package graft.delta

import org.apache.spark.sql.types._

/** Schema evolution validation (reference:
  * kernel/src/transaction/schema_evolution.rs,
  * kernel/src/schema/mod.rs:2030-2055 widening matrix,
  * kernel/src/schema/compare.rs).
  *
  * Allowed evolutions for ALTER TABLE:
  *  - add a nullable column (old files read it as NULL — free with
  *    Spark's schema-first parquet read)
  *  - widen a column per the protocol matrix: byte → short → int →
  *    long, float → double, timestamp ↔ timestamp_ntz (old int32/float
  *    pages read natively under the widened schema by Spark's
  *    vectorized reader)
  * Drops, renames (without column mapping), narrowing, and nullability
  * tightening are rejected.
  */
object SchemaEvolution {

  /** Protocol widening matrix (schema/mod.rs:2030-2055). */
  def canWiden(from: DataType, to: DataType): Boolean = (from, to) match {
    case (a, b) if a == b => true
    case (ByteType, ShortType | IntegerType | LongType) => true
    case (ShortType, IntegerType | LongType) => true
    case (IntegerType, LongType) => true
    case (FloatType, DoubleType) => true
    case (TimestampType, TimestampNTZType) => true
    case (TimestampNTZType, TimestampType) => true
    case _ => false
  }

  /** Structural diff between two schemas (reference
    * kernel/src/schema/diff.rs): added/dropped columns and type changes
    * by top-level name.
    */
  case class SchemaDiff(
      added: Seq[StructField],
      dropped: Seq[StructField],
      changed: Seq[(StructField, StructField)]) {
    def isEmpty: Boolean = added.isEmpty && dropped.isEmpty && changed.isEmpty
  }

  def diff(oldSchema: StructType, newSchema: StructType): SchemaDiff = {
    val oldByName = oldSchema.fields.map(f => f.name -> f).toMap
    val newByName = newSchema.fields.map(f => f.name -> f).toMap
    SchemaDiff(
      added = newSchema.fields.filterNot(f => oldByName.contains(f.name)),
      dropped = oldSchema.fields.filterNot(f => newByName.contains(f.name)),
      changed = oldSchema.fields.flatMap(of =>
        newByName.get(of.name)
          .filter(_.dataType != of.dataType)
          .map(nf => (of, nf))))
  }

  /** Validate that `newSchema` is a legal evolution of `oldSchema`:
    * every old column present (same name), type equal or widened,
    * nullability never tightened; new columns must be nullable.
    * Returns the offending description on failure.
    */
  def validate(oldSchema: StructType, newSchema: StructType): Option[String] = {
    val newByName = newSchema.fields.map(f => f.name -> f).toMap
    oldSchema.fields.iterator.flatMap { of =>
      newByName.get(of.name) match {
        case None => Some(s"column '${of.name}' was dropped")
        case Some(nf) =>
          if (!canWiden(of.dataType, nf.dataType))
            Some(s"column '${of.name}': ${of.dataType.simpleString} cannot " +
              s"widen to ${nf.dataType.simpleString}")
          else if (of.nullable && !nf.nullable)
            Some(s"column '${of.name}': nullability cannot tighten")
          else None
      }
    }.nextOption().orElse {
      val oldNames = oldSchema.fieldNames.toSet
      newSchema.fields.iterator
        .filter(f => !oldNames.contains(f.name) && !f.nullable)
        .map(f => s"new column '${f.name}' must be nullable")
        .nextOption()
    }
  }

  /** Merge an incoming write schema into the table schema
    * (delta-spark's `mergeSchema` writer option semantics): table
    * column order is preserved; a column present in both keeps the
    * WIDER of the two types per [[canWiden]] (a narrower incoming
    * column upcasts at write time instead); incoming-only columns
    * append as nullable. Incompatible type pairs fail loudly — a
    * silent cast would corrupt data.
    * Name matching is case-insensitive, like Spark's resolution.
    */
  def merge(table: StructType, incoming: StructType): StructType = {
    def find(s: StructType, name: String): Option[StructField] =
      s.fields.find(_.name.equalsIgnoreCase(name))
    val kept = table.fields.map { tf =>
      find(incoming, tf.name) match {
        case Some(inf) if inf.dataType == tf.dataType => tf
        case Some(inf) if canWiden(tf.dataType, inf.dataType) =>
          tf.copy(dataType = inf.dataType)
        case Some(inf) if canWiden(inf.dataType, tf.dataType) => tf
        case Some(inf) => throw new IllegalArgumentException(
          s"mergeSchema: column '${tf.name}' " +
            s"${tf.dataType.simpleString} cannot merge with incoming " +
            inf.dataType.simpleString)
        case None => tf
      }
    }
    val added = incoming.fields
      .filter(f => find(table, f.name).isEmpty)
      .map(_.copy(nullable = true))
    StructType(kept ++ added)
  }
}
