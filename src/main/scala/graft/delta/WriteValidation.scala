package graft.delta

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructField

/** Write-time enforcement of check constraints, column invariants, NOT
  * NULL, generated columns, and default column values (reference
  * kernel/src/expressions/sql.rs:1-80 — the SQL-expression surface for
  * these features — and schema/mod.rs:253-313 field-metadata keys;
  * semantics follow the Delta protocol sections on CHECK constraints,
  * column invariants and generated columns).
  *
  * Enforcement is embedded INTO the staging projection via
  * `raise_error` guards — the checks ride the same distributed write
  * job, zero extra passes over the data; a violating row aborts the
  * job before anything commits.
  */
object WriteValidation {

  val CONSTRAINT_PREFIX = "delta.constraints."
  val INVARIANTS_KEY = "delta.invariants"
  val GENERATION_KEY = "delta.generationExpression"
  val DEFAULT_KEY = "CURRENT_DEFAULT"

  /** (description, boolean SQL over logical columns) pairs that every
    * written row must satisfy.
    */
  def checks(snap: Snapshot): Seq[(String, String)] = {
    val fromProps = snap.metadata.configuration.toSeq.collect {
      case (k, sql) if k.startsWith(CONSTRAINT_PREFIX) =>
        (s"CHECK constraint ${k.stripPrefix(CONSTRAINT_PREFIX)}", sql)
    }
    val fromInvariants = snap.schema.fields.toSeq.collect {
      case f if f.metadata.contains(INVARIANTS_KEY) =>
        // protocol shape: {"expression":{"expression":"<sql>"}}
        val sql = JsonLog.mapper
          .readTree(f.metadata.getString(INVARIANTS_KEY))
          .path("expression").path("expression").asText
        (s"invariant on ${f.name}", sql)
    }
    val notNull = snap.schema.fields.toSeq.collect {
      case f if !f.nullable =>
        (s"NOT NULL constraint on ${f.name}",
          s"${ColumnMapping.quoted(f.name)} IS NOT NULL")
    }
    // a generated column supplied explicitly must match its expression
    val genMatch = generated(snap).toSeq.map { case (c, e) =>
      (s"generated column $c", s"${ColumnMapping.quoted(c)} <=> ($e)")
    }
    (fromProps ++ fromInvariants ++ notNull ++ genMatch)
      .filter(_._2.nonEmpty)
  }

  /** column → generation expression SQL. */
  def generated(snap: Snapshot): Map[String, String] =
    snap.schema.fields.collect {
      case f if f.metadata.contains(GENERATION_KEY) =>
        f.name -> f.metadata.getString(GENERATION_KEY)
    }.toMap

  def defaultOf(f: StructField): Option[String] =
    if (f.metadata.contains(DEFAULT_KEY))
      Some(f.metadata.getString(DEFAULT_KEY))
    else None

  /** Prepare `df` for staging: fill columns absent from the input —
    * generated columns compute from their expression, default columns
    * take their CURRENT_DEFAULT — then embed every check as a
    * raise_error guard wrapped around the first output column (the
    * guard rides the projection; it cannot be pruned because the
    * column's value flows through it).
    */
  /** `passthrough` columns ride the projection untouched (e.g. the
    * materialized row-tracking columns an OPTIMIZE rewrite must carry
    * into the staged files).
    */
  def prepare(df: DataFrame, snap: Snapshot,
      passthrough: Seq[String] = Nil,
      nullGeneratedAsOmitted: Boolean = false): DataFrame = {
    val present = df.columns.toSet
    val gen = generated(snap)
    var out = df
    snap.schema.fields.foreach { f =>
      if (!present.contains(f.name)) {
        gen.get(f.name) match {
          case Some(e) =>
            out = out.withColumn(f.name, expr(e).cast(f.dataType))
          case None => defaultOf(f) match {
            case Some(d) =>
              out = out.withColumn(f.name, expr(d).cast(f.dataType))
            case None => // fall through to the select below, which
              // raises the standard missing-column analysis error
          }
        }
      } else if (nullGeneratedAsOmitted) gen.get(f.name).foreach { e =>
        // SQL-INSERT path only: the analyzer fills omitted columns
        // with NULL before the write reaches the engine, so a NULL in
        // a present generated column means "omitted" — compute it. On
        // the DataFrame API path omission is distinguishable, so an
        // explicit NULL stays and the guard below rejects it
        // (delta-spark parity).
        out = out.withColumn(f.name,
          coalesce(ColumnMapping.qcol(f.name), expr(e)).cast(f.dataType))
      }
    }
    val extras = passthrough.map(ColumnMapping.qcol)
    val cs = checks(snap)
    if (cs.isEmpty)
      out.select(snap.schema.fieldNames.map(ColumnMapping.qcol) ++
        extras: _*)
    else {
      val violated = cs.map { case (_, sql) =>
        not(coalesce(expr(sql), lit(false)))
      }.reduce(_ || _)
      val msg = concat(lit("row violates "),
        cs.foldRight(lit(""): org.apache.spark.sql.Column) { case ((desc, sql), acc) =>
          when(not(coalesce(expr(sql), lit(false))),
            lit(s"$desc [$sql]")).otherwise(acc)
        })
      val first = snap.schema.fields.head
      val guarded = when(violated,
        raise_error(msg).cast(first.dataType))
        .otherwise(ColumnMapping.qcol(first.name))
        .as(first.name, first.metadata)
      out.select(guarded +:
        (snap.schema.fieldNames.tail.map(ColumnMapping.qcol) ++
          extras): _*)
    }
  }
}
