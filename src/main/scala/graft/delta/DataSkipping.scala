package graft.delta

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Stats-based file-skipping predicate rewrite (reference:
  * kernel/src/scan/data_skipping.rs:32-441 and
  * kernel/src/kernel_predicates/mod.rs:45-200).
  *
  * Rewrites a data predicate over table columns into a predicate over the
  * per-file stats struct (`__stats.minValues/maxValues/nullCount/
  * numRecords`):
  *   a <  L  ⇒ minValues.a <  L        (file may contain a matching row)
  *   a >  L  ⇒ maxValues.a >  L
  *   a =  L  ⇒ minValues.a <= L AND maxValues.a >= L
  *   a IS NULL      ⇒ nullCount.a > 0
  *   a IS NOT NULL  ⇒ nullCount.a < numRecords
  * AND may drop un-rewritable children (safe over-approximation); OR
  * requires both; NOT is pushed down by inverting children (De Morgan,
  * reference expressions/mod.rs:532-538). Anything not understood makes
  * that subtree unknown — the file is KEPT (skipping is best-effort,
  * filtering correctness never depends on it; reference
  * expressions/mod.rs:503-520).
  */
object DataSkipping {

  /** Stats schema for a table schema, restricted to skipping-eligible
    * top-level leaf columns (reference stats_schema/mod.rs).
    */
  def statsSchema(dataSchema: StructType): StructType = {
    val eligible = dataSchema.fields.filter(f => isEligible(f.dataType))
    StructType(Seq(
      StructField("numRecords", LongType),
      StructField("minValues", StructType(eligible.map(f =>
        StructField(f.name, f.dataType)))),
      StructField("maxValues", StructType(eligible.map(f =>
        StructField(f.name, f.dataType)))),
      StructField("nullCount", StructType(dataSchema.fields.map(f =>
        StructField(f.name, LongType))))))
  }

  def isEligible(dt: DataType): Boolean = dt match {
    case _: NumericType | StringType | DateType | TimestampType |
         TimestampNTZType => true
    case _ => false
  }

  private object Attr {
    def unapply(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute if a.nameParts.size == 1 =>
        Some(a.nameParts.head)
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
  }

  private def statRef(kind: String, name: String): Expression =
    UnresolvedAttribute(Seq("__stats", kind, name))
  private def numRecords: Expression =
    UnresolvedAttribute(Seq("__stats", "numRecords"))

  /** Invert a predicate for NOT pushdown. */
  private def negate(e: Expression): Option[Expression] = e match {
    case LessThan(a, b) => Some(GreaterThanOrEqual(a, b))
    case GreaterThan(a, b) => Some(LessThanOrEqual(a, b))
    case LessThanOrEqual(a, b) => Some(GreaterThan(a, b))
    case GreaterThanOrEqual(a, b) => Some(LessThan(a, b))
    case EqualTo(a, b) => None // NOT(a=b) needs distinct-count stats; skip
    case IsNull(c) => Some(IsNotNull(c))
    case IsNotNull(c) => Some(IsNull(c))
    case And(a, b) =>
      for (na <- negate(a); nb <- negate(b)) yield Or(na, nb)
    case Or(a, b) =>
      for (na <- negate(a); nb <- negate(b)) yield And(na, nb)
    case Not(c) => Some(c)
    case _ => None
  }

  /** Floor a timestamp literal to milliseconds — written timestamp stats
    * are truncated toward −∞ at 3 fractional digits (the ToJson stats
    * contract), so MAX-side comparisons must compare against the floored
    * literal or files whose true max lies in (floor(max), max] would be
    * wrongly skipped. Comparisons become >= after flooring.
    */
  private def floorMs(l: Literal): Literal = l match {
    case Literal(v: Long, t @ (TimestampType | TimestampNTZType)) =>
      Literal(v - java.lang.Math.floorMod(v, 1000L), t)
    case other => other
  }
  private def isTs(l: Literal): Boolean = l.dataType match {
    case TimestampType | TimestampNTZType => true
    case _ => false
  }
  /** MAX-side bound: max(a) must admit values matching `op l`. */
  private def maxSide(a: String, l: Literal, strict: Boolean): Expression =
    if (isTs(l)) GreaterThanOrEqual(statRef("maxValues", a), floorMs(l))
    else if (strict) GreaterThan(statRef("maxValues", a), l)
    else GreaterThanOrEqual(statRef("maxValues", a), l)

  /** Rewrite a data predicate to a skipping predicate; None = cannot
    * skip on this subtree. `eligible` = columns with min/max stats;
    * `nullFields` = columns present in the nullCount struct (dataSchema
    * only — a partition column reaching here, e.g. inside a mixed OR
    * conjunct, must return None or the generated field reference would
    * not resolve against the stats schema).
    */
  def rewrite(e: Expression, eligible: Set[String],
      nullFields: Set[String]): Option[Expression] =
    e match {
      case LessThan(Attr(a), l: Literal) if eligible(a) =>
        Some(LessThan(statRef("minValues", a), l))
      case LessThan(l: Literal, Attr(a)) if eligible(a) =>
        Some(maxSide(a, l, strict = true))
      case GreaterThan(Attr(a), l: Literal) if eligible(a) =>
        Some(maxSide(a, l, strict = true))
      case GreaterThan(l: Literal, Attr(a)) if eligible(a) =>
        Some(LessThan(statRef("minValues", a), l))
      case LessThanOrEqual(Attr(a), l: Literal) if eligible(a) =>
        Some(LessThanOrEqual(statRef("minValues", a), l))
      case LessThanOrEqual(l: Literal, Attr(a)) if eligible(a) =>
        Some(maxSide(a, l, strict = false))
      case GreaterThanOrEqual(Attr(a), l: Literal) if eligible(a) =>
        Some(maxSide(a, l, strict = false))
      case GreaterThanOrEqual(l: Literal, Attr(a)) if eligible(a) =>
        Some(LessThanOrEqual(statRef("minValues", a), l))
      case EqualTo(Attr(a), l: Literal) if eligible(a) =>
        Some(And(LessThanOrEqual(statRef("minValues", a), l),
          maxSide(a, l, strict = false)))
      case EqualTo(l: Literal, Attr(a)) if eligible(a) =>
        Some(And(LessThanOrEqual(statRef("minValues", a), l),
          maxSide(a, l, strict = false)))
      case IsNull(Attr(a)) if nullFields(a) =>
        Some(GreaterThan(statRef("nullCount", a), Literal(0L)))
      case IsNotNull(Attr(a)) if nullFields(a) =>
        Some(LessThan(statRef("nullCount", a), numRecords))
      case In(Attr(a), list) if eligible(a) &&
          list.forall(_.isInstanceOf[Literal]) && list.nonEmpty =>
        // any literal within [min, max] keeps the file
        Some(list.map(l => And(
          LessThanOrEqual(statRef("minValues", a), l.asInstanceOf[Literal]),
          maxSide(a, l.asInstanceOf[Literal], strict = false))
          .asInstanceOf[Expression]).reduce(Or))
      case And(a, b) =>
        (rewrite(a, eligible, nullFields), rewrite(b, eligible, nullFields)) match {
          case (Some(ra), Some(rb)) => Some(And(ra, rb))
          case (some @ Some(_), None) => some
          case (None, some) => some // AND-drop is safe
        }
      case Or(a, b) =>
        for (ra <- rewrite(a, eligible, nullFields);
             rb <- rewrite(b, eligible, nullFields))
          yield Or(ra, rb)
      case Not(c) => negate(c).flatMap(rewrite(_, eligible, nullFields))
      case l @ Literal(_, BooleanType) => Some(l)
      case _ => None
    }

  /** Column names referenced by an expression (top-level only). */
  def references(e: Expression): Set[String] = {
    val out = scala.collection.mutable.Set.empty[String]
    e.foreach {
      case a: UnresolvedAttribute => out += a.nameParts.head
      case a: AttributeReference => out += a.name
      case _ =>
    }
    out.toSet
  }

  /** Split a predicate into conjuncts. */
  def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
  }

  def parse(spark: SparkSession, sql: String): Expression =
    spark.sessionState.sqlParser.parseExpression(sql)
}
