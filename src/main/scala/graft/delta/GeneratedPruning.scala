package graft.delta

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types._

/** Partition-filter derivation for GENERATED partition columns
  * (delta-spark's OptimizeGeneratedColumn; the reference stores the
  * generation expression in field metadata,
  * kernel/src/schema/mod.rs:253-313 `delta.generationExpression`).
  *
  * The canonical 100 TB case: a table partitioned by
  * `day GENERATED ALWAYS AS (CAST(ts AS DATE))` queried with
  * `ts >= T1 AND ts < T2`. Without derivation the predicate references
  * only the base column, so partition pruning sees nothing and the
  * scan lists every partition. This derives the implied partition
  * predicates:
  *
  *  - `base = lit`  → `p <=> f(lit)` for ANY deterministic generation
  *    expression f over a single base column (rows with that base
  *    value can only live in that partition);
  *  - `base >= lit` / `>` → `p >= f(lit)`, and `<=` / `<` →
  *    `p <= f(lit)`, for MONOTONE non-decreasing f (identity,
  *    CAST(base AS DATE), year, date_trunc, trunc, and the
  *    lexicographically-ordered date_format patterns);
  *  - `base IN (l1..ln)` → `p <=> f(l1) OR ... OR p <=> f(ln)`.
  *
  * For the recognized monotone shapes `f(b)` is NULL iff `b` is NULL,
  * and a NULL base never satisfies the source comparison (3VL), so the
  * derived predicates are exact — they can never prune a file that
  * could hold a matching row.
  */
object GeneratedPruning {

  /** date_format patterns whose output string-sorts in time order. */
  private val monotoneFormats = Set(
    "yyyy", "yyyy-MM", "yyyy-MM-dd", "yyyy-MM-dd-HH", "yyyy-MM-dd HH")

  private sealed trait Shape
  private case object Monotone extends Shape
  private case object EqualityOnly extends Shape

  /** Classify a generation expression over exactly one base column:
    * (baseColumn, shape). None when it references zero or multiple
    * columns — no derivation possible.
    */
  private def classify(gen: Expression): Option[(String, Shape)] = {
    val refs = DataSkipping.references(gen)
    if (refs.size != 1) return None
    def isBase(e: Expression) = e match {
      case a: UnresolvedAttribute => a.nameParts.size == 1
      case _ => false
    }
    val shape = gen match {
      case a: UnresolvedAttribute if a.nameParts.size == 1 => Monotone
      case c: Cast if c.dataType == DateType && isBase(c.child) => Monotone
      case f: UnresolvedFunction =>
        val name = f.nameParts.last.toLowerCase(java.util.Locale.ROOT)
        (name, f.arguments) match {
          case ("year", Seq(b)) if isBase(b) => Monotone
          case ("date_trunc", Seq(_, b)) if isBase(b) => Monotone
          case ("trunc", Seq(b, _)) if isBase(b) => Monotone
          case ("date_format", Seq(b, Literal(fmt, StringType)))
              if isBase(b) && fmt != null &&
                monotoneFormats(fmt.toString) => Monotone
          case _ => EqualityOnly
        }
      case _ => EqualityOnly
    }
    Some((refs.head, shape))
  }

  /** Derive partition conjuncts implied by `dataConjuncts` for every
    * generated partition column. Derived conjuncts reference only the
    * partition column, so the existing partition-pruning path
    * evaluates them over the typed partition-values struct. All
    * evaluation is driver-local (one-row plans, no cluster jobs); any
    * evaluation failure simply derives nothing (scan stays unpruned —
    * correct, just less fast).
    */
  def derive(spark: SparkSession, schema: StructType,
      partCols: Seq[String], dataConjuncts: Seq[Expression])
      : Seq[Expression] = {
    if (dataConjuncts.isEmpty) return Nil
    val generated = partCols.flatMap { p =>
      schema.fields.find(_.name == p)
        .filter(_.metadata.contains(WriteValidation.GENERATION_KEY))
        .map(f => (p, f.metadata.getString(WriteValidation.GENERATION_KEY)))
    }
    if (generated.isEmpty) return Nil

    generated.flatMap { case (p, genSql) =>
      scala.util.Try(DataSkipping.parse(spark, genSql)).toOption
        .flatMap(classify).toSeq.flatMap { case (base, shape) =>
          val baseType = schema.fields.find(_.name == base)
            .map(_.dataType).getOrElse(StringType)

          // f(comparand): CAST the comparand to the base type, then
          // evaluate the generation expression over it — a one-row
          // local relation, executed driver-side
          def f(comparandSql: String): Option[Any] = scala.util.Try {
            import scala.jdk.CollectionConverters._
            val v = spark.sql(
              s"SELECT CAST(($comparandSql) AS ${baseType.sql})")
              .head().get(0)
            if (v == null) throw new IllegalArgumentException(
              s"comparand ($comparandSql) casts to NULL as " +
                baseType.sql)
            spark.createDataFrame(
                Seq(Row(v)).asJava,
                StructType(Seq(StructField(base, baseType))))
              .select(expr(genSql)).head().get(0)
          }.toOption

          def attr = UnresolvedAttribute(Seq(p))
          def isBaseAttr(e: Expression) = e match {
            case a: UnresolvedAttribute => a.nameParts == Seq(base)
            case _ => false
          }
          def foldableSql(e: Expression): Option[String] =
            if (e.foldable || DataSkipping.references(e).isEmpty)
              scala.util.Try(e.sql).toOption
            else None

          def mono(cmp: (Expression, Expression) => Expression,
              v: Expression): Option[Expression] =
            if (shape != Monotone) None
            else foldableSql(v).flatMap(f)
              .map(fv => cmp(attr, Literal(fv)))
          def eq(v: Expression): Option[Expression] =
            foldableSql(v).flatMap(f)
              .map(fv => EqualNullSafe(attr, Literal(fv)))

          dataConjuncts.flatMap {
            case EqualTo(b, v) if isBaseAttr(b) => eq(v)
            case EqualTo(v, b) if isBaseAttr(b) => eq(v)
            case GreaterThanOrEqual(b, v) if isBaseAttr(b) =>
              mono(GreaterThanOrEqual(_, _), v)
            case GreaterThan(b, v) if isBaseAttr(b) =>
              mono(GreaterThanOrEqual(_, _), v)
            case LessThanOrEqual(b, v) if isBaseAttr(b) =>
              mono(LessThanOrEqual(_, _), v)
            case LessThan(b, v) if isBaseAttr(b) =>
              mono(LessThanOrEqual(_, _), v)
            // flipped operand order: lit cmp base
            case GreaterThanOrEqual(v, b) if isBaseAttr(b) =>
              mono(LessThanOrEqual(_, _), v)
            case GreaterThan(v, b) if isBaseAttr(b) =>
              mono(LessThanOrEqual(_, _), v)
            case LessThanOrEqual(v, b) if isBaseAttr(b) =>
              mono(GreaterThanOrEqual(_, _), v)
            case LessThan(v, b) if isBaseAttr(b) =>
              mono(GreaterThanOrEqual(_, _), v)
            case In(b, vs) if isBaseAttr(b) && vs.nonEmpty =>
              val fvs = vs.map(eq)
              if (fvs.exists(_.isEmpty)) None
              else Some(fvs.flatten.reduce(Or(_, _)))
            case _ => None
          }
        }
    }
  }
}
