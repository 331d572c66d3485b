package graft.delta

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Stats-based file-skipping predicate rewrite (reference:
  * kernel/src/scan/data_skipping.rs:32-441 and
  * kernel/src/kernel_predicates/mod.rs:45-200; nested stats schemas
  * kernel/src/scan/data_skipping/stats_schema/mod.rs:23-45 via the
  * column trie kernel/src/column_trie.rs).
  *
  * Rewrites a data predicate over table columns into a predicate over the
  * per-file stats struct (`__stats.minValues/maxValues/nullCount/
  * numRecords`):
  *   a <  L  ⇒ minValues.a <  L        (file may contain a matching row)
  *   a >  L  ⇒ maxValues.a >  L
  *   a =  L  ⇒ minValues.a <= L AND maxValues.a >= L
  *   a IS NULL      ⇒ nullCount.a > 0
  *   a IS NOT NULL  ⇒ nullCount.a < numRecords
  * Columns are LEAF PATHS: a predicate on `a.b.c` skips against
  * `__stats.minValues.a.b.c` — the stats structs mirror the data
  * schema's struct nesting exactly (stats_schema/mod.rs). AND may drop
  * un-rewritable children (safe over-approximation); OR requires both;
  * NOT is pushed down by inverting children (De Morgan, reference
  * expressions/mod.rs:532-538). Anything not understood makes that
  * subtree unknown — the file is KEPT (skipping is best-effort,
  * filtering correctness never depends on it; reference
  * expressions/mod.rs:503-520).
  */
object DataSkipping {

  /** Stats schema mirroring the data schema's struct nesting, restricted
    * to skipping-eligible leaf columns (reference stats_schema/mod.rs:
    * minValues/maxValues keep eligible leaves under their original
    * struct paths; nullCount mirrors every leaf as a long). Structs with
    * no surviving leaves are pruned.
    */
  def statsSchema(dataSchema: StructType): StructType = {
    def minMaxOf(st: StructType): Option[StructType] = {
      val kept = st.fields.flatMap { f =>
        f.dataType match {
          case nested: StructType =>
            minMaxOf(nested).map(s => StructField(f.name, s))
          case dt if isEligible(dt) => Some(StructField(f.name, dt))
          case _ => None
        }
      }
      if (kept.isEmpty) None else Some(StructType(kept))
    }
    def nullsOf(st: StructType): StructType = StructType(
      st.fields.map { f =>
        f.dataType match {
          case nested: StructType => StructField(f.name, nullsOf(nested))
          case _ => StructField(f.name, LongType)
        }
      })
    val mm = minMaxOf(dataSchema).getOrElse(StructType(Nil))
    StructType(Seq(
      StructField("numRecords", LongType),
      StructField("minValues", mm),
      StructField("maxValues", mm),
      StructField("nullCount", nullsOf(dataSchema))))
  }

  /** Restrict a stats schema to the given root-relative paths (e.g.
    * `Seq("maxValues","a","b")`, `Seq("numRecords")`), dropping any
    * struct left empty. Used to parse only the stat leaves a skipping
    * predicate references — at millions of adds, from_json over the
    * full mirrored schema is the dominant planning cost.
    */
  def pruneToPaths(schema: StructType, keep: Set[Seq[String]])
      : StructType = {
    def walk(st: StructType, prefix: Seq[String]): Option[StructType] = {
      val kept = st.fields.flatMap { f =>
        val p = prefix :+ f.name
        f.dataType match {
          case nested: StructType =>
            if (keep.contains(p)) Some(f)
            else walk(nested, p).map(s => StructField(f.name, s))
          case _ => if (keep.contains(p)) Some(f) else None
        }
      }
      if (kept.isEmpty) None else Some(StructType(kept))
    }
    walk(schema, Nil).getOrElse(StructType(Nil))
  }

  /** Leaf paths with min/max stats in `statsSchema(dataSchema)`. */
  def eligiblePaths(dataSchema: StructType): Set[Seq[String]] =
    leafPaths(dataSchema).collect {
      case (p, dt) if isEligible(dt) => p
    }.toSet

  /** Every leaf path (primitive or non-struct complex) with a nullCount
    * slot; struct INTERIOR nodes carry no flat count.
    */
  def nullCountPaths(dataSchema: StructType): Set[Seq[String]] =
    leafPaths(dataSchema).map(_._1).toSet

  /** Depth-first (path, type) for every non-struct node. */
  def leafPaths(st: StructType): Seq[(Seq[String], DataType)] =
    st.fields.flatMap { f =>
      f.dataType match {
        case nested: StructType =>
          leafPaths(nested).map { case (p, dt) => (f.name +: p, dt) }
        case dt => Seq((Seq(f.name), dt))
      }
    }.toSeq

  def isEligible(dt: DataType): Boolean = dt match {
    case _: NumericType | StringType | DateType | TimestampType |
         TimestampNTZType => true
    case _ => false
  }

  private object Attr {
    def unapply(e: Expression): Option[Seq[String]] = e match {
      case a: UnresolvedAttribute => Some(a.nameParts)
      case a: AttributeReference => Some(Seq(a.name))
      case GetStructField(Attr(parent), _, Some(name)) =>
        Some(parent :+ name)
      case _ => None
    }
  }

  private def statRef(kind: String, path: Seq[String]): Expression =
    UnresolvedAttribute(Seq("__stats", kind) ++ path)
  private def numRecords: Expression =
    UnresolvedAttribute(Seq("__stats", "numRecords"))

  /** Invert a predicate for NOT pushdown. NOT(=) and NOT(<=>) are
    * handled directly in [[rewrite]] (they need min=max=L reasoning,
    * not an inverted comparison).
    */
  private def negate(e: Expression): Option[Expression] = e match {
    case LessThan(a, b) => Some(GreaterThanOrEqual(a, b))
    case GreaterThan(a, b) => Some(LessThanOrEqual(a, b))
    case LessThanOrEqual(a, b) => Some(GreaterThan(a, b))
    case GreaterThanOrEqual(a, b) => Some(LessThan(a, b))
    case EqualTo(_, _) | EqualNullSafe(_, _) => None // rewrite handles
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
  /** Stats whose written form may not equal the exact value (string
    * 32-cp truncation + tie-breakers, timestamp ms flooring) cannot
    * prove `min = max = L` — NOT(=)/Distinct skipping needs exactness.
    */
  private def isExact(l: Literal): Boolean = l.dataType match {
    case StringType | TimestampType | TimestampNTZType => false
    case _ => true
  }
  /** MAX-side bound: max(a) must admit values matching `op l`. */
  private def maxSide(a: Seq[String], l: Literal,
      strict: Boolean): Expression =
    if (isTs(l)) GreaterThanOrEqual(statRef("maxValues", a), floorMs(l))
    else if (strict) GreaterThan(statRef("maxValues", a), l)
    else GreaterThanOrEqual(statRef("maxValues", a), l)

  /** `a = l` may hold in the file: min <= l <= max. */
  private def eqTerm(a: Seq[String], l: Literal): Expression =
    And(LessThanOrEqual(statRef("minValues", a), l),
      maxSide(a, l, strict = false))
  /** `a <> l` may hold for some non-null row: unless the stats prove
    * every value equals l (min = max = l, exact types only), keep.
    */
  private def neTerm(a: Seq[String], l: Literal): Expression =
    Not(And(EqualTo(statRef("minValues", a), l),
      EqualTo(statRef("maxValues", a), l)))

  /** Rewrite a data predicate to a skipping predicate; None = cannot
    * skip on this subtree. `eligible` = leaf paths with min/max stats;
    * `nullFields` = leaf paths present in the nullCount struct
    * (dataSchema only — a partition column reaching here, e.g. inside a
    * mixed OR conjunct, must return None or the generated field
    * reference would not resolve against the stats schema).
    */
  def rewrite(e: Expression, eligible: Set[Seq[String]],
      nullFields: Set[Seq[String]]): Option[Expression] = {
    // All-null guard: a comparison only matches a NON-null row, so a
    // file whose column is entirely null (nullCount = numRecords) can
    // be skipped even though its min/max stats are absent (reference
    // production path eval_sql_where; tests.rs
    // test_all_null_pruning_all_comparison_ops). Plain EqualTo, not
    // <=>: an add with absent/unparseable stats (legal per the
    // protocol) yields NULL for BOTH counts, and NULL <=> NULL is TRUE
    // — the guard would render a definite FALSE that coalesce(_, true)
    // cannot rescue, silently skipping a live file. With EqualTo the
    // NULL propagates and the file is kept.
    def g(a: Seq[String], term: Expression): Expression =
      if (nullFields(a))
        And(Not(EqualTo(statRef("nullCount", a), numRecords)), term)
      else term
    e match {
      case LessThan(Attr(a), l: Literal) if eligible(a) =>
        Some(g(a, LessThan(statRef("minValues", a), l)))
      case LessThan(l: Literal, Attr(a)) if eligible(a) =>
        Some(g(a, maxSide(a, l, strict = true)))
      case GreaterThan(Attr(a), l: Literal) if eligible(a) =>
        Some(g(a, maxSide(a, l, strict = true)))
      case GreaterThan(l: Literal, Attr(a)) if eligible(a) =>
        Some(g(a, LessThan(statRef("minValues", a), l)))
      case LessThanOrEqual(Attr(a), l: Literal) if eligible(a) =>
        Some(g(a, LessThanOrEqual(statRef("minValues", a), l)))
      case LessThanOrEqual(l: Literal, Attr(a)) if eligible(a) =>
        Some(g(a, maxSide(a, l, strict = false)))
      case GreaterThanOrEqual(Attr(a), l: Literal) if eligible(a) =>
        Some(g(a, maxSide(a, l, strict = false)))
      case GreaterThanOrEqual(l: Literal, Attr(a)) if eligible(a) =>
        Some(g(a, LessThanOrEqual(statRef("minValues", a), l)))
      case EqualTo(Attr(a), l: Literal) if eligible(a) =>
        Some(g(a, eqTerm(a, l)))
      case EqualTo(l: Literal, Attr(a)) if eligible(a) =>
        Some(g(a, eqTerm(a, l)))
      // a <=> NULL ⇒ a IS NULL; a <=> l ⇒ same bounds as a = l
      // (reference kernel_predicates/mod.rs:301-322 Distinct machinery)
      case EqualNullSafe(Attr(a), l: Literal) =>
        if (l.value == null) rewrite(IsNull(UnresolvedAttribute(a)),
          eligible, nullFields)
        else if (eligible(a)) Some(g(a, eqTerm(a, l))) else None
      case EqualNullSafe(l: Literal, Attr(a)) =>
        rewrite(EqualNullSafe(UnresolvedAttribute(a), l),
          eligible, nullFields)
      // NOT(a = l): null rows fail a <> l under 3VL, so skip when ALL
      // values provably equal l — min = max = l with exact
      // (untruncated) stats — or when every row is null (the guard)
      case Not(EqualTo(Attr(a), l: Literal))
          if eligible(a) && isExact(l) && l.value != null =>
        Some(g(a, neTerm(a, l)))
      case Not(EqualTo(l: Literal, Attr(a)))
          if eligible(a) && isExact(l) && l.value != null =>
        Some(g(a, neTerm(a, l)))
      // a IS DISTINCT FROM l (parses as NOT(a <=> l)): matches null
      // rows too, so the file survives if it has any null OR any value
      // different from l (kernel_predicates/mod.rs:301-322, :586)
      case Not(EqualNullSafe(Attr(a), l: Literal)) =>
        if (l.value == null)
          rewrite(IsNotNull(UnresolvedAttribute(a)), eligible, nullFields)
        else if (eligible(a) && isExact(l) && nullFields(a))
          Some(Or(GreaterThan(statRef("nullCount", a), Literal(0L)),
            neTerm(a, l)))
        else None
      case Not(EqualNullSafe(l: Literal, Attr(a))) =>
        rewrite(Not(EqualNullSafe(UnresolvedAttribute(a), l)),
          eligible, nullFields)
      case IsNull(Attr(a)) if nullFields(a) =>
        Some(GreaterThan(statRef("nullCount", a), Literal(0L)))
      case IsNotNull(Attr(a)) if nullFields(a) =>
        Some(LessThan(statRef("nullCount", a), numRecords))
      case In(Attr(a), list) if eligible(a) &&
          list.forall(_.isInstanceOf[Literal]) && list.nonEmpty =>
        // any literal within [min, max] keeps the file
        Some(g(a, list.map(l =>
          eqTerm(a, l.asInstanceOf[Literal]): Expression).reduce(Or)))
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
