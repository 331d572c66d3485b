package graft.delta

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{Row, SQLContext}

/** DSv1 batch relation over a Delta table: `spark.read
  * .format("graft-delta").load(path)` (+ `versionAsOf`/`timestampAsOf`
  * time travel). Supported pushed filters are translated to a
  * predicate for the log-level skipping path (partition pruning +
  * stats), then Spark re-applies every filter exactly on the rows —
  * translation only ever REDUCES the files read, never the rows
  * returned (the DataSkipping contract: unknown ⇒ keep).
  */
class GraftDeltaRelation(
    override val sqlContext: SQLContext,
    path: String,
    version: Option[Long]) extends BaseRelation
    with PrunedFilteredScan with InsertableRelation {

  private val spark = sqlContext.sparkSession

  /** Resolved per SCAN, not pinned at relation creation: Spark caches
    * resolved v1 relations (the session catalog's tableRelationCache),
    * so a pinned snapshot would serve stale reads after an INSERT
    * through the same cached relation. The schema IS pinned (analysis
    * needs a stable schema; Spark invalidates the cache on ALTER).
    */
  private def resolveSnap: Snapshot =
    Snapshot.forTable(spark, path, version)

  override val schema: StructType = resolveSnap.schema

  /** `INSERT INTO` / `INSERT OVERWRITE` on a session-catalog table
    * `CREATE TABLE ... USING graft-delta` routes here — same
    * transactional commit path as the DataFrame writer.
    */
  override def insert(data: org.apache.spark.sql.DataFrame,
      overwrite: Boolean): Unit = {
    require(version.isEmpty, "cannot write to a time-travelled table")
    val t = DeltaTable.forPath(spark, path)
    // SQL INSERT resolution fills omitted columns with NULL — a NULL
    // generated column on this path means "compute it"
    if (overwrite) t.overwrite(data, nullGeneratedAsOmitted = true)
    else t.append(data, nullGeneratedAsOmitted = true)
  }

  /** The scan already produces InternalRow — skip Spark's
    * Row↔InternalRow double conversion (the DSv1 idiom: with
    * needConversion=false the engine consumes the RDD[Row] as
    * RDD[InternalRow] directly, keeping the parquet scan's unsafe rows
    * on the codegen path).
    */
  override def needConversion: Boolean = false

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val pred = filters.flatMap(GraftDeltaRelation.toSql)
      .reduceOption((a, b) => s"($a) AND ($b)")
    val df = new DeltaScan(resolveSnap, pred).toDF
    val projected =
      if (requiredColumns.isEmpty)
        // COUNT(*)-style scans: any single cheap column serves
        df.select(ColumnMapping.qcol(schema.fieldNames.head))
      else df.select(requiredColumns.map(ColumnMapping.qcol).toIndexedSeq: _*)
    projected.queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }
}

object GraftDeltaRelation {

  private def lit(v: Any): Option[String] = v match {
    case null => None
    case s: String => Some("'" + s.replace("\\", "\\\\")
      .replace("'", "\\'") + "'")
    case b: Boolean => Some(b.toString)
    case n @ (_: Byte | _: Short | _: Int | _: Long |
              _: Float | _: Double) => Some(n.toString)
    case d: java.math.BigDecimal => Some(d.toPlainString)
    case d: java.sql.Date => Some(s"DATE '$d'")
    case _ => None // timestamps etc.: skip — Spark still filters rows
  }

  private def q(attr: String): String =
    "`" + attr.replace("`", "``") + "`"

  /** Best-effort Filter → SQL for file skipping; None = not translated
    * (the file set stays a superset — correctness unaffected).
    */
  private[graft] def toSql(f: Filter): Option[String] = f match {
    case EqualTo(a, v) => lit(v).map(l => s"${q(a)} = $l")
    case GreaterThan(a, v) => lit(v).map(l => s"${q(a)} > $l")
    case GreaterThanOrEqual(a, v) => lit(v).map(l => s"${q(a)} >= $l")
    case LessThan(a, v) => lit(v).map(l => s"${q(a)} < $l")
    case LessThanOrEqual(a, v) => lit(v).map(l => s"${q(a)} <= $l")
    case In(a, vs) if vs.nonEmpty && vs.forall(_ != null) =>
      val ls = vs.toSeq.map(lit)
      if (ls.forall(_.isDefined))
        Some(s"${q(a)} IN (${ls.flatten.mkString(", ")})")
      else None
    case IsNull(a) => Some(s"${q(a)} IS NULL")
    case IsNotNull(a) => Some(s"${q(a)} IS NOT NULL")
    case And(l, r) => (toSql(l), toSql(r)) match {
      case (Some(a), Some(b)) => Some(s"($a) AND ($b)")
      case (a, b) => a.orElse(b) // AND may drop a side (skipping-safe)
      }
    case Or(l, r) => for { a <- toSql(l); b <- toSql(r) }
      yield s"($a) OR ($b)" // OR needs BOTH sides
    case _ => None
  }

  /** EXACT Filter → SQL, for row-mutating paths (SQL DELETE): every
    * conjunct must translate — unlike [[toSql]], which may DROP an AND
    * side because skipping only ever keeps extra files. Dropping a
    * conjunct here would delete rows the user did not name. None =
    * refuse the operation (Spark reports it unsupported) rather than
    * run a wider delete.
    */
  private[graft] def toExactSql(f: Filter): Option[String] = f match {
    case And(l, r) => for { a <- toExactSql(l); b <- toExactSql(r) }
      yield s"($a) AND ($b)"
    case Or(l, r) => for { a <- toExactSql(l); b <- toExactSql(r) }
      yield s"($a) OR ($b)"
    case Not(c) => toExactSql(c).map(s => s"NOT ($s)")
    case AlwaysTrue() => Some("true")
    case AlwaysFalse() => Some("false")
    case other => toSql(other) match {
      // the leaf cases in toSql are exact; only the junctions differ
      case some @ Some(_) => some
      case None => None
    }
  }
}
