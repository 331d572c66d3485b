package graft.delta

import java.sql.{Date, Timestamp}
import java.time.ZoneOffset
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Per-file stats JSON for add actions (reference:
  * default-engine/src/stats.rs, transaction/mod.rs:109-132; the ToJson
  * stats contract in expressions/mod.rs:103-126).
  *
  * Shape: {"numRecords":N,"minValues":{..},"maxValues":{..},
  * "nullCount":{..}} with timestamps as ISO-8601 UTC micros. We keep
  * full-precision strings (protocol permits untruncated stats; the
  * 32-char truncation + tie-breaker rules only matter when truncating).
  */
object StatsJson {

  private val tsFmt = DateTimeFormatter
    .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").withZone(ZoneOffset.UTC)

  def renderValue(v: Any): Option[String] = v match {
    case null => None
    case s: String => Some("\"" + JsonLog.esc(s) + "\"")
    case d: Date => Some("\"" + d.toString + "\"")
    case t: Timestamp => Some("\"" + tsFmt.format(t.toInstant) + "\"")
    case t: java.time.Instant => Some("\"" + tsFmt.format(t) + "\"")
    case d: java.math.BigDecimal => Some(d.toPlainString)
    case d: Double =>
      if (java.lang.Double.isFinite(d)) Some(d.toString) else None
    case f: Float =>
      if (java.lang.Float.isFinite(f)) Some(f.toString) else None
    case n @ (_: Long | _: Int | _: Short | _: Byte) => Some(n.toString)
    case b: Boolean => Some(b.toString)
    case other => Some("\"" + JsonLog.esc(other.toString) + "\"")
  }

  private def renderObj(fields: Seq[(String, Option[String])]): String =
    fields.collect { case (k, Some(v)) => "\"" + JsonLog.esc(k) + "\":" + v }
      .mkString("{", ",", "}")

  /** Mark a stats JSON as non-tight (`tightBounds:false`) — required when
    * a deletion vector is attached without recomputing stats over live
    * rows: min/max/nullCount become bounds over the physical file, not
    * exact values (protocol contract).
    */
  def markNonTight(stats: String): String = {
    val n = JsonLog.mapper.readTree(stats)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    n.put("tightBounds", false)
    n.toString
  }

  /** Build the stats JSON from a collected per-file aggregate row with
    * columns: numRecords, min_<c>/max_<c> for eligible cols, null_<c>
    * for all data cols.
    */
  def fromAggRow(row: Row, eligibleCols: Seq[String],
      allCols: Seq[String]): String = {
    def get(name: String): Any = {
      val i = row.fieldIndex(name)
      if (row.isNullAt(i)) null else row.get(i)
    }
    val numRecords = get("numRecords").asInstanceOf[Long]
    val mins = eligibleCols.map(c => c -> renderValue(get(s"min_$c")))
    val maxs = eligibleCols.map(c => c -> renderValue(get(s"max_$c")))
    val nulls = allCols.map(c => c -> renderValue(get(s"null_$c")))
    s"""{"numRecords":$numRecords,"minValues":${renderObj(mins)},""" +
      s""""maxValues":${renderObj(maxs)},"nullCount":${renderObj(nulls)}}"""
  }
}
