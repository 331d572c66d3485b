package graft.delta

import java.sql.{Date, Timestamp}
import java.time.ZoneOffset
import java.time.format.DateTimeFormatter


/** Per-file stats JSON for add actions (reference:
  * default-engine/src/stats.rs, transaction/mod.rs:109-132; the ToJson
  * stats contract in expressions/mod.rs:103-126).
  *
  * Shape: {"numRecords":N,"minValues":{..},"maxValues":{..},
  * "nullCount":{..}}. Protocol truncation contract:
  *  - strings: min truncates to a 32-code-point prefix; max appends a
  *    tie-breaker after the prefix — 0x7F when the truncated char is
  *    ASCII, U+10FFFF otherwise, scanning up to 64 code points for a
  *    truncation point that is not itself U+10FFFF (no valid point ⇒
  *    the max stat is omitted)
  *  - timestamps: exactly three fractional digits, truncated toward −∞
  *    (readers compensate on the max side — DataSkipping floors the
  *    comparison literal to milliseconds)
  */
object StatsJson {

  val STRING_PREFIX_LENGTH = 32
  val STRING_EXPANSION_LIMIT = 64
  private val ASCII_MAX = 0x7f
  private val UTF8_MAX = 0x10ffff

  /** Min-side truncation: a 32-code-point prefix is always <= the value. */
  def truncateMin(s: String): String =
    if (s.codePointCount(0, s.length) <= STRING_PREFIX_LENGTH) s
    else s.substring(0, s.offsetByCodePoints(0, STRING_PREFIX_LENGTH))

  /** Max-side truncation with tie-breaker; None = no valid truncation
    * point within the expansion limit (max stat must be omitted).
    */
  def truncateMax(s: String): Option[String] = {
    val n = s.codePointCount(0, s.length)
    if (n <= STRING_PREFIX_LENGTH) return Some(s)
    val maxChars = math.min(n, STRING_EXPANSION_LIMIT)
    var len = STRING_PREFIX_LENGTH
    while (len <= maxChars) {
      if (len >= n) return Some(s)
      val idx = s.offsetByCodePoints(0, len)
      val next = s.codePointAt(idx)
      if (next != UTF8_MAX) {
        val tie =
          if (next < ASCII_MAX) "\u007f"
          else new String(Character.toChars(UTF8_MAX))
        return Some(s.substring(0, idx) + tie)
      }
      len += 1
    }
    None
  }

  private val tsFmt = DateTimeFormatter
    .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").withZone(ZoneOffset.UTC)
  private val tsNtzFmt = DateTimeFormatter
    .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS")

  def renderValue(v: Any): Option[String] = renderSide(v, isMax = false)

  /** Render one stats leaf. Strings truncate per side; timestamps always
    * truncate toward −∞ at 3 digits (ToJson contract).
    */
  def renderSide(v: Any, isMax: Boolean): Option[String] = v match {
    case null => None
    case s: String =>
      if (isMax) truncateMax(s).map(t => "\"" + JsonLog.esc(t) + "\"")
      else Some("\"" + JsonLog.esc(truncateMin(s)) + "\"")
    case d: Date => Some("\"" + d.toString + "\"")
    case d: java.time.LocalDate => Some("\"" + d.toString + "\"")
    case t: Timestamp => Some("\"" + tsFmt.format(t.toInstant) + "\"")
    case t: java.time.Instant => Some("\"" + tsFmt.format(t) + "\"")
    case l: java.time.LocalDateTime =>
      Some("\"" + tsNtzFmt.format(l.truncatedTo(
        java.time.temporal.ChronoUnit.MILLIS)) + "\"")
    case b: Array[Byte] => // ToJson contract: lowercase hex, not base64
      Some("\"" + b.map("%02x".format(_)).mkString + "\"")
    case d: java.math.BigDecimal => Some(d.toPlainString)
    case d: Double =>
      if (java.lang.Double.isFinite(d)) Some(d.toString) else None
    case f: Float =>
      if (java.lang.Float.isFinite(f)) Some(f.toString) else None
    case n @ (_: Long | _: Int | _: Short | _: Byte) => Some(n.toString)
    case b: Boolean => Some(b.toString)
    case other => Some("\"" + JsonLog.esc(other.toString) + "\"")
  }

  /** Nested object from depth-first (leaf path, rendered value) entries
    * — the stats structs mirror the data schema's struct nesting
    * (reference stats_schema/mod.rs). None leaves are omitted; interior
    * structs whose every leaf is omitted are dropped entirely.
    */
  private def renderPathObj(
      entries: Seq[(Seq[String], Option[String])]): String = {
    val heads = entries.map(_._1.head).distinct
    heads.flatMap { h =>
      val sub = entries.filter(_._1.head == h)
      if (sub.head._1.size == 1)
        sub.head._2.map(v => "\"" + JsonLog.esc(h) + "\":" + v)
      else {
        val inner = renderPathObj(sub.map { case (p, v) => (p.tail, v) })
        if (inner == "{}") None
        else Some("\"" + JsonLog.esc(h) + "\":" + inner)
      }
    }.mkString("{", ",", "}")
  }

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

  /** Assemble a stats JSON from already-rendered leaf values keyed by
    * leaf PATH (nested structs render as nested objects; None =
    * unknown, omitted).
    */
  def render(numRecords: Long, mins: Seq[(Seq[String], Option[String])],
      maxs: Seq[(Seq[String], Option[String])],
      nulls: Seq[(Seq[String], Option[String])]): String =
    s"""{"numRecords":$numRecords,"minValues":${renderPathObj(mins)},""" +
      s""""maxValues":${renderPathObj(maxs)},""" +
      s""""nullCount":${renderPathObj(nulls)}}"""

}
