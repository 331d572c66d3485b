package graft.delta

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.types._

/** Write-time stats validation (reference
  * kernel/src/transaction/stats_verifier.rs:370): every add action's
  * stats JSON must honor the protocol contract BEFORE it commits —
  * a malformed stat is worse than no stat, because readers skip files
  * based on it (silent wrong answers, not errors). Checks: parseable
  * JSON object, `numRecords` present and non-negative, every
  * `nullCount` within [0, numRecords], min/max keys drawn from the
  * schema, and min <= max per column where the type is unambiguously
  * orderable from JSON.
  */
object StatsVerifier {

  /** None = valid; Some(description) = the violation. */
  def verify(statsJson: String, physSchema: StructType): Option[String] = {
    val n =
      try JsonLog.mapper.readTree(statsJson)
      catch { case e: Exception =>
        return Some(s"stats are not valid JSON: ${e.getMessage}")
      }
    if (!n.isObject) return Some("stats are not a JSON object")
    val numRecords = n.path("numRecords")
    if (!numRecords.isIntegralNumber)
      return Some("numRecords missing or not integral")
    val rows = numRecords.asLong
    if (rows < 0) return Some(s"negative numRecords $rows")

    val fields = physSchema.fieldNames.toSet
    val iter = n.path("nullCount").properties().iterator()
    while (iter.hasNext) {
      val e = iter.next()
      if (!fields.contains(e.getKey))
        return Some(s"nullCount for unknown column '${e.getKey}'")
      val v = e.getValue
      if (!v.isIntegralNumber || v.asLong < 0 || v.asLong > rows)
        return Some(s"nullCount.${e.getKey}=${v} outside [0, $rows]")
    }

    Seq("minValues", "maxValues").foreach { side =>
      val it = n.path(side).properties().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (!fields.contains(e.getKey))
          return Some(s"$side for unknown column '${e.getKey}'")
      }
    }

    val byName = physSchema.fields.map(f => f.name -> f.dataType).toMap
    val mins = n.path("minValues")
    val maxs = n.path("maxValues")
    val it = mins.properties().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getKey
      val mx = maxs.path(c)
      if (!mx.isMissingNode && !mx.isNull) {
        ordered(e.getValue, mx, byName(c)).foreach { ok =>
          if (!ok) return Some(
            s"minValues.$c=${e.getValue} > maxValues.$c=$mx")
        }
      }
    }
    None
  }

  /** Some(min <= max) when the JSON values are unambiguously orderable
    * for the type; None = cannot judge (plain strings with truncation
    * tie-breakers order by code point, which JSON text cannot settle).
    */
  private def ordered(mn: JsonNode, mx: JsonNode,
      dt: DataType): Option[Boolean] = dt match {
    case (ByteType | ShortType | IntegerType | LongType)
        if mn.isIntegralNumber && mx.isIntegralNumber =>
      Some(mn.asLong <= mx.asLong)
    case (FloatType | DoubleType | _: DecimalType)
        if mn.isNumber && mx.isNumber =>
      Some(mn.asDouble <= mx.asDouble)
    case (DateType | TimestampType | TimestampNTZType)
        if mn.isTextual && mx.isTextual =>
      // ISO-8601 renderings order lexicographically
      Some(mn.asText <= mx.asText)
    case _ => None
  }

  /** Throw on the first invalid add — called on every staged file
    * before its add action commits.
    */
  def verifyAll(adds: Seq[AddFile], physSchema: StructType): Unit =
    adds.foreach { a =>
      a.stats.foreach { s =>
        verify(s, physSchema).foreach { msg =>
          throw new IllegalStateException(
            s"invalid stats for ${a.path}: $msg")
        }
      }
    }
}
