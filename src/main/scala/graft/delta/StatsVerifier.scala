package graft.delta

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.types._

/** Write-time stats validation (reference
  * kernel/src/transaction/stats_verifier.rs:370): every add action's
  * stats JSON must honor the protocol contract BEFORE it commits —
  * a malformed stat is worse than no stat, because readers skip files
  * based on it (silent wrong answers, not errors). Checks: parseable
  * JSON object, `numRecords` present and non-negative, every
  * `nullCount` leaf within [0, numRecords], min/max keys drawn from the
  * schema (recursing into nested structs, whose stats mirror the data
  * schema's nesting), and min <= max per leaf where the type is
  * unambiguously orderable from JSON.
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

    // nullCount: every leaf is an integral count in [0, numRecords];
    // struct columns nest (their node must be an object, not a count)
    def checkNulls(node: JsonNode, st: StructType,
        prefix: String): Option[String] = {
      val byName = st.fields.map(f => f.name -> f.dataType).toMap
      val iter = node.properties().iterator()
      while (iter.hasNext) {
        val e = iter.next()
        val path = prefix + e.getKey
        byName.get(e.getKey) match {
          case None =>
            return Some(s"nullCount for unknown column '$path'")
          case Some(nested: StructType) =>
            if (!e.getValue.isObject)
              return Some(s"nullCount.$path must nest for struct column")
            val r = checkNulls(e.getValue, nested, path + ".")
            if (r.isDefined) return r
          case Some(_) =>
            val v = e.getValue
            if (!v.isIntegralNumber || v.asLong < 0 || v.asLong > rows)
              return Some(s"nullCount.$path=${v} outside [0, $rows]")
        }
      }
      None
    }
    checkNulls(n.path("nullCount"), physSchema, "") match {
      case some @ Some(_) => return some
      case None =>
    }

    // minValues/maxValues: keys drawn from the schema at every nesting
    // level; min <= max per orderable leaf
    def checkSides(mins: JsonNode, maxs: JsonNode, st: StructType,
        prefix: String): Option[String] = {
      val byName = st.fields.map(f => f.name -> f.dataType).toMap
      for (side <- Seq(mins, maxs)) {
        val it = side.properties().iterator()
        while (it.hasNext) {
          val e = it.next()
          val path = prefix + e.getKey
          byName.get(e.getKey) match {
            case None =>
              return Some(s"min/max stat for unknown column '$path'")
            case Some(_: StructType) if !e.getValue.isObject =>
              return Some(s"min/max.$path must nest for struct column")
            case Some(_) =>
          }
        }
      }
      val it = mins.properties().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getKey
        val mx = maxs.path(c)
        if (!mx.isMissingNode && !mx.isNull) byName.get(c) match {
          case Some(nested: StructType) =>
            val r = checkSides(e.getValue, mx, nested, prefix + c + ".")
            if (r.isDefined) return r
          case Some(dt) =>
            ordered(e.getValue, mx, dt).foreach { ok =>
              if (!ok) return Some(
                s"minValues.$prefix$c=${e.getValue} > " +
                  s"maxValues.$prefix$c=$mx")
            }
          case None =>
        }
      }
      None
    }
    checkSides(n.path("minValues"), n.path("maxValues"), physSchema, "")
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
