package graft.delta

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Stats truncation contract (reference default-engine/src/stats.rs,
  * expressions/mod.rs:103-126): truncated min <= value <= truncated max
  * under UTF-8 binary ordering (what Spark and the protocol compare
  * with), and skipping with truncated stats never skips a matching file.
  * Properties run over a seeded random corpus (ASCII, BMP,
  * supplementary, and U+10FFFF code points).
  */
class StatsTruncationSpec extends AnyFunSuite {

  private val alphabet: IndexedSeq[String] =
    ('a' to 'z').map(_.toString) ++ ('0' to '9').map(_.toString) ++
      IndexedSeq("é", "℞", "中", "~", "",
        new String(Character.toChars(0x1f600)),
        new String(Character.toChars(0x10ffff)))

  private def randString(rnd: scala.util.Random): String = {
    val n = rnd.nextInt(101)
    (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString
  }

  private def u8(s: String) = UTF8String.fromString(s)

  test("truncated min <= value <= truncated max (UTF-8 order)") {
    val rnd = new scala.util.Random(42)
    (0 until 3000).foreach { _ =>
      val s = randString(rnd)
      val mn = StatsJson.truncateMin(s)
      assert(u8(mn).compareTo(u8(s)) <= 0)
      assert(mn.codePointCount(0, mn.length) <=
        StatsJson.STRING_PREFIX_LENGTH ||
        s.codePointCount(0, s.length) <= StatsJson.STRING_PREFIX_LENGTH)
      StatsJson.truncateMax(s).foreach { mx =>
        assert(u8(mx).compareTo(u8(s)) >= 0, s"max '$mx' < value '$s'")
        assert(mx.codePointCount(0, mx.length) <=
          StatsJson.STRING_EXPANSION_LIMIT + 1)
      }
    }
  }

  test("truncated max covers every string sharing the prefix") {
    // the tie-breaker guarantees: any string starting with the truncated
    // prefix compares <= prefix + tie-breaker
    val rnd = new scala.util.Random(7)
    (0 until 3000).foreach { _ =>
      val long = randString(rnd) + randString(rnd)
      if (long.codePointCount(0, long.length) >
          StatsJson.STRING_PREFIX_LENGTH) {
        StatsJson.truncateMax(long).foreach { mx =>
          assert(u8(mx).compareTo(u8(long)) >= 0, s"'$mx' < '$long'")
        }
      }
    }
  }

  test("all-U+10FFFF tail yields no max stat") {
    val s = "a" * 10 +
      new String(Character.toChars(0x10ffff)) * 60
    assert(StatsJson.truncateMax(s).isEmpty)
  }

  test("timestamp floor: skipping with truncated stats never skips a match") {
    // stats store floor_ms(max); the reader compares max >= floor_ms(L)
    val rnd = new scala.util.Random(13)
    def floorMs(x: Long) = x - java.lang.Math.floorMod(x, 1000L)
    (0 until 5000).foreach { _ =>
      val v = rnd.nextLong() % (1L << 50)
      val l = rnd.nextLong() % (1L << 50)
      if (v > l) assert(floorMs(v) >= floorMs(l))
    }
  }

  test("3-digit timestamp rendering truncates toward -inf") {
    val t = java.sql.Timestamp.from(
      java.time.Instant.parse("2026-07-02T15:55:55.298677Z"))
    assert(StatsJson.renderSide(t, isMax = true) ==
      Some("\"2026-07-02T15:55:55.298Z\""))
    val pre1970 = java.sql.Timestamp.from(
      java.time.Instant.parse("1969-12-31T23:59:59.999500Z"))
    assert(StatsJson.renderSide(pre1970, isMax = false) ==
      Some("\"1969-12-31T23:59:59.999Z\""))
  }

  test("end-to-end: long-string stats skip correctly, never wrongly") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val dir = graft.TestSpark.tmpDir("trunc")
    val long1 = "a" * 60
    val long2 = "b" * 60
    val src = Seq((1L, long1), (2L, long2)).toDF("k", "s")
    DeltaTable.create(spark, dir, src.schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(src)
    val stats = t.scan(None).collectAddFiles().flatMap(_.stats).mkString
    assert(stats.contains("\"" + "a" * 32 + "\"")) // truncated min
    assert(!stats.contains(long2))                 // max truncated too
    // exact-match predicates on the truncated column still return rows
    assert(t.scan(Some(s"s = '$long2'")).toDF.count() == 1)
    assert(t.scan(Some(s"s > '$long1'")).toDF.count() == 1)
    // and a predicate beyond the tie-breaker max skips the file
    assert(t.scan(Some("s > 'c'")).collectAddFiles().isEmpty)
  }
}
