package graft.delta

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Fuzz for the COLLAPSED CDF range plan (file-constant commit
  * columns, shared scan arms, version-keyed DV-swap masks): under a
  * randomized DML mix, the whole-range read must row-for-row equal
  * the union of single-version reads — the single-commit shape where
  * constant stamping and mask keying cannot cross commits. Catches
  * exactly the new risk surface: a version stamped onto another
  * commit's file, a DV diff applied at the wrong version, an arm
  * dropping or double-reading a file.
  */
class CdfRangeFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cdfConf = Map(TableChanges.CDF_ENABLED_KEY -> "true")

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(col("k"), col("s"), col("p"), col("_change_type"),
        col("_commit_version"),
        col("_commit_timestamp").cast("long"))
      .collect().map(_.toString).sorted.toSeq

  test("whole-range read == union of single-version reads across a " +
      "randomized append/delete/DV/update/restore mix (3 trials)") {
    val rnd = new scala.util.Random(20260815)
    for (trial <- 1 to 3) {
      val dir = TestSpark.tmpDir(s"cdf-fuzz$trial")
      val all = (1 to 20000).map(i =>
        (i.toLong, s"v$i", s"p${i % 2}")).toDF("k", "s", "p")
      DeltaTable.create(spark, dir, all.schema, Seq("p"), cdfConf)
      val t = DeltaTable.forPath(spark, dir)
      // big first batch so DV bitmaps persist past the inline cap
      // often enough to exercise file-DV reads too
      t.append(all.filter($"k" <= 2000).repartition(2))

      var nextK = 2000L
      val ops = 8 + rnd.nextInt(4)
      (1 to ops).foreach { _ =>
        rnd.nextInt(6) match {
          case 0 | 1 => // fresh append
            val lo = nextK + 1; nextK += 200 + rnd.nextInt(200)
            t.append(all.filter($"k" > lo && $"k" <= nextK)
              .limit(400).repartition(1 + rnd.nextInt(2)))
          case 2 => // cdc rewrite delete
            t.deleteWhere(s"k % 13 = ${rnd.nextInt(13)} and k <= 2000")
          case 3 => // DV swap — repeatedly hits the SAME big files
            t.deleteWhereDV(s"k % 17 = ${rnd.nextInt(17)} and k <= 2000")
          case 4 => // DV-based update: pairs + fresh adds in one commit
            t.updateWhereDV(s"k % 19 = ${rnd.nextInt(19)} and k <= 1000",
              Map("s" -> "concat(s, '!')"))
          case 5 => // restore: re-adds previously removed paths
            val v = t.snapshot().version
            t.restore(1L + rnd.nextInt(v.toInt))
        }
      }
      val end = t.snapshot().version

      val whole = TableChanges.read(spark, dir, 1, Some(end))
      val perVersion = (1L to end).map(v =>
          TableChanges.read(spark, dir, v, Some(v)))
        .reduce(_.unionByName(_))
      assert(sortedRows(whole) == sortedRows(perVersion),
        s"trial $trial: range read diverges from per-version union " +
          s"over [1, $end]")

      // plan stays collapsed: never more scan arms than change
      // classes + DV-conflict overflows could ever justify
      val scans = "Scan parquet".r
        .findAllIn(whole.queryExecution.executedPlan.toString).length
      assert(scans <= 6,
        s"trial $trial: $scans scan arms over [1, $end]")

      // predicate pushdown stays row-preserving on the collapsed plan
      val pred = "k % 5 = 1"
      val pruned = TableChanges.read(spark, dir, 1, Some(end), Some(pred))
      assert(sortedRows(pruned.filter(expr(pred))) ==
        sortedRows(whole.filter(expr(pred))),
        s"trial $trial: pushdown changed matching rows")
    }
  }
}
