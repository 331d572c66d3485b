package graft.delta

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The `.format("graft-delta")` batch surface: save modes create /
  * append / overwrite through the transactional commit path, reads go
  * through the log-backed skipping scan, filters push into file
  * skipping, and versionAsOf time-travels.
  */
class BatchFormatSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val FMT = "graft-delta"

  test("write modes: create, append, overwrite, ignore, error") {
    val dir = TestSpark.tmpDir("fmt")
    val a = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    a.write.format(FMT).save(dir)                       // create (v1)
    assert(spark.read.format(FMT).load(dir).count() == 2)

    Seq((3L, "c")).toDF("k", "s")
      .write.format(FMT).mode(SaveMode.Append).save(dir) // v2
    assert(spark.read.format(FMT).load(dir).count() == 3)

    Seq((9L, "z")).toDF("k", "s")
      .write.format(FMT).mode(SaveMode.Overwrite).save(dir) // v3
    assert(spark.read.format(FMT).load(dir)
      .as[(Long, String)].collect().toSet == Set((9L, "z")))

    Seq((0L, "x")).toDF("k", "s")
      .write.format(FMT).mode(SaveMode.Ignore).save(dir) // no-op
    assert(spark.read.format(FMT).load(dir).count() == 1)

    intercept[IllegalStateException] {
      Seq((0L, "x")).toDF("k", "s")
        .write.format(FMT).mode(SaveMode.ErrorIfExists).save(dir)
    }

    // versionAsOf reads pre-overwrite state
    assert(spark.read.format(FMT).option("versionAsOf", 2)
      .load(dir).count() == 3)
  }

  test("filters push down to file skipping; rows come back exact") {
    val dir = TestSpark.tmpDir("fmtpush")
    val t = {
      val src = (1L to 1000L).map(k => (k, k % 7, s"r$k"))
        .toDF("k", "m", "s")
      DeltaTable.create(spark, dir, src.schema,
        configuration = Map(DeltaTable.CLUSTERING_NUM_FILES_KEY -> "8"),
        clusterBy = Seq("k"))
      val tt = DeltaTable.forPath(spark, dir)
      tt.append(src)
      tt
    }
    val total = t.scan(None).collectAddFiles().size
    assert(total >= 4, s"premise: want several files, got $total")
    val df = spark.read.format(FMT).load(dir).filter($"k" < 100)
    assert(df.select("k").as[Long].collect().toSet == (1L until 100L).toSet)
    // file skipping engaged: the scan reads fewer files than the table
    val hit = t.scan(Some("k < 100")).collectAddFiles().size
    assert(hit < total, s"skipping read $hit of $total files")
    // DV deletes apply through the relation too
    t.deleteWhereDV("k = 50")
    assert(!spark.read.format(FMT).load(dir)
      .filter($"k" < 100).select("k").as[Long].collect().contains(50L))
  }

  test("projection and string/null filter translation") {
    val dir = TestSpark.tmpDir("fmtproj")
    Seq((1L, "en", 1.0), (2L, null.asInstanceOf[String], 2.0),
      (3L, "de", 3.0)).toDF("k", "lang", "v")
      .write.format(FMT).save(dir)
    val got = spark.read.format(FMT).load(dir)
      .filter($"lang".isNotNull && $"lang" === "en")
      .select("k").as[Long].collect().toSeq
    assert(got == Seq(1L))
    assert(spark.read.format(FMT).load(dir)
      .filter($"lang".isNull).count() == 1)
  }
}
