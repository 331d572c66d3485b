package graft.delta

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** SHALLOW CLONE: absolute-path adds (the protocol's other `path`
  * form), DV re-addressing, independent evolution, and vacuum safety.
  */
class CloneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("clone reads the source's files in place; DVs keep resolving") {
    val src = TestSpark.tmpDir("clone-src")
    val data = (1 to 500).map(i => (i.toLong, s"v$i", i % 5)).toDF("k", "s", "p")
    DeltaTable.create(spark, src, data.schema, Seq("p"))
    val t = DeltaTable.forPath(spark, src)
    t.append(data)
    t.deleteWhereDV("k % 7 = 0") // a live deletion vector in the clone
    val expect = t.toDF.select($"k").as[Long].collect().sorted.toSeq

    val tgt = TestSpark.tmpDir("clone-tgt")
    assert(t.cloneShallow(tgt) == 0L)
    val c = DeltaTable.forPath(spark, tgt)
    assert(c.toDF.select($"k").as[Long].collect().sorted.toSeq == expect)
    // zero data copied: the clone's directory holds only the log
    val cloneFiles = new java.io.File(tgt).listFiles().map(_.getName).toSet
    assert(cloneFiles == Set("_delta_log"), cloneFiles.toString)
    // partition pruning still works through absolute paths
    assert(c.scan(Some("p = 3")).toDF.count() ==
      t.scan(Some("p = 3")).toDF.count())
  }

  test("clone evolves independently; vacuum cannot reach source files") {
    val src = TestSpark.tmpDir("clone2-src")
    val data = (1 to 100).map(i => (i.toLong, i * 2.0)).toDF("k", "v")
    DeltaTable.create(spark, src, data.schema)
    val t = DeltaTable.forPath(spark, src)
    t.append(data)

    val tgt = TestSpark.tmpDir("clone2-tgt")
    t.cloneShallow(tgt)
    val c = DeltaTable.forPath(spark, tgt)

    // clone-side DML: delete + append land under the clone root only
    c.deleteWhere("k <= 50")
    c.append(Seq((1000L, 0.5)).toDF("k", "v"))
    assert(c.toDF.count() == 51)
    assert(t.toDF.count() == 100, "source must be untouched")

    // vacuum on the clone lists only the clone's directory: the
    // source's (now-removed-from-clone) files are out of reach
    c.setProperties(
      Map("delta.deletedFileRetentionDuration" -> "interval 0 seconds"))
    val candidates = c.vacuum(dryRun = true)
    assert(candidates.forall(!_.contains("clone2-src")),
      s"vacuum must never name source files: $candidates")
    c.vacuum()
    assert(t.toDF.count() == 100, "vacuum on clone deleted source data")

    // cloning onto an existing table fails loudly
    intercept[IllegalArgumentException] { t.cloneShallow(tgt) }
  }

  test("clone of a clone: absolute paths pass through un-prefixed") {
    val src = TestSpark.tmpDir("clone3-src")
    val data = (1 to 200).map(i => (i.toLong, s"v$i")).toDF("k", "s")
    DeltaTable.create(spark, src, data.schema)
    val t = DeltaTable.forPath(spark, src)
    t.append(data)
    t.deleteWhereDV("k % 9 = 0")
    val expect = t.toDF.select($"k").as[Long].collect().sorted.toSeq

    val gen1 = TestSpark.tmpDir("clone3-g1")
    t.cloneShallow(gen1)
    val c1 = DeltaTable.forPath(spark, gen1)
    c1.append(Seq((9999L, "new")).toDF("k", "s")) // gen1-local file
    // second generation: gen0 files stay addressed at gen0 (no
    // 'file:/g2/file:/src/...' double prefix), gen1's own file at gen1
    val gen2 = TestSpark.tmpDir("clone3-g2")
    c1.cloneShallow(gen2)
    val c2 = DeltaTable.forPath(spark, gen2)
    assert(c2.toDF.select($"k").as[Long].collect().sorted.toSeq ==
      (expect :+ 9999L).sorted)
    val paths = c2.scan(None).collectAddFiles(slim = true).map(_.path)
    assert(paths.forall(p => Storage.isAbsoluteUri(Storage.decodeUriPath(p))),
      paths.take(3).toString)
    assert(paths.forall(p => !p.drop(6).contains("file:")),
      s"double-prefixed path in second-generation clone: " +
        paths.filter(_.drop(6).contains("file:")).take(3))
  }
}
