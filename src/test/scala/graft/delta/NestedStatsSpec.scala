package graft.delta

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** End-to-end nested-column stats: writes collect min/max/nullCount for
  * struct LEAF paths (reference stats_schema/mod.rs:23-45 builds the
  * stats schema over nested leaves via the column trie), and scans skip
  * files on `a.b < x` predicates — asserted FILE-side, not just
  * row-side.
  */
class NestedStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mkTable(): (DeltaTable, String) = {
    val dir = TestSpark.tmpDir("nested-stats")
    val src = spark.range(0, 100)
      .select(col("id"),
        struct(col("id").as("x"),
          concat(lit("v"), col("id")).as("tag"),
          struct((col("id") % 7).as("z")).as("inner")).as("s"))
    DeltaTable.create(spark, dir, src.schema)
    val t = DeltaTable.forPath(spark, dir)
    // 4 files with disjoint s.x ranges: 0-24, 25-49, 50-74, 75-99
    (0 until 4).foreach { i =>
      t.append(src.filter(col("id") >= i * 25 && col("id") < (i + 1) * 25)
        .repartition(1))
    }
    (t, dir)
  }

  private def files(t: DeltaTable, pred: String): Seq[AddFile] =
    new DeltaScan(t.snapshot(), Some(pred)).collectAddFiles()

  test("adds carry nested minValues/maxValues/nullCount objects") {
    val (t, _) = mkTable()
    val adds = files(t, "id >= 0")
    assert(adds.size == 4)
    adds.foreach { a =>
      val st = a.stats.get
      val n = JsonLog.mapper.readTree(st)
      assert(n.path("minValues").path("s").path("x").isIntegralNumber,
        s"missing nested min s.x in $st")
      assert(n.path("maxValues").path("s").path("inner").path("z")
        .isIntegralNumber, s"missing nested max s.inner.z in $st")
      assert(n.path("nullCount").path("s").path("tag").isIntegralNumber,
        s"missing nested nullCount s.tag in $st")
    }
  }

  test("predicates on struct leaves skip files") {
    val (t, _) = mkTable()
    assert(files(t, "s.x < 25").size == 1)
    assert(files(t, "s.x >= 75").size == 1)
    assert(files(t, "s.x = 50").size == 1)
    assert(files(t, "s.inner.z IS NOT NULL").size == 4)
    // doubly-nested equality: every file holds z in [0,6]
    assert(files(t, "s.inner.z = 3").size == 4)
    // string leaf: min/max prefix bounds still skip
    assert(files(t, "s.tag = 'v0'").size == 1)
    // rows stay exact after skipping
    assert(t.scan(Some("s.x < 25")).toDF.count() == 25)
    assert(t.scan(Some("s.x >= 75 AND s.inner.z = 5"))
      .toDF.select("id").as[Long].collect().toSet ==
      (75L until 100L).filter(_ % 7 == 5).toSet)
  }

  test("IS DISTINCT FROM and NOT(=) skip on exact-typed leaves") {
    val dir = TestSpark.tmpDir("nested-distinct")
    val src = spark.range(0, 10)
      .select(col("id"), lit(5L).as("c"))
    DeltaTable.create(spark, dir, src.schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(src.repartition(1))                       // c = 5 everywhere
    t.append(spark.range(10, 20)
      .select(col("id"), lit(9L).as("c")).repartition(1)) // c = 9
    // all values in file 1 equal 5 -> NOT(=5) and DISTINCT FROM 5 skip it
    assert(files(t, "NOT (c = 5)").size == 1)
    assert(files(t, "c IS DISTINCT FROM 5").size == 1)
    assert(files(t, "c IS DISTINCT FROM 7").size == 2)
    assert(t.scan(Some("c IS DISTINCT FROM 5")).toDF.count() == 10)
  }

  test("all-null columns prune comparisons via the nullCount guard") {
    val dir = TestSpark.tmpDir("nested-allnull")
    val src = spark.range(0, 10).select(col("id"),
      when(lit(false), col("id")).as("v")) // v: all null, LongType
    DeltaTable.create(spark, dir, src.schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(src.repartition(1))
    t.append(spark.range(10, 20)
      .select(col("id"), col("id").as("v")).repartition(1))
    assert(files(t, "v < 100").size == 1) // all-null file pruned
    assert(files(t, "v IS NULL").size == 1)
    assert(t.scan(Some("v < 100")).toDF.count() == 10)
  }

  test("adds with absent or unparseable stats are always kept") {
    // Legal per the protocol: an add may carry no stats at all. The
    // all-null guard must then render NULL (kept), not FALSE — a
    // NULL<=>NULL guard would silently skip live files on every
    // comparison predicate.
    val dir = TestSpark.tmpDir("nostats")
    val src = spark.range(0, 10).select(col("id"), col("id").as("v"))
    DeltaTable.create(spark, dir, src.schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(src.repartition(1))
    // strip the stats field from every add in the commit JSON
    val logDir = new org.apache.hadoop.fs.Path(dir, "_delta_log")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(logDir).filter(_.getPath.getName.endsWith(".json"))
      .foreach { st =>
        val lines = scala.io.Source.fromInputStream(
          fs.open(st.getPath)).getLines().toList
        val rewritten = lines.map { line =>
          val node = JsonLog.mapper.readTree(line)
          if (node.has("add")) {
            node.get("add").asInstanceOf[
              com.fasterxml.jackson.databind.node.ObjectNode]
              .remove("stats")
            JsonLog.mapper.writeValueAsString(node)
          } else line
        }
        val out = fs.create(st.getPath, true)
        try out.write((rewritten.mkString("\n") + "\n").getBytes("UTF-8"))
        finally out.close()
      }
    val t2 = DeltaTable.forPath(spark, dir)
    assert(files(t2, "v < 5").size == 1)   // kept despite no stats
    assert(files(t2, "v = 3").size == 1)
    assert(files(t2, "v IS NOT NULL").size == 1)
    assert(files(t2, "v IS DISTINCT FROM 3").size == 1)
    assert(t2.scan(Some("v < 5")).toDF.count() == 5)
  }

  test("checkpointed nested struct stats still skip after log vacuum") {
    val (t, dir) = mkTable()
    t.checkpoint()
    assert(files(t, "s.x < 25").size == 1)
    // fresh snapshot reading THROUGH the checkpoint
    val t2 = DeltaTable.forPath(spark, dir)
    assert(files(t2, "s.x >= 75").size == 1)
    assert(t2.toDF.count() == 100)
  }
}
