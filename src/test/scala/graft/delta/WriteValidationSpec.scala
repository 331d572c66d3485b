package graft.delta

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Write-time CHECK constraints, invariants, NOT NULL, generated and
  * default columns (reference expressions/sql.rs surface +
  * schema/mod.rs:253-313 metadata keys). These features were previously
  * writer-gated "supported-when-inactive"; now they are enforced, so
  * tables that define them stay writable.
  */
class WriteValidationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def violates[T](body: => T): String = {
    val e = intercept[Exception](body)
    // raise_error surfaces wrapped in Spark's job failure chain
    Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).find(m => m != null && m.contains("violates"))
      .getOrElse(fail(s"no violation message in: $e"))
  }

  test("CHECK constraint rejects violating appends, accepts valid ones") {
    val dir = TestSpark.tmpDir("wv-check")
    val src = Seq((1L, 5.0), (2L, 7.5)).toDF("k", "v")
    DeltaTable.create(spark, dir, src.schema,
      configuration = Map("delta.constraints.positive" -> "v > 0"))
    val t = DeltaTable.forPath(spark, dir)
    // the table is writable even though checkConstraints is ACTIVE
    t.append(src)
    assert(t.toDF.count() == 2)
    val msg = violates(t.append(Seq((3L, -1.0)).toDF("k", "v")))
    assert(msg.contains("CHECK constraint positive"))
    assert(t.toDF.count() == 2, "failed append must not commit")
  }

  test("adding a constraint via setProperties upgrades the protocol " +
      "and enforces immediately") {
    val dir = TestSpark.tmpDir("wv-addcheck")
    val src = Seq((1L, "ok")).toDF("k", "s")
    DeltaTable.create(spark, dir, src.schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(src)
    t.setProperties(Map("delta.constraints.nonempty" -> "length(s) > 0"))
    assert(TableFeatures.supportsWriterFeature(
      t.snapshot().protocol, "checkConstraints"))
    t.append(Seq((2L, "x")).toDF("k", "s"))
    val msg = violates(t.append(Seq((3L, "")).toDF("k", "s")))
    assert(msg.contains("nonempty"))
  }

  test("NOT NULL columns reject null rows") {
    val dir = TestSpark.tmpDir("wv-nn")
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("s", StringType, nullable = true)))
    DeltaTable.create(spark, dir, schema)
    val t = DeltaTable.forPath(spark, dir)
    val okRows = spark.createDataFrame(
      java.util.List.of[org.apache.spark.sql.Row](
        org.apache.spark.sql.Row(1L, "a")), schema)
    t.append(okRows)
    val nullable = StructType(schema.fields.map(_.copy(nullable = true)))
    val badRows = spark.createDataFrame(
      java.util.List.of[org.apache.spark.sql.Row](
        org.apache.spark.sql.Row(null, "b")), nullable)
    val msg = violates(t.append(badRows))
    assert(msg.contains("NOT NULL constraint on k"))
  }

  test("column invariant from field metadata is enforced") {
    val dir = TestSpark.tmpDir("wv-inv")
    val meta = new MetadataBuilder().putString("delta.invariants",
      """{"expression":{"expression":"qty <= 100"}}""").build()
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("qty", LongType, nullable = true, meta)))
    DeltaTable.create(spark, dir, schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(Seq((1L, 50L)).toDF("id", "qty"))
    val msg = violates(t.append(Seq((2L, 500L)).toDF("id", "qty")))
    assert(msg.contains("invariant on qty"))
  }

  test("generated column: computed when absent, validated when supplied") {
    val dir = TestSpark.tmpDir("wv-gen")
    val meta = new MetadataBuilder()
      .putString("delta.generationExpression", "k * 2").build()
    val schema = StructType(Seq(
      StructField("k", LongType),
      StructField("doubled", LongType, nullable = true, meta)))
    DeltaTable.create(spark, dir, schema)
    val t = DeltaTable.forPath(spark, dir)
    // absent -> computed
    t.append(Seq(1L, 2L, 3L).toDF("k"))
    assert(t.toDF.select("doubled").as[Long].collect().toSet ==
      Set(2L, 4L, 6L))
    // supplied and consistent -> accepted
    t.append(Seq((4L, 8L)).toDF("k", "doubled"))
    // supplied and WRONG -> rejected
    val msg = violates(t.append(Seq((5L, 11L)).toDF("k", "doubled")))
    assert(msg.contains("generated column doubled"))
    assert(t.toDF.count() == 4)
  }

  test("UPDATE recomputes generated columns from the new row") {
    val dir = TestSpark.tmpDir("wv-gen-upd")
    val meta = new MetadataBuilder()
      .putString("delta.generationExpression", "k * 2").build()
    val schema = StructType(Seq(
      StructField("k", LongType),
      StructField("doubled", LongType, nullable = true, meta)))
    DeltaTable.create(spark, dir, schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(Seq(1L, 2L, 3L).toDF("k"))
    // updating the base column must regenerate, not carry stale values
    t.updateWhere("k = 2", Map("k" -> "20"))
    assert(t.toDF.orderBy("k").select("k", "doubled").as[(Long, Long)]
      .collect().toSeq == Seq((1L, 2L), (3L, 6L), (20L, 40L)))
  }

  test("CURRENT_DEFAULT fills columns absent from the input") {
    val dir = TestSpark.tmpDir("wv-def")
    val meta = new MetadataBuilder()
      .putString("CURRENT_DEFAULT", "'unknown'").build()
    val schema = StructType(Seq(
      StructField("k", LongType),
      StructField("tag", StringType, nullable = true, meta)))
    DeltaTable.create(spark, dir, schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(Seq(1L, 2L).toDF("k"))
    t.append(Seq((3L, "explicit")).toDF("k", "tag"))
    assert(t.toDF.orderBy("k").select("tag").as[String].collect().toSeq ==
      Seq("unknown", "unknown", "explicit"))
  }

  test("no commit ever carries a zero-row add") {
    // Spark writers emit one file per task, including empty ones; a
    // zero-row add's empty stats are unprovable to every disjointness
    // check downstream (the q_delta_concurrent spurious-abort root
    // cause), so staging must drop them before commit
    val dir = TestSpark.tmpDir("wv-zerorow")
    val src = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s")
    DeltaTable.create(spark, dir, src.schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(src.repartition(8)) // ≥5 empty task files
    def adds0 = new DeltaScan(t.snapshot(), None).collectAddFiles()
    val adds = adds0
    assert(adds.nonEmpty && adds.size <= 3)
    adds.foreach { a =>
      val stats = a.stats.getOrElse(fail(s"add ${a.path} has no stats"))
      assert(!stats.matches(""".*"numRecords"\s*:\s*0[,}].*"""),
        s"zero-row add committed: ${a.path} stats=$stats")
    }
    // an all-empty append commits no adds and leaves the table readable
    t.append(src.filter($"k" > 100).repartition(4))
    assert(adds0.size == adds.size)
    assert(t.toDF.count() == 3)
  }

  test("a column named numRecords does not trip zero-row detection") {
    // the zero-row filter is anchored to the stats document prefix; an
    // unanchored match would also hit nullCount.numRecords = 0 for a
    // column physically NAMED numRecords and delete a live file
    val dir = TestSpark.tmpDir("wv-numrec-col")
    val src = Seq((1L, 0L), (2L, 0L), (3L, 5L)).toDF("k", "numRecords")
    DeltaTable.create(spark, dir, src.schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(src.repartition(1))
    val adds = new DeltaScan(t.snapshot(), None).collectAddFiles()
    assert(adds.size == 1, "live file was dropped as zero-row")
    val stats = adds.head.stats.get
    // the decoy really is present in the stats JSON
    assert(stats.contains(""""minValues":{"""))
    assert(stats.contains(""""numRecords":0"""),
      s"test decoy missing from stats: $stats")
    assert(t.toDF.count() == 3)
  }

  test("rows surviving a DELETE rewrite re-validate cleanly") {
    val dir = TestSpark.tmpDir("wv-del")
    val src = Seq((1L, 5.0), (2L, 7.5), (3L, 9.0)).toDF("k", "v")
    DeltaTable.create(spark, dir, src.schema,
      configuration = Map("delta.constraints.positive" -> "v > 0"))
    val t = DeltaTable.forPath(spark, dir)
    t.append(src.repartition(1))
    t.deleteWhere("k = 2") // survivor rewrite runs through staging
    assert(t.toDF.select("k").as[Long].collect().toSet == Set(1L, 3L))
  }
}
