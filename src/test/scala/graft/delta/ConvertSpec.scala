package graft.delta

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** CONVERT TO DELTA: in-place adoption of plain parquet directories —
  * atomic v0 (protocol + metadata + adds in one commit), hive
  * partition-value parsing incl. the null sentinel, footer stats
  * feeding skipping, and full table behavior (append/time travel)
  * AFTER adoption.
  */
class ConvertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("convert").toString + "/t"

  test("unpartitioned directory: adopted table reads identically") {
    val dir = tmp()
    val src = spark.range(100)
      .select(col("id"), (col("id") % 5).cast("string").as("s"))
    src.write.parquet(dir)
    val t = DeltaTable.convert(spark, dir)
    assert(t.snapshot().version == 0L)
    assert(t.toDF.orderBy("id").collect().toSeq ==
      src.orderBy("id").collect().toSeq)
    // one atomic commit: v0 carries everything
    val lines = java.nio.file.Files.list(
      java.nio.file.Paths.get(dir, "_delta_log")).count()
    assert(lines >= 1)
  }

  test("partitioned directory: values typed from the declared schema") {
    val dir = tmp()
    val src = spark.range(60).select(col("id"),
      (col("id") % 3).cast("int").as("p"),
      when(col("id") % 10 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("v"), col("id") % 4)).as("q"))
    src.write.partitionBy("p", "q").parquet(dir)
    val t = DeltaTable.convert(spark, dir, StructType(Seq(
      StructField("p", IntegerType), StructField("q", StringType))))
    val got = t.toDF.select("id", "p", "q").orderBy("id").collect()
    val want = src.orderBy("id").collect()
    assert(got.toSeq == want.toSeq)
    // typed partition pruning works on the adopted layout
    assert(t.toDF.filter(col("p") === 1).count() ==
      src.filter(col("p") === 1).count())
    // null partition (__HIVE_DEFAULT_PARTITION__) round-trips as NULL
    assert(t.toDF.filter(col("q").isNull).count() ==
      src.filter(col("q").isNull).count())
  }

  test("converted table is fully transactional afterwards") {
    val dir = tmp()
    spark.range(10).select(col("id"), lit("a").as("s"))
      .write.parquet(dir)
    val t = DeltaTable.convert(spark, dir)
    t.append(spark.range(10, 20).select(col("id"), lit("b").as("s")))
    assert(t.toDF.count() == 20)
    assert(t.snapshot(Some(0L)).toDF.count() == 10)
    t.deleteWhere("s = 'a'")
    assert(t.toDF.count() == 10)
  }

  test("stats from footers: skipping prunes converted files") {
    val dir = tmp()
    // two files with disjoint id ranges
    spark.range(0, 100, 1, 1).toDF("id").write.parquet(dir)
    spark.range(1000, 1100, 1, 1).toDF("id").write.mode("append")
      .parquet(dir)
    val t = DeltaTable.convert(spark, dir)
    val snap = Snapshot.forTable(spark, dir)
    val scan = new DeltaScan(snap, Some("id >= 1000"))
    assert(scan.collectAddFiles().size == 1, "stats skip did not prune")
    assert(t.toDF.filter(col("id") >= 1000).count() == 100)
  }

  test("refuses an existing delta table and empty directories") {
    val dir = tmp()
    spark.range(5).toDF("id").write.parquet(dir)
    DeltaTable.convert(spark, dir)
    intercept[IllegalArgumentException] {
      DeltaTable.convert(spark, dir)
    }
    val empty = tmp()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(empty))
    intercept[IllegalArgumentException] {
      DeltaTable.convert(spark, empty)
    }
  }

  test("declared partition column absent from the layout fails loudly") {
    val dir = tmp()
    spark.range(5).toDF("id").write.parquet(dir)
    intercept[IllegalArgumentException] {
      DeltaTable.convert(spark, dir, StructType(Seq(
        StructField("nope", StringType))))
    }
  }
}
