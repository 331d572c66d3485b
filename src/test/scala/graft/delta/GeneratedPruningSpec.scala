package graft.delta

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Partition pruning through GENERATED partition columns
  * (GeneratedPruning; delta-spark's OptimizeGeneratedColumn):
  * predicates on the BASE column must prune partitions derived from
  * it — and never prune a file holding a matching row.
  */
class GeneratedPruningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mkTable(genExpr: String, partType: DataType): DeltaTable = {
    val dir = TestSpark.tmpDir("genprune")
    val meta = new MetadataBuilder()
      .putString("delta.generationExpression", genExpr).build()
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("ts", TimestampType),
      StructField("day", partType, nullable = true, meta)))
    // stats only on id: ts predicates cannot stats-skip, so any
    // pruning observed below comes from the GENERATED derivation
    DeltaTable.create(spark, dir, schema, Seq("day"),
      Map("delta.dataSkippingStatsColumns" -> "id"))
    val t = DeltaTable.forPath(spark, dir)
    // 6 days x 4 rows, 6-hourly
    val src = (0 until 24).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(
        f"2024-03-${1 + i / 4}%02d ${(i % 4) * 6}%02d:30:00"))
    }.toDF("id", "ts")
    t.append(src)
    t
  }

  private def files(t: DeltaTable, pred: String): Seq[AddFile] =
    new DeltaScan(t.snapshot(), Some(pred)).collectAddFiles()

  test("CAST(ts AS DATE): ranges on ts prune day partitions exactly") {
    val t = mkTable("CAST(ts AS DATE)", DateType)
    val all = files(t, "id >= 0")
    assert(all.map(_.partitionValues("day")).distinct.size == 6)
    // half-open range covering days 2..3
    val pred = "ts >= TIMESTAMP '2024-03-02 00:00:00' AND " +
      "ts < TIMESTAMP '2024-03-04 00:00:00'"
    val pruned = files(t, pred)
    val days = pruned.map(_.partitionValues("day")).distinct.sorted
    // derived p <= 2024-03-04 keeps the boundary day; never more
    assert(days.head == "2024-03-02" && days.last <= "2024-03-04",
      s"days=$days")
    assert(days.size <= 3 && days.size < 6)
    // rows stay exact vs the unpruned answer
    val got = t.scan(Some(pred)).toDF.select("id").as[Long].collect().sorted
    assert(got.toSeq == (4L until 12L))
  }

  test("equality on ts prunes to a single day for any expression") {
    val t = mkTable("CAST(ts AS DATE)", DateType)
    val pruned = files(t, "ts = TIMESTAMP '2024-03-05 06:30:00'")
    assert(pruned.map(_.partitionValues("day")).distinct == Seq("2024-03-05"))
    val got = t.scan(Some("ts = TIMESTAMP '2024-03-05 06:30:00'"))
      .toDF.select("id").as[Long].collect()
    assert(got.toSeq == Seq(17L))
  }

  test("date_format yyyy-MM-dd string partitions prune on ts ranges") {
    val t = mkTable("date_format(ts, 'yyyy-MM-dd')", StringType)
    val pred = "ts > TIMESTAMP '2024-03-04 23:00:00'"
    val pruned = files(t, pred)
    val days = pruned.map(_.partitionValues("day")).distinct.sorted
    assert(days.forall(_ >= "2024-03-04"), s"days=$days")
    assert(days.size <= 3)
    val got = t.scan(Some(pred)).toDF.select("id").as[Long].collect().sorted
    assert(got.toSeq == (16L until 24L))
  }

  test("non-monotone month(): ranges derive nothing, equality still prunes") {
    val dir = TestSpark.tmpDir("genmonth")
    val meta = new MetadataBuilder()
      .putString("delta.generationExpression", "month(ts)").build()
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("ts", TimestampType),
      StructField("m", IntegerType, nullable = true, meta)))
    DeltaTable.create(spark, dir, schema, Seq("m"),
      Map("delta.dataSkippingStatsColumns" -> "id"))
    val t = DeltaTable.forPath(spark, dir)
    t.append(Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-10 00:00:00")),
      (2L, java.sql.Timestamp.valueOf("2024-02-10 00:00:00")),
      (3L, java.sql.Timestamp.valueOf("2024-03-10 00:00:00")))
      .toDF("id", "ts"))
    // month() is not monotone across years: a range must NOT prune
    val ranged = files(t, "ts >= TIMESTAMP '2024-02-01 00:00:00'")
    assert(ranged.map(_.partitionValues("m")).distinct.size == 3)
    // equality derivation holds for any deterministic expression
    val eq = files(t, "ts = TIMESTAMP '2024-02-10 00:00:00'")
    assert(eq.map(_.partitionValues("m")).distinct == Seq("2"))
  }

  test("conjuncts on other columns and non-literal comparands derive " +
      "nothing but stay correct") {
    val t = mkTable("CAST(ts AS DATE)", DateType)
    // id predicate: no partition derivation (stats on id may still
    // skip files); the answer stays exact
    val got1 = t.scan(Some("id < 5")).toDF.select("id")
      .as[Long].collect().sorted
    assert(got1.toSeq == (0L until 5L))
    // ts compared to a column: no derivation, no wrong pruning
    assert(files(t, "ts >= ts").map(_.partitionValues("day"))
      .distinct.size == 6)
    assert(t.scan(Some("ts >= ts")).toDF.count() == 24)
  }
}
