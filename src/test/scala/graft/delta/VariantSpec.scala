package graft.delta

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Variant columns (reference schema/mod.rs:2298-2301: physical
  * {metadata: BINARY, value: BINARY}, Spark 4 VariantType natively).
  */
class VariantSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("variant column roundtrips through the delta table") {
    val dir = TestSpark.tmpDir("variant")
    val src = spark.sql(
      "select id, parse_json(concat('{\"a\":', id, ',\"s\":\"x\"}')) as v " +
        "from range(5)")
    val t = DeltaTable.create(spark, dir, src.schema)
    assert(t.snapshot().protocol.readerFeatures.get.contains("variantType"))
    t.append(src)
    val got = DeltaTable.forPath(spark, dir).toDF
      .selectExpr("id", "to_json(v) as j")
      .orderBy(col("id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == (0L until 5L).map(i =>
      (i, s"""{"a":$i,"s":"x"}""")))
    // variant is not skipping-eligible; predicates on other cols fine
    assert(DeltaTable.forPath(spark, dir)
      .scan(Some("id >= 3")).toDF.count() == 2)
  }

  test("shredded variant: feature declared, files shredded, reads " +
    "reassemble (reference table_features/mod.rs:630-645 " +
    "variantShredding; schema/mod.rs:2298-2301 flexible physical " +
    "representation)") {
    val dir = TestSpark.tmpDir("variant-shred")
    val src = spark.sql(
      "select id, parse_json(concat('{\"a\":', id, ',\"s\":\"x', id, " +
        "'\"}')) as v from range(50)")
    val t = DeltaTable.create(spark, dir, src.schema,
      configuration =
        Map(DeltaTable.VARIANT_SHREDDING_KEY -> "true"))
    val p = t.snapshot().protocol
    assert(p.readerFeatures.get.contains("variantShredding"))
    assert(p.writerFeatures.get.contains("variantShredding"))
    val confBefore = Seq("spark.sql.variant.writeShredding.enabled",
      "spark.sql.variant.inferShreddingSchema")
      .map(k => k -> spark.conf.getOption(k))
    t.append(src)

    // prove the staged parquet is PHYSICALLY shredded: the footer must
    // carry a typed_value subcolumn next to metadata/value
    val files = Storage.listFilesRecursive(
        Storage.fs(new org.apache.hadoop.fs.Path(dir),
          spark.sessionState.newHadoopConf()),
        new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet") &&
        !p.toString.contains("_delta_log"))
    assert(files.nonEmpty)
    val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
      spark.sessionState.newHadoopConf(), files.head)
    val vType = footer.getFileMetaData.getSchema.getType(Seq("v"): _*)
    val sub = vType.asGroupType().getFields.toString
    assert(sub.contains("typed_value"), s"expected shredded layout: $sub")

    // scan reassembles shredded rows into logical variant values
    val got = DeltaTable.forPath(spark, dir).toDF
      .selectExpr("id", "to_json(v) as j")
      .orderBy(col("id")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == (0L until 50L).map(i =>
      (i, s"""{"a":$i,"s":"x$i"}""")))
    // typed field access works through the shredded layout
    assert(DeltaTable.forPath(spark, dir).toDF
      .selectExpr("cast(variant_get(v, '$.a', 'long') as long) as a")
      .agg(sum(col("a"))).head.getLong(0) == (0L until 50L).sum)
    // writer confs were restored after the staging job
    assert(confBefore.forall { case (k, v) =>
      spark.conf.getOption(k) == v })
  }

  test("shredding property without a variant column is rejected") {
    val dir = TestSpark.tmpDir("variant-shred-bad")
    val schema = spark.range(1).toDF("id").schema
    intercept[IllegalArgumentException] {
      DeltaTable.create(spark, dir, schema,
        configuration = Map(DeltaTable.VARIANT_SHREDDING_KEY -> "true"))
    }
  }
}
