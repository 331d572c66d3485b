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

  test("interop: shredded files with a typed_value shape WE did not " +
      "choose still reassemble exactly (external-writer simulation)") {
    // An external engine is free to pick any per-file shredding schema
    // (reference table_features variantShredding: readers must handle
    // arbitrary typed_value shapes + residual values). Force a foreign
    // shape for one file — only field `a`, typed STRING where our
    // inferrer picks BIGINT, `s` left in the residual — and mix it
    // with a file shredded our way plus an unshredded one.
    val dir = TestSpark.tmpDir("variant-interop")
    def batch(lo: Int, hi: Int) = spark.sql(
      s"select id, parse_json(concat('{\"a\":', id, ',\"s\":\"x', id, " +
        s"'\"}')) as v from range($lo, $hi)")
    val t = DeltaTable.create(spark, dir, batch(0, 1).schema,
      configuration = Map(DeltaTable.VARIANT_SHREDDING_KEY -> "true"))
    t.append(batch(0, 20)) // our inferred shredding (a: BIGINT, s: STRING)
    val force = "spark.sql.variant.forceShreddingSchemaForTest"
    val infer = "spark.sql.variant.inferShreddingSchema"
    val prev = spark.conf.getOption(force)
    try {
      spark.conf.set(force, "a string")
      spark.conf.set(infer, "false")
      t.append(batch(20, 40)) // foreign shape: a as STRING, s residual
    } finally {
      prev match {
        case Some(v) => spark.conf.set(force, v)
        case None => spark.conf.unset(force)
      }
      spark.conf.unset(infer)
    }
    // a third, UNSHREDDED file (writer feature off for this append)
    val t2 = DeltaTable.forPath(spark, dir)
    DeltaTable.ScopedSessionConf.withConfs(spark,
      Seq("spark.sql.variant.writeShredding.enabled" -> "false")) {
      t2.append(batch(40, 50))
    }
    // every row reassembles exactly regardless of its file's shape
    val got = DeltaTable.forPath(spark, dir).toDF
      .selectExpr("id", "to_json(v) as j")
      .orderBy(col("id")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == (0L until 50L).map(i =>
      (i, s"""{"a":$i,"s":"x$i"}""")))
    // typed access crosses shapes: a arrives as long even from the
    // string-shredded file; s even when residual-only
    assert(DeltaTable.forPath(spark, dir).toDF
      .selectExpr("cast(variant_get(v, '$.a', 'long') as long) as a")
      .agg(sum(col("a"))).head.getLong(0) == (0L until 50L).sum)
    assert(DeltaTable.forPath(spark, dir).toDF
      .selectExpr("variant_get(v, '$.s', 'string') as s")
      .where("s = 'x25'").count() == 1)
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
