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
}
