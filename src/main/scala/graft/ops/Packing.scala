package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining pipelines: documents concatenate
  * in a deterministic order and chunk into fixed token-budget
  * sequences (GPT-style concat-then-chunk). Each document is assigned
  * the sequence its FIRST token lands in.
  *
  * Scale shape: packing is per-BUCKET (hash of the order key), so the
  * window runs partition-local — no global sort, no single-task
  * window. Buckets are independent shards a downstream loader can
  * consume in parallel; determinism comes from (bucket, orderKey)
  * being a total order.
  */
object Packing {

  /** Assign each row a (bucket, seq) pair: `seq` = index of the
    * budget-sized chunk the row's first token falls in, within its
    * bucket's doc_id-ordered concat stream.
    */
  def assignSequences(df: DataFrame, orderKey: Column, tokens: Column,
      budget: Int, numBuckets: Int): DataFrame = {
    require(budget > 0 && numBuckets > 0)
    val bucket = pmod(orderKey, lit(numBuckets)).cast("int")
    val w = Window.partitionBy(col("__bucket")).orderBy(orderKey)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__bucket", bucket)
      .withColumn("__cum", sum(tokens).over(w))
      .withColumn("__seq",
        floor((col("__cum") - tokens) / lit(budget.toDouble)).cast("long"))
      .withColumnRenamed("__bucket", "bucket")
      .withColumnRenamed("__seq", "seq")
      .drop("__cum")
  }
}
