package graft.streaming

import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.graft.StreamingShim
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.{DataFrame, SQLContext}

import graft.delta.{DeltaTable, SetTransaction, Snapshot}

/** Structured Streaming sink writing microbatches into a Delta table
  * with EXACTLY-ONCE semantics: every committed batch carries a
  * SetTransaction marker (appId = the streaming query id, version =
  * batchId), and a replayed batch whose id is at or below the recorded
  * marker is skipped — the idempotent-writer contract the reference
  * implements via `txn` actions (actions/set_transaction.rs) put to
  * its intended use.
  *
  * The table is created from the first batch's schema when absent.
  * Append mode appends each microbatch; Complete mode (streaming
  * aggregations) atomically REPLACES the table with each batch's full
  * result, same idempotency marker. Update mode belongs to
  * CDF-producing upserts and is rejected.
  */
class DeltaSink(
    sqlContext: SQLContext,
    tablePath: String,
    outputMode: OutputMode,
    mergeSchema: Boolean = false) extends Sink {

  require(outputMode == OutputMode.Append() ||
      outputMode == OutputMode.Complete(),
    s"graft-delta sink supports Append and Complete output modes, " +
      s"got $outputMode")

  private val spark = sqlContext.sparkSession

  private def queryId: String =
    Option(spark.sparkContext.getLocalProperty("sql.streaming.queryId"))
      .getOrElse(throw new IllegalStateException(
        "no streaming query id in task context"))

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the incoming frame is streaming-planned; rewrap its rows as a
    // batch DataFrame before handing it to the transactional writer
    val batchDF = StreamingShim.internalCreateBatchDF(
      sqlContext, data.queryExecution.toRdd, data.schema)
    if (!DeltaTable.isDeltaTable(spark, tablePath))
      DeltaTable.create(spark, tablePath, data.schema)
    val t = DeltaTable.forPath(spark, tablePath)
    val snap = Snapshot.forTable(spark, tablePath)
    val app = queryId
    val already = snap.setTransactions
      .find(_.appId == app).map(_.version)
    if (already.exists(_ >= batchId)) return // replay after restart
    val txn = SetTransaction(app, batchId, Some(System.currentTimeMillis()))
    // sink-side schema evolution (`.option("mergeSchema", "true")`):
    // an upstream that grew a column evolves the table instead of
    // failing the query (a stream is the writer that can least afford
    // a schema mismatch abort mid-run)
    if (outputMode == OutputMode.Complete())
      // mergeSchema in Complete mode = the batch's schema IS the
      // table's next schema (the table is the aggregation result);
      // without it an evolved aggregation fails loudly as in Append
      t.overwrite(batchDF, overwriteSchema = mergeSchema,
        txn = Some(txn))
    else if (mergeSchema)
      t.append(batchDF, txn = Some(txn), mergeSchema = true)
    else t.appendFrom(snap, batchDF, txn = Some(txn))
    ()
  }
}
