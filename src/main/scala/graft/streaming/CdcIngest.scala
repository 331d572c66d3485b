package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.delta.{AdaptiveMetadata, ContentTree, DeltaTable,
  EqualityDeletes, SetTransaction}

/** CDC ingest with merge-on-read deletes: each micro-batch of
  * `(_op, <row columns>)` events lands as at most one APPEND commit
  * (the upserts) plus one O(root) equality-delete tree commit (the
  * delete keys) — no data file is ever rewritten on the ingest path;
  * [[EqualityDeletes.convertToPositionDeletes]] folds the accumulated
  * deletes into DVs out-of-band.
  *
  * Ordering contract (the Iceberg sequence rule does the work): the
  * batch's upserts append FIRST at version V, the batch's deletes
  * write at sequence V and so reach only data with sequence < V —
  * within one batch an upsert of a deleted key WINS, across batches a
  * later upsert resurrects the key and a later delete kills it. No
  * per-row timestamps, no window functions, no state store: the tree
  * root + the table version ARE the state.
  *
  * Exactly-once: the append rides a SetTransaction marker
  * (appId/batchId), so a foreachBatch replay after a sink failure
  * no-ops the data commit; the tree advance re-derives from the
  * committed table version (updateRoot at an unchanged version is a
  * no-op) and re-appending the same delete batch is idempotent at
  * READ time (duplicate keys collapse to max sequence before the
  * anti-join).
  */
object CdcIngest {

  val OP_COL = "_op"
  val UPSERT = "upsert"
  val DELETE = "delete"

  /** Process one micro-batch against `t` + the tree at `root`;
    * returns the advanced root. `keyIds` are data-schema positions of
    * the CDC key columns (the equality ids).
    */
  def processBatch(t: DeltaTable, root: AdaptiveMetadata.ContentRoot,
      batch: DataFrame, keyIds: Seq[Int], appId: String,
      batchId: Long): AdaptiveMetadata.ContentRoot = {
    val snap0 = t.snapshot()
    val dataCols = snap0.schema.fieldNames.toSeq
    val ins = batch.filter(col(OP_COL) === UPSERT)
      .select(dataCols.map(col): _*)
    val keyNames = EqualityDeletes.idsToNames(snap0.dataSchema, keyIds)
    // upsert = replace: EVERY batch key writes an equality delete
    // (the Iceberg upsert-mode convention) — the sequence rule spares
    // this batch's own appended rows, so the new version wins and any
    // older version of the key dies without a lookup or a rewrite
    val dels = batch.filter(col(OP_COL).isin(DELETE, UPSERT))
      .select(keyNames.map(col): _*)

    if (!ins.isEmpty)
      t.append(ins, txn = Some(SetTransaction(appId, batchId,
        Some(System.currentTimeMillis()))))
    val snap = t.snapshot()
    // carries prior delete entries through; same-version => no-op
    val advanced = ContentTree.updateRoot(snap, root)
    val files = EqualityDeletes.writeDeleteFiles(snap, dels, keyIds,
      sequenceNumber = snap.version)
    if (files.isEmpty) advanced
    else EqualityDeletes.appendDeleteEntries(snap, advanced, files)
  }

  /** Current table state under the CDC contract: the tree-planned
    * read with position AND equality deletes applied.
    */
  def currentState(t: DeltaTable,
      root: AdaptiveMetadata.ContentRoot): DataFrame = {
    val snap = t.snapshot()
    EqualityDeletes.readApplying(snap,
      root.resolve(snap.tableRoot.toString))
  }
}
