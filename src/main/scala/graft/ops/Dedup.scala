package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate detection building blocks that scale: banded MinHash
  * LSH candidate generation (consumes the signature table — every join
  * is an equi-join on a band key) and a 64-bit SimHash.
  *
  * Scale notes: the band self-join shuffles on (band, key); bucket sizes
  * are bounded by signature collisions, not by document count, and the
  * pair space never materializes outside matching buckets. Callers
  * should follow candidates with an exact verification (e.g. true
  * Jaccard over shingles, or `Similarity.cosinePairs` on embeddings).
  */
object Dedup {

  /** Incremental exact dedup against a persisted Delta state table of
    * content hashes — the production shape for a pipeline that ingests
    * in batches: each batch drops documents whose content was EVER seen
    * (this run or any prior run), then registers its own survivors'
    * hashes transactionally. State lives in a Delta table, so a crashed
    * batch retries cleanly and concurrent writers go through the commit
    * protocol.
    *
    * Scale: the state table holds one 32-char hash per unique document
    * — at 10B docs that's a few hundred GB, and the anti-join
    * hash-partitions both sides on `h` (one shuffle each side, no
    * broadcast of the big state). Within-batch dupes keep the minimum
    * id (deterministic representative).
    *
    * Returns the unseen rows of `batch` (all original columns).
    */
  def incrementalNew(spark: org.apache.spark.sql.SparkSession,
      statePath: String, batch: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    import graft.delta.DeltaTable
    val withH = batch.withColumn("__h", md5(col(textCol)))
    // within-batch representative: minimum id per hash
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__h"))
      .orderBy(col(idCol))
    val batchUnique = withH
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val fresh =
      if (!DeltaTable.isDeltaTable(spark, statePath)) batchUnique
      else {
        val seen = DeltaTable.forPath(spark, statePath).toDF
          .select(col("h").as("__h"))
        batchUnique.join(seen, Seq("__h"), "left_anti")
      }
    // register survivors BEFORE returning (restart-safe: re-running the
    // batch re-derives the same survivors and the append is idempotent
    // in content)
    val newHashes = fresh.select(col("__h").as("h")).distinct()
    if (!DeltaTable.isDeltaTable(spark, statePath))
      DeltaTable.create(spark, statePath, newHashes.schema)
    DeltaTable.forPath(spark, statePath).append(newHashes)
    fresh.drop("__h")
  }

  /** Exactly-once variant of [[incrementalNew]] for streaming ingestion
    * (`foreachBatch`): the state append carries a `txn` idempotency
    * marker (appId, batchVersion) and each hash row records which batch
    * first registered it. A replayed batch — same (appId, version) at or
    * below the recorded marker — does NOT re-filter against state that
    * now contains its own hashes (which would silently drop every
    * survivor); it re-derives the identical survivor set from the
    * provenance column. This is the reference's `txn` action applied to
    * pipeline state (actions/set_transaction.rs).
    */
  def incrementalNewIdempotent(spark: org.apache.spark.sql.SparkSession,
      statePath: String, batch: DataFrame, idCol: String,
      textCol: String, appId: String, batchVersion: Long): DataFrame = {
    import graft.delta.{DeltaTable, SetTransaction, Snapshot}
    // null-safe hash: md5(NULL) is NULL and NULL never equi-joins, so a
    // NULL-text row would survive the original run but vanish from the
    // replay's provenance semi-join — breaking the exactly-once
    // contract. NULL maps to a 4-char sentinel no
    // 32-hex-char md5 can collide with.
    val withH = batch.withColumn("__h",
      when(col(textCol).isNull, lit("NULL"))
        .otherwise(md5(col(textCol))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__h"))
      .orderBy(col(idCol))
    val batchUnique = withH
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val exists = DeltaTable.isDeltaTable(spark, statePath)
    val marker: Option[Long] =
      if (exists)
        Snapshot.forTable(spark, statePath).setTransactions
          .find(_.appId == appId).map(_.version)
      else None
    if (marker.exists(_ >= batchVersion)) {
      // replay: survivors = exactly the hashes this batch registered
      val mine = DeltaTable.forPath(spark, statePath).toDF
        .filter(col("app_id") === appId &&
          col("batch_v") === batchVersion)
        .select(col("h").as("__h"))
      batchUnique.join(mine, Seq("__h"), "left_semi").drop("__h")
    } else {
      val fresh =
        if (!exists) batchUnique
        else {
          // snapshot-pinned read: the anti-join keeps answering from the
          // pre-append state even when consumed after the commit below
          val seen = DeltaTable.forPath(spark, statePath).toDF
            .select(col("h").as("__h"))
          batchUnique.join(seen, Seq("__h"), "left_anti")
        }
      val newHashes = fresh.select(col("__h").as("h")).distinct()
        .withColumn("app_id", lit(appId))
        .withColumn("batch_v", lit(batchVersion))
      if (!exists)
        DeltaTable.create(spark, statePath, newHashes.schema)
      DeltaTable.forPath(spark, statePath).append(newHashes,
        Some(SetTransaction(appId, batchVersion,
          Some(System.currentTimeMillis()))))
      fresh.drop("__h")
    }
  }

  /** Batch-incremental NEAR-duplicate admission against a persisted
    * Delta state of banded MinHash signatures — the fuzzy sibling of
    * [[incrementalNew]] and the production shape for continuous-ingest
    * dedup: each batch (1) rejects docs whose signatures collide on any
    * LSH band with an already-admitted doc AND agree on >= `threshold`
    * of all signatures, (2) resolves within-batch near-dup groups to
    * their minimum-id representative (banded pairs → connected
    * components), and (3) registers the admitted docs' banded rows in
    * the state table transactionally.
    *
    * Scale: the state holds `bands` rows per admitted doc, partitioned
    * by band — the reject join is an equi-join on (band, bkey), so both
    * sides hash-partition on the bucket key and the pair space never
    * exceeds bucket collisions. No broadcast of state, no all-pairs.
    *
    * Restart safety: a batch that crashed BEFORE its state append
    * re-derives the identical admitted set on retry (the state is
    * unchanged). For at-least-once drivers that may re-run a batch
    * AFTER its append committed (where the reject join would now see
    * the batch's own rows and drop everything), pass `txn` — the
    * append then carries a (appId, batchVersion) idempotency marker and
    * per-row provenance, and a replayed batch returns exactly the rows
    * it admitted the first time (the reference's `txn` action applied
    * to pipeline state, actions/set_transaction.rs).
    *
    * `batchSigs`: one row per doc with `idCol` + `sigCols` (e.g. the
    * mh0..mh7 MinHash columns). Returns the admitted rows.
    */
  def incrementalFuzzyNew(spark: org.apache.spark.sql.SparkSession,
      statePath: String, batchSigs: DataFrame, idCol: String,
      sigCols: Seq[String], rowsPerBand: Int = 2,
      threshold: Double = 0.5,
      txn: Option[(String, Long)] = None): DataFrame = {
    import graft.delta.{DeltaTable, SetTransaction, Snapshot}
    val exists = DeltaTable.isDeltaTable(spark, statePath)
    val marker: Option[Long] = txn.flatMap { case (appId, _) =>
      if (!exists) None
      else Snapshot.forTable(spark, statePath).setTransactions
        .find(_.appId == appId).map(_.version)
    }
    txn.foreach { case (appId, batchV) =>
      if (marker.exists(_ >= batchV)) {
        // replay: admitted = exactly the ids this batch registered
        val mine = DeltaTable.forPath(spark, statePath).toDF
          .filter(col("app_id") === appId && col("batch_v") === batchV)
          .select(col("doc_id").as(idCol)).distinct()
        return batchSigs.join(mine, Seq(idCol), "left_semi")
      }
    }
    val survivors =
      if (!exists) batchSigs
      else {
        val state = DeltaTable.forPath(spark, statePath).toDF
        val bandsB = bandExplode(batchSigs, idCol, sigCols, rowsPerBand,
          carry = sigCols)
        val agree = sigCols.map(c =>
          when(col(s"b.$c") === col(s"s.$c"), 1).otherwise(0))
          .reduce(_ + _) / lit(sigCols.size.toDouble)
        val rejected = bandsB.as("b")
          .join(state.as("s"),
            col("b.band") === col("s.band") &&
              col("b.bkey") === col("s.bkey"))
          .filter(agree >= threshold)
          .select(col("b.doc_id").as(idCol)).distinct()
        batchSigs.join(rejected, Seq(idCol), "left_anti")
      }
    // within-batch near-dup groups: keep each component's minimum id
    val edges = minhashBandPairs(survivors, idCol, sigCols, rowsPerBand)
      .filter(col("sig_sim") >= threshold)
    val comp = connectedComponents(edges, "doc_a", "doc_b")
    val admitted = survivors.join(broadcast(comp),
        col(idCol) === col("id"), "left")
      .filter(col("rep").isNull || col("rep") === col(idCol))
      .drop("id", "rep")
    val stateRows = bandExplode(admitted, idCol, sigCols, rowsPerBand,
        carry = sigCols)
      .select(col("band") +: col("bkey") +: col("doc_id") +:
        sigCols.map(col) :+
        lit(txn.map(_._1).orNull).cast("string").as("app_id") :+
        lit(txn.map(t => Long.box(t._2)).orNull).cast("long")
          .as("batch_v"): _*)
    if (!exists)
      DeltaTable.create(spark, statePath, stateRows.schema, Seq("band"))
    DeltaTable.forPath(spark, statePath).append(stateRows,
      txn.map { case (appId, batchV) =>
        SetTransaction(appId, batchV, Some(System.currentTimeMillis())) })
    admitted
  }

  /** Banded LSH over MinHash signature columns: `sigCols` are split into
    * bands of `rowsPerBand`; two docs are candidates iff some band
    * agrees on every signature in it. Output: (doc_a < doc_b, sig_sim)
    * where sig_sim = fraction of ALL signatures that agree (the standard
    * Jaccard estimator).
    */
  /** One row per (doc, band): the band key is the `_`-joined signature
    * values of that band — two docs share a band key iff the band's
    * signatures all agree (the LSH bucketing contract). Extra columns
    * in `carry` ride along (e.g. the full signature vector, so bucket
    * joins can verify similarity without a second join).
    */
  private def bandExplode(sigs: DataFrame, idCol: String,
      sigCols: Seq[String], rowsPerBand: Int,
      carry: Seq[String] = Nil): DataFrame = {
    require(sigCols.size % rowsPerBand == 0, "bands must divide signatures")
    val bands = sigCols.grouped(rowsPerBand).toSeq
    val bandArray = array(bands.zipWithIndex.map { case (cs, i) =>
      struct(lit(i).as("band"),
        concat_ws("_", cs.map(c => col(c).cast("string")): _*).as("bkey"))
    }: _*)
    sigs.select(col(idCol).as("doc_id") +: explode(bandArray).as("bd") +:
        carry.map(col): _*)
      .select(col("doc_id") +: col("bd.band").as("band") +:
        col("bd.bkey").as("bkey") +: carry.map(col): _*)
  }

  def minhashBandPairs(sigs: DataFrame, idCol: String,
      sigCols: Seq[String], rowsPerBand: Int = 2): DataFrame = {
    val exploded = bandExplode(sigs, idCol, sigCols, rowsPerBand)
    val cand = exploded.as("a").join(exploded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val sa = sigs.select(col(idCol).as("doc_a") +:
      sigCols.map(c => col(c).as(s"__a_$c")): _*)
    val sb = sigs.select(col(idCol).as("doc_b") +:
      sigCols.map(c => col(c).as(s"__b_$c")): _*)
    cand.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("sig_sim",
        sigCols.map(c => when(col(s"__a_$c") === col(s"__b_$c"), 1)
          .otherwise(0)).reduce(_ + _) / lit(sigCols.size.toDouble))
      .select(col("doc_a"), col("doc_b"), col("sig_sim"))
  }

  /** Edge-count threshold below which components are solved with a
    * driver union-find — verified near-dup pair sets are metadata-sized
    * relative to the corpus, and O(E α(E)) on the driver beats several
    * Spark rounds of shuffle overhead. Above it, the distributed
    * min-label loop takes over.
    */
  val DRIVER_CC_MAX_EDGES: Long = 2000000L

  /** Connected components over a near-duplicate pair set: every id is
    * labeled with the MINIMUM id reachable in its component — the
    * canonical "cluster representative" step after candidate
    * generation + verification. Small pair sets use a driver
    * union-find; larger ones a deterministic min-label propagation
    * loop (one equi-join + one aggregate shuffle per round, lineage
    * truncated per iteration, converging in O(component diameter)
    * rounds).
    *
    * Input: (idA, idB) pair rows (either orientation). Output:
    * (id, rep) for every id appearing in a pair.
    */
  def connectedComponents(pairs: DataFrame, idACol: String,
      idBCol: String, maxIterations: Int = 50,
      driverMaxEdges: Long = DRIVER_CC_MAX_EDGES): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val rawEdges = pairs.select(col(idACol).cast("long").as("a"),
      col(idBCol).cast("long").as("b")).cache()
    val edgeCount = rawEdges.count()
    if (edgeCount <= driverMaxEdges) {
      val es = rawEdges.as[(Long, Long)].collect()
      rawEdges.unpersist()
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) {
          val n = parent(c); parent(c) = r; c = n
        }
        r
      }
      def union(x: Long, y: Long): Unit = {
        val (rx, ry) = (find(x), find(y))
        if (rx != ry) { // min id becomes the root
          if (rx < ry) parent(ry) = rx else parent(rx) = ry
        }
      }
      es.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a)
        parent.getOrElseUpdate(b, b)
        union(a, b)
      }
      return parent.keys.toSeq.sorted
        .map(id => (id, find(id))).toDF("id", "rep")
    }

    val edges = rawEdges
      .unionByName(pairs.select(col(idBCol).cast("long").as("a"),
        col(idACol).cast("long").as("b")))
      .distinct()
      .cache()
    rawEdges.unpersist()
    // localCheckpoint truncates the lineage each round — the iterative
    // plan would otherwise nest one full copy per iteration
    var labels = edges.select(col("a").as("id"))
      .distinct()
      .withColumn("rep", col("id"))
      .localCheckpoint(true)
    var changed = 1L
    var iters = 0
    while (changed > 0 && iters < maxIterations) {
      // candidate label for each id: the min of its own and its
      // neighbors' current labels
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "b")
          .withColumnRenamed("rep", "nrep"), "b")
        .select(col("a").as("id"), col("nrep"))
      val next = labels.select(col("id"), col("rep").as("nrep"))
        .unionByName(viaNeighbors)
        .groupBy("id").agg(min(col("nrep")).as("rep"))
        .localCheckpoint(true)
      changed = next.join(labels.withColumnRenamed("rep", "old"), "id")
        .filter(col("rep") < col("old")).count()
      labels = next
      iters += 1
    }
    edges.unpersist()
    labels
  }

  /** 64-bit SimHash over whitespace tokens using the portable 60-bit
    * md5-prefix hash re-hashed per bit position. One shuffle on the doc
    * id (map-side combine on the 64 bit-sum aggregates).
    */
  def simHash64(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = docs.select(col(idCol).as("doc_id"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("word"))
      .withColumn("h",
        expr("cast(conv(substring(md5(word), 1, 15), 16, 10) as bigint)"))
      .withColumn("h2",
        expr("cast(conv(substring(md5(concat(word, '#')), 1, 15), 16, 10) as bigint)"))
    // 60 bits from h, the top 4 from h2 — portable and branch-free
    val bitAggs = (0 until 64).map { i =>
      val src = if (i < 60) col("h") else col("h2")
      val sh = if (i < 60) i else i - 60
      sum(when(src.bitwiseAND(lit(1L << sh)) =!= 0L, 1).otherwise(-1))
        .as(s"b$i")
    }
    val fp = (0 until 64).map { i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    words.groupBy(col("doc_id")).agg(bitAggs.head, bitAggs.tail: _*)
      .select(col("doc_id"), fp.as("simhash64"))
  }
}
