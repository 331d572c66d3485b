package graft.delta

import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** User-facing Delta table handle: ACID writes (CREATE/append/DELETE),
  * snapshot reads with time travel, checkpointing.
  * (reference: kernel/src/transaction/mod.rs — append txn :199-322,
  * commit :327-590; create_table.rs; history_manager/mod.rs)
  */
class DeltaTable(val spark: SparkSession, val pathStr: String,
    val catalog: Option[CatalogClient] = None,
    committerOverride: Option[Committer] = None,
    val correlationId: Option[String] = None) {
  val root = new Path(pathStr)

  /** Handle whose commits carry an opaque caller-supplied correlation
    * id in their commitInfo (reference transaction/mod.rs
    * `with_correlation_id`, #2834) — joins the table's commits to the
    * caller's own request/operation id in the log and in
    * [[historyDetail]]. An empty id is treated as unset.
    */
  def withCorrelationId(id: String): DeltaTable =
    new DeltaTable(spark, pathStr, catalog, committerOverride,
      Option(id).filter(_.nonEmpty))
  private def hconf = spark.sessionState.newHadoopConf()
  private def fs = Storage.fs(root, hconf)
  private val logDir = FileNames.logDir(root)

  /** Classic checkpoints auto-split into V1 multipart files above
    * 2× this many actions, and every checkpoint parquet is written
    * with small row groups — the read side's split granularity (and
    * so the checkpoint-arm replay parallelism of every future
    * snapshot) is bounded by writer-side row-group layout.
    */
  private val CHECKPOINT_ACTIONS_PER_PART = 100000
  private val CHECKPOINT_ROW_GROUP_BYTES = 16 * 1024 * 1024

  /** The commit authority for this handle (reference committer/mod.rs):
    * stage-and-ratify when a catalog manages the table, put-if-absent
    * otherwise.
    */
  private def committer: Committer =
    committerOverride.getOrElse(
      catalog.map(c => new CatalogCommitter(c, pathStr))
        .getOrElse(FileSystemCommitter))

  def snapshot(version: Option[Long] = None): Snapshot = catalog match {
    case Some(c) => Snapshot.forTable(spark, pathStr, version,
      c.logTail(pathStr), c.maxRatifiedVersion(pathStr))
    case None => Snapshot.forTable(spark, pathStr, version)
  }

  def toDF: DataFrame = snapshot().toDF

  def scan(predicateSql: Option[String] = None,
      version: Option[Long] = None): DeltaScan = {
    val b = snapshot(version).scanBuilder()
    predicateSql.foreach(b.withPredicate)
    b.build()
  }

  // ---------------- commit machinery ----------------

  /** Atomic put-if-absent commit with conflict resolution (reference
    * committer/filesystem.rs + transaction/mod.rs:327-590). On losing
    * the race at version v the WINNING commit is read and examined:
    * protocol/metadata changes and same-appId transactions surface as
    * typed conflicts regardless of retryability (a blind append must
    * never skip over them — the staged data was validated against the
    * old table definition); reads-based commits surface
    * [[ConcurrentWriteException]]; blind appends rebase to the next
    * version, REGENERATING the commit lines via `mkLines(v)` so the
    * in-commit timestamp derives from the actual predecessor (the
    * winning commit), keeping ICT strictly monotonic across retries.
    */
  private[delta] def commitActions(startVersion: Long,
      mkLines: Long => Seq[String], retryable: Boolean,
      txnAppIds: Seq[String],
      readCheck: Option[DeltaTable.ReadSet] = None,
      serializable: Boolean = false): Long = {
    val opId = Metrics.newId()
    val t0 = Metrics.now()
    var v = startVersion
    var attempts = 0
    def fail(e: Exception): Nothing = {
      Metrics.report(MetricEvent.TransactionCommitFailure(opId,
        Metrics.now() - t0, v, attempts, e.getClass.getSimpleName))
      throw e
    }
    while (true) {
      val content = mkLines(v).mkString("", "\n", "\n")
      committer.commit(fs, logDir, v, content) match {
        case CommitResponse.Committed(cv, _) =>
          // commit JSON bytes: the log-growth half of write-side I/O
          // accounting (data_write covers the parquet half)
          if (Metrics.reporter ne NoOpReporter)
            Metrics.report(MetricEvent.IoBytes(opId, "commit_write",
              1L, content.getBytes("UTF-8").length.toLong))
          Metrics.report(MetricEvent.TransactionCommitSuccess(opId,
            Metrics.now() - t0, cv, attempts))
          return cv
        case CommitResponse.Conflict(_) => ()
      }
      attempts += 1
      val winner = Storage.readLines(fs, resolveCommitPath(v))
        .filter(_.nonEmpty)
      def winnerField(field: String) = winner.iterator
        .filter(_.contains("\"" + field + "\""))
        .map(JsonLog.parseLine)
        .flatMap(n => Option(n.get(field)).filterNot(_.isNull))
      if (winnerField("protocol").nonEmpty)
        fail(new ProtocolChangedException(
          s"concurrent protocol change at version $v for $pathStr"))
      if (winnerField("metaData").nonEmpty)
        fail(new MetadataChangedException(
          s"concurrent metadata change at version $v for $pathStr"))
      if (txnAppIds.nonEmpty) {
        winnerField("txn").map(_.get("appId").asText)
          .find(txnAppIds.contains)
          .foreach(app => fail(new ConcurrentTransactionException(
            s"concurrent transaction for appId '$app' at version $v " +
              s"for $pathStr")))
      }
      if (attempts > 1000)
        fail(new ConcurrentWriteException(
          s"commit conflict at version $v for $pathStr (gave up)"))
      readCheck match {
        case Some(rs) =>
          // delete/delete: the winner removed a file we also remove —
          // both transactions acted on the same rows
          winnerField("remove").map(RowCodec.jsonToRemove)
            .map(r => Storage.canonicalPathKey(r.path))
            .find(rs.removedKeys.contains)
            .foreach(p => fail(new ConcurrentDeleteDeleteException(
              s"concurrent removal of '$p' at version $v for $pathStr")))
          // append check: winner adds are safe only when partition
          // pruning + stats skipping PROVE no added file can hold a row
          // matching our predicate (delta's Serializable check; the
          // reference surfaces the same cases via CommitResult)
          // dataChange=false adds (a concurrent OPTIMIZE/compaction)
          // rewrite existing rows without changing table contents — the
          // remove/remove check above already catches compactions that
          // touched OUR files, so they never conflict with a predicate
          // (delta-spark excludes them under WriteSerializable too)
          val winAdds = winnerField("add").map(RowCodec.jsonToAdd)
            .filter(_.dataChange).toSeq
          if (winAdds.nonEmpty && !rs.maintenance) {
            val disjoint = rs.predicateSql.isDefined && {
              val rows: Seq[org.apache.spark.sql.Row] = winAdds.map(a =>
                new org.apache.spark.sql.catalyst.expressions
                  .GenericRowWithSchema(
                    Array[Any](RowCodec.addToRow(a), v),
                    rs.snap.addsSchema))
              val df = spark.createDataFrame(
                rows.asJava, rs.snap.addsSchema)
              new DeltaScan(rs.snap, rs.predicateSql)
                .pruneAdds(df).limit(1).count() == 0
            }
            if (!disjoint) fail(new ConcurrentAppendException(
              s"concurrent append at version $v for $pathStr may match " +
                s"the predicate ${rs.predicateSql.getOrElse("<none>")}"))
          }
          // provably disjoint winner → rebase past it
        case None =>
          if (!retryable) fail(new ConcurrentWriteException(
            s"commit conflict at version $v for $pathStr"))
          // Serializable isolation: a blind append may not slide past a
          // commit that REMOVED data — serializing the append first
          // would change which rows that delete saw
          // (delta.isolationLevel; WriteSerializable keeps the default
          // append-commutes-with-anything behavior)
          if (serializable &&
              winnerField("remove").exists(r =>
                Option(r.get("dataChange")).forall(_.asBoolean)))
            fail(new ConcurrentWriteException(
              s"serializable isolation: concurrent data removal at " +
                s"version $v for $pathStr"))
      }
      v += 1
    }
    v // unreachable
  }

  private[delta] def commitActions(startVersion: Long, actions: Seq[String],
      retryable: Boolean): Long =
    commitActions(startVersion, (_: Long) => actions, retryable, Nil)

  private def now(): Long = System.currentTimeMillis()

  /** Writer gate (reference table_features write gates): refuse to
    * commit when the protocol declares writer features this engine does
    * not implement, and enforce delta.appendOnly for mutating ops.
    */
  private def writerGate(snap: Snapshot, mutating: Boolean): Unit = {
    require(snap.protocol.minWriterVersion <= 7,
      s"unsupported minWriterVersion ${snap.protocol.minWriterVersion}")
    // reference committer/filesystem.rs test contract: a filesystem
    // committer must never write to a catalog-managed table — its
    // put-if-absent "win" would bypass the catalog's arbitration
    if (CatalogManaged.isCatalogManaged(snap.protocol) &&
        !committer.isCatalogCommitter)
      throw new IllegalStateException(
        "This table is catalog-managed and requires a catalog " +
          "committer: open it with DeltaTable.forPath(spark, path, catalog)")
    val bad = TableFeatures.unsupportedWriterFeatures(
      snap.protocol, snap.metadata)
    require(bad.isEmpty,
      s"cannot write: unsupported writer features ${bad.mkString(", ")}")
    if (mutating)
      require(!snap.metadata.configuration.get("delta.appendOnly")
          .exists(_.equalsIgnoreCase("true")),
        s"table at $pathStr is append-only (delta.appendOnly=true)")
  }

  /** Best-effort incremental `.crc` update after a commit (reference
    * kernel/src/crc/): previous version's checksum + this commit's
    * added/removed file sizes — totals AND the per-bin file-size
    * histogram advance without listing anything. Skipped when the
    * chain is broken (no prior crc) — never load-bearing.
    */
  private def maybeWriteChecksum(v: Long, addedSizes: Seq[Long],
      removedSizes: Seq[Long],
      newMeta: Option[graft.delta.Metadata] = None,
      newProto: Option[Protocol] = None): Unit =
    try {
      Checksum.read(fs, logDir, v - 1).foreach { prev =>
        val hist = prev.fileSizeHistogram.map { h0 =>
          val h1 = addedSizes.foldLeft(h0)(_.insert(_))
          removedSizes.foldLeft(h1)(_.remove(_))
        }
        Checksum.write(fs, logDir, v, Checksum.VersionChecksum(
          prev.tableSizeBytes + addedSizes.sum - removedSizes.sum,
          prev.numFiles + addedSizes.size - removedSizes.size,
          newProto.getOrElse(prev.protocol),
          newMeta.getOrElse(prev.metadata),
          hist))
      }
    } catch { case _: Exception => () }

  private def commitInfoLine(op: String, params: Map[String, String],
      ict: Option[Long] = None): String =
    JsonLog.writeAction(SingleAction(commitInfo = Some(CommitInfo(
      timestamp = now(), operation = op, operationParameters = params,
      engineInfo = Some("graft-spark/0.1.0"),
      inCommitTimestamp = ict,
      correlationId = correlationId))))

  /** Where the commit for `version` lives: the catalog's ratified
    * staged file when one exists (it is the authority — the published
    * copy may not exist yet), the published path otherwise.
    */
  private def resolveCommitPath(version: Long): Path =
    catalog.flatMap(_.logTail(pathStr)
        .find(_.version == version).map(_.location))
      .getOrElse(FileNames.commitFile(logDir, version))

  /** In-commit timestamp of the commit file at `version`, if any. */
  private def commitIct(version: Long): Option[Long] = {
    val p = resolveCommitPath(version)
    if (version < 0 || !fs.exists(p)) None
    else Storage.readLines(fs, p).iterator
      .filter(_.contains("\"commitInfo\""))
      .map(JsonLog.parseLine)
      .flatMap(n => Option(n.get("commitInfo")).filterNot(_.isNull))
      .flatMap(ci => Option(ci.get("inCommitTimestamp"))
        .filterNot(_.isNull).map(_.asLong))
      .nextOption()
  }

  /** Monotonic in-commit timestamp for a commit whose PREDECESSOR is
    * `predVersion` (reference transaction/commit_info.rs:484; protocol:
    * strictly greater than the predecessor's, regardless of clock
    * skew). Commit retries must recompute this against the commit that
    * actually won the race, not the stale snapshot — a concurrent
    * writer may have committed a larger ICT.
    */
  private def ictAt(snap: Snapshot, predVersion: Long): Option[Long] = {
    if (!snap.metadata.configuration.get(DeltaTable.ICT_ENABLED_KEY)
        .exists(_.equalsIgnoreCase("true"))) return None
    Some(math.max(now(), commitIct(predVersion).getOrElse(0L) + 1))
  }

  private def ictFor(snap: Snapshot): Option[Long] =
    ictAt(snap, snap.version)

  /** Publish ratified catalog commits `<= upToVersion` (default: all)
    * to their `_delta_log/{version}.json` locations (reference
    * Committer::publish + publish_types.rs PublishMetadata). Publishing
    * is an optimization — reads through the catalog are correct before
    * and after — so it is idempotent and safe to race.
    */
  def publish(upToVersion: Option[Long] = None): Long = {
    val cat = catalog.getOrElse(throw new IllegalStateException(
      s"table at $pathStr has no catalog: nothing to publish"))
    val tail = cat.logTail(pathStr)
    require(tail.nonEmpty, s"no unpublished catalog commits for $pathStr")
    val upTo = upToVersion.getOrElse(tail.last.version)
    val toPublish = tail.filter(_.version <= upTo)
    require(toPublish.nonEmpty && toPublish.last.version == upTo,
      s"version $upTo is not an unpublished ratified version of $pathStr")
    committer.publish(fs, logDir, toPublish)
    upTo
  }

  // ---------------- write path ----------------

  /** Stage `df` as parquet files under a unique subdir and derive the
    * per-file stats from the staged files' parquet FOOTERS — the writer
    * already aggregated min/max/null counts per chunk, so the "stats
    * pass" is a metadata-sized read instead of a second full scan of
    * just-written data (reference transaction/mod.rs:199-322 +
    * default-engine/src/stats.rs, which accumulates stats while
    * writing).
    */
  private def stageFiles(df: DataFrame, snap: Snapshot,
      passthrough: Seq[String] = Nil,
      nullGeneratedAsOmitted: Boolean = false): Seq[AddFile] = {
    val partCols = snap.partitionColumns
    val stage = "part-" + UUID.randomUUID().toString.substring(0, 8)
    val stagePath = new Path(root, stage)

    // Write with PHYSICAL column names + parquet field ids (column
    // mapping); identity when mode=none.
    val physDataSchema = ColumnMapping.physicalSchema(snap.dataSchema)
    val physPartCols = partCols.map(c =>
      ColumnMapping.physicalName(snap.schema.fields.find(_.name == c).get))
    // fill generated/default columns and embed constraint checks into
    // the projection — they ride the staging job, zero extra passes;
    // clustered tables additionally range-partition + sort on the
    // clustering key so each staged file covers a disjoint range
    val clusterCols = Clustering.columns(snap)
    // 0 = let AQE size the range partitions (files track the advisory
    // partition size — the right default at scale); a fixed count pins
    // the file count explicitly
    val clusterFiles = snap.metadata.configuration
      .get(DeltaTable.CLUSTERING_NUM_FILES_KEY).map(_.toInt).getOrElse(0)
    val renamed = physicalProjection(
      Clustering.layout(
        WriteValidation.prepare(df, snap, passthrough,
          nullGeneratedAsOmitted),
        clusterCols, clusterFiles),
      snap, passthrough)

    // materializePartitionColumns / icebergCompatV3: partition values
    // must ALSO live in the data files (reference
    // table_configuration.rs:510-523). Spark's partitionBy strips the
    // partitioning column from file content, so partition on a
    // duplicate alias and keep the physical column in the data; the
    // alias prefix is stripped back off when dir names are parsed into
    // partitionValues below. Readers are unaffected either way: the
    // requested data schema never includes partition columns.
    val materialize = IcebergCompat.materializePartitionColumns(
      snap.protocol, snap.metadata) && physPartCols.nonEmpty
    val (toWrite, partByCols) =
      if (!materialize) (renamed, physPartCols)
      else (physPartCols.foldLeft(renamed)((d, c) =>
              d.withColumn(DeltaTable.MAT_PART_PREFIX + c, col(s"`$c`"))),
            physPartCols.map(DeltaTable.MAT_PART_PREFIX + _))

    // INT96 (Spark's legacy default) carries no usable footer stats and
    // is non-standard; micros is lossless for Spark timestamps. Scoped
    // set/restore around this one write job. Tables that opted into
    // variantShredding additionally write variant columns shredded
    // ({metadata, value, typed_value}) with an inferred typed_value
    // schema, so downstream scans prune into the typed subcolumns.
    // table property turns shredding on; an EXPLICIT session-level
    // writeShredding.enabled=false still wins (Spark's session conf is
    // the user's per-write escape hatch — e.g. staging one unshredded
    // file into an otherwise-shredded table)
    val shred = snap.metadata.configuration
      .get(DeltaTable.VARIANT_SHREDDING_KEY)
      .exists(_.equalsIgnoreCase("true")) &&
      !spark.conf.getOption("spark.sql.variant.writeShredding.enabled")
        .exists(_.equalsIgnoreCase("false"))
    val scopedConfs: Seq[(String, String)] =
      Seq("spark.sql.parquet.outputTimestampType" -> "TIMESTAMP_MICROS") ++
      (if (shred)
        Seq("spark.sql.variant.writeShredding.enabled" -> "true",
          "spark.sql.variant.inferShreddingSchema" -> "true")
       else Nil)
    // Optimized write (delta.autoOptimize.optimizeWrite): shuffle on
    // the partition columns before a partitioned write, so every
    // partition VALUE lands in one task and writes ONE file instead of
    // inputPartitions × values small files — the small-file defense at
    // streaming-ingest scale. AQE coalesces tiny shuffle partitions
    // into shared tasks without changing the one-file-per-value shape.
    // Clustered tables already range-partition (their own layout);
    // unpartitioned tables bin-pack via OPTIMIZE instead — a blind
    // repartition there would just serialize the write.
    val optimizeWrite = snap.metadata.configuration
      .get(DeltaTable.OPTIMIZE_WRITE_KEY).exists(_.equalsIgnoreCase("true"))
    val laidOut =
      if (optimizeWrite && clusterCols.isEmpty && partByCols.nonEmpty)
        toWrite.repartition(partByCols.map(c => col(s"`$c`")): _*)
      else toWrite
    DeltaTable.ScopedSessionConf.withConfs(spark, scopedConfs) {
      val writer = laidOut.write.mode("overwrite")
      // delta.parquet.compression.codec: table-pinned codec beats the
      // session default (a 100 TB table's scan cost is set at write
      // time; the property makes it an explicit table contract)
      TableProperties.parquetCompression(snap.metadata)
        .foreach(c => writer.option("compression", c))
      (if (partByCols.nonEmpty) writer.partitionBy(partByCols: _*)
       else writer).parquet(stagePath.toString)
    }

    // remove committer markers, list the staged data files
    val success = new Path(stagePath, "_SUCCESS")
    if (fs.exists(success)) fs.delete(success, false)
    val listed = Storage.listFilesRecursive(fs, stagePath)
      .filter(_.getPath.getName.endsWith(".parquet"))
    val rootRaw = fs.makeQualified(root).toUri.getRawPath
    def relOf(p: Path): String =
      p.toUri.getRawPath.stripPrefix(rootRaw).stripPrefix("/")
    // delta.randomizeFilePrefixes: move each staged file under its own
    // short random prefix so object-store request load spreads across
    // the key space instead of hammering one shared prefix (the S3
    // throughput ceiling at ingest scale). Partition values still come
    // from the ORIGINAL hive-style staging layout — after the move,
    // only add.path records where the file lives; readers never list
    // directories. Renames are O(files) metadata ops on the driver,
    // bounded by the append's own file count.
    val randomize = TableProperties.randomizeFilePrefixes(snap.metadata)
    val prefixLen = TableProperties.randomPrefixLength(snap.metadata)
    // (finalStatus, hive-layout rel path the partition values parse from)
    val files: Seq[(org.apache.hadoop.fs.FileStatus, String)] =
      if (!randomize) listed.map(st => (st, relOf(st.getPath))).toSeq
      else listed.map { st =>
        val origRel = relOf(st.getPath)
        val prefix = UUID.randomUUID().toString.replace("-", "")
          .take(prefixLen)
        val dest = new Path(root, s"$prefix/${st.getPath.getName}")
        fs.mkdirs(dest.getParent)
        require(fs.rename(st.getPath, dest),
          s"failed to move staged file into randomized prefix: $dest")
        (fs.getFileStatus(dest), origRel)
      }.toSeq
    // the emptied staging tree is noise once its files moved out
    if (randomize) fs.delete(stagePath, true)

    // footer stats (stats JSON keys are PHYSICAL names on column-mapped
    // tables); fans out to executors when the append staged many files
    val statsSel = ParquetFooterStats.selection(snap,
      clusterCols.map(c => ColumnMapping.physicalName(
        snap.schema.fields.find(_.name == c).get)).toSet)
    val statsByPath = ParquetFooterStats.collect(spark,
      files.map(_._1.getPath.toString), physDataSchema, hconf, statsSel)

    // Spark writers emit one (possibly empty) file per task; a zero-row
    // file carries empty min/max stats, which downstream conflict checks
    // and data skipping can never prove disjoint (NULL min ⇒ coalesce
    // keeps the file ⇒ a provably-disjoint concurrent DML aborts).
    // Drop them before they ever become adds — reference never commits
    // zero-record files either (transaction stats contract).
    // Anchored to the document prefix (StatsJson.render always emits
    // numRecords first): an unanchored match would also hit a
    // nullCount/minValues entry of 0 for a column physically NAMED
    // "numRecords" and delete a live file before commit.
    val zeroRowRe = """^\{"numRecords"\s*:\s*0[,}]""".r
    val (empties, liveFiles) = files.partition { case (st, _) =>
      zeroRowRe.findFirstIn(statsByPath(st.getPath.toString)).isDefined
    }
    empties.foreach { case (st, _) => fs.delete(st.getPath, false) }

    val staged = liveFiles.map { case (st, hiveRel) =>
      val abs = st.getPath
      // add.path is a URI-ENCODED relative path (protocol contract) —
      // getRawPath keeps %-escapes so a literal '%' or space in a
      // partition dir name round-trips exactly
      val rel = relOf(abs)
      val pv: Map[String, String] = hiveRel.split('/').dropRight(1)
        .map(uriDecodeSegment)
        .filter(_.contains('='))
        .map { seg =>
          val Array(k0, v) = seg.split("=", 2)
          // materialized-partition writes partition on an alias of the
          // physical column (see above) — strip it back off
          val k = if (k0.startsWith(DeltaTable.MAT_PART_PREFIX))
            k0.stripPrefix(DeltaTable.MAT_PART_PREFIX) else k0
          k -> (if (v == "__HIVE_DEFAULT_PARTITION__") null
                else unescapePathName(v))
        }.toMap
      AddFile(
        path = rel,
        partitionValues =
          physPartCols.map(c => c -> pv.getOrElse(c, null)).toMap,
        size = st.getLen,
        modificationTime = st.getModificationTime,
        dataChange = true,
        stats = Some(statsByPath(abs.toString)),
        clusteringProvider =
          if (clusterCols.nonEmpty) Some(Clustering.PROVIDER) else None)
    }
    // protocol-contract validation BEFORE anything commits (reference
    // transaction/stats_verifier.rs): a malformed stat would make
    // readers silently skip live files
    StatsVerifier.verifyAll(staged, physDataSchema)
    // V3 requires every add to carry numRecords (reference
    // table_configuration.rs:900-907)
    if (IcebergCompat.requiresStatsNumRecords(snap.protocol, snap.metadata))
      staged.foreach { a =>
        require(a.stats.exists(_.contains("\"numRecords\"")),
          s"icebergCompatV3 requires stats.numRecords on every add " +
            s"(missing for ${a.path})")
      }
    // sizes are already in hand — byte accounting costs nothing here
    Metrics.report(MetricEvent.IoBytes(Metrics.newId(), "data_write",
      staged.size.toLong, staged.map(_.size).sum))
    staged
  }

  /** Rewrite the whole table range-sorted on its clustering columns
    * (reference transaction/data_layout.rs; the OPTIMIZE analog).
    * Adds/removes carry dataChange=false — readers of the change feed
    * and streaming sources see no row-level change, because there is
    * none.
    */
  def optimizeClustered(): Long = {
    val snap = snapshot()
    val clusterCols = Clustering.columns(snap)
    require(clusterCols.nonEmpty,
      s"table at $pathStr has no clustering columns")
    optimizeRewrite(snap, df => df,
      Map("clusterBy" -> clusterCols.mkString(",")))
  }

  /** Ad-hoc `OPTIMIZE ... ZORDER BY (cols)` (delta-spark's one-off
    * z-ordering): lays the rewrite out on the NAMED columns without
    * touching the table's clustering metadata — for tables whose read
    * pattern differs from their physical layout. Tables with DECLARED
    * clustering refuse (the staging path would re-sort on the declared
    * keys and silently undo the requested order — use
    * [[optimizeClustered]] there).
    */
  def optimizeZorderBy(cols: Seq[String], numFiles: Int = 0): Long = {
    val snap = snapshot()
    require(cols.nonEmpty, "ZORDER BY requires at least one column")
    require(Clustering.columns(snap).isEmpty,
      s"table at $pathStr declares clustering columns — " +
        "use optimizeClustered()")
    cols.foreach { c =>
      val f = snap.schema.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(s"no such column '$c'"))
      require(DataSkipping.isEligible(f.dataType),
        s"ZORDER BY column '$c' has no min/max stats " +
          s"(${f.dataType.simpleString})")
    }
    optimizeRewrite(snap,
      df => Clustering.zorderLayout(df, cols, numFiles),
      Map("zorderBy" -> cols.mkString(",")))
  }

  /** `ALTER TABLE ... CLUSTER BY (cols)` / `CLUSTER BY NONE` (empty
    * seq): replace the table's clustering columns in a metadata-only
    * commit — the delta liquid-clustering re-key. Existing data keeps
    * its layout; subsequent appends and the next [[optimizeClustered]]
    * use the NEW columns. First-time clustering upgrades the protocol
    * with the clustering + domainMetadata features (reference
    * clustering.rs domain; requirement table_features/mod.rs:487).
    */
  def alterClusterBy(cols: Seq[String]): Long = {
    val snap = snapshot()
    writerGate(snap, mutating = false)
    require(cols.intersect(snap.partitionColumns).isEmpty,
      "a column cannot be both a partition and a clustering column")
    cols.foreach { c =>
      val f = snap.schema.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(s"no such column '$c'"))
      require(DataSkipping.isEligible(f.dataType),
        s"clustering column '$c' has no min/max stats " +
          s"(${f.dataType.simpleString}) — clustering would never " +
          "help skipping")
    }
    val hadClustering = Clustering.columns(snap).nonEmpty
    if (cols.isEmpty && !hadClustering) return snap.version // no-op
    val needsFeature = cols.nonEmpty &&
      !TableFeatures.supportsWriterFeature(snap.protocol,
        Clustering.FEATURE)
    val proto =
      if (needsFeature)
        Some(TableFeatures.upgraded(snap.protocol, Nil,
          Seq(Clustering.FEATURE, "domainMetadata")))
      else None
    val domain =
      if (cols.isEmpty)
        Clustering.domainFor(Nil).copy(removed = true)
      else Clustering.domainFor(cols.map(c => Seq(
        ColumnMapping.physicalName(snap.schema.fields.find(_.name == c).get))))
    val lines = Seq(
      commitInfoLine("ALTER TABLE",
        Map("operation" -> "CLUSTER BY",
          "clusterBy" -> cols.mkString(",")), ictFor(snap))) ++
      proto.map(p =>
        JsonLog.writeAction(SingleAction(protocol = Some(p)))).toSeq ++
      Seq(JsonLog.writeAction(SingleAction(domainMetadata = Some(domain))))
    val committed = commitActions(snap.version + 1, lines,
      retryable = false)
    maybeWriteChecksum(committed, Nil, Nil, newProto = proto)
    maybeAutoCheckpoint(committed, snap.metadata)
    committed
  }

  /** Bin-packing OPTIMIZE for any table: rewrite the live file set
    * into ~`targetFileBytes`-sized files (small-file compaction — the
    * cure for streaming-ingest file explosions). dataChange=false.
    */
  def optimizeCompact(targetFileBytes: Long = 0L,
      where: Option[String] = None): Long = {
    val snap = snapshot()
    // 0 = resolve from delta.targetFileSize, else the 128 MB default
    val targetBytes =
      if (targetFileBytes > 0) targetFileBytes
      else TableProperties.targetFileSize(snap.metadata)
        .getOrElse(128L << 20)
    require(targetBytes > 0, "targetFileBytes must be positive")
    // a clustered table's staging already range-partitions on the
    // cluster key — adding a hash repartition first would just be a
    // wasted extra shuffle
    if (Clustering.columns(snap).nonEmpty) {
      require(where.isEmpty,
        "OPTIMIZE WHERE on a clustered table is not supported — " +
          "clustering rewrites the whole layout")
      return optimizeClustered()
    }
    // OPTIMIZE WHERE: a partition predicate scopes the rewrite to
    // matching partitions (delta-spark's contract — a non-partition
    // predicate would force row-level reasoning OPTIMIZE cannot do)
    where.foreach { w =>
      val refs = spark.sessionState.sqlParser.parseExpression(w)
        .references.map(_.name).toSet
      val partCols = snap.partitionColumns.toSet
      require(refs.nonEmpty && refs.subsetOf(partCols),
        s"OPTIMIZE WHERE predicate may reference only partition " +
          s"columns ${partCols.mkString("(", ",", ")")}, got '$w'")
    }
    // slim: the rewrite restages (fresh stats) and tombstones carry
    // none — at 5M files full stats JSON is gigabytes of driver heap
    // for nothing
    val candidates = new DeltaScan(snap, where)
      .collectAddFiles(slim = true)
    val totalBytes = candidates.map(_.size).sum
    val numFiles = math.max(1L,
      (totalBytes + targetBytes - 1) / targetBytes).toInt
    val partCols = snap.partitionColumns
    val layout: DataFrame => DataFrame =
      if (partCols.nonEmpty)
        df => df.repartition(numFiles, partCols.map(c => col(s"`$c`")): _*)
      else df => df.repartition(numFiles)
    optimizeRewrite(snap, layout,
      Map("targetFileBytes" -> targetBytes.toString) ++
        where.map("where" -> _),
      subset = where.map(_ => candidates))
  }

  /** REORG TABLE ... APPLY (PURGE) (delta-spark surface; the kernel
    * leaves maintenance to engines — reference
    * kernel/src/transaction/mod.rs keeps remove+add commits generic):
    * rewrite ONLY the files carrying deletion vectors, physically
    * dropping the soft-deleted rows — the staged replacements carry no
    * DV descriptor. Files without DVs are untouched (contrast
    * [[optimizeCompact]], which rewrites the whole live set).
    * dataChange=false: readers and CDF see identical rows; vacuum can
    * then reclaim the old files AND their DV files past retention.
    */
  def reorgPurge(where: Option[String] = None): Long = {
    val snap = snapshot()
    where.foreach { w =>
      val refs = spark.sessionState.sqlParser.parseExpression(w)
        .references.map(_.name).toSet
      val partCols = snap.partitionColumns.toSet
      require(refs.nonEmpty && refs.subsetOf(partCols),
        s"REORG WHERE predicate may reference only partition columns " +
          s"${partCols.mkString("(", ",", ")")} — got '$w'")
    }
    val dvFiles = new DeltaScan(snap, where)
      .collectAddFiles(slim = true) // rewrite restages; see OPTIMIZE
      .filter(_.deletionVector.isDefined)
    if (dvFiles.isEmpty) return snap.version
    optimizeRewrite(snap, df => df,
      Map("applyPurge" -> "true") ++ where.map("predicate" -> _),
      subset = Some(dvFiles))
  }

  /** Auto-compaction (delta.autoOptimize.autoCompact): after a
    * data-adding commit, bin-pack any partition that has accumulated
    * `minNumFiles`+ files below half the target size. dataChange=false,
    * so CDF readers and streams see no row change. Optimized write
    * fixes ONE commit's layout; this fixes the accumulation ACROSS
    * commits — the other half of the streaming-ingest small-file
    * defense. Rewrites only the small files (a partition's full-sized
    * files are never touched), so the write amplification is bounded
    * by the small-file volume, not table size.
    */
  def autoCompact(minNumFiles: Int = 50,
      targetFileBytes: Long = 0L,
      touchedPartitions: Option[Set[Map[String, String]]] = None)
      : Option[Long] = {
    val snap = snapshot()
    // 0 = resolve from delta.targetFileSize, else the 128 MB default
    val targetBytes =
      if (targetFileBytes > 0) targetFileBytes
      else TableProperties.targetFileSize(snap.metadata)
        .getOrElse(128L << 20)
    require(minNumFiles > 0 && targetBytes > 0,
      "minNumFiles and targetFileBytes must be positive")
    if (RowTracking.enabled(snap.metadata)) return None
    // Post-commit probes only need file counts for partitions whose
    // count CHANGED — the ones the triggering commit touched. Scoping
    // the candidate scan to them turns the per-commit probe from
    // O(live files) into O(commit) at ingest scale (a 5M-file table
    // would otherwise replay + collect its whole file list after
    // every append). The predicate is partition-value exact-match,
    // built only for string/integral partition types (timestamp/
    // decimal literal round-trips are format-sensitive and a wrongly
    // PRUNED partition would silently skip its compaction); capped at
    // 64 touched partitions so the predicate never explodes — wider
    // commits fall back to the full scan.
    val partCols0 = snap.partitionColumns
    val safePartTypes = partCols0.forall { c =>
      snap.schema.fields.find(_.name == c).map(_.dataType).exists {
        case StringType | IntegerType | LongType | ShortType |
             ByteType | BooleanType => true
        case _ => false
      }
    }
    val predicate: Option[String] = touchedPartitions
      .filter(p => partCols0.nonEmpty && safePartTypes &&
        p.nonEmpty && p.size <= 64)
      .map(_.toSeq.map { pv =>
        partCols0.map { c =>
          pv.getOrElse(c, null) match {
            case null => s"`$c` IS NULL"
            case v => s"`$c` = '${v.replace("'", "''")}'"
          }
        }.mkString("(", " AND ", ")")
      }.mkString(" OR "))
    val small = new DeltaScan(snap, predicate).collectAddFiles(slim = true)
      .filter(_.size < targetBytes / 2)
    val toCompact = small.groupBy(_.partitionValues).values
      .filter(_.size >= minNumFiles).toSeq.flatten
    if (toCompact.isEmpty) return None
    val numFiles = math.max(1L,
      (toCompact.map(_.size).sum + targetBytes - 1) / targetBytes)
      .toInt
    // repartition(n, partCols) still lands each partition VALUE in one
    // task → one compacted file per value; plain repartition(n) would
    // re-fragment every value across n tasks
    val partCols = snap.partitionColumns
    val layout: DataFrame => DataFrame =
      if (partCols.nonEmpty)
        df => df.repartition(numFiles, partCols.map(c => col(s"`$c`")): _*)
      else df => df.repartition(numFiles)
    Some(optimizeRewrite(snap, layout,
      Map("auto" -> "true", "minNumFiles" -> minNumFiles.toString,
        "targetFileBytes" -> targetBytes.toString),
      subset = Some(toCompact)))
  }

  /** Post-commit hook: run [[autoCompact]] when the table property asks
    * for it. Thresholds come from session confs so tests and operators
    * can tune without a metadata commit.
    */
  private def maybeAutoCompact(metadata: graft.delta.Metadata,
      touchedPartitions: Option[Set[Map[String, String]]] = None): Unit = {
    val on = metadata.configuration
      .get(DeltaTable.AUTO_COMPACT_KEY).exists(_.equalsIgnoreCase("true"))
    if (!on || RowTracking.enabled(metadata)) return
    // best-effort (delta-spark semantics): the triggering write already
    // committed, so losing the OPTIMIZE version race to a concurrent
    // writer — or any IO error here — must not surface as a failed
    // append (a caller retrying the "failed" append would duplicate data)
    try {
      val minN = spark.conf.getOption("spark.graft.autoCompact.minNumFiles")
        .map(_.toInt).getOrElse(50)
      val target = spark.conf
        .getOption("spark.graft.autoCompact.targetFileBytes")
        .map(_.toLong).getOrElse(0L)
      autoCompact(minN, target, touchedPartitions)
    } catch { case e: Exception =>
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn(s"auto-compact after commit failed (best-effort): $e")
    }
  }

  private def optimizeRewrite(snap: Snapshot,
      layout: DataFrame => DataFrame,
      params: Map[String, String],
      subset: Option[Seq[AddFile]] = None): Long = {
    writerGate(snap, mutating = false)
    val rtEnabled = RowTracking.enabled(snap.metadata)
    val matCols = RowTracking.materializedCols(snap.metadata)
    require(!rtEnabled || matCols.isDefined,
      "OPTIMIZE on a row-tracking table requires the materialized " +
        s"row-id column names (${RowTracking.MAT_ROW_ID_KEY}) in the " +
        "table configuration")
    val existing =
      subset.getOrElse(
        new DeltaScan(snap, None).collectAddFiles(slim = true))
    if (existing.isEmpty) return snap.version
    // row tracking: read the ORIGINAL row ids alongside the data and
    // write them into the staged files under the materialized column
    // names — readers prefer the materialized value over
    // baseRowId + row_index, so ids survive the rewrite (the protocol's
    // stability contract for dataChange=false rewrites)
    val input =
      if (!rtEnabled) readFiles(snap, existing)
      else {
        val (idCol, vCol) = matCols.get
        new DeltaScan(snap, None).toDFWithRowIds(existing)
          .withColumnRenamed("_row_id", idCol)
          .withColumnRenamed("_row_commit_version", vCol)
      }
    val passthrough =
      if (rtEnabled) matCols.toSeq.flatMap(c => Seq(c._1, c._2)) else Nil
    // Clustered/z-ordered staging passes over the input TWICE (range-
    // boundary sampling or percentile aggregation, then the shuffled
    // write), and the input here is the expensive assembled read (DV
    // masks, row-id materialization). Cache it across the two passes
    // when the candidate set is modest — the add sizes make the gate
    // exact, and a 100 TB rewrite stays streaming rather than
    // duplicating the table onto executor disks.
    val clustered = Clustering.columns(snap).nonEmpty
    val cacheInput = clustered && existing.map(_.size).sum <=
      spark.conf.getOption(DeltaTable.OPTIMIZE_CACHE_INPUT_KEY)
        .map(_.toLong).getOrElse(32L << 30)
    if (cacheInput)
      input.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val staged0 =
      try stageFiles(layout(input), snap, passthrough)
      finally if (cacheInput) { input.unpersist(false); () }
    // fresh default ids for the new files + an advanced high-water mark
    // (adds still REQUIRE baseRowId per protocol; the materialized
    // columns override them row-by-row on read)
    val (staged, rtLines) =
      if (!rtEnabled) (staged0, Nil)
      else {
        val (assigned, hwm) = RowTracking.assign(staged0,
          RowTracking.highWaterMark(snap), snap.version + 1)
        (assigned, Seq(JsonLog.writeAction(SingleAction(domainMetadata =
          Some(RowTracking.domainMetadataFor(hwm))))))
      }
    val removes = existing.map { a =>
      RemoveFile(a.path, Some(now()), dataChange = false,
        extendedFileMetadata = Some(true),
        partitionValues = Some(a.partitionValues), size = Some(a.size),
        deletionVector = a.deletionVector)
    }
    val adds = staged.map(_.copy(dataChange = false))
    val tail = rtLines ++
      removes.map(r => JsonLog.writeAction(SingleAction(remove = Some(r)))) ++
      adds.map(a => JsonLog.writeAction(SingleAction(add = Some(a))))
    // concurrent appends rebase past a pure compaction (their files are
    // never among those compacted); row-tracking OPTIMIZE keeps
    // fail-fast — its high-water-mark domain metadata must not slide
    // past a winner that also advanced the HWM
    val readSet =
      if (rtEnabled) None
      else Some(DeltaTable.ReadSet(snap, None,
        existing.map(a => Storage.canonicalPathKey(a.path)).toSet,
        maintenance = true))
    val committed = commitActions(snap.version + 1,
      cv => commitInfoLine("OPTIMIZE", params, ictAt(snap, cv - 1)) +: tail,
      retryable = false, Nil, readSet)
    maybeWriteChecksum(committed, adds.map(_.size),
      existing.map(_.size))
    maybeAutoCheckpoint(committed, snap.metadata)
    committed
  }

  /** Rename logical columns to physical names + field ids for writing
    * (struct casts rename nested fields positionally; identity when
    * column mapping is off).
    */
  private def physicalProjection(df: DataFrame, snap: Snapshot,
      passthrough: Seq[String] = Nil): DataFrame = {
    val physSchema = ColumnMapping.physicalSchema(snap.schema)
    df.select(
      snap.schema.fields.zip(physSchema.fields).map { case (lf, pf) =>
        (lf.dataType match {
          case _: org.apache.spark.sql.types.StructType |
               _: org.apache.spark.sql.types.ArrayType |
               _: org.apache.spark.sql.types.MapType =>
            ColumnMapping.qcol(lf.name).cast(pf.dataType)
          case _ => ColumnMapping.qcol(lf.name)
        }).as(pf.name, pf.metadata)
      } ++ passthrough.map(ColumnMapping.qcol): _*)
  }

  /** Stage CDF `_change_data` files for `df` (logical table columns):
    * written with physical names + a physical `_change_type` column,
    * partitioned like the table. A commit carrying cdc actions is read
    * ONLY through them (reference table_changes/log_replay.rs
    * classification), which is what makes partial file rewrites
    * CDF-correct.
    */
  private def stageCdcFiles(df: DataFrame, snap: Snapshot,
      changeType: String): Seq[AddCDCFile] =
    stageCdcMulti(Seq(df -> changeType), snap)

  /** Stage several change-typed row sets as ONE `_change_data` write
    * job: each branch carries its `_change_type` literal through a
    * unionByName, so an UPDATE's pre+post images (or a MERGE's four
    * image kinds) cost one Spark job instead of one per kind. cdc
    * files legally mix change types — `_change_type` is a physical
    * data column, never per-file metadata.
    */
  private def stageCdcMulti(parts: Seq[(DataFrame, String)],
      snap: Snapshot): Seq[AddCDCFile] = {
    if (parts.isEmpty) return Nil
    val physPartCols = snap.partitionColumns.map(c =>
      ColumnMapping.physicalName(snap.schema.fields.find(_.name == c).get))
    val stagePath = new Path(new Path(root, "_change_data"),
      "cdc-" + UUID.randomUUID().toString.substring(0, 8))
    val renamed = parts.map { case (df, changeType) =>
      physicalProjection(df, snap)
        .withColumn("_change_type", lit(changeType))
    }.reduce(_.unionByName(_))
    val writer = renamed.write.mode("overwrite")
    (if (physPartCols.nonEmpty) writer.partitionBy(physPartCols: _*) else writer)
      .parquet(stagePath.toString)
    val success = new Path(stagePath, "_SUCCESS")
    if (fs.exists(success)) fs.delete(success, false)
    Storage.listFilesRecursive(fs, stagePath)
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map { st =>
        val rel = st.getPath.toUri.getRawPath.stripPrefix(
          fs.makeQualified(root).toUri.getRawPath).stripPrefix("/")
        val pv: Map[String, String] = rel.split('/').dropRight(1)
          .map(uriDecodeSegment)
          .filter(_.contains('='))
          .map { seg =>
            val Array(k, v) = seg.split("=", 2)
            k -> (if (v == "__HIVE_DEFAULT_PARTITION__") null
                  else unescapePathName(v))
          }.toMap
        AddCDCFile(rel,
          physPartCols.map(c => c -> pv.getOrElse(c, null)).toMap,
          st.getLen, dataChange = false)
      }
  }

  /** URI-decode one path segment ('+' stays literal). */
  private def uriDecodeSegment(s: String): String =
    try java.net.URLDecoder.decode(s.replace("+", "%2B"), "UTF-8")
    catch { case _: IllegalArgumentException => s }

  /** Hive-style partition-dir unescaping (%XX only — '+' stays). */
  private def unescapePathName(s: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 3 <= s.length) {
        try {
          b.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
          i += 3
        } catch { case _: NumberFormatException => b.append(c); i += 1 }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  /** Blind append (reference transaction/mod.rs add_files + commit).
    * With row tracking enabled, fresh adds receive baseRowId ranges from
    * the delta.rowTracking high-water mark and the commit carries the
    * advanced mark (reference row_tracking.rs:19-68); such commits are
    * not blind-retryable (a conflicting writer may have consumed ids).
    */
  def append(df: DataFrame, txn: Option[SetTransaction] = None,
      mergeSchema: Boolean = false,
      nullGeneratedAsOmitted: Boolean = false): Long = {
    val snap0 = snapshot()
    if (!mergeSchema)
      return appendFrom(snap0, df, txn, nullGeneratedAsOmitted)
    // writer-side schema evolution (delta-spark's `mergeSchema`): the
    // merged schema rides the validated ALTER path (column-mapping id
    // assignment, typeWidening feature), then the batch appends aligned
    // to it — old files read added columns as NULL, widened columns
    // natively
    val merged = SchemaEvolution.merge(snap0.schema, df.schema)
    val snap = if (merged == snap0.schema) snap0
      else { alterSchema(merged); snapshot() }
    appendFrom(snap, alignTo(df, snap.schema), txn, nullGeneratedAsOmitted)
  }

  /** Schema enforcement: a write carrying columns the table does not
    * have is rejected, never silently dropped (the staging projection
    * would otherwise discard them — data loss masquerading as
    * success). `mergeSchema` is the sanctioned escape hatch.
    */
  private def enforceNoExtraColumns(df: DataFrame, snap: Snapshot): Unit = {
    val table = snap.schema.fieldNames.map(_.toLowerCase).toSet
    val extra = df.columns.filterNot(c => table.contains(c.toLowerCase))
    require(extra.isEmpty, s"schema mismatch: column(s) " +
      s"${extra.mkString(", ")} do not exist in the table " +
      "(set mergeSchema to evolve the schema)")
  }

  /** Project `df` onto `schema`: case-insensitive column match, upcast
    * narrower incoming types, fill absent columns with NULL. Structs
    * rebuild BY NAME at every depth (a plain struct cast is
    * positional — after a nested evolution the incoming field order
    * can differ from the merged schema, and a positional cast would
    * silently shift values across fields); arrays/maps of structs
    * align element-wise through `transform`/`transform_values` (all
    * codegen'd built-ins, no UDFs).
    */
  private def alignTo(df: DataFrame, schema: StructType): DataFrame = {
    def alignExpr(c: Column, from: DataType, to: DataType): Column =
      (from, to) match {
        case (f, t) if f == t => c
        case (fs: StructType, ts: StructType) =>
          val inner = ts.fields.map { tf =>
            fs.fields.find(_.name.equalsIgnoreCase(tf.name)) match {
              case Some(ff) =>
                alignExpr(c.getField(ff.name), ff.dataType, tf.dataType)
                  .as(tf.name)
              case None => lit(null).cast(tf.dataType).as(tf.name)
            }
          }
          // a NULL struct stays NULL, not a struct of NULLs
          when(c.isNull, lit(null).cast(ts))
            .otherwise(struct(inner.toIndexedSeq: _*))
        case (fa: ArrayType, ta: ArrayType) =>
          transform(c, x => alignExpr(x, fa.elementType, ta.elementType))
        case (fm: MapType, tm: MapType) =>
          transform_values(c,
            (_, v) => alignExpr(v, fm.valueType, tm.valueType))
        case (_, t) => c.cast(t)
      }
    df.select(schema.fields.map { f =>
      df.schema.fields.find(_.name.equalsIgnoreCase(f.name)) match {
        case Some(c) =>
          alignExpr(col(s"`${c.name}`"), c.dataType, f.dataType).as(f.name)
        case None => lit(null).cast(f.dataType).as(f.name)
      }
    }.toIndexedSeq: _*)
  }

  /** Append against an explicit (possibly stale) snapshot — the
    * transaction seam conflict tests drive; `append` is this from the
    * latest snapshot.
    */
  private[graft] def appendFrom(snap: Snapshot, df: DataFrame,
      txn: Option[SetTransaction] = None,
      nullGeneratedAsOmitted: Boolean = false): Long = {
    writerGate(snap, mutating = false)
    // idempotent-writer skip (delta-spark's txnAppId/txnVersion): a
    // marker already at-or-past txn.version means this logical batch
    // landed — a restarted job re-running it must no-op, not duplicate.
    // The commit loop's same-slot check covers markers racing us NOW;
    // this covers markers that committed before we loaded the snapshot.
    txn.foreach { tx =>
      if (snap.setTransactions.find(_.appId == tx.appId)
          .exists(_.version >= tx.version))
        return snap.version
    }
    enforceNoExtraColumns(df, snap)
    val (dfComplete, identityCols) = IdentityColumns.assign(df, snap)
    val staged = stageFiles(dfComplete, snap,
      nullGeneratedAsOmitted = nullGeneratedAsOmitted)
    val rowTracking = RowTracking.enabled(snap.metadata)
    val v = snap.version + 1
    val (adds, hwmLine) =
      if (!rowTracking) (staged, Nil)
      else {
        val (assigned, hwm) =
          RowTracking.assign(staged, RowTracking.highWaterMark(snap), v)
        (assigned, Seq(JsonLog.writeAction(SingleAction(
          domainMetadata = Some(RowTracking.domainMetadataFor(hwm))))))
      }
    // identity marks advance from the staged stats; the commit then
    // carries the updated metadata and is no longer blind-retryable
    // (a concurrent writer may have consumed the same value range)
    val idHwms = IdentityColumns.hwmFromStats(staged, snap, identityCols)
    val idMeta = if (idHwms.isEmpty) None
      else Some(IdentityColumns.advance(snap.metadata, idHwms))
    val tail =
      txn.map(t => JsonLog.writeAction(SingleAction(txn = Some(t)))).toSeq ++
      hwmLine ++
      idMeta.map(m =>
        JsonLog.writeAction(SingleAction(metaData = Some(m)))).toSeq ++
      adds.map(a => JsonLog.writeAction(SingleAction(add = Some(a))))
    // commitInfo regenerates per attempt: the ICT predecessor after a
    // rebase is the commit that won the race, not the stale snapshot
    val committed = commitActions(v,
      cv => commitInfoLine("WRITE", Map("mode" -> "Append"),
        ictAt(snap, cv - 1)) +: tail,
      retryable = !rowTracking && idMeta.isEmpty,
      txnAppIds = txn.map(_.appId).toSeq,
      serializable = TableProperties.serializableIsolation(snap.metadata))
    maybeWriteChecksum(committed, adds.map(_.size), Nil, newMeta = idMeta)
    maybeAutoCheckpoint(committed, idMeta.getOrElse(snap.metadata))
    maybeAutoCompact(snap.metadata,
      Some(adds.map(_.partitionValues).toSet))
    committed
  }

  /** Replace the table's contents atomically: one commit removes every
    * live file and adds the staged replacement (mode("overwrite")
    * semantics — reference transaction/mod.rs remove+add reconciliation;
    * readers at older versions still see the old data).
    */
  def overwrite(df: DataFrame, overwriteSchema: Boolean = false,
      txn: Option[SetTransaction] = None,
      nullGeneratedAsOmitted: Boolean = false): Long = {
    val snap0 = snapshot()
    writerGate(snap0, mutating = true)
    // idempotent-writer skip — same contract as appendFrom
    txn.foreach { tx =>
      if (snap0.setTransactions.find(_.appId == tx.appId)
          .exists(_.version >= tx.version))
        return snap0.version
    }
    // `overwriteSchema`: replacing every row may also replace the
    // schema wholesale (delta-spark's writer option). Not merged —
    // REPLACED: dropped and retyped columns are fine because no old
    // data survives to be read under them. Column-mapped tables keep
    // surviving fields' physical identity via the ALTER machinery's
    // annotation rules, so this routes schema replacement through a
    // metadata commit first (old readers of old versions are
    // unaffected; time travel still resolves their schema).
    // schema replacement and data replacement must land in ONE commit:
    // a separate metadata commit would durably pair the new schema with
    // the old data files (time travel / a concurrent reader / a crash
    // between the commits would read old parquet under a retyped
    // schema). Stage against a synthetic snapshot carrying the new
    // schema, then commit metaData + removes + adds together.
    val replacing = overwriteSchema && df.schema != snap0.schema
    val newMeta = if (replacing) {
      require(ColumnMapping.mode(snap0.metadata) == "none",
        "overwriteSchema on a column-mapped table is not supported")
      require(snap0.partitionColumns.forall(df.schema.fieldNames.contains),
        s"overwriteSchema cannot drop partition columns " +
          snap0.partitionColumns.mkString("(", ",", ")"))
      Some(snap0.metadata.copy(
        schemaString = GeoTypes.toSchemaString(df.schema)))
    } else None
    val snap = newMeta.fold(snap0)(m =>
      new Snapshot(spark, snap0.tableRoot, snap0.segment, snap0.protocol, m,
        snap0.builtAsLatest))
    enforceNoExtraColumns(df, snap)
    val existing = new DeltaScan(snap0, None).collectAddFiles(slim = true)
    val stagedRaw = stageFiles(df, snap,
      nullGeneratedAsOmitted = nullGeneratedAsOmitted)
    // row-tracking tables assign fresh baseRowIds + advance the HWM on
    // EVERY data-adding commit — an overwrite without them would serve
    // null _row_ids and break row-tracking CDF (appendFrom parity)
    val (staged, hwmLine) =
      if (!RowTracking.enabled(snap0.metadata)) (stagedRaw, Nil)
      else {
        val (assigned, hwm) = RowTracking.assign(stagedRaw,
          RowTracking.highWaterMark(snap0), snap0.version + 1)
        (assigned, Seq(JsonLog.writeAction(SingleAction(
          domainMetadata = Some(RowTracking.domainMetadataFor(hwm))))))
      }
    val removes = existing.map { a =>
      RemoveFile(a.path, Some(now()), dataChange = true,
        extendedFileMetadata = Some(true),
        partitionValues = Some(a.partitionValues), size = Some(a.size),
        deletionVector = a.deletionVector)
    }
    // a replaced schema can INTRODUCE geo columns (e.g. a df read from
    // another geo table): the same dual-sided feature upgrade the
    // alterSchema path emits must ride this commit too, or every later
    // snapshot load fails the geo gate on an unreadable table
    val newProto =
      if (newMeta.exists(m => GeoTypes.containsGeo(df.schema)) &&
          !snap0.protocol.readerFeatures.exists(_.contains(GeoTypes.FEATURE)))
        Some(TableFeatures.upgraded(snap0.protocol,
          Seq(GeoTypes.FEATURE), Seq(GeoTypes.FEATURE)))
      else None
    val protoLine = newProto.map(p =>
      JsonLog.writeAction(SingleAction(protocol = Some(p)))).toSeq
    val tail =
      txn.map(t => JsonLog.writeAction(SingleAction(txn = Some(t)))).toSeq ++
      hwmLine ++
      protoLine ++
      newMeta.map(m =>
        JsonLog.writeAction(SingleAction(metaData = Some(m)))).toSeq ++
      removes.map(r => JsonLog.writeAction(SingleAction(remove = Some(r)))) ++
      staged.map(a => JsonLog.writeAction(SingleAction(add = Some(a))))
    val committed = commitActions(snap0.version + 1,
      cv => commitInfoLine("WRITE", Map("mode" -> "Overwrite"),
        ictAt(snap0, cv - 1)) +: tail,
      retryable = false, txn.map(_.appId).toSeq)
    // the CRC must carry the upgraded protocol too: its fast path
    // serves P&M verbatim, and a stale protocol under a geo schema
    // fails the gate on the very next read
    maybeWriteChecksum(committed, staged.map(_.size), existing.map(_.size),
      newMeta = newMeta, newProto = newProto)
    maybeAutoCheckpoint(committed, newMeta.getOrElse(snap0.metadata))
    committed
  }

  /** DML predicates must be deterministic (delta-spark parity): the
    * DV paths evaluate the predicate in separate jobs (bitmap pass,
    * rewrite pass) and even single-pass DML re-evaluates on retry —
    * rand()/current_timestamp() would mark one row set and rewrite
    * another, silently losing or duplicating rows.
    */
  private def requireDeterministicPredicate(snap: Snapshot,
      predicateSql: String, op: String): Unit = {
    import org.apache.spark.sql.catalyst.expressions.{
      CurrentDate, CurrentTimestamp, Now}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snap.schema)
    val analyzed =
      empty.filter(coalesce(expr(predicateSql), lit(false)))
        .queryExecution.analyzed
    analyzed.collectFirst { case f: LFilter => f.condition }.foreach { c =>
      val timey = c.exists {
        case _: CurrentTimestamp | _: CurrentDate | _: Now => true
        case _ => false
      }
      require(c.deterministic && !timey,
        s"$op predicate must be deterministic, got: $predicateSql")
    }
  }

  /** DELETE WHERE: files whose rows all survive are untouched; files with
    * any matching row are rewritten without the matching rows
    * (remove+add pairs — reference transaction/update.rs:188-812 file-
    * granular path; DV-based row-granular delete is the upgrade path).
    */
  def deleteWhere(predicateSql: String): Long = {
    val snap = snapshot()
    writerGate(snap, mutating = true)
    requireDeterministicPredicate(snap, predicateSql, "DELETE")
    val scan = new DeltaScan(snap, Some(predicateSql))
    // slim: tombstones and the rewrite read need path/pv/size/DV —
    // never the stats JSON (the DV delete paths DO need it: their
    // re-adds preserve the original stats)
    val candidates = scan.collectAddFiles(slim = true)
    if (candidates.isEmpty) return snap.version

    // one read of the candidate files feeds both the survivor rewrite
    // and the CDF delete staging; survivors keep their row ids through
    // the materialized columns on row-tracking tables
    val (full, rtCols) = readFilesForRewrite(snap, candidates)
    val cdf = TableChanges.cdfEnabled(snap.metadata)
    if (cdf) full.persist()
    // survivors: NOT(cond) OR cond IS NULL  (DELETE's 3VL contract)
    val survivors = full.filter(
      not(coalesce(expr(predicateSql), lit(false))))
    // no isEmpty pre-check: that is a full extra read of the candidate
    // files per DELETE; stageFiles' zero-row drop already returns Nil
    // for an all-deleted rewrite
    val newAdds = stageFiles(survivors, snap, rtCols)
    // CDF: a rewrite commit without cdc actions would read as
    // delete-all + insert-survivors; stage the actually-deleted rows as
    // _change_data instead
    val cdcActions =
      if (cdf) stageCdcFiles(full.filter(expr(predicateSql)), snap, "delete")
      else Nil
    if (cdf) full.unpersist()
    val removes = candidates.map { a =>
      // the tombstone MUST carry the candidate's DV descriptor: the
      // replay dedup key is (path, dvUniqueId), so a DV-less remove
      // would never shadow a DV-carrying add — its rows would resurrect
      RemoveFile(a.path, Some(now()), dataChange = true,
        extendedFileMetadata = Some(true),
        partitionValues = Some(a.partitionValues), size = Some(a.size),
        deletionVector = a.deletionVector)
    }
    val (newAddsRt, rtLines) =
      assignRowIds(snap, newAdds, snap.version + 1)
    val tail = rtLines ++
      removes.map(r => JsonLog.writeAction(SingleAction(remove = Some(r)))) ++
      newAddsRt.map(a => JsonLog.writeAction(SingleAction(add = Some(a)))) ++
      cdcActions.map(c => JsonLog.writeAction(SingleAction(cdc = Some(c))))
    val committed = commitActions(snap.version + 1,
      cv => commitInfoLine("DELETE", Map("predicate" -> predicateSql),
        ictAt(snap, cv - 1)) +: tail,
      retryable = false, Nil,
      Some(DeltaTable.ReadSet(snap, Some(predicateSql),
        candidates.map(a => Storage.canonicalPathKey(a.path)).toSet)))
    maybeWriteChecksum(committed,
      newAdds.map(_.size), candidates.map(_.size))
    maybeAutoCheckpoint(committed, snap.metadata)
    committed
  }

  /** Read specific add files with partition values injected. */
  private def readFiles(snap: Snapshot, adds: Seq[AddFile]): DataFrame =
    new DeltaScan(snap, None).assemble(adds, keepMeta = false)

  /** Row-tracking DML read: the original row ids ride along RENAMED to
    * the table's materialized column names, so a rewrite stages them
    * straight through and unchanged rows keep their ids (the
    * protocol's preservation contract). Returns (frame, passthrough
    * names) — (plain read, Nil) when row tracking is off.
    */
  private def readFilesForRewrite(snap: Snapshot,
      adds: Seq[AddFile]): (DataFrame, Seq[String]) =
    RowTracking.materializedCols(snap.metadata) match {
      case Some((idCol, vCol))
          if RowTracking.enabled(snap.metadata) && adds.nonEmpty =>
        (new DeltaScan(snap, None).toDFWithRowIds(adds)
           .withColumnRenamed("_row_id", idCol)
           .withColumnRenamed("_row_commit_version", vCol),
         Seq(idCol, vCol))
      case _ => (readFiles(snap, adds), Nil)
    }

  /** Row-tracking commit invariant: EVERY add carries
    * baseRowId/defaultRowCommitVersion when the feature is enabled
    * (reference row_tracking.rs assignment). Fresh defaults; rows that
    * must keep their ids do so via the materialized columns staged into
    * the files. Returns the annotated adds + the HWM domain line.
    */
  private def assignRowIds(snap: Snapshot, adds: Seq[AddFile],
      v: Long): (Seq[AddFile], Seq[String]) =
    if (!RowTracking.enabled(snap.metadata) || adds.isEmpty) (adds, Nil)
    else {
      val (assigned, hwm) = RowTracking.assign(adds,
        RowTracking.highWaterMark(snap), v)
      (assigned, Seq(JsonLog.writeAction(SingleAction(domainMetadata =
        Some(RowTracking.domainMetadataFor(hwm))))))
    }

  /** UPDATE SET ... WHERE ...: files containing matching rows are
    * rewritten with the assignments applied (reference
    * transaction/update.rs file-granular path); untouched files stay.
    * With CDF enabled the commit stages update_preimage /
    * update_postimage `_change_data` rows, so the feed reads row-level
    * updates rather than delete-all + insert-all.
    */
  /** The post-assignment row frame shared by the UPDATE paths: clause
    * assignments applied (cast to the column type), generated columns
    * recomputed from the post-assignment row (explicit assignments
    * win), row-tracking columns materialized with a nulled commit
    * version so updated rows keep their id but take the new add's
    * default version.
    */
  private def applyUpdateAssignments(matched: DataFrame, snap: Snapshot,
      set: Map[String, String], rtCols: Seq[String]): DataFrame = {
    val rtUpdated: Seq[Column] = rtCols match {
      case Seq(idCol, vCol) => Seq(ColumnMapping.qcol(idCol),
        lit(null).cast("long").as(vCol))
      case _ => Nil
    }
    val rtKeep: Seq[Column] = rtCols.map(ColumnMapping.qcol)
    val assigned = matched.select(snap.schema.fields.map { f =>
      set.get(f.name)
        .map(e => expr(e).cast(f.dataType).as(f.name, f.metadata))
        .getOrElse(ColumnMapping.qcol(f.name))
    }.toIndexedSeq ++ rtUpdated: _*)
    val regen = WriteValidation.generated(snap) -- set.keys
    if (regen.isEmpty) assigned
    else assigned.select(snap.schema.fields.map { f =>
      regen.get(f.name)
        .map(e => expr(e).cast(f.dataType).as(f.name, f.metadata))
        .getOrElse(ColumnMapping.qcol(f.name))
    }.toIndexedSeq ++ rtKeep: _*)
  }

  def updateWhere(predicateSql: String, set: Map[String, String]): Long = {
    val snap = snapshot()
    writerGate(snap, mutating = true)
    requireDeterministicPredicate(snap, predicateSql, "UPDATE")
    require(set.nonEmpty, "UPDATE requires at least one assignment")
    set.keys.foreach(c => require(snap.schema.fieldNames.contains(c),
      s"no such column '$c'"))
    require(set.keys.toSet.intersect(snap.partitionColumns.toSet).isEmpty,
      "updating a partition column is not supported")
    val scan = new DeltaScan(snap, Some(predicateSql))
    val candidates = scan.collectAddFiles(slim = true) // see DELETE
    if (candidates.isEmpty) return snap.version

    // row-tracking tables: updated rows KEEP their row id but take the
    // NEW commit version — materialize the id, null the version so the
    // read falls back to the new add's default (survivors keep both)
    val (full, rtCols) = readFilesForRewrite(snap, candidates)
    val cdf = TableChanges.cdfEnabled(snap.metadata)
    full.persist()
    val matched = full.filter(coalesce(expr(predicateSql), lit(false)))
    val applied = applyUpdateAssignments(matched, snap, set, rtCols)
    val survivors = full.filter(
      not(coalesce(expr(predicateSql), lit(false))))
    val newAdds =
      stageFiles(survivors.unionByName(applied), snap, rtCols)
    val cdcActions =
      if (!cdf) Nil
      else stageCdcMulti(Seq(matched -> "update_preimage",
        applied -> "update_postimage"), snap)
    full.unpersist()
    val removes = candidates.map { a =>
      RemoveFile(a.path, Some(now()), dataChange = true,
        extendedFileMetadata = Some(true),
        partitionValues = Some(a.partitionValues), size = Some(a.size),
        deletionVector = a.deletionVector)
    }
    val (newAddsRt, rtLines) =
      assignRowIds(snap, newAdds, snap.version + 1)
    val tail = rtLines ++
      removes.map(r => JsonLog.writeAction(SingleAction(remove = Some(r)))) ++
      newAddsRt.map(a => JsonLog.writeAction(SingleAction(add = Some(a)))) ++
      cdcActions.map(c => JsonLog.writeAction(SingleAction(cdc = Some(c))))
    val committed = commitActions(snap.version + 1,
      cv => commitInfoLine("UPDATE", Map("predicate" -> predicateSql),
        ictAt(snap, cv - 1)) +: tail,
      retryable = false, Nil,
      Some(DeltaTable.ReadSet(snap, Some(predicateSql),
        candidates.map(a => Storage.canonicalPathKey(a.path)).toSet)))
    maybeWriteChecksum(committed, newAdds.map(_.size),
      candidates.map(_.size))
    maybeAutoCheckpoint(committed, snap.metadata)
    committed
  }

  /** ONE distributed pass per candidate file: build the new-deletion
    * bitmap ON THE EXECUTORS (groupByKey + mapGroups — compressed
    * bitmap bytes travel to the driver, never row-index lists; a
    * 1B-row DELETE funnels kilobytes, not gigabytes) and count
    * matched/live rows for the fully-deleted-file check. Shared by
    * deleteWhereDV and updateWhereDV — the two must never drift on
    * what "matched" means.
    */
  private def dvMatchPerFile(scan: DeltaScan, candidates: Seq[AddFile],
      predicateSql: String): Array[(String, Array[Byte], Long, Long)] = {
    val withMeta = scan.assemble(candidates, keepMeta = true)
    import spark.implicits._
    withMeta.select(col("__path"), col("__ridx"),
        coalesce(expr(predicateSql), lit(false)).as("__m"))
      .as[(String, Long, Boolean)]
      .groupByKey(_._1)
      .mapGroups { (path: String, it: Iterator[(String, Long, Boolean)]) =>
        val rb = new org.roaringbitmap.longlong.Roaring64NavigableMap()
        var live = 0L
        var matched = 0L
        it.foreach { case (_, ridx, m) =>
          live += 1
          if (m) { matched += 1; rb.addLong(ridx) }
        }
        (path, DeletionVectors.bitmapBytes(rb), matched, live)
      }.collect()
  }

  /** Merge each partially-matched file's new bitmap with its existing
    * DV at BITMAP level (assemble already excluded old-DV rows, so
    * cardinalities simply add), then route small bitmaps inline into
    * the log line and pack larger ones into one deletion_vector file.
    */
  private def dvSwapDescriptors(
      partialFiles: Seq[(String, Array[Byte], Long, Long)],
      byPath: Map[String, AddFile])
      : Map[String, DeletionVectorDescriptor] = {
    val conf = hconf
    val merged: Seq[(String, Array[Byte], Long)] = partialFiles.map {
      case (p, bytes, matched, _) =>
        byPath(p).deletionVector match {
          case Some(old) =>
            val oldBytes = DeletionVectors.readBitmapBytes(old, root, conf)
            (p, DeletionVectors.orBitmaps(oldBytes, bytes),
              old.cardinality + matched)
          case None => (p, bytes, matched)
        }
    }
    val (inlineSized, fileSized) = merged.partition {
      case (_, bytes, _) =>
        bytes.length + 4 <= DeletionVectors.INLINE_MAX_BYTES
    }
    inlineSized.map { case (p, bytes, card) =>
      p -> DeletionVectors.inlineDescriptor(bytes, card)
    }.toMap ++
      (if (fileSized.isEmpty) Map.empty[String, DeletionVectorDescriptor]
       else DeletionVectors.writeBitmaps(fileSized, root, conf))
  }

  /** DELETE WHERE via deletion vectors (reference
    * transaction/update.rs:275-812): no data rewrite — matching row
    * indexes are merged into each file's bitmap, committed as
    * remove+add pairs that swap the file's DV. Upgrades the protocol to
    * table features on first use.
    */
  def deleteWhereDV(predicateSql: String): Long = {
    val snap = snapshot()
    writerGate(snap, mutating = true)
    requireDeterministicPredicate(snap, predicateSql, "DELETE")
    val scan = new DeltaScan(snap, Some(predicateSql))
    // slim: the DV match and the removes need path/pv/size/DV only;
    // stats come back BY REFERENCE below for just the swapped files
    val candidates = scan.collectAddFiles(slim = true)
    if (candidates.isEmpty) return snap.version

    val perFile = dvMatchPerFile(scan, candidates, predicateSql)
    val matchedFiles = perFile.filter(_._3 > 0)
    if (matchedFiles.isEmpty) return snap.version

    val byPath = candidates.map { a =>
      fs.makeQualified(
        Storage.childPath(root, Storage.decodeUriPath(a.path)))
        .toUri.getPath -> a
    }.toMap

    val (gone, partialFiles) = matchedFiles.toSeq.partition {
      case (_, _, matched, live) => matched == live
    }
    // only the partially-matched files re-enter the log (with their
    // original stats marked non-tight) — fetch exactly their stats
    val statsOf = statsForPaths(scan,
      partialFiles.map(p => byPath(p._1).path).toSet)
    val byPathStats = byPath.map { case (k, a) =>
      k -> a.copy(stats = statsOf.get(a.path).orElse(a.stats))
    }
    commitDvSwaps(snap, gone.map(_._1), partialFiles, byPathStats,
      "DELETE", Map("predicate" -> predicateSql),
      readPredicate = Some(predicateSql))
  }

  /** Original stats JSON for the named add paths, fetched in ONE
    * targeted metadata pass — the stats-by-reference leg of the slim
    * DV-DML collects: the candidate collect stays slim (path/pv/size/
    * DV), and only the files that actually re-enter the log as DV
    * swaps pull their stats, bounding the driver's stats heap by the
    * commit's own write amplification instead of the candidate set
    * (at 5M files a broad-predicate DV DELETE used to collect
    * gigabytes of stats JSON it mostly never re-emitted).
    */
  private def statsForPaths(scan: DeltaScan,
      paths: Set[String]): Map[String, String] = {
    if (paths.isEmpty) return Map.empty
    val spark2 = spark
    import spark2.implicits._
    val want = broadcast(paths.toSeq.toDF("__p"))
    scan.filesDF
      .join(want, col("add.path") === col("__p"), "left_semi")
      .select(col("add.path"), col("add.stats"))
      .collect()
      .flatMap(r => Option(r.getString(1)).map(r.getString(0) -> _))
      .toMap
  }

  /** The shared DV-swap commit tail: remove+add pairs swapping each
    * file's deletion vector (fully-dead files remove without re-add),
    * first-use protocol upgrade, checksum + auto-checkpoint. Used by
    * predicate DELETE/UPDATE ([[deleteWhereDV]]) and by
    * [[graft.delta.EqualityDeletes.commitAsDeletionVectors]], which
    * materializes tree-level equality deletes into the log.
    */
  private[graft] def commitDvSwaps(snap: Snapshot, gonePaths: Seq[String],
      partialFiles: Seq[(String, Array[Byte], Long, Long)],
      byPath: Map[String, AddFile], opName: String,
      opParams: Map[String, String],
      readPredicate: Option[String]): Long = {
    val descs = dvSwapDescriptors(partialFiles, byPath)

    def removeOf(a: AddFile): RemoveFile = RemoveFile(
      a.path, Some(now()), dataChange = true,
      extendedFileMetadata = Some(true),
      partitionValues = Some(a.partitionValues), size = Some(a.size),
      deletionVector = a.deletionVector)

    val removes = (gonePaths ++ partialFiles.map(_._1))
      .map(p => removeOf(byPath(p)))
    // stats on a DV-carrying add describe the PHYSICAL file, so they
    // must be flagged tightBounds:false (protocol contract — external
    // readers may otherwise do metadata-only aggregates over dead rows)
    val newAdds = partialFiles.map { case (p, _, _, _) =>
      val a = byPath(p)
      a.copy(deletionVector = Some(descs(p)), dataChange = true,
        stats = a.stats.map(StatsJson.markNonTight))
    }

    // upgrade preserves existing + legacy-implied features
    // (reference table_features upgrade path)
    val needsUpgrade = snap.protocol.minReaderVersion < 3 ||
      !snap.protocol.readerFeatures.exists(_.contains("deletionVectors"))
    val protoLine =
      if (needsUpgrade)
        Seq(JsonLog.writeAction(SingleAction(protocol = Some(
          TableFeatures.upgraded(snap.protocol,
            Seq("deletionVectors"), Seq("deletionVectors"))))))
      else Nil

    val tail =
      protoLine ++
      removes.map(r => JsonLog.writeAction(SingleAction(remove = Some(r)))) ++
      newAdds.map(a => JsonLog.writeAction(SingleAction(add = Some(a))))
    // a commit carrying its own protocol upgrade can never rebase —
    // winnerField("protocol") would be OUR line; keep those strict
    val committed =
      if (needsUpgrade)
        commitActions(snap.version + 1,
          cv => commitInfoLine(opName, opParams,
            ictAt(snap, cv - 1)) +: tail, retryable = false, Nil)
      else commitActions(snap.version + 1,
        cv => commitInfoLine(opName, opParams,
          ictAt(snap, cv - 1)) +: tail,
        retryable = false, Nil,
        Some(DeltaTable.ReadSet(snap, readPredicate,
          (gonePaths ++ partialFiles.map(_._1))
            .map(p => Storage.canonicalPathKey(byPath(p).path)).toSet)))
    maybeWriteChecksum(committed,
      newAdds.map(_.size),
      (gonePaths ++ partialFiles.map(_._1)).map(p => byPath(p).size),
      newProto = if (needsUpgrade)
        Some(TableFeatures.upgraded(snap.protocol,
          Seq("deletionVectors"), Seq("deletionVectors")))
      else None)
    maybeAutoCheckpoint(committed, snap.metadata)
    committed
  }

  /** UPDATE WHERE via deletion vectors (delta-spark's DV-based UPDATE;
    * reference transaction/update.rs — DV attach + new adds in one
    * commit): matching rows are DV-marked in their files and ONLY the
    * updated copies are written as new files. Write amplification =
    * the updated rows, not the whole candidate files — the difference
    * between rewriting kilobytes and rewriting terabytes when an
    * UPDATE touches 0.1% of a 100 TB table. Untouched rows never move,
    * so their row ids and file-level stats stay put; the DV-swapped
    * add keeps its baseRowId and gets tightBounds:false stats.
    * Upgrades the protocol to deletionVectors on first use.
    */
  def updateWhereDV(predicateSql: String,
      set: Map[String, String]): Long = {
    val snap = snapshot()
    writerGate(snap, mutating = true)
    requireDeterministicPredicate(snap, predicateSql, "UPDATE")
    require(set.nonEmpty, "UPDATE requires at least one assignment")
    set.keys.foreach(c => require(snap.schema.fieldNames.contains(c),
      s"no such column '$c'"))
    require(set.keys.toSet.intersect(snap.partitionColumns.toSet).isEmpty,
      "updating a partition column is not supported")
    val scan = new DeltaScan(snap, Some(predicateSql))
    // slim collect + stats by reference for the swapped files (see
    // deleteWhereDV): the rewrite stages FRESH stats for the updated
    // copies, so only the DV-swap re-adds need the originals
    val candidates = scan.collectAddFiles(slim = true)
    if (candidates.isEmpty) return snap.version

    // per-file deletion bitmaps for the matching rows — executor-built,
    // compressed bytes to the driver (shared pass with deleteWhereDV)
    val perFile = dvMatchPerFile(scan, candidates, predicateSql)
    val matchedFiles = perFile.filter(_._3 > 0)
    if (matchedFiles.isEmpty) return snap.version
    val byPath = candidates.map { a =>
      fs.makeQualified(
        Storage.childPath(root, Storage.decodeUriPath(a.path)))
        .toUri.getPath -> a
    }.toMap
    val matchedAdds = matchedFiles.map(f => byPath(f._1)).toSeq

    // the UPDATED row copies (only these are written)
    val (full, rtCols) = readFilesForRewrite(snap, matchedAdds)
    val cdf = TableChanges.cdfEnabled(snap.metadata)
    full.persist()
    val matched = full.filter(coalesce(expr(predicateSql), lit(false)))
    val applied = applyUpdateAssignments(matched, snap, set, rtCols)
    val newAdds = stageFiles(applied, snap, rtCols)
    val cdcActions =
      if (!cdf) Nil
      else stageCdcMulti(Seq(matched -> "update_preimage",
        applied -> "update_postimage"), snap)
    full.unpersist()

    // DV swap per matched file: fully-matched files drop entirely
    val (gone, partialFiles) = matchedFiles.toSeq.partition {
      case (_, _, matched, live) => matched == live
    }
    val descs = dvSwapDescriptors(partialFiles, byPath)
    val removes = (gone.map(_._1) ++ partialFiles.map(_._1)).map { p =>
      val a = byPath(p)
      RemoveFile(a.path, Some(now()), dataChange = true,
        extendedFileMetadata = Some(true),
        partitionValues = Some(a.partitionValues), size = Some(a.size),
        deletionVector = a.deletionVector)
    }
    val statsOf = statsForPaths(scan,
      partialFiles.map(p => byPath(p._1).path).toSet)
    val swapped = partialFiles.map { case (p, _, _, _) =>
      val a = byPath(p)
      a.copy(deletionVector = Some(descs(p)), dataChange = true,
        stats = statsOf.get(a.path).orElse(a.stats)
          .map(StatsJson.markNonTight))
    }

    val needsUpgrade = snap.protocol.minReaderVersion < 3 ||
      !snap.protocol.readerFeatures.exists(_.contains("deletionVectors"))
    val proto =
      if (needsUpgrade) Some(TableFeatures.upgraded(snap.protocol,
        Seq("deletionVectors"), Seq("deletionVectors")))
      else None
    val (newAddsRt, rtLines) =
      assignRowIds(snap, newAdds, snap.version + 1)
    val tail =
      proto.map(p =>
        JsonLog.writeAction(SingleAction(protocol = Some(p)))).toSeq ++
      rtLines ++
      removes.map(r => JsonLog.writeAction(SingleAction(remove = Some(r)))) ++
      (swapped ++ newAddsRt).map(a =>
        JsonLog.writeAction(SingleAction(add = Some(a)))) ++
      cdcActions.map(c => JsonLog.writeAction(SingleAction(cdc = Some(c))))
    // a commit carrying its own protocol upgrade can never rebase
    val committed = commitActions(snap.version + 1,
      cv => commitInfoLine("UPDATE", Map("predicate" -> predicateSql),
        ictAt(snap, cv - 1)) +: tail,
      retryable = false, Nil,
      if (needsUpgrade) None
      else Some(DeltaTable.ReadSet(snap, Some(predicateSql),
        matchedAdds.map(a => Storage.canonicalPathKey(a.path)).toSet)))
    maybeWriteChecksum(committed,
      swapped.map(_.size) ++ newAdds.map(_.size),
      matchedAdds.map(_.size), newProto = proto)
    maybeAutoCheckpoint(committed, snap.metadata)
    committed
  }

  /** MERGE INTO (upsert): clauses evaluate in order per row, first
    * whose condition holds wins (Delta MERGE contract; the kernel
    * supplies the building blocks — file-granular remove+add rewrite,
    * reference transaction/mod.rs — and delta-spark defines clause
    * semantics). Spark-first shape: ONE inner join finds touched
    * files; only those files rewrite; matched/survivor/insert row sets
    * are plain joins over the candidate rows, so everything stays
    * distributed and the source is free to broadcast when small.
    *
    * `condSql` and clause expressions reference the target as `t` and
    * the source as `s` (NOT MATCHED BY SOURCE clauses see `t` only).
    * With CDF enabled the commit stages
    * update_preimage/update_postimage/delete/insert `_change_data`
    * rows. A target row matching multiple source rows is an error when
    * any matched clause exists (ambiguous update — Delta contract).
    * NOT MATCHED BY SOURCE clauses force a full-table candidate set
    * (every unmatched target row is potentially affected).
    */
  def merge(source: DataFrame, condSql: String,
      clauses: Seq[MergeClause]): Long =
    merge(source, condSql, clauses, schemaEvolution = false)

  /** MERGE with writer-side schema evolution (delta-spark's
    * `withSchemaEvolution()` builder flag; reference
    * kernel/src/transaction/schema_evolution.rs:784): any clause
    * assignment targeting a column absent from the table is added
    * first — nullable, typed from the same-named SOURCE column (the
    * only place a new merge column's values can come from) — via the
    * validated alterSchema commit, then the merge runs against the
    * evolved snapshot. Rows the merge does not touch read the new
    * column as NULL. The SQL surface (`MERGE ... WITH SCHEMA
    * EVOLUTION`) reaches the same alterSchema path through Spark's
    * ResolveMergeIntoSchemaEvolution + the catalog's alterTable.
    */
  def merge(source: DataFrame, condSql: String,
      clauses: Seq[MergeClause], schemaEvolution: Boolean): Long = {
    import MergeClause._
    if (schemaEvolution) {
      val cur = snapshot().schema
      val have = cur.fieldNames.toSet
      val assignedNew = clauses.flatMap {
        case MatchedUpdate(_, set) => set.keys
        case NotMatchedBySourceUpdate(_, set) => set.keys
        case NotMatchedInsert(_, values) => values.keys
        case _ => Nil
      }.distinct.filterNot(have)
      if (assignedNew.nonEmpty) {
        val srcByName = source.schema.fields.map(f => f.name -> f).toMap
        val added = assignedNew.map(n => srcByName.getOrElse(n,
          throw new IllegalArgumentException(
            s"schema evolution: assigned column '$n' exists in neither " +
              "the table nor the merge source")))
          .map(f => f.copy(nullable = true))
        alterSchema(StructType(cur.fields.toIndexedSeq ++ added))
      }
    }
    val snap = snapshot()
    writerGate(snap, mutating = true)
    require(clauses.nonEmpty, "MERGE requires at least one clause")
    val matchedClauses = clauses.filter {
      case _: MatchedUpdate | _: MatchedDelete => true
      case _ => false
    }
    val insertClauses = clauses.collect { case c: NotMatchedInsert => c }
    val bySourceClauses = clauses.filter {
      case _: NotMatchedBySourceUpdate | _: NotMatchedBySourceDelete => true
      case _ => false
    }
    val fieldNames = snap.schema.fieldNames.toSet
    clauses.foreach {
      case MatchedUpdate(_, set) => set.keys.foreach(c => require(
        fieldNames.contains(c), s"no such column '$c'"))
      case NotMatchedBySourceUpdate(_, set) => set.keys.foreach(c =>
        require(fieldNames.contains(c), s"no such column '$c'"))
      case NotMatchedInsert(_, values) => values.keys.foreach(c => require(
        fieldNames.contains(c), s"no such column '$c'"))
      case _ => ()
    }

    val scan = new DeltaScan(snap, None)
    // slim: MERGE tombstones + rewrites need no stats JSON (see DELETE)
    val allAdds = scan.collectAddFiles(slim = true)
    val cond = expr(condSql)
    val src = source.alias("s")
    src.persist()
    var fullId: DataFrame = null
    var bsTagged: DataFrame = null
    try {
      // -- touched files: the only full-table join; candidate files
      //    contain every matching target row by construction. BY SOURCE
      //    clauses can hit any unmatched row anywhere → all files
      val candidates: Seq[AddFile] =
        if (allAdds.isEmpty) Nil
        else if (bySourceClauses.nonEmpty) allAdds
        else if (matchedClauses.isEmpty) Nil
        else {
          val withMeta = scan.assemble(allAdds, keepMeta = true)
          val touched = withMeta.alias("t").join(src, cond, "inner")
            .select(col("__path")).distinct()
            .collect().map(_.getString(0)).toSet
          allAdds.filter(a => touched(fs.makeQualified(
            Storage.childPath(root, Storage.decodeUriPath(a.path)))
            .toUri.getPath))
        }

      val cdf = TableChanges.cdfEnabled(snap.metadata)
      // row-tracking tables read the candidates WITH their row ids so
      // kept/updated target rows stage them through (updated rows null
      // the commit version — they take the new add's default)
      val (fullRead, rtCols) = readFilesForRewrite(snap, candidates)
      fullId = fullRead
        .withColumn("_tid", monotonically_increasing_id()).persist()
      val tgt = fullId.alias("t")
      def tcol(f: StructField): Column =
        col("t." + ColumnMapping.quoted(f.name))
      val rtPre: Seq[Column] =
        rtCols.map(c => col("t." + ColumnMapping.quoted(c)).as(c))
      val rtUpdated: Seq[Column] = rtCols match {
        case Seq(idCol, vCol) =>
          Seq(col("t." + ColumnMapping.quoted(idCol)).as(idCol),
            lit(null).cast("long").as(vCol))
        case _ => Nil
      }
      val preCols = snap.schema.fields.toIndexedSeq
        .map(f => tcol(f).as(f.name, f.metadata)) ++ rtPre

      // -- matched rows, tagged with the first applicable clause
      val matchedTagged: DataFrame = {
        var action: Column = lit("keep")
        matchedClauses.zipWithIndex.reverse.foreach { case (c, i) =>
          val cc = c match {
            case MatchedUpdate(cnd, _) => cnd
            case MatchedDelete(cnd) => cnd
            case _ => None
          }
          action = when(cc.map(expr).getOrElse(lit(true)), lit(s"a$i"))
            .otherwise(action)
        }
        // persisted: the dup check, update pre/post, delete and keep
        // row sets plus their CDF stagings all derive from this one
        // join — without caching each job re-executes it
        tgt.join(src, cond, "inner").withColumn("_action", action).persist()
      }
      if (matchedClauses.nonEmpty && candidates.nonEmpty) {
        val dup = matchedTagged.groupBy(col("_tid")).count()
          .filter(col("count") > 1).limit(1).count()
        require(dup == 0, "MERGE: a target row matched multiple " +
          "source rows with matched clauses present (ambiguous)")
      }
      val updateTags = matchedClauses.zipWithIndex.collect {
        case (_: MatchedUpdate, i) => s"a$i" }
      val deleteTags = matchedClauses.zipWithIndex.collect {
        case (_: MatchedDelete, i) => s"a$i" }

      def setOf(c: MergeClause): Map[String, String] = c match {
        case MatchedUpdate(_, set) => set
        case NotMatchedBySourceUpdate(_, set) => set
        case _ => Map.empty
      }
      // post-update rows: per-column clause cascade, then recompute
      // generated columns not explicitly assigned (stored values are
      // stale once a base column changes — same contract as UPDATE)
      def updateCascade(rows: DataFrame, cls: Seq[MergeClause],
          prefix: String): DataFrame = {
        val postCols = snap.schema.fields.toIndexedSeq.map { f =>
          var v: Column = tcol(f)
          cls.zipWithIndex.foreach { case (c, i) =>
            setOf(c).get(f.name).foreach { e =>
              v = when(col("_action") === s"$prefix$i",
                expr(e).cast(f.dataType)).otherwise(v)
            }
          }
          v.as(f.name, f.metadata)
        }
        val assigned = rows.select(postCols ++ rtUpdated: _*)
        val regen = WriteValidation.generated(snap) --
          cls.flatMap(setOf(_).keys)
        if (regen.isEmpty) assigned
        else assigned.select(snap.schema.fields.toIndexedSeq.map { f =>
          regen.get(f.name)
            .map(e => expr(e).cast(f.dataType).as(f.name, f.metadata))
            .getOrElse(ColumnMapping.qcol(f.name))
        } ++ rtCols.map(ColumnMapping.qcol): _*)
      }
      val updatedPre =
        if (updateTags.isEmpty) None
        else Some(matchedTagged.filter(col("_action").isin(updateTags: _*)))
      val updatedPost =
        updatedPre.map(updateCascade(_, matchedClauses, "a"))
      val deletedRows =
        if (deleteTags.isEmpty) None
        else Some(matchedTagged.filter(col("_action").isin(deleteTags: _*))
          .select(preCols: _*))
      val keptMatched = matchedTagged.filter(col("_action") === "keep")
        .select(preCols: _*)

      // -- target rows with no source match: plain survivors, or the
      //    NOT MATCHED BY SOURCE cascade when such clauses exist
      val unmatchedTgt = tgt.join(src, cond, "left_anti")
      val (survivors, bsUpdatedPre, bsUpdatedPost, bsDeleted) =
        if (bySourceClauses.isEmpty)
          (unmatchedTgt.select(preCols: _*), None, None, None)
        else {
          var action: Column = lit("keep")
          bySourceClauses.zipWithIndex.reverse.foreach { case (c, i) =>
            val cc = c match {
              case NotMatchedBySourceUpdate(cnd, _) => cnd
              case NotMatchedBySourceDelete(cnd) => cnd
              case _ => None
            }
            action = when(cc.map(expr).getOrElse(lit(true)), lit(s"b$i"))
              .otherwise(action)
          }
          val tagged = unmatchedTgt.withColumn("_action", action).persist()
          bsTagged = tagged
          val updTags = bySourceClauses.zipWithIndex.collect {
            case (_: NotMatchedBySourceUpdate, i) => s"b$i" }
          val delTags = bySourceClauses.zipWithIndex.collect {
            case (_: NotMatchedBySourceDelete, i) => s"b$i" }
          val pre =
            if (updTags.isEmpty) None
            else Some(tagged.filter(col("_action").isin(updTags: _*)))
          (tagged.filter(col("_action") === "keep").select(preCols: _*),
            pre,
            pre.map(updateCascade(_, bySourceClauses, "b")),
            if (delTags.isEmpty) None
            else Some(tagged.filter(col("_action").isin(delTags: _*))
              .select(preCols: _*)))
        }

      // -- not-matched source rows → insert projections. Columns no
      //    clause supplies stay ABSENT when identity/generated/default
      //    machinery fills them, NULL otherwise.
      val genCols = WriteValidation.generated(snap)
      val idCols = IdentityColumns.specs(snap.schema).map(_.name).toSet
      val (insertRaw, identityCols): (Option[DataFrame], Set[String]) =
        if (insertClauses.isEmpty) (None, Set.empty)
        else {
          // NOT MATCHED means unmatched against the WHOLE target; when
          // no file was a rewrite candidate the anti-join reads the
          // full table directly (matching rows only live in candidate
          // files, so candidate rows suffice otherwise)
          val antiTarget =
            if (candidates.isEmpty && allAdds.nonEmpty)
              scan.assemble(allAdds, keepMeta = false).alias("t")
            else tgt
          val unmatched =
            if (allAdds.isEmpty) src
            else src.join(antiTarget, cond, "left_anti")
          var action: Column = lit("skip")
          insertClauses.zipWithIndex.reverse.foreach { case (c, i) =>
            action = when(c.condition.map(expr).getOrElse(lit(true)),
              lit(s"i$i")).otherwise(action)
          }
          val tagged = unmatched.withColumn("_action", action)
            .filter(col("_action") =!= "skip")
          val supplied = insertClauses.flatMap(_.values.keys).toSet
          val outFields = snap.schema.fields.toIndexedSeq.filter { f =>
            supplied.contains(f.name) ||
              !(idCols.contains(f.name) || genCols.contains(f.name) ||
                WriteValidation.defaultOf(f).isDefined)
          }
          val insCols = outFields.map { f =>
            var v: Column = lit(null).cast(f.dataType)
            insertClauses.zipWithIndex.foreach { case (c, i) =>
              if (c.values.contains(f.name))
                v = when(col("_action") === s"i$i",
                  expr(c.values(f.name)).cast(f.dataType)).otherwise(v)
            }
            v.as(f.name, f.metadata)
          }
          val raw = tagged.select(insCols: _*)
          val (assigned, idents) = IdentityColumns.assign(raw, snap)
          // persisted: staged once for data, once more for CDF inserts
          (Some(WriteValidation.prepare(assigned, snap).persist()), idents)
        }

      val outParts = Seq(Some(survivors), Some(keptMatched),
        updatedPost, bsUpdatedPost, insertRaw).flatten
      // inserts carry no materialized columns — allowMissingColumns
      // fills NULL, so inserted rows take the new add's FRESH defaults
      val out = outParts.reduce(
        _.unionByName(_, allowMissingColumns = rtCols.nonEmpty))
      val newAdds =
        if (candidates.isEmpty && insertRaw.isEmpty) Nil
        else stageFiles(out, snap, rtCols)
      if (candidates.isEmpty && newAdds.isEmpty) return snap.version

      val cdcActions =
        if (!cdf) Nil
        else stageCdcMulti(
          (updatedPre.toSeq ++ bsUpdatedPre).map(r =>
            r.select(preCols: _*) -> "update_preimage") ++
          (updatedPost.toSeq ++ bsUpdatedPost).map(_ -> "update_postimage") ++
          (deletedRows.toSeq ++ bsDeleted).map(_ -> "delete") ++
          insertRaw.toSeq.map(_ -> "insert"), snap)

      val removes = candidates.map { a =>
        RemoveFile(a.path, Some(now()), dataChange = true,
          extendedFileMetadata = Some(true),
          partitionValues = Some(a.partitionValues), size = Some(a.size),
          deletionVector = a.deletionVector)
      }
      val idHwms = IdentityColumns.hwmFromStats(newAdds, snap, identityCols)
      val idMeta = if (idHwms.isEmpty) None
        else Some(IdentityColumns.advance(snap.metadata, idHwms))
      val (newAddsRt, rtLines) =
        assignRowIds(snap, newAdds, snap.version + 1)
      val tail =
        idMeta.map(m =>
          JsonLog.writeAction(SingleAction(metaData = Some(m)))).toSeq ++
        rtLines ++
        removes.map(r => JsonLog.writeAction(SingleAction(remove = Some(r)))) ++
        newAddsRt.map(a => JsonLog.writeAction(SingleAction(add = Some(a)))) ++
        cdcActions.map(c => JsonLog.writeAction(SingleAction(cdc = Some(c))))
      // MERGE reads under a join condition, not a single-table
      // predicate — no stats proof possible, so any concurrent add is
      // a conflict (predicateSql = None keeps the check conservative);
      // identity-advancing merges also change metadata and stay strict
      val committed = commitActions(snap.version + 1,
        cv => commitInfoLine("MERGE", Map("predicate" -> condSql),
          ictAt(snap, cv - 1)) +: tail,
        retryable = false, Nil,
        if (idMeta.isDefined) None
        else Some(DeltaTable.ReadSet(snap, None,
          candidates.map(a => Storage.canonicalPathKey(a.path)).toSet)))
      matchedTagged.unpersist()
      insertRaw.foreach(_.unpersist())
      maybeWriteChecksum(committed, newAdds.map(_.size),
        candidates.map(_.size), newMeta = idMeta)
      maybeAutoCheckpoint(committed, idMeta.getOrElse(snap.metadata))
      committed
    } finally {
      src.unpersist()
      if (fullId != null) fullId.unpersist()
      if (bsTagged != null) bsTagged.unpersist()
    }
  }

  // ---------------- ALTER TABLE ----------------

  /** Metadata-only commit applying a validated schema evolution
    * (reference transaction/alter_table.rs:82, schema_evolution.rs:784).
    * Old data files are read under the widened schema natively (Spark's
    * vectorized parquet reader handles int32→int64 / float→double
    * pages); added nullable columns read as NULL from old files.
    */
  def alterSchema(newSchema: StructType): Long = {
    val snap = snapshot()
    writerGate(snap, mutating = false)
    SchemaEvolution.validate(snap.schema, newSchema).foreach(msg =>
      throw new IllegalArgumentException(s"illegal schema evolution: $msg"))
    val schemaDiff = SchemaEvolution.diff(snap.schema, newSchema)
    val widens = schemaDiff.changed.nonEmpty
    val cmMode = ColumnMapping.mode(snap.metadata)
    // preserve column-mapping annotations on surviving fields (at any
    // nesting depth); assign fresh physical names/ids to added ones.
    // The id seed self-heals against the schema's actual max id — a
    // stale persisted maxColumnId must not collide a new id with an
    // existing field (reference schema_evolution.rs:764-783,
    // delta-spark findMaxColumnId)
    val (finalSchema, newConfig) =
      if (cmMode == "none") (newSchema, snap.metadata.configuration)
      else {
        val seed = math.max(
          snap.metadata.configuration
            .get(ColumnMapping.MAX_ID_KEY).map(_.toLong).getOrElse(0L),
          ColumnMapping.maxAssignedId(snap.schema))
        val (annotated, maxId) =
          ColumnMapping.reconcile(snap.schema, newSchema, seed)
        (annotated, snap.metadata.configuration +
          (ColumnMapping.MAX_ID_KEY -> maxId.toString))
      }
    val meta = snap.metadata.copy(
      schemaString = GeoTypes.toSchemaString(finalSchema),
      configuration = newConfig)
    // widening requires typeWidening; a geo column arriving via evolution
    // (e.g. a mergeSchema append of a field read from another geo table)
    // requires 'geospatial' in BOTH feature lists — committing the schema
    // without it would leave every later snapshot load failing validation
    val featureAdds =
      (if (widens && !snap.protocol.writerFeatures
          .exists(_.contains("typeWidening"))) Seq("typeWidening") else Nil) ++
      (if (GeoTypes.containsGeo(finalSchema) &&
          !snap.protocol.readerFeatures.exists(_.contains(GeoTypes.FEATURE)))
        Seq(GeoTypes.FEATURE) else Nil)
    // a default arriving via ALTER declares the writer-only
    // allowColumnDefaults feature at the same commit
    val writerOnlyAdds =
      if (finalSchema.json.contains(WriteValidation.DEFAULT_KEY) &&
          !TableFeatures.supportsWriterFeature(
            snap.protocol, "allowColumnDefaults"))
        Seq("allowColumnDefaults")
      else Nil
    val newProto = if (featureAdds.isEmpty && writerOnlyAdds.isEmpty) None
      else Some(TableFeatures.upgraded(snap.protocol, featureAdds,
        featureAdds ++ writerOnlyAdds))
    val protoLine = newProto.map(p =>
      JsonLog.writeAction(SingleAction(protocol = Some(p)))).toSeq
    val lines = Seq(
      commitInfoLine("ALTER TABLE", Map(
        "operation" -> "CHANGE SCHEMA",
        "added" -> schemaDiff.added.map(_.name).mkString(","),
        "changed" -> schemaDiff.changed.map(_._1.name).mkString(",")),
        ictFor(snap))) ++ protoLine ++ Seq(
      JsonLog.writeAction(SingleAction(metaData = Some(meta))))
    val committed = commitActions(snap.version + 1, lines, retryable = false)
    maybeWriteChecksum(committed, Nil, Nil, newMeta = Some(meta),
      newProto = newProto)
    maybeAutoCheckpoint(committed, meta)
    committed
  }

  /** ALTER TABLE ADD COLUMN (nullable — required for old files). */
  def addColumn(name: String, dataType: DataType): Long =
    addColumn(Seq(name), dataType)

  /** ADD COLUMN at a nested path: `Seq("a", "b")` adds field `b`
    * inside struct column `a` (old files read it as NULL). Every
    * intermediate path step must be an existing struct — or a struct
    * nested directly under arrays/maps, matching Spark's
    * `element`/`value`-free ADD COLUMN path addressing (reference
    * schema_evolution.rs modify_field_at_path: descending through a
    * non-struct is an error, never a silent no-op).
    */
  def addColumn(path: Seq[String], dataType: DataType): Long =
    addColumn(path, dataType, None)

  /** ADD COLUMN ... FIRST / AFTER — a column-mapping-free, metadata-only
    * reorder (schema POSITION is logical; reads resolve by name/id).
    * `position` None appends at the end of its struct.
    */
  def addColumn(path: Seq[String], dataType: DataType,
      position: Option[DeltaTable.ColumnPosition]): Long = {
    require(path.nonEmpty, "empty column path")
    val snap = snapshot()
    def place(fields: Array[StructField],
        nf: StructField): Array[StructField] = position match {
      case None => fields :+ nf
      case Some(DeltaTable.First) => nf +: fields
      case Some(DeltaTable.After(ref)) =>
        val i = fields.indexWhere(_.name == ref)
        require(i >= 0,
          s"cannot add '${path.mkString(".")}' AFTER '$ref': no such " +
            "sibling column")
        (fields.take(i + 1) :+ nf) ++ fields.drop(i + 1)
    }
    def insert(s: StructType, p: Seq[String]): StructType = p match {
      case Seq(leaf) =>
        require(!s.fieldNames.contains(leaf),
          s"column '${path.mkString(".")}' already exists")
        StructType(place(s.fields,
          StructField(leaf, dataType, nullable = true)))
      case step +: rest =>
        val i = s.fieldNames.indexOf(step)
        require(i >= 0, s"no struct column '$step'")
        def descend(dt: DataType): DataType = dt match {
          case inner: StructType => insert(inner, rest)
          case a: ArrayType => a.copy(elementType = descend(a.elementType))
          case m: MapType => m.copy(valueType = descend(m.valueType))
          case other => throw new IllegalArgumentException(
            s"cannot add '${path.mkString(".")}': '$step' is " +
              s"${other.simpleString}, not a struct")
        }
        val f = s.fields(i)
        StructType(s.fields.updated(i,
          f.copy(dataType = descend(f.dataType))))
    }
    alterSchema(insert(snap.schema, path))
  }

  /** ALTER COLUMN DROP NOT NULL (loosening; SET NOT NULL refuses — old
    * files cannot retroactively prove non-nullness).
    */
  def setColumnNullable(path: Seq[String], nullable: Boolean): Long = {
    require(path.nonEmpty, "empty column path")
    require(nullable,
      s"cannot SET NOT NULL on '${path.mkString(".")}': existing rows " +
        "cannot be proven non-null (drop and re-add, or rewrite)")
    val snap = snapshot()
    def patch(s: StructType, p: Seq[String]): StructType = {
      val i = s.fieldNames.indexOf(p.head)
      require(i >= 0, s"no column '${p.head}'")
      val f = s.fields(i)
      if (p.tail.isEmpty)
        StructType(s.fields.updated(i, f.copy(nullable = true)))
      else {
        def descend(dt: DataType): DataType = dt match {
          case inner: StructType => patch(inner, p.tail)
          case a: ArrayType => a.copy(elementType = descend(a.elementType))
          case m: MapType => m.copy(valueType = descend(m.valueType))
          case other => throw new IllegalArgumentException(
            s"cannot alter '${path.mkString(".")}': '${p.head}' is " +
              s"${other.simpleString}, not a struct")
        }
        StructType(s.fields.updated(i,
          f.copy(dataType = descend(f.dataType))))
      }
    }
    alterSchema(patch(snap.schema, path))
  }

  /** ALTER COLUMN SET DEFAULT sql / DROP DEFAULT (None). The default
    * is stored in the field's `CURRENT_DEFAULT` metadata (delta +
    * Spark's shared contract); writes that omit the column fill it at
    * stage time (WriteValidation.prepare). Setting one declares the
    * writer-only allowColumnDefaults feature.
    */
  def setColumnDefault(path: Seq[String], default: Option[String]): Long = {
    require(path.nonEmpty, "empty column path")
    val snap = snapshot()
    default.foreach { d =>
      // the expression must be constant-foldable NOW — a default that
      // fails to evaluate would brick every later write
      try spark.sql(s"SELECT $d").collect()
      catch { case e: Exception =>
        throw new IllegalArgumentException(
          s"invalid DEFAULT expression '$d': ${e.getMessage}")
      }
    }
    def patch(s: StructType, p: Seq[String]): StructType = {
      val i = s.fieldNames.indexOf(p.head)
      require(i >= 0, s"no column '${p.head}'")
      val f = s.fields(i)
      if (p.tail.isEmpty) {
        require(!f.metadata.contains(WriteValidation.GENERATION_KEY),
          s"'${p.head}' is a generated column — it cannot also carry " +
            "a default")
        // only CURRENT_DEFAULT (future writes). EXISTS_DEFAULT is
        // fixed at column-add time — setting it here would make rows
        // in files that PREDATE the column retroactively read the new
        // default instead of NULL (Spark's reader fills absent
        // columns from EXISTS_DEFAULT)
        val mb = new MetadataBuilder().withMetadata(f.metadata)
        default match {
          case Some(d) => mb.putString(WriteValidation.DEFAULT_KEY, d)
          case None => mb.remove(WriteValidation.DEFAULT_KEY)
        }
        StructType(s.fields.updated(i, f.copy(metadata = mb.build())))
      } else {
        def descend(dt: DataType): DataType = dt match {
          case inner: StructType => patch(inner, p.tail)
          case a: ArrayType => a.copy(elementType = descend(a.elementType))
          case m: MapType => m.copy(valueType = descend(m.valueType))
          case other => throw new IllegalArgumentException(
            s"cannot alter '${path.mkString(".")}': '${p.head}' is " +
              s"${other.simpleString}, not a struct")
        }
        StructType(s.fields.updated(i,
          f.copy(dataType = descend(f.dataType))))
      }
    }
    alterSchema(patch(snap.schema, path))
  }

  /** ALTER TABLE ALTER COLUMN TYPE (widening only). */
  def widenColumn(name: String, to: DataType): Long =
    widenColumn(Seq(name), to)

  /** Widen a column at a nested path (same addressing as
    * [[addColumn(path:Seq[String]*]]).
    */
  def widenColumn(path: Seq[String], to: DataType): Long = {
    require(path.nonEmpty, "empty column path")
    val snap = snapshot()
    def patch(s: StructType, p: Seq[String]): StructType = {
      val i = s.fieldNames.indexOf(p.head)
      require(i >= 0, s"no column '${p.head}'")
      val f = s.fields(i)
      def descend(dt: DataType): DataType = dt match {
        case inner: StructType => patch(inner, p.tail)
        case a: ArrayType => a.copy(elementType = descend(a.elementType))
        case m: MapType => m.copy(valueType = descend(m.valueType))
        case other => throw new IllegalArgumentException(
          s"cannot widen '${path.mkString(".")}': '${p.head}' is " +
            s"${other.simpleString}, not a struct")
      }
      StructType(s.fields.updated(i, f.copy(dataType =
        if (p.tail.isEmpty) to else descend(f.dataType))))
    }
    alterSchema(patch(snap.schema, path))
  }

  /** ALTER TABLE RENAME COLUMN (reference
    * kernel/src/table_features/column_mapping.rs:28-35 — physical names
    * decouple the logical schema from data files, which is exactly what
    * makes a rename metadata-only). The field keeps its column-mapping
    * id and physical name, so existing parquet — and stats JSON keyed by
    * physical name — keep serving the renamed column. Requires column
    * mapping mode `name` or `id`. A renamed top-level partition column
    * updates its LOGICAL name in `partitionColumns`; add-file
    * `partitionValues` stay keyed by the unchanged physical name.
    */
  def renameColumn(path: Seq[String], newName: String): Long = {
    require(path.nonEmpty, "empty column path")
    val snap = snapshot()
    writerGate(snap, mutating = false)
    require(ColumnMapping.mode(snap.metadata) != "none",
      "RENAME COLUMN requires column mapping (set " +
        s"'${ColumnMapping.MODE_KEY}' to 'name' or 'id' first)")
    rejectIfReferenced(snap, path, "rename")
    def rec(s: StructType, p: Seq[String]): StructType = {
      val i = s.fieldNames.indexOf(p.head)
      require(i >= 0, s"no column '${p.head}'")
      val f = s.fields(i)
      if (p.tail.isEmpty) {
        require(!s.fields.exists(x =>
            (x ne f) && x.name.equalsIgnoreCase(newName)),
          s"column '$newName' already exists")
        StructType(s.fields.updated(i, f.copy(name = newName)))
      } else {
        def descend(dt: DataType): DataType = dt match {
          case inner: StructType => rec(inner, p.tail)
          case a: ArrayType => a.copy(elementType = descend(a.elementType))
          case m: MapType => m.copy(valueType = descend(m.valueType))
          case other => throw new IllegalArgumentException(
            s"cannot rename '${path.mkString(".")}': '${p.head}' is " +
              s"${other.simpleString}, not a struct")
        }
        StructType(s.fields.updated(i,
          f.copy(dataType = descend(f.dataType))))
      }
    }
    val finalSchema = rec(snap.schema, path)
    val newPartCols =
      if (path.length == 1)
        snap.partitionColumns.map(c => if (c == path.head) newName else c)
      else snap.partitionColumns
    val oldDotted = path.mkString(".")
    val newDotted = (path.init :+ newName).mkString(".")
    val newConfig = statsColumnsEdit(snap.metadata.configuration) { entry =>
      if (entry == oldDotted) Some(newDotted)
      else if (entry.startsWith(oldDotted + "."))
        Some(newDotted + entry.stripPrefix(oldDotted))
      else Some(entry)
    }
    commitSchemaOnly(snap, finalSchema, newPartCols, newConfig,
      Map("operation" -> "RENAME COLUMN",
        "from" -> oldDotted, "to" -> newDotted))
  }

  /** ALTER TABLE DROP COLUMN — metadata-only: the physical column stays
    * in existing parquet but vanishes from the logical schema. A later
    * `addColumn` with the SAME logical name gets a FRESH column-mapping
    * id + physical name (alterSchema reconcile), so dropped data never
    * resurfaces. Requires column mapping; partition / clustering
    * columns and the last field of a struct refuse.
    */
  def dropColumn(path: Seq[String]): Long = {
    require(path.nonEmpty, "empty column path")
    val snap = snapshot()
    writerGate(snap, mutating = false)
    require(ColumnMapping.mode(snap.metadata) != "none",
      "DROP COLUMN requires column mapping (set " +
        s"'${ColumnMapping.MODE_KEY}' to 'name' or 'id' first)")
    require(!(path.length == 1 && snap.partitionColumns.contains(path.head)),
      s"cannot drop partition column '${path.head}'")
    rejectIfReferenced(snap, path, "drop")
    val physPath = physicalPathOf(snap.schema, path)
    require(!Clustering.physicalColumns(snap).contains(physPath),
      s"cannot drop clustering column '${path.mkString(".")}' — " +
        "re-cluster without it first")
    def rec(s: StructType, p: Seq[String]): StructType = {
      val i = s.fieldNames.indexOf(p.head)
      require(i >= 0, s"no column '${p.head}'")
      if (p.tail.isEmpty) {
        require(s.fields.length > 1,
          s"cannot drop '${path.mkString(".")}': a struct must keep " +
            "at least one column")
        StructType(s.fields.patch(i, Nil, 1))
      } else {
        val f = s.fields(i)
        def descend(dt: DataType): DataType = dt match {
          case inner: StructType => rec(inner, p.tail)
          case a: ArrayType => a.copy(elementType = descend(a.elementType))
          case m: MapType => m.copy(valueType = descend(m.valueType))
          case other => throw new IllegalArgumentException(
            s"cannot drop '${path.mkString(".")}': '${p.head}' is " +
              s"${other.simpleString}, not a struct")
        }
        StructType(s.fields.updated(i,
          f.copy(dataType = descend(f.dataType))))
      }
    }
    val finalSchema = rec(snap.schema, path)
    val dotted = path.mkString(".")
    val newConfig = statsColumnsEdit(snap.metadata.configuration) { entry =>
      if (entry == dotted || entry.startsWith(dotted + ".")) None
      else Some(entry)
    }
    commitSchemaOnly(snap, finalSchema, snap.partitionColumns, newConfig,
      Map("operation" -> "DROP COLUMNS", "columns" -> dotted))
  }

  /** Refuse rename/drop of a column referenced by a CHECK constraint or
    * another column's generation expression — the stored SQL text would
    * silently break (delta-spark parity). Conservative word-boundary
    * match on the TOP-LEVEL name.
    */
  private def rejectIfReferenced(snap: Snapshot, path: Seq[String],
      op: String): Unit = {
    val word = java.util.regex.Pattern
      .compile("(?i)\\b" + java.util.regex.Pattern.quote(path.head) + "\\b")
    snap.metadata.configuration.foreach { case (k, sql) =>
      if (k.startsWith(WriteValidation.CONSTRAINT_PREFIX) &&
          word.matcher(sql).find())
        throw new IllegalArgumentException(
          s"cannot $op column '${path.mkString(".")}': referenced by " +
            s"CHECK constraint ${k.stripPrefix(
              WriteValidation.CONSTRAINT_PREFIX)} ($sql) — drop the " +
            "constraint first")
    }
    snap.schema.fields.foreach { f =>
      if (f.metadata.contains(WriteValidation.GENERATION_KEY) &&
          f.name != path.head &&
          word.matcher(
            f.metadata.getString(WriteValidation.GENERATION_KEY)).find())
        throw new IllegalArgumentException(
          s"cannot $op column '${path.mkString(".")}': referenced by " +
            s"generation expression of '${f.name}'")
    }
  }

  /** Physical path of a (possibly nested) logical column. */
  private def physicalPathOf(schema: StructType,
      path: Seq[String]): Seq[String] = {
    var cur: DataType = schema
    path.map { step =>
      cur match {
        case st: StructType =>
          val f = st.fields.find(_.name == step).getOrElse(
            throw new IllegalArgumentException(s"no column '$step'"))
          cur = f.dataType
          ColumnMapping.physicalName(f)
        case other => throw new IllegalArgumentException(
          s"'$step' addresses into ${other.simpleString}, not a struct")
      }
    }
  }

  /** Map each `delta.dataSkippingStatsColumns` entry through `f`
    * (None = remove); the key disappears when the list empties.
    */
  private def statsColumnsEdit(config: Map[String, String])(
      f: String => Option[String]): Map[String, String] =
    config.get(ParquetFooterStats.STATS_COLUMNS_KEY) match {
      case None => config
      case Some(list) =>
        val edited = list.split(",").map(_.trim).filter(_.nonEmpty)
          .flatMap(e => f(e))
        if (edited.isEmpty) config - ParquetFooterStats.STATS_COLUMNS_KEY
        else config + (ParquetFooterStats.STATS_COLUMNS_KEY ->
          edited.mkString(","))
    }

  /** Metadata-only schema commit shared by RENAME/DROP COLUMN. No
    * SchemaEvolution.validate here — these are explicit non-additive
    * DDL whose legality the callers establish, and they preserve
    * column-mapping annotations by construction (fields are copied,
    * never re-annotated).
    */
  private def commitSchemaOnly(snap: Snapshot, finalSchema: StructType,
      partCols: Seq[String], config: Map[String, String],
      params: Map[String, String]): Long = {
    val meta = snap.metadata.copy(
      schemaString = GeoTypes.toSchemaString(finalSchema),
      partitionColumns = partCols,
      configuration = config)
    val lines = Seq(
      commitInfoLine("ALTER TABLE", params, ictFor(snap)),
      JsonLog.writeAction(SingleAction(metaData = Some(meta))))
    val committed = commitActions(snap.version + 1, lines,
      retryable = false)
    maybeWriteChecksum(committed, Nil, Nil, newMeta = Some(meta))
    maybeAutoCheckpoint(committed, meta)
    committed
  }

  /** ALTER TABLE SET TBLPROPERTIES (metadata-only commit). Enabling
    * in-commit timestamps mid-log additionally records the enablement
    * version + timestamp (reference history_manager — time travel needs
    * the boundary: commits below it order by file mtime, commits at or
    * above it by ICT) and stamps the enabling commit itself with an
    * ICT, per protocol.
    */
  def setProperties(props: Map[String, String],
      operation: String = "SET TBLPROPERTIES"): Long = {
    val snap = snapshot()
    def ictOn(c: Map[String, String]) =
      c.get(DeltaTable.ICT_ENABLED_KEY).exists(_.equalsIgnoreCase("true"))
    val enablingIct =
      ictOn(props) && !ictOn(snap.metadata.configuration)
    val v = snap.version + 1
    val ict =
      if (enablingIct) Some(math.max(now(),
        commitIct(snap.version).getOrElse(0L) + 1))
      else ictFor(snap)
    val enablementProps =
      if (enablingIct) Map(
        DeltaTable.ICT_ENABLEMENT_VERSION_KEY -> v.toString,
        DeltaTable.ICT_ENABLEMENT_TIMESTAMP_KEY -> ict.get.toString)
      else Map.empty[String, String]
    // enabling row tracking fixes the materialized column names at the
    // SAME commit (they must exist before any rewrite materializes ids)
    val enablingRt = props.get(RowTracking.ENABLED_KEY)
        .exists(_.equalsIgnoreCase("true")) &&
      !RowTracking.enabled(snap.metadata)
    val enablingDv = props.get("delta.enableDeletionVectors")
        .exists(_.equalsIgnoreCase("true")) &&
      !FeatureRequirements.isSupported(snap.protocol, "deletionVectors")
    val rtProps =
      if (enablingRt && !snap.metadata.configuration.contains(
          RowTracking.MAT_ROW_ID_KEY))
        RowTracking.freshMaterializedNames()
      else Map.empty[String, String]
    val meta = snap.metadata.copy(
      configuration = snap.metadata.configuration ++ props ++
        enablementProps ++ rtProps)
    // `delta.feature.<name>=supported` declares a feature on ALTER just
    // as it does on CREATE (delta-spark's convention)
    val explicitFeatures = props.collect {
      case (k, v) if k.startsWith("delta.feature.") &&
          v.equalsIgnoreCase("supported") =>
        k.stripPrefix("delta.feature.")
    }.toSeq.filterNot(TableFeatures.supportsWriterFeature(snap.protocol, _))
    val featureAdds =
      (if (enablingIct && !snap.protocol.writerFeatures
          .exists(_.contains("inCommitTimestamp")))
        Seq("inCommitTimestamp") else Nil) ++
      (if (enablingRt && !TableFeatures.supportsWriterFeature(
          snap.protocol, "rowTracking"))
        Seq("rowTracking", "domainMetadata") else Nil) ++
      (if (props.keys.exists(_.startsWith(WriteValidation.CONSTRAINT_PREFIX))
          && !TableFeatures.supportsWriterFeature(
            snap.protocol, "checkConstraints"))
        Seq("checkConstraints") else Nil) ++
      (if (enablingDv) Seq("deletionVectors") else Nil) ++
      explicitFeatures
    val readerAdds =
      (if (enablingDv) Seq("deletionVectors") else Nil) ++
      explicitFeatures.filter(TableFeatures.readerWriterFeatures.contains)
    val newProto =
      if (featureAdds.nonEmpty)
        Some(TableFeatures.upgraded(snap.protocol, readerAdds,
          featureAdds ++ readerAdds))
      else None
    // an ALTER whose resulting configuration enables a feature with
    // unmet dependencies must fail HERE — committing it would brick
    // every subsequent read at the snapshot gate
    FeatureRequirements.validateEnabled(newProto.getOrElse(snap.protocol),
      meta)
    val protoLine = newProto.map(p =>
      JsonLog.writeAction(SingleAction(protocol = Some(p)))).toSeq
    val lines = Seq(
      commitInfoLine("ALTER TABLE", Map("operation" -> operation),
        ict)) ++ protoLine ++ Seq(
      JsonLog.writeAction(SingleAction(metaData = Some(meta))))
    val committed = commitActions(v, lines, retryable = false)
    maybeWriteChecksum(committed, Nil, Nil, newMeta = Some(meta),
      newProto = newProto)
    maybeAutoCheckpoint(committed, meta)
    committed
  }

  /** ALTER TABLE UNSET TBLPROPERTIES: metadata-only commit removing
    * configuration keys (delta-spark parity: unknown keys are a no-op
    * with ifExists, the protocol never downgrades). The resulting
    * configuration must still satisfy feature dependencies — e.g.
    * unsetting a property a declared feature requires fails here, not
    * at the next read.
    */
  def unsetProperties(keys: Seq[String],
      operation: String = "UNSET TBLPROPERTIES"): Long = {
    val snap = snapshot()
    // structural keys whose removal silently corrupts the table:
    // materialized row-id names (ids would re-derive differently after
    // rewrites), the ICT enablement boundary (timestamp time travel
    // mis-orders), column-mapping mode/id HWM (reads lose physical
    // resolution; fresh ids could collide)
    val protectedKeys = Set(
      RowTracking.MAT_ROW_ID_KEY, RowTracking.MAT_RCV_KEY,
      DeltaTable.ICT_ENABLEMENT_VERSION_KEY,
      DeltaTable.ICT_ENABLEMENT_TIMESTAMP_KEY,
      ColumnMapping.MODE_KEY, ColumnMapping.MAX_ID_KEY)
    keys.filter(protectedKeys).foreach(k =>
      throw new IllegalArgumentException(
        s"cannot unset '$k': internal table-structure property"))
    val present = keys.filter(snap.metadata.configuration.contains)
    if (present.isEmpty) return snap.version
    val meta = snap.metadata.copy(
      configuration = snap.metadata.configuration -- present)
    FeatureRequirements.validateEnabled(snap.protocol, meta)
    val lines = Seq(
      commitInfoLine("ALTER TABLE",
        Map("operation" -> operation,
          "properties" -> present.mkString(",")), ictFor(snap)),
      JsonLog.writeAction(SingleAction(metaData = Some(meta))))
    val committed = commitActions(snap.version + 1, lines,
      retryable = false)
    maybeWriteChecksum(committed, Nil, Nil, newMeta = Some(meta))
    maybeAutoCheckpoint(committed, meta)
    committed
  }

  /** ALTER TABLE ADD CONSTRAINT name CHECK (sql) — delta-spark
    * semantics: the name lowercases into `delta.constraints.<name>`,
    * EXISTING rows must already satisfy the predicate (a distributed
    * violations probe that stops at the first offending row — at
    * 100 TB this is one short-circuited scan, never a collect), and
    * the commit auto-enables the checkConstraints writer feature.
    */
  def addCheckConstraint(name: String, predicateSql: String,
      preValidated: Boolean = false): Long = {
    val snap = snapshot()
    val key = WriteValidation.CONSTRAINT_PREFIX + name.toLowerCase
    require(!snap.metadata.configuration.contains(key),
      s"constraint '${name.toLowerCase}' already exists")
    // `preValidated` skips the probe when the caller already scanned
    // (Spark's analyzer validates enforced CHECKs before the catalog's
    // alterTable runs — a second full scan per DDL would double the
    // cost on a large table)
    if (!preValidated) {
      val probe = toDF.filter(
        not(coalesce(expr(predicateSql), lit(false))))
      val violation = probe.select(snap.schema.fieldNames.map(col)
        .toIndexedSeq: _*).limit(1).collect()
      if (violation.nonEmpty)
        throw new IllegalArgumentException(
          s"cannot add CHECK constraint '$name' ($predicateSql): " +
            s"existing row violates it: ${violation.head}")
    }
    setProperties(Map(key -> predicateSql), operation = "ADD CONSTRAINT")
  }

  /** ALTER TABLE DROP CONSTRAINT name: removes the stored predicate;
    * the checkConstraints feature stays declared (protocol never
    * downgrades on drop, delta-spark parity).
    */
  def dropCheckConstraint(name: String, ifExists: Boolean = false): Long = {
    val snap = snapshot()
    val key = WriteValidation.CONSTRAINT_PREFIX + name.toLowerCase
    if (!snap.metadata.configuration.contains(key)) {
      if (ifExists) return snap.version
      throw new IllegalArgumentException(
        s"no such constraint '${name.toLowerCase}' — existing: " +
          snap.metadata.configuration.keys
            .filter(_.startsWith(WriteValidation.CONSTRAINT_PREFIX))
            .map(_.stripPrefix(WriteValidation.CONSTRAINT_PREFIX))
            .mkString(", "))
    }
    unsetProperties(Seq(key), operation = "DROP CONSTRAINT")
  }

  // ---------------- checkpoint ----------------

  /** Write a classic single-file V1 checkpoint at the current version
    * (or at `version`) + `_last_checkpoint` hint (reference
    * kernel/src/checkpoint/mod.rs, action reconciliation in
    * action_reconciliation/log_replay.rs).
    */
  def checkpoint(version: Option[Long] = None): Long = {
    val snap = snapshot(version)
    val v = snap.version
    // delta.checkpointPolicy=v2: every checkpoint this table writes is
    // V2-format (the policy is a table contract, not a per-call choice)
    if (TableProperties.checkpointPolicy(snap.metadata) == "v2") {
      require(version.forall(_ == snapshot().version),
        "checkpointPolicy=v2 checkpoints only the latest version")
      return checkpointV2()
    }
    val state = checkpointState(snap)
    state.persist()
    val size = state.count() // known before writing; no re-read after
    // Route large states to protocol-standard V1 MULTIPART parts
    // automatically: a single-file checkpoint caps every future
    // replay's read parallelism at its row-group count (a 1M-add
    // state is ~200 MB ⇒ 2 row groups ⇒ a 32-core replay running on
    // 2). Parts of ~100k actions keep the checkpoint arm
    // embarrassingly parallel at any scale.
    if (size > 2L * CHECKPOINT_ACTIONS_PER_PART) {
      val n = math.ceil(size.toDouble / CHECKPOINT_ACTIONS_PER_PART).toInt
      writeClassicCheckpointParts(state, v, n, size)
    } else {
      val tmp = new Path(logDir, s".ckpt-tmp-${UUID.randomUUID()}")
      state.coalesce(1).write.mode("overwrite")
        .option("parquet.block.size", CHECKPOINT_ROW_GROUP_BYTES)
        .parquet(tmp.toString)
      val part = Storage.listFilesRecursive(fs, tmp)
        .filter(_.getPath.getName.endsWith(".parquet")).head
      val dest = FileNames.classicCheckpointFile(logDir, v)
      if (fs.exists(dest)) fs.delete(dest, false)
      fs.rename(part.getPath, dest)
      fs.delete(tmp, true)
      Storage.put(fs, new Path(logDir, FileNames.LAST_CHECKPOINT),
        s"""{"version":$v,"size":$size}""")
      Metrics.report(MetricEvent.IoBytes(Metrics.newId(),
        "checkpoint_write", 1L, part.getLen))
    }
    // the state already holds every live add — re-seed the .crc chain
    // with EXACT totals + file-size histogram (recovers a chain broken
    // by a missing/histogram-less crc); one 95-row aggregate
    try {
      val binB = FileSizeHistogram.DefaultBinBoundaries
      val binOf = udf((s: Long) => FileSizeHistogram.empty.binOf(s))
      val rows = state.filter(col("add").isNotNull)
        .select(col("add.size").as("sz"))
        .groupBy(binOf(col("sz")).as("bin"))
        .agg(count(lit(1)).as("n"), sum(col("sz")).as("bytes"))
        .collect()
      val fc = new Array[Long](binB.length)
      val tb = new Array[Long](binB.length)
      rows.foreach { r =>
        fc(r.getAs[Int]("bin")) = r.getAs[Long]("n")
        tb(r.getAs[Int]("bin")) = r.getAs[Long]("bytes")
      }
      Checksum.write(fs, logDir, v, Checksum.VersionChecksum(
        tb.sum, fc.sum, snap.protocol, snap.metadata,
        Some(FileSizeHistogram(binB, fc, tb))))
    } catch { case _: Exception => () }
    state.unpersist()
    // log files the new checkpoint supersedes expire after the
    // retention window (delta's operational behavior on checkpoint;
    // best-effort — failures never fail the checkpoint). Catalog-managed
    // logs are the catalog's to garbage-collect, never touched here.
    if (!committer.isCatalogCommitter &&
        !snap.metadata.configuration.get("delta.enableExpiredLogCleanup")
          .exists(_.equalsIgnoreCase("false")))
      try cleanupExpiredLogs(v, snap.metadata)
      catch { case e: Exception =>
        org.slf4j.LoggerFactory.getLogger(getClass)
          .warn(s"expired-log cleanup after checkpoint failed: $e") }
    v
  }

  /** Delete log files strictly below `ckptVersion` whose modification
    * time fell past `delta.logRetentionDuration` (default 30 days) —
    * they are fully covered by the checkpoint, and keeping them forever
    * grows `_delta_log` without bound (10⁶ commits = 10⁶ driver-listed
    * objects at snapshot time; the listing, not the data, becomes the
    * scale ceiling). Time travel below the horizon is the documented
    * trade. V2 sidecar files are left alone: orphans are inert, and a
    * manifest may be shared by a checkpoint that survives.
    */
  private def cleanupExpiredLogs(ckptVersion: Long,
      m: graft.delta.Metadata): Unit = {
    val retention = m.configuration.get("delta.logRetentionDuration")
      .flatMap(intervalMillis).getOrElse(30L * 86400000)
    val cutoff = now() - retention
    val crcRe = raw"(\d{20})\.crc".r
    Storage.listSorted(fs, logDir).foreach { st =>
      val deletable = FileNames.parse(st.getPath) match {
        case Some(FileNames.CommitFile(ver, _)) => ver < ckptVersion
        case Some(FileNames.CheckpointFile(ver, _, _, _, _)) =>
          ver < ckptVersion
        case Some(FileNames.CompactedFile(_, hi, _)) => hi < ckptVersion
        case None => st.getPath.getName match {
          case crcRe(ver) => ver.toLong < ckptVersion
          case _ => false
        }
      }
      if (deletable && st.getModificationTime < cutoff)
        fs.delete(st.getPath, false)
    }
  }

  /** Post-commit hook: when `delta.checkpointInterval` is set (> 0),
    * checkpoint every Nth version automatically (then expire old log
    * files, see [[checkpoint]]). Best-effort like auto-compact: the
    * triggering commit already succeeded, so nothing here may throw.
    * The reference keeps checkpointing an explicit API; the interval
    * property opts a long-lived table into delta's operational
    * behavior, without which replay cost grows without bound.
    */
  private def maybeAutoCheckpoint(v: Long,
      m: graft.delta.Metadata): Unit = {
    val interval = m.configuration.get("delta.checkpointInterval")
      .flatMap(s => scala.util.Try(s.trim.toInt).toOption).getOrElse(0)
    if (interval <= 0 || v <= 0 || v % interval != 0) return
    try checkpoint(Some(v))
    catch { case e: Exception =>
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn(s"auto-checkpoint at version $v failed (best-effort): $e")
    }
  }

  /** Parse delta's `interval N (hours|days|weeks|...)` duration form. */
  private def intervalMillis(s: String): Option[Long] =
    TableProperties.parseInterval(s)

  /** `delta.deletedFileRetentionDuration` in millis (default 1 week). */
  private def tombstoneRetentionMillis(m: graft.delta.Metadata): Long =
    m.configuration.get("delta.deletedFileRetentionDuration")
      .flatMap(intervalMillis).getOrElse(7L * 24 * 3600 * 1000)

  /** Reconciled checkpoint state: live adds + UNEXPIRED remove
    * tombstones + P&M + txns (reference
    * action_reconciliation/log_replay.rs — tombstones older than the
    * retention window are dropped; the files they reference are vacuum
    * candidates that no reader may rely on).
    */
  private def checkpointState(snap: Snapshot): DataFrame = {
    val cutoff = now() - tombstoneRetentionMillis(snap.metadata)
    // a tombstone with no deletionTimestamp counts as 0 = expired
    // (reference action reconciliation; keeping them forever would grow
    // checkpoints without bound on logs from engines omitting the field)
    val fileActions = snap.latestActions
      .filter(col("add").isNotNull ||
        coalesce(col("remove.deletionTimestamp"), lit(0L)) >= cutoff)
      .select(
        lit(null).cast(LogSchema.txn).as("txn"),
        col("add"),
        col("remove"),
        lit(null).cast(LogSchema.metaData).as("metaData"),
        lit(null).cast(LogSchema.protocol).as("protocol"),
        lit(null).cast(LogSchema.domainMetadata).as("domainMetadata"))
    import scala.jdk.CollectionConverters._
    // delta.setTransactionRetentionDuration: expired txn idempotency
    // markers drop out at reconciliation (reference
    // SetTransaction::is_expired, actions/mod.rs:1055-1068 — a None
    // lastUpdated or no configured retention never expires)
    val txnCutoff = TableProperties
      .setTransactionRetentionMillis(snap.metadata).map(now() - _)
    val liveTxns = snap.setTransactions.filterNot(t =>
      txnCutoff.exists(c => t.lastUpdated.exists(_ <= c)))
    val pmRows: Seq[org.apache.spark.sql.Row] = Seq(
      org.apache.spark.sql.Row(null, null, null, null,
        protocolRow(snap.protocol), null),
      org.apache.spark.sql.Row(null, null, null,
        metadataRow(snap.metadata), null, null)) ++
      liveTxns.map(t => org.apache.spark.sql.Row(
        org.apache.spark.sql.Row(t.appId, t.version,
          t.lastUpdated.map(Long.box).orNull), null, null, null, null, null)) ++
      snap.domainMetadatas.map(d => org.apache.spark.sql.Row(
        null, null, null, null, null,
        org.apache.spark.sql.Row(d.domain, d.configuration, d.removed)))
    val pmDF = spark.createDataFrame(pmRows.asJava, LogSchema.checkpoint)
    withCheckpointStatsShape(pmDF.unionByName(fileActions), snap)
  }

  /** Apply the table's checkpoint stats contract
    * (delta.checkpoint.writeStatsAsJson / writeStatsAsStruct): extend
    * `add` with the typed `stats_parsed` struct, and/or strip the JSON
    * `stats` string. Disabling both would leave readers statless (no
    * skipping, no numRecords) — refused.
    */
  private def withCheckpointStatsShape(state: DataFrame,
      snap: Snapshot): DataFrame = {
    val asJson = TableProperties.writeStatsAsJson(snap.metadata)
    val asStruct = TableProperties.writeStatsAsStruct(snap.metadata)
    require(asJson || asStruct,
      s"${TableProperties.WRITE_STATS_AS_JSON}=false requires " +
        s"${TableProperties.WRITE_STATS_AS_STRUCT}=true — a checkpoint " +
        "with neither stats form strips skipping stats and numRecords")
    if (asJson && !asStruct) return state // default shape
    val withStruct =
      if (!asStruct) state
      else {
        val s1 = state.withColumn("add",
          col("add").withField("stats_parsed",
            from_json(col("add.stats"), snap.statsParsedSchema)))
        // struct-stats checkpoints also carry the TYPED partition
        // tuple (reference checkpoint_transform.rs:104-116 —
        // `partitionValues_parsed` reconstructs via MAP_TO_STRUCT),
        // under physical names like stats_parsed; readers without the
        // column are unaffected, readers with it skip re-parsing the
        // protocol's partition-value string rules per file
        val parts = snap.partitionColumns
        if (parts.isEmpty) s1
        else {
          val fields = parts.map { c =>
            val f = snap.schema.fields.find(_.name == c).get
            val phys = ColumnMapping.physicalName(f)
            PartitionValues.castExpr("add.partitionValues", phys,
              f.dataType).as(phys)
          }
          s1.withColumn("add", col("add")
            .withField("partitionValues_parsed", struct(fields: _*)))
        }
      }
    if (asJson) withStruct
    else withStruct.withColumn("add", col("add").dropFields("stats"))
  }

  /** Multi-part V1 checkpoint: the state is split across `numParts`
    * files named `v.checkpoint.<part>.<parts>.parquet` (readers union
    * all parts — the scale path for huge file sets).
    */
  def checkpointMultipart(numParts: Int): Long = {
    require(numParts >= 1, "numParts must be positive")
    val snap = snapshot()
    val v = snap.version
    val state = checkpointState(snap)
    state.persist()
    val size = state.count()
    writeClassicCheckpointParts(state, v, numParts, size)
    state.unpersist()
    v
  }

  /** Write a classic checkpoint as `numParts` V1 multipart files
    * (`v.checkpoint.<i>.<n>.parquet`) and point `_last_checkpoint` at
    * them. Small parquet row groups keep each part split-friendly on
    * the read side.
    */
  private def writeClassicCheckpointParts(state: DataFrame, v: Long,
      numParts: Int, size: Long): Unit = {
    val tmp = new Path(logDir, s".ckpt-tmp-${UUID.randomUUID()}")
    state.repartition(numParts).write.mode("overwrite")
      .option("parquet.block.size", CHECKPOINT_ROW_GROUP_BYTES)
      .parquet(tmp.toString)
    val parts = Storage.listFilesRecursive(fs, tmp)
      .filter(_.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
    parts.zipWithIndex.foreach { case (st, i) =>
      val dest = new Path(logDir,
        f"$v%020d.checkpoint.${i + 1}%010d.${parts.size}%010d.parquet")
      if (fs.exists(dest)) fs.delete(dest, false)
      fs.rename(st.getPath, dest)
    }
    fs.delete(tmp, true)
    Storage.put(fs, new Path(logDir, FileNames.LAST_CHECKPOINT),
      s"""{"version":$v,"size":$size,"parts":${parts.size}}""")
    Metrics.report(MetricEvent.IoBytes(Metrics.newId(),
      "checkpoint_write", parts.size.toLong, parts.map(_.getLen).sum))
  }

  /** V2 checkpoint (reference kernel/src/checkpoint/mod.rs V2 shape +
    * actions/mod.rs:1251): file actions go to `_delta_log/_sidecars/`
    * parquet files; the top-level `v.checkpoint.<uuid>.parquet` holds
    * P&M, txns, `checkpointMetadata` and the sidecar refs. With
    * `numSidecars = 0` the file actions are inlined in the top-level
    * file.
    */
  def checkpointV2(numSidecars: Int = 2): Long = {
    // V2 checkpoints require the v2Checkpoint table feature — upgrade
    // the protocol (preserving implied legacy features) on first use
    val pre = snapshot()
    if (!pre.protocol.readerFeatures.exists(_.contains("v2Checkpoint"))) {
      val up = TableFeatures.upgraded(pre.protocol,
        Seq("v2Checkpoint"), Seq("v2Checkpoint"))
      val uv = commitActions(pre.version + 1, Seq(
        commitInfoLine("UPGRADE PROTOCOL", Map.empty),
        JsonLog.writeAction(SingleAction(protocol = Some(up)))),
        retryable = false)
      maybeWriteChecksum(uv, Nil, Nil, newProto = Some(up))
    }
    val snap = snapshot()
    val v = snap.version
    val uuid = UUID.randomUUID().toString

    val fileActions = snap.latestActions.select(col("add"), col("remove"))
    fileActions.persist()
    val nFiles = fileActions.count()
    // stats contract (writeStatsAsJson/writeStatsAsStruct) applies to
    // the file actions wherever they land — sidecars or inline
    val shapedActions = withCheckpointStatsShape(fileActions, snap)

    val sidecars: Seq[Sidecar] =
      if (numSidecars <= 0) Nil
      else {
        val scDir = new Path(logDir, "_sidecars")
        val tmp = new Path(scDir, s".sc-tmp-$uuid")
        shapedActions.repartition(numSidecars).write
          .mode("overwrite").parquet(tmp.toString)
        val parts = Storage.listFilesRecursive(fs, tmp)
          .filter(_.getPath.getName.endsWith(".parquet"))
          .sortBy(_.getPath.getName)
        val out = parts.zipWithIndex.map { case (st, i) =>
          val name = s"$uuid-$i.parquet"
          val dest = new Path(scDir, name)
          if (fs.exists(dest)) fs.delete(dest, false)
          fs.rename(st.getPath, dest)
          val fst = fs.getFileStatus(dest)
          Sidecar(name, fst.getLen, fst.getModificationTime)
        }
        fs.delete(tmp, true)
        out
      }

    // top-level: P&M + txns + checkpointMetadata + sidecar refs
    // (+ file actions inline when there are no sidecars)
    import scala.jdk.CollectionConverters._
    def topRow(txn: org.apache.spark.sql.Row, add: org.apache.spark.sql.Row,
        remove: org.apache.spark.sql.Row, meta: org.apache.spark.sql.Row,
        proto: org.apache.spark.sql.Row, dm: org.apache.spark.sql.Row,
        sc: org.apache.spark.sql.Row,
        cm: org.apache.spark.sql.Row): org.apache.spark.sql.Row =
      org.apache.spark.sql.Row(txn, add, remove, meta, proto, dm, sc, cm)
    val headRows: Seq[org.apache.spark.sql.Row] = Seq(
      topRow(null, null, null, null, protocolRow(snap.protocol), null, null,
        null),
      topRow(null, null, null, metadataRow(snap.metadata), null, null, null,
        null),
      topRow(null, null, null, null, null, null, null,
        org.apache.spark.sql.Row(v, null))) ++
      snap.setTransactions.map(t => topRow(
        org.apache.spark.sql.Row(t.appId, t.version,
          t.lastUpdated.map(Long.box).orNull),
        null, null, null, null, null, null, null)) ++
      // domain metadata (e.g. the delta.rowTracking high-water mark) must
      // survive a V2 checkpoint: post-checkpoint snapshots only replay
      // later commits, so dropping it here would silently reassign
      // baseRowIds from 0 on the next append
      snap.domainMetadatas.map(d => topRow(null, null, null, null, null,
        org.apache.spark.sql.Row(d.domain, d.configuration, d.removed),
        null, null)) ++
      sidecars.map(sc => topRow(null, null, null, null, null, null,
        org.apache.spark.sql.Row(sc.path, sc.sizeInBytes,
          sc.modificationTime, null), null))
    val headDF = spark.createDataFrame(headRows.asJava, LogSchema.v2Checkpoint)
    val topDF =
      // allowMissingColumns: the head rows' all-null add column may
      // lack the shaped stats_parsed field (or still carry stats when
      // the shape dropped it) — nulls fill either direction
      if (sidecars.nonEmpty) headDF
      else headDF.unionByName(shapedActions.select(
        lit(null).cast(LogSchema.txn).as("txn"),
        col("add"), col("remove"),
        lit(null).cast(LogSchema.metaData).as("metaData"),
        lit(null).cast(LogSchema.protocol).as("protocol"),
        lit(null).cast(LogSchema.domainMetadata).as("domainMetadata"),
        lit(null).cast(LogSchema.sidecar).as("sidecar"),
        lit(null).cast(LogSchema.checkpointMetadata).as("checkpointMetadata")),
        allowMissingColumns = true)
    val tmp = new Path(logDir, s".ckpt-tmp-$uuid")
    topDF.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    fileActions.unpersist()
    val part = Storage.listFilesRecursive(fs, tmp)
      .filter(_.getPath.getName.endsWith(".parquet")).head
    val dest = new Path(logDir, f"$v%020d.checkpoint.$uuid.parquet")
    if (fs.exists(dest)) fs.delete(dest, false)
    fs.rename(part.getPath, dest)
    fs.delete(tmp, true)
    // Enriched hint (reference last_checkpoint_hint.rs #2777): embed
    // the v2Checkpoint identity + sidecar refs + non-file actions so
    // readers can skip opening the top-level checkpoint file entirely.
    // Oversized lists are OMITTED whole (the read side would drop them
    // anyway) — the hint stays bounded no matter the table.
    val destSt = fs.getFileStatus(dest)
    val scJson =
      if (sidecars.size > 30) None
      else Some(sidecars.map(JsonLog.writeSidecar).mkString(
        "\"sidecarFiles\":[", ",", "],"))
    val nfa = Seq(
      s"""{"protocol":${JsonLog.writeProtocol(snap.protocol)}}""",
      s"""{"metaData":${JsonLog.writeMetadata(snap.metadata)}}""",
      s"""{"checkpointMetadata":{"version":$v}}""") ++
      snap.setTransactions.map(t =>
        s"""{"txn":${JsonLog.writeTxn(t)}}""") ++
      snap.domainMetadatas.map(d =>
        s"""{"domainMetadata":${JsonLog.writeDomainMetadata(d)}}""")
    val nfaJson =
      if (nfa.size > 30) None
      else Some(nfa.mkString("\"nonFileActions\":[", ",", "],"))
    val v2Obj =
      s"""{${scJson.getOrElse("")}${nfaJson.getOrElse("")}""" +
        s""""path":"${dest.getName}","sizeInBytes":${destSt.getLen},""" +
        s""""modificationTime":${destSt.getModificationTime}}"""
    Storage.put(fs, new Path(logDir, FileNames.LAST_CHECKPOINT),
      s"""{"version":$v,"size":${nFiles + headRows.size},""" +
        s""""sizeInBytes":${destSt.getLen},"v2Checkpoint":$v2Obj}""")
    Metrics.report(MetricEvent.IoBytes(Metrics.newId(),
      "checkpoint_write", 1L + sidecars.size,
      destSt.getLen + sidecars.map(_.sizeInBytes).sum))
    v
  }

  /** RESTORE TABLE TO VERSION: one commit re-adding the target
    * version's file set and tombstoning everything newer — pure log
    * arithmetic, no data movement (files must still exist, i.e. not
    * vacuumed). Also restores the target's metadata when it differs.
    */
  def restore(version: Long): Long = {
    val snap = snapshot()
    require(version <= snap.version,
      s"cannot restore to future version $version (latest ${snap.version})")
    if (version == snap.version) return snap.version
    writerGate(snap, mutating = true)
    val target = snapshot(Some(version))
    def key(a: AddFile) = Storage.canonicalPathKey(a.path) + "@" +
      a.deletionVector.map(_.uniqueId).getOrElse("")
    // current files only become TOMBSTONES — slim; the target's adds
    // re-enter the log verbatim, so only THAT side carries stats.
    // Contract reason the wanted side stays FULL (audited r13): every
    // collected add becomes a re-add JSON line of this commit, stats
    // included — the driver-side list IS the commit payload, so its
    // size is bounded by the commit being written, not by waste;
    // streaming it would need an iterator-shaped commit writer.
    val current = new DeltaScan(snap, None).collectAddFiles(slim = true)
      .map(a => key(a) -> a).toMap
    val wanted = new DeltaScan(target, None).collectAddFiles()
      .map(a => key(a) -> a).toMap
    val removes = (current.keySet -- wanted.keySet).toSeq.sorted.map { k =>
      val a = current(k)
      RemoveFile(a.path, Some(now()), dataChange = true,
        extendedFileMetadata = Some(true),
        partitionValues = Some(a.partitionValues), size = Some(a.size),
        deletionVector = a.deletionVector)
    }
    val adds = (wanted.keySet -- current.keySet).toSeq.sorted
      .map(k => wanted(k).copy(dataChange = true))
    val metaLine =
      if (target.metadata.schemaString == snap.metadata.schemaString &&
          target.metadata.configuration == snap.metadata.configuration) Nil
      else Seq(JsonLog.writeAction(SingleAction(metaData =
        Some(target.metadata))))
    val lines =
      Seq(commitInfoLine("RESTORE", Map("version" -> version.toString),
        ictFor(snap))) ++ metaLine ++
      removes.map(r => JsonLog.writeAction(SingleAction(remove = Some(r)))) ++
      adds.map(a => JsonLog.writeAction(SingleAction(add = Some(a))))
    val committed = commitActions(snap.version + 1, lines, retryable = false)
    maybeWriteChecksum(committed, adds.map(_.size),
      removes.map(_.size.getOrElse(0L)),
      newMeta = if (metaLine.nonEmpty) Some(target.metadata) else None)
    maybeAutoCheckpoint(committed,
      if (metaLine.nonEmpty) target.metadata else snap.metadata)
    committed
  }

  /** SHALLOW CLONE: a new table at `targetPath` whose version-0 commit
    * re-adds THIS snapshot's live files by absolute URI — zero bytes
    * copied, reads served straight from the source's data files
    * (delta-spark's CREATE TABLE ... SHALLOW CLONE; the protocol's
    * absolute-path add form). Relative-UUID deletion vectors are
    * re-addressed as absolute ('p') descriptors so they keep resolving
    * from the clone. Protocol, schema, table configuration, and domain
    * metadata (clustering, row-tracking marks) carry over; the clone
    * then evolves independently — its DML lands under its own root,
    * and vacuum only lists the clone's directory, so the source's
    * files are structurally out of reach.
    */
  def cloneShallow(targetPath: String): Long = {
    val snap = snapshot()
    require(!DeltaTable.isDeltaTable(spark, targetPath),
      s"clone target is already a delta table: $targetPath")
    val srcRootQ = fs.makeQualified(root)
    val srcUri = srcRootQ.toUri.toString.stripSuffix("/")
    // full collect by contract (audited r13): every add here becomes a
    // re-add line of the clone's version-0 commit, stats preserved —
    // the list is the commit payload itself (same reason as RESTORE)
    val adds = new DeltaScan(snap, None).collectAddFiles().map { a =>
      val dv = a.deletionVector.map { d =>
        d.storageType match {
          case "u" =>
            val rel = DeletionVectors.relativePath(
              "u", d.pathOrInlineDv, "").get
            d.copy(storageType = "p",
              pathOrInlineDv = new Path(srcRootQ, rel).toString)
          case _ => d // "p" is already absolute; "i" is inline bytes
        }
      }
      // a source that is ITSELF a shallow clone already carries
      // absolute-URI paths — prefixing those again would produce an
      // unreadable 'file:/tgt/file:/orig/...' second-generation clone
      val abs = if (Storage.isAbsoluteUri(Storage.decodeUriPath(a.path)))
        a.path else srcUri + "/" + a.path
      a.copy(path = abs, deletionVector = dv, dataChange = true)
    }
    val targetRoot = new Path(targetPath)
    val tfs = Storage.fs(targetRoot, spark.sessionState.newHadoopConf())
    val ts = System.currentTimeMillis()
    val ictOn = snap.metadata.configuration
      .get(DeltaTable.ICT_ENABLED_KEY).exists(_.equalsIgnoreCase("true"))
    val meta = snap.metadata.copy(id = UUID.randomUUID().toString,
      createdTime = Some(ts))
    val lines = Seq(
      JsonLog.writeAction(SingleAction(commitInfo = Some(CommitInfo(
        ts, "CLONE",
        Map("source" -> pathStr, "sourceVersion" -> snap.version.toString),
        Some("graft-spark/0.1.0"),
        inCommitTimestamp = if (ictOn) Some(ts) else None)))),
      JsonLog.writeAction(SingleAction(protocol = Some(snap.protocol))),
      JsonLog.writeAction(SingleAction(metaData = Some(meta)))) ++
      snap.domainMetadatas.filterNot(_.removed).map(d =>
        JsonLog.writeAction(SingleAction(domainMetadata = Some(d)))) ++
      adds.map(a => JsonLog.writeAction(SingleAction(add = Some(a))))
    tfs.mkdirs(FileNames.logDir(targetRoot))
    require(Storage.putIfAbsent(tfs,
      FileNames.commitFile(FileNames.logDir(targetRoot), 0L),
      lines.mkString("", "\n", "\n")),
      s"clone target log already exists: $targetPath")
    0L
  }

  // ---------------- vacuum ----------------

  /** Delete data files no longer referenced by the current snapshot
    * whose tombstones are older than the retention window (the
    * operation vacuumProtocolCheck gates; file set reasoning follows
    * the checkpoint tombstone-retention contract). Never touches
    * `_delta_log`. Returns the deleted (or would-be deleted, with
    * `dryRun = true`) table-relative paths.
    *
    * Scale: gated on the same [[Snapshot.smallState]] threshold as the
    * scan handoff. Small tables compare the recursive listing against
    * the live set as Scala sets on the driver (one listing, no jobs).
    * Past the gate, EVERYTHING fans out: the live set stays a
    * DataFrame, the table listing distributes one subtree per task,
    * dead files fall out of an anti-join, and the deletes run on
    * executors — the driver never holds the file list of a 100 TB
    * table. `graft.vacuum.forceDistributed=1` forces the wide arm
    * (spec hook, mirroring `graft.tree.smallHandoffEntries`).
    */
  def vacuum(dryRun: Boolean = false): Seq[String] = {
    val snap = snapshot()
    val retention = tombstoneRetentionMillis(snap.metadata)
    val cutoff = now() - retention
    val rootUri = fs.makeQualified(root).toUri.getPath
    val forceWide = sys.props.get("graft.vacuum.forceDistributed")
      .exists(_ == "1")
    if (snap.smallState && !forceWide)
      vacuumDriver(snap, cutoff, rootUri, dryRun)
    else vacuumDistributed(snap, cutoff, rootUri, dryRun)
  }

  private def vacuumDriver(snap: Snapshot, cutoff: Long,
      rootUri: String, dryRun: Boolean): Seq[String] = {
    def rel(p: Path): String =
      p.toUri.getPath.stripPrefix(rootUri).stripPrefix("/")

    // live = every file the current snapshot reads (data + DV files);
    // DV paths resolve through the SAME prefix logic as the reader
    // (DeletionVectors.relativePath) — a live DV written with a random
    // prefix must never look dead
    val live: Set[String] = {
      val adds = new DeltaScan(snap, None).collectAddFiles(slim = true)
      adds.map(a => Storage.decodeUriPath(a.path)).toSet ++
        adds.flatMap(_.deletionVector).flatMap(dv =>
          DeletionVectors.relativePath(
            dv.storageType, dv.pathOrInlineDv, rootUri))
    }

    // recently removed files stay until their tombstones expire — and so
    // do their DV files (CDF readers within retention resolve them);
    // a missing deletionTimestamp counts as 0 = already expired
    // (reference action reconciliation treats absent as 0)
    val protectedTombstones: Set[String] = snap.latestActions
      .filter(col("remove").isNotNull &&
        coalesce(col("remove.deletionTimestamp"), lit(0L)) >= cutoff)
      .select(col("remove.path"),
        col("remove.deletionVector.storageType"),
        col("remove.deletionVector.pathOrInlineDv")).collect()
      .flatMap { r =>
        Seq(Storage.decodeUriPath(r.getString(0))) ++
          (if (r.isNullAt(1)) Nil
           else DeletionVectors.relativePath(
             r.getString(1), r.getString(2), rootUri))
      }.toSet

    val candidates = Storage.listFilesRecursive(fs, root)
      .filter { st =>
        val r = rel(st.getPath)
        !r.startsWith(FileNames.LOG_DIR) &&
          !st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith(".") &&
          st.getModificationTime < cutoff &&
          !live.contains(r) && !protectedTombstones.contains(r)
      }
      .map(st => (rel(st.getPath), st.getPath, st.getLen))

    if (!dryRun) {
      candidates.foreach { case (_, p, _) => fs.delete(p, false) }
      // reclaimed bytes — the gauge that says whether vacuums keep up
      // with write amplification
      Metrics.report(MetricEvent.IoBytes(Metrics.newId(),
        "vacuum_delete", candidates.size.toLong,
        candidates.map(_._3).sum))
    }
    candidates.map(_._1)
  }

  /** The wide vacuum arm — semantics identical to [[vacuumDriver]],
    * every O(#files) step distributed. Live-artifact derivation (data
    * path + DV path per add) runs as a narrow flatMap over the slim
    * add columns; the listing parallelizes one top-level subtree per
    * task; dead = candidates ANTI-JOIN keep-set (a shuffle join — the
    * two biggest frames never meet the driver); deletes run
    * per-partition with executor-local FS clients (idempotent:
    * a retried task re-deleting a gone file is a no-op). Only the
    * deleted REL PATHS collect — the API's return value, O(deleted).
    */
  private def vacuumDistributed(snap: Snapshot, cutoff: Long,
      rootUri: String, dryRun: Boolean): Seq[String] = {
    import spark.implicits._
    def artifactPaths(df: DataFrame) =
      df.select(col("path"), col("storageType"), col("pathOrInlineDv"))
        .as[(String, String, String)]
        .flatMap { case (p, st, pd) =>
          Seq(Storage.decodeUriPath(p)) ++
            (if (st == null) Nil
             else DeletionVectors.relativePath(st, pd, rootUri))
        }
    val live = artifactPaths(new DeltaScan(snap, None).filesDF.select(
      col("add.path").as("path"),
      col("add.deletionVector.storageType").as("storageType"),
      col("add.deletionVector.pathOrInlineDv").as("pathOrInlineDv")))
    val protectedTombstones = artifactPaths(snap.latestActions
      .filter(col("remove").isNotNull &&
        coalesce(col("remove.deletionTimestamp"), lit(0L)) >= cutoff)
      .select(col("remove.path").as("path"),
        col("remove.deletionVector.storageType").as("storageType"),
        col("remove.deletionVector.pathOrInlineDv")
          .as("pathOrInlineDv")))
    val keep = live.union(protectedTombstones).toDF("rel")

    // the driver lists ONE level; tasks walk their subtrees with
    // executor-local FS clients. `_delta_log` itself is never walked;
    // any other hidden path still filters per-file, exactly as the
    // driver arm does.
    val top = Storage.fs(root, hconf).listStatus(root).toSeq
    val (topDirs, topFiles) = top.partition(_.isDirectory)
    val subdirs = topDirs.map(_.getPath)
      .filterNot(_.getName == FileNames.LOG_DIR).map(_.toString)
    val bconf = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(hconf))
    val fromDirs =
      if (subdirs.isEmpty)
        spark.emptyDataset[(String, String, Long, Long)]
      else spark.sparkContext
        .parallelize(subdirs, math.min(subdirs.size, 256))
        .mapPartitions { it =>
          val conf = bconf.value.value
          it.flatMap { d =>
            val p = new Path(d)
            Storage.listFilesRecursive(p.getFileSystem(conf), p)
              .map(st => (st.getPath.toString,
                st.getPath.toUri.getPath, st.getModificationTime,
                st.getLen))
          }
        }.toDS()
    val fromTop = topFiles.map(st => (st.getPath.toString,
      st.getPath.toUri.getPath, st.getModificationTime, st.getLen))
    val candidates = fromDirs
      .union(spark.createDataset(fromTop))
      .map { case (abs, uriPath, mtime, len) =>
        (abs, uriPath.stripPrefix(rootUri).stripPrefix("/"), mtime,
          len) }
      .filter { case (_, r, mtime, _) =>
        val name = r.substring(r.lastIndexOf('/') + 1)
        !r.startsWith(FileNames.LOG_DIR) && !name.startsWith("_") &&
          !name.startsWith(".") && mtime < cutoff
      }.toDF("abs", "rel", "mtime", "len")

    val dead = candidates.join(keep, Seq("rel"), "left_anti")
      .select(col("abs"), col("rel"), col("len"))
      .as[(String, String, Long)]
    val out =
      if (dryRun) dead.map(_._2).collect().toSeq
      else {
        val deleted = dead.mapPartitions { it =>
          val conf = bconf.value.value
          it.map { case (abs, r, len) =>
            val p = new Path(abs)
            p.getFileSystem(conf).delete(p, false)
            (r, len)
          }
        }.collect().toSeq
        Metrics.report(MetricEvent.IoBytes(Metrics.newId(),
          "vacuum_delete", deleted.size.toLong,
          deleted.map(_._2).sum))
        deleted.map(_._1)
      }
    bconf.destroy()
    out
  }

  /** FSCK REPAIR TABLE (delta-spark parity): tombstone live add entries
    * whose data files are MISSING from storage (manually deleted,
    * external-cleaner casualties) so every later read stops failing
    * with FILE_NOT_EXIST. `dryRun` lists the missing paths without
    * committing. Scale mirrors vacuum's gate: small tables probe
    * against one driver listing; past [[Snapshot.smallState]] (or
    * `graft.fsck.forceDistributed=1`) the live adds stay a DataFrame,
    * the listing distributes, and missing artifacts fall out of an
    * anti-join — only the BROKEN adds (the commit's own payload,
    * O(missing)) ever reach the driver. The repair commit carries
    * plain removes (dataChange=true): downstream CDF/streaming
    * readers crossing it see row-level deletes they cannot re-read
    * (the bytes are gone) — delta-spark's FSCK has the same boundary.
    */
  def fsckRepair(dryRun: Boolean = false): Seq[String] = {
    val snap = snapshot()
    if (!dryRun) writerGate(snap, mutating = true)
    val rootUri = fs.makeQualified(root).toUri.getPath
    val forceWide = sys.props.get("graft.fsck.forceDistributed")
      .exists(_ == "1")
    val missing: Seq[AddFile] =
      if (snap.smallState && !forceWide) fsckMissingDriver(snap, rootUri)
      else fsckMissingDistributed(snap, rootUri)
    if (dryRun || missing.isEmpty) return missing.map(_.path)
    val removes = missing.map { a =>
      RemoveFile(a.path, Some(now()), dataChange = true,
        extendedFileMetadata = Some(true),
        partitionValues = Some(a.partitionValues), size = Some(a.size),
        deletionVector = a.deletionVector)
    }
    val committed = commitActions(snap.version + 1,
      cv => commitInfoLine("FSCK",
        Map("numRemovedFiles" -> missing.size.toString),
        ictAt(snap, cv - 1)) +:
        removes.map(r =>
          JsonLog.writeAction(SingleAction(remove = Some(r)))),
      retryable = false, Nil,
      // maintenance conflict shape: a concurrent APPEND's new files
      // exist by construction (never "missing"), so it commutes;
      // remove/remove overlap (someone else tombstoned the same file)
      // still conflicts
      Some(DeltaTable.ReadSet(snap, None,
        missing.map(a => Storage.canonicalPathKey(a.path)).toSet,
        maintenance = true)))
    maybeWriteChecksum(committed, Nil,
      missing.map(_.size))
    maybeAutoCheckpoint(committed, snap.metadata)
    missing.map(_.path)
  }

  private def fsckMissingDriver(snap: Snapshot,
      rootUri: String): Seq[AddFile] = {
    // slim: fsck needs path/partitionValues/size/deletionVector only —
    // never stats JSON (gigabytes at millions of files)
    val adds = new DeltaScan(snap, None).collectAddFiles(slim = true)
    // ONE recursive listing answers existence for everything under the
    // table root (vacuum's approach — per-file exists() would be
    // O(files) SERIAL round trips on an object store); only
    // absolute-URI adds outside the root (a shallow clone's source
    // files, rare by construction) fall back to per-file probes
    val present: Set[String] = Storage.listFilesRecursive(fs, root)
      .map(st => fs.makeQualified(st.getPath).toUri.getPath).toSet
    // under-root needs a path-SEGMENT boundary (root `/data/t` must not
    // claim `/data/t2/x.parquet`): a sibling dir whose name extends the
    // root would otherwise be judged against the root-only listing and
    // live files tombstoned
    val rootPrefix = rootUri.stripSuffix("/") + "/"
    def gone(p: Path): Boolean = {
      val pfs = Storage.fs(p, hconf)
      val q = pfs.makeQualified(p).toUri.getPath
      if (q == rootUri || q.startsWith(rootPrefix)) !present(q)
      else !pfs.exists(p)
    }
    // a live add is broken when its DATA file is gone OR its
    // deletion-vector FILE is gone (the bitmap is unrecoverable, and
    // every scan of the file fails with the same FILE_NOT_EXIST this
    // repair exists to clear) — both repair by tombstoning the add
    adds.filter { a =>
      gone(Storage.childPath(root, Storage.decodeUriPath(a.path))) ||
        a.deletionVector.exists { d =>
          DeletionVectors.relativePath(
              d.storageType, d.pathOrInlineDv, rootUri) match {
            case Some(rel) => gone(Storage.childPath(root, rel))
            case None if d.storageType == "p" =>
              gone(new Path(d.pathOrInlineDv)) // external absolute DV
            case None => false // inline bytes never go missing
          }
        }
    }
  }

  /** The wide fsck arm — same missing-artifact semantics as
    * [[fsckMissingDriver]], O(#files) work distributed. Under-root
    * artifact probes become an anti-join of (add, expected uri)
    * against the distributed listing; only ABSOLUTE-URI artifacts (a
    * shallow clone's source files, external "p" DVs — rare by
    * construction) collect for exact per-file driver probes. The full
    * add rows fetched at the end are exactly the broken ones.
    */
  private def fsckMissingDistributed(snap: Snapshot,
      rootUri: String): Seq[AddFile] = {
    import spark.implicits._
    val rootPrefix = rootUri.stripSuffix("/") + "/"
    val scan = new DeltaScan(snap, None)

    // distributed listing (vacuum's shape); `_delta_log` holds no data
    // or DV artifacts, so it is never walked
    val top = Storage.fs(root, hconf).listStatus(root).toSeq
    val (topDirs, topFiles) = top.partition(_.isDirectory)
    val subdirs = topDirs.map(_.getPath)
      .filterNot(_.getName == FileNames.LOG_DIR).map(_.toString)
    val bconf = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(hconf))
    val fromDirs =
      if (subdirs.isEmpty) spark.emptyDataset[String]
      else spark.sparkContext
        .parallelize(subdirs, math.min(subdirs.size, 256))
        .mapPartitions { it =>
          val conf = bconf.value.value
          it.flatMap { d =>
            val p = new Path(d)
            Storage.listFilesRecursive(p.getFileSystem(conf), p)
              .map(_.getPath.toUri.getPath)
          }
        }.toDS()
    val present = fromDirs
      .union(spark.createDataset(topFiles.map(_.getPath.toUri.getPath)))
      .toDF("uri")

    val slim = scan.filesDF.select(col("add.path").as("path"),
      col("add.deletionVector.storageType").as("st"),
      col("add.deletionVector.pathOrInlineDv").as("pd"))
    // (add path, expected artifact uri) rows for every UNDER-ROOT
    // artifact; DV paths anchor at the table root regardless of where
    // the data file lives
    val probes = slim.as[(String, String, String)].flatMap {
      case (p, st, pd) =>
        val dec = Storage.decodeUriPath(p)
        val data =
          if (Storage.isAbsoluteUri(dec) || dec.startsWith("/")) Nil
          else Seq((p, rootPrefix + dec))
        val dv =
          if (st == null) Nil
          else DeletionVectors.relativePath(st, pd, rootUri)
            .map(rel => (p, rootPrefix + rel)).toSeq
        data ++ dv
    }.toDF("path", "uri")
    val missingKeys = probes.join(present, Seq("uri"), "left_anti")
      .select(col("path")).distinct()
    val missingRel = scan.filesDF
      .join(missingKeys, col("add.path") === missingKeys("path"),
        "left_semi")
      .select(col("add.*")).collect().map(RowCodec.rowToAdd).toSeq

    // absolute-URI data paths and external "p" DVs: exact per-file
    // probes on the driver (over-collection is safe — the probe is
    // exact; these rows are rare by construction)
    val decPath = Storage.decodeUriPathCol(col("add.path"))
    val pdStripped = regexp_replace(
      col("add.deletionVector.pathOrInlineDv"),
      Storage.URI_PREFIX_REGEX, "")
    val absCond =
      decPath.rlike("^[a-zA-Z][a-zA-Z0-9+.\\-]*:") ||
      decPath.startsWith("/") ||
      (col("add.deletionVector.storageType") === "p" &&
        !pdStripped.startsWith(rootPrefix))
    val absolutes = scan.filesDF.filter(absCond)
      .select(col("add.*")).collect().map(RowCodec.rowToAdd).toSeq
    def goneExact(p: Path): Boolean = !Storage.fs(p, hconf).exists(p)
    val absMissing = absolutes.filter { a =>
      goneExact(Storage.childPath(root, Storage.decodeUriPath(a.path))) ||
        a.deletionVector.exists { d =>
          DeletionVectors.relativePath(
              d.storageType, d.pathOrInlineDv, rootUri) match {
            case Some(rel) => goneExact(Storage.childPath(root, rel))
            case None if d.storageType == "p" =>
              goneExact(new Path(d.pathOrInlineDv))
            case None => false
          }
        }
    }
    bconf.destroy()
    (missingRel ++ absMissing).map(a => a.path -> a).toMap.values.toSeq
  }

  // ---------------- log compaction ----------------

  /** Write `lo.hi.compacted.json` — the range's actions reduced to their
    * newest-wins survivors (reference kernel/src/log_compaction/
    * writer.rs:140): latest P&M if present in range, latest txn per
    * appId, and the latest file action per (path, dvId) including remove
    * tombstones. Readers substitute it for the commit run.
    */
  def compactLog(lo: Long, hi: Long): Long = {
    require(lo <= hi, s"invalid compaction range [$lo, $hi]")
    var protocol: Option[String] = None
    var metadata: Option[String] = None
    val txns = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val seen = scala.collection.mutable.HashSet.empty[String]
    val fileLines = scala.collection.mutable.ArrayBuffer.empty[String]
    (hi to lo by -1).foreach { v =>
      val p = FileNames.commitFile(logDir, v)
      require(fs.exists(p), s"missing commit $v for compaction")
      Storage.readLines(fs, p).filter(_.nonEmpty).foreach { line =>
        val n = JsonLog.parseLine(line)
        def has(f: String) = n.get(f) != null && !n.get(f).isNull
        if (has("protocol") && protocol.isEmpty) protocol = Some(line)
        else if (has("metaData") && metadata.isEmpty) metadata = Some(line)
        else if (has("txn")) {
          val app = n.get("txn").get("appId").asText
          if (!txns.contains(app)) txns(app) = line
        } else if (has("add") || has("remove")) {
          val side = if (has("add")) "add" else "remove"
          val a = n.get(side)
          val dvId = Option(a.get("deletionVector")).filterNot(_.isNull)
            .map(RowCodec.jsonToDv).map(_.uniqueId).getOrElse("")
          val key = Storage.canonicalPathKey(a.get("path").asText) +
            "@" + dvId
          if (seen.add(key)) fileLines += line
        }
      }
    }
    val lines = protocol.toSeq ++ metadata.toSeq ++ txns.values ++ fileLines
    val dest = new Path(logDir, f"$lo%020d.$hi%020d.compacted.json")
    if (!Storage.putIfAbsent(fs, dest, lines.mkString("", "\n", "\n")))
      throw new IllegalStateException(s"compacted file already exists: $dest")
    hi
  }

  private def protocolRow(p: Protocol): org.apache.spark.sql.Row =
    org.apache.spark.sql.Row(p.minReaderVersion, p.minWriterVersion,
      p.readerFeatures.orNull, p.writerFeatures.orNull)

  private def metadataRow(m: graft.delta.Metadata): org.apache.spark.sql.Row =
    org.apache.spark.sql.Row(m.id, m.name.orNull, m.description.orNull,
      org.apache.spark.sql.Row(m.format.provider, m.format.options),
      m.schemaString, m.partitionColumns, m.configuration,
      m.createdTime.map(Long.box).orNull)

  /** The file-size distribution recorded in the version's `.crc`
    * checksum (reference crc/file_size_histogram.rs) — table layout
    * statistics with zero listing; None when the checksum chain has no
    * histogram at that version (run `checkpoint()` to re-seed).
    */
  def fileSizeHistogram(version: Option[Long] = None)
      : Option[FileSizeHistogram] = {
    val v = version.getOrElse(snapshot().version)
    Checksum.read(fs, logDir, v).flatMap(_.fileSizeHistogram)
  }

  // ---------------- history / time travel ----------------

  /** (version, file-or-in-commit timestamp millis, operation). */
  def history(): Seq[(Long, Long, String)] =
    historyDetail().map { case (v, ts, op, _) => (v, ts, op) }

  /** history() plus the commit's caller-supplied correlation id
    * (#2834) when its commitInfo carries one.
    */
  def historyDetail(): Seq[(Long, Long, String, Option[String])] = {
    Storage.listSorted(fs, logDir).flatMap { st =>
      FileNames.parse(st.getPath) match {
        case Some(FileNames.CommitFile(v, p)) =>
          val op = Storage.readLines(fs, p).iterator
            .map(JsonLog.parseLine)
            .collectFirst {
              case n if n.has("commitInfo") && !n.get("commitInfo").isNull =>
                val ci = n.get("commitInfo")
                val ts = Option(ci.get("inCommitTimestamp"))
                  .filterNot(_.isNull).map(_.asLong)
                  .getOrElse(st.getModificationTime)
                (ts, Option(ci.get("operation")).map(_.asText).getOrElse(""),
                  Option(ci.get("correlationId")).filterNot(_.isNull)
                    .map(_.asText))
            }.getOrElse((st.getModificationTime, "", None))
          Some((v, op._1, op._2, op._3))
        case _ => None
      }
    }
  }

  /** Shared state for every timestamp query (reference
    * history_manager/mod.rs: one listing + ICT-enablement régime feeds
    * latest_version_as_of / first_version_after /
    * timestamp_range_to_versions / get_earliest_commit): the sorted
    * commit files, a lazily-resolved per-index timestamp, and the
    * index of the first ICT commit (commits.size when ICT is off,
    * 0 when ICT-since-creation).
    */
  private final class HistoryIndex {
    val commits: IndexedSeq[(FileNames.CommitFile,
        org.apache.hadoop.fs.FileStatus)] =
      Storage.listSorted(fs, logDir)
        .flatMap(st => FileNames.parse(st.getPath).map(f => (f, st)))
        .collect { case (c: FileNames.CommitFile, st) => (c, st) }
        .sortBy(_._1.version).toIndexedSeq
    if (commits.isEmpty)
      throw new IllegalStateException(s"no delta log found at $pathStr")
    private val tsCache = scala.collection.mutable.HashMap.empty[Int, Long]
    def tsOf(i: Int): Long = tsCache.getOrElseUpdate(i, {
      val (c, st) = commits(i)
      Storage.readLines(fs, c.path).iterator
        .filter(_.contains("\"commitInfo\""))
        .map(JsonLog.parseLine)
        .flatMap(n => Option(n.get("commitInfo")).filterNot(_.isNull))
        .flatMap(ci => Option(ci.get("inCommitTimestamp"))
          .filterNot(_.isNull).map(_.asLong))
        .nextOption()
        .getOrElse(st.getModificationTime)
    })
    private val conf = snapshot().metadata.configuration
    val ictOn: Boolean = conf.get(DeltaTable.ICT_ENABLED_KEY)
      .exists(_.equalsIgnoreCase("true"))
    val enableTs: Option[Long] =
      conf.get(DeltaTable.ICT_ENABLEMENT_TIMESTAMP_KEY).map(_.toLong)
    val boundary: Int =
      if (!ictOn) commits.size
      else conf.get(DeltaTable.ICT_ENABLEMENT_VERSION_KEY).map(_.toLong)
        .map(ev => commits.indexWhere(_._1.version >= ev))
        .filter(_ >= 0).getOrElse(0)
    /** Greatest index with ts <= tsMillis within [lo, hi], or -1. */
    def greatestLower(tsMillis: Long, lo0: Int, hi0: Int): Int = {
      var lo = lo0; var hi = hi0; var ans = -1
      while (lo <= hi) {
        val mid = (lo + hi) / 2
        if (tsOf(mid) <= tsMillis) { ans = mid; lo = mid + 1 }
        else hi = mid - 1
      }
      ans
    }
    /** Least index with ts >= tsMillis within [lo, hi], or -1. */
    def leastUpper(tsMillis: Long, lo0: Int, hi0: Int): Int = {
      var lo = lo0; var hi = hi0; var ans = -1
      while (lo <= hi) {
        val mid = (lo + hi) / 2
        if (tsOf(mid) >= tsMillis) { ans = mid; hi = mid - 1 }
        else lo = mid + 1
      }
      ans
    }
  }

  /** Latest version committed at or before `tsMillis` — binary search
    * over the commit files (reference history_manager/mod.rs
    * latest_version_as_of, search.rs:266). When ICT was enabled
    * MID-LOG (`delta.inCommitTimestampEnablementVersion`), the log
    * holds two independently-monotonic timestamp sequences: file
    * mtimes below the enablement version and in-commit timestamps
    * at/above it — one global binary search over both would compare
    * incomparable clocks and can resolve wrong. The enablement
    * timestamp picks which régime to search.
    */
  def versionAtTimestamp(tsMillis: Long): Long =
    versionAtTimestamp(tsMillis, new HistoryIndex)

  private def versionAtTimestamp(tsMillis: Long, h: HistoryIndex): Long = {
    val (lo0, hi0) =
      if (!h.ictOn) (0, h.commits.size - 1)
      else if (h.enableTs.exists(tsMillis < _)) {
        // strictly before the ICT era: search the mtime-ordered prefix
        if (h.boundary == 0)
          throw new IllegalArgumentException(
            s"no version at or before timestamp $tsMillis")
        (0, h.boundary - 1)
      } else (h.boundary, h.commits.size - 1)
    val ans = h.greatestLower(tsMillis, lo0, hi0)
    if (ans < 0)
      throw new IllegalArgumentException(
        s"no version at or before timestamp $tsMillis")
    h.commits(ans)._1.version
  }

  /** First version committed at or after `tsMillis` (reference
    * history_manager/mod.rs first_version_after). Mirrors
    * [[versionAtTimestamp]]'s two-régime ICT handling: a timestamp
    * before the ICT era searches the mtime prefix and, when the whole
    * prefix predates it, resolves to the first ICT commit — the
    * enablement timestamp is by construction >= the query.
    */
  def firstVersionAfter(tsMillis: Long): Long =
    firstVersionAfter(tsMillis, new HistoryIndex)

  private def firstVersionAfter(tsMillis: Long, h: HistoryIndex): Long = {
    val ans =
      if (!h.ictOn) h.leastUpper(tsMillis, 0, h.commits.size - 1)
      else if (h.enableTs.exists(tsMillis < _)) {
        val inPrefix = h.leastUpper(tsMillis, 0, h.boundary - 1)
        if (inPrefix >= 0) inPrefix
        else if (h.boundary < h.commits.size) h.boundary
        else -1
      } else h.leastUpper(tsMillis, h.boundary, h.commits.size - 1)
    if (ans < 0)
      throw new IllegalArgumentException(
        s"no version at or after timestamp $tsMillis")
    h.commits(ans)._1.version
  }

  /** [[firstVersionAfter]], except a timestamp past the whole log
    * resolves to tip+1 derived FROM THE SAME LISTING. Streaming start
    * resolution must not re-list on the fallback path: a commit landing
    * between the search and a second listing would be silently skipped
    * (its timestamp is >= the query, so the stream owes it to the
    * reader).
    */
  def firstVersionAfterOrNext(tsMillis: Long): Long = {
    val h = new HistoryIndex
    try firstVersionAfter(tsMillis, h)
    catch { case _: IllegalArgumentException =>
      h.commits.last._1.version + 1 }
  }

  /** Resolve a CDF/commit-range timestamp window to versions
    * (reference history_manager/mod.rs timestamp_range_to_versions):
    * start maps through first-after, end through latest-as-of; an
    * endless range returns None for the end. A window falling entirely
    * between two commits is empty and rejected, as is start > end.
    */
  def timestampRangeToVersions(startTs: Long,
      endTs: Option[Long]): (Long, Option[Long]) = {
    endTs.foreach(e => require(startTs <= e,
      s"invalid timestamp range: $startTs > $e"))
    // ONE listing + one shared timestamp cache serves both searches —
    // per-call HistoryIndex rebuilds would re-list the log dir and
    // re-read the same commit files on an object store
    val h = new HistoryIndex
    val startV = firstVersionAfter(startTs, h)
    val endV = endTs.map { e =>
      val v = versionAtTimestamp(e, h)
      require(startV <= v,
        s"empty timestamp range: ($startTs, $e) falls between commits")
      v
    }
    (startV, endV)
  }

  /** Earliest listed commit as (version, timestamp) (reference
    * history_manager/mod.rs get_earliest_commit,
    * HistoryCommitType::Published). After log compaction vacuumed
    * early commits this is the history floor — timestamp queries below
    * it throw.
    */
  def earliestCommit(): (Long, Long) = {
    val h = new HistoryIndex
    (h.commits(0)._1.version, h.tsOf(0))
  }

  /** Earliest version whose full table state can be reconstructed:
    * version 0 when its commit survives, else the earliest COMPLETE
    * checkpoint (all parts of a multipart set present) — reference
    * history_manager/mod.rs get_earliest_commit,
    * HistoryCommitType::Recreatable. Throws when commits exist but
    * neither anchor does (a log whose head was vacuumed past every
    * checkpoint is unreadable history).
    */
  def earliestRecreatableVersion(): Long = {
    val entries = Storage.listSorted(fs, logDir)
      .flatMap(st => FileNames.parse(st.getPath))
    if (entries.exists {
      case FileNames.CommitFile(0L, _) => true
      case _ => false
    }) return 0L
    // a version may hold parts from SEVERAL checkpoint attempts (a
    // crashed 2-part write next to a later complete 3-part set), so
    // completeness is judged per numParts-attempt, never across the
    // mixed listing. A V2 checkpoint anchors a version only while its
    // sidecar files still exist — the manifest alone cannot rebuild
    // the file set after an external cleaner took `_sidecars/`.
    val byVersion = entries
      .collect { case c: FileNames.CheckpointFile => c }
      .groupBy(_.version)
    def sidecarsOk(top: FileNames.CheckpointFile): Boolean =
      try Snapshot.readV2TopLevel(spark, logDir, top)
        .sidecarPaths.forall(p => fs.exists(new Path(p)))
      catch { case _: Exception => false }
    def anchors(v: Long): Boolean = {
      val files = byVersion(v)
      val attempts = files.filterNot(_.isV2).groupBy(_.numParts)
      // true V1 multipart attempts never reference sidecars
      val multiOk = attempts.exists { case (n, ps) =>
        n > 1 && ps.map(_.part).toSet.size == n }
      // a classic-NAMED single-part file may still carry V2 content
      // (interop writers emit checkpointMetadata + sidecar refs under
      // the classic name — Snapshot.sniffV2's whole reason to exist);
      // it anchors only while its sidecars survive
      val singleOk = attempts.get(1).exists(_.exists(top =>
        try !Snapshot.sniffV2(spark, top) || sidecarsOk(top)
        catch { case _: Exception => false }))
      multiOk || singleOk || files.filter(_.isV2).exists(sidecarsOk)
    }
    byVersion.keys.toSeq.sorted.find(anchors).getOrElse(
      throw new IllegalStateException(
        s"no recreatable version at $pathStr: commit 0 is gone and no " +
          "complete checkpoint anchors the log"))
  }
}

object DeltaTable {

  /** Reference-counted scoped session-conf overrides. A naive
    * save/set/restore around a write job RACES under concurrent
    * writers on one session: thread B saves thread A's override as
    * "original", A restores the true original mid-B, and B's restore
    * then leaks the override permanently. Writers needing the same
    * value share a refcount; a writer needing a DIFFERENT value for a
    * held key waits its turn. The true original is restored only when
    * the last holder releases. Keyed by (session, key): two sessions
    * sharing this JVM hold independent SQLConfs, so each session's
    * writers must set — and restore — their OWN conf.
    */
  private[delta] object ScopedSessionConf {
    /** One override generation for a key. Layers stack only when the
      * SOLE holder of every live layer re-enters with a different
      * value (nested retarget): waiting there would deadlock on
      * ourselves — the outer scope can't release until the inner
      * returns.
      */
    private final class Layer(var orig: Option[String], val value: String) {
      var n: Int = 0
      val perThread = scala.collection.mutable.Map.empty[Thread, Int]
      def add(t: Thread): Unit = {
        n += 1; perThread(t) = perThread.getOrElse(t, 0) + 1
      }
      def remove(t: Thread): Unit = {
        n -= 1
        val c = perThread(t) - 1
        if (c == 0) perThread.remove(t) else perThread(t) = c
      }
      def soleHolder(t: Thread): Boolean = perThread.getOrElse(t, 0) == n
    }
    /** head = innermost live layer for the key. */
    private val held = scala.collection.mutable.Map
      .empty[(SparkSession, String), List[Layer]]
    def withConfs[T](spark: SparkSession,
        kvsRaw: Seq[(String, String)])(body: => T): T = {
      // a duplicate key would add to its layer twice but release once
      // (joined is keyed by conf key), pinning the layer count >0
      // forever and blocking every later writer on that key
      val kvs = kvsRaw.distinctBy(_._1)
      require(kvs.size == kvsRaw.size,
        s"duplicate conf keys in withConfs: ${kvsRaw.map(_._1)}")
      val me = Thread.currentThread()
      val joined = scala.collection.mutable.Map.empty[String, Layer]
      held.synchronized {
        def blocked(k: String, v: String): Boolean =
          held.get((spark, k)) match {
            case Some(layers @ (top :: _)) =>
              top.value != v && !layers.forall(_.soleHolder(me))
            case _ => false
          }
        while (kvs.exists { case (k, v) => blocked(k, v) }) held.wait()
        kvs.foreach { case (k, v) =>
          val key = (spark, k)
          held.getOrElse(key, Nil) match {
            case top :: _ if top.value == v =>
              top.add(me); joined(k) = top
            case layers => // free, or nested retarget by the sole holder
              val orig = spark.conf.getOption(k)
              spark.conf.set(k, v)
              val l = new Layer(orig, v)
              l.add(me); joined(k) = l
              held(key) = l :: layers
          }
        }
      }
      try body
      finally held.synchronized {
        kvs.foreach { case (k, _) =>
          val key = (spark, k)
          val l = joined(k)
          l.remove(me)
          if (l.n == 0) {
            val layers = held.getOrElse(key, Nil)
            if (layers.headOption.exists(_ eq l)) {
              // innermost layer drained: its saved original (= the
              // value the layer below set, or the true original) is
              // the live value again
              held(key) = layers.tail
              if (held(key).isEmpty) held.remove(key)
              l.orig match {
                case Some(x) => spark.conf.set(k, x)
                case None => spark.conf.unset(k)
              }
            } else {
              // an OUTER layer drained while an inner one is still
              // live (a joiner attached to the stacked inner layer,
              // then the stacker unwound both of its scopes): the conf
              // must stay at the inner value, and this layer's
              // original grafts onto the layer stacked directly above
              // it so the final drain restores the true original
              // instead of this layer's now-dead value
              val idx = layers.indexWhere(_ eq l)
              if (idx > 0) layers(idx - 1).orig = l.orig
              held(key) = layers.filterNot(_ eq l)
              if (held(key).isEmpty) held.remove(key)
            }
          }
          // KNOWN WINDOW (accepted): a stacker unwinding its inner
          // retarget while a joiner still holds that layer resumes its
          // OUTER body under the inner value — restoring would yank the
          // conf from under the joiner, and blocking here can deadlock
          // on legitimate joiner-awaits-stacker patterns. Harmless in
          // practice: every production writer pins a CONSTANT value per
          // key (micros timestamps, shredding=true), so live layers for
          // one key never disagree. A writer that retargets a key must
          // not depend on the outer value between its inner scope's end
          // and its outer scope's end.
        }
        held.notifyAll()
      }
    }
  }

  /** Read footprint of a reads-based (DML) transaction, for commit
    * conflict checks: the snapshot it planned against, the predicate
    * it read under, and the canonical keys of the files it removes.
    */

  /** `maintenance`: the commit is a dataChange=false rewrite of
    * exactly `removedKeys` — concurrent APPENDS are always disjoint
    * (new files are never among those compacted), so the rebase check
    * skips predicate pruning; remove/remove overlap still conflicts.
    */
  case class ReadSet(snap: Snapshot, predicateSql: Option[String],
      removedKeys: Set[String], maintenance: Boolean = false)

  val ICT_ENABLED_KEY = "delta.enableInCommitTimestamps"

  /** ADD COLUMN placement (FIRST / AFTER sibling / append). */
  sealed trait ColumnPosition
  case object First extends ColumnPosition
  final case class After(sibling: String) extends ColumnPosition
  /** Opt-in to shredded variant data files (delta-spark's property;
    * reference table_features/mod.rs:630-645 variantShredding).
    */
  val VARIANT_SHREDDING_KEY = "delta.enableVariantShredding"
  val OPTIMIZE_WRITE_KEY = "delta.autoOptimize.optimizeWrite"
  val AUTO_COMPACT_KEY = "delta.autoOptimize.autoCompact"
  /** partitionBy alias prefix used when partition columns are
    * materialized into data files (IcebergCompat).
    */
  val MAT_PART_PREFIX = "__gpm_"
  /** Fixed file count for clustered writes; unset/0 = AQE-sized. */
  val CLUSTERING_NUM_FILES_KEY = "graft.clustering.numFiles"
  /** Session conf: OPTIMIZE caches its assembled input across the
    * layout's two passes (range sample + shuffled write) when the
    * candidate bytes are at or below this; above it the rewrite
    * streams. Default 32 GiB.
    */
  val OPTIMIZE_CACHE_INPUT_KEY = "graft.optimize.cacheInputMaxBytes"
  val ICT_ENABLEMENT_VERSION_KEY =
    "delta.inCommitTimestampEnablementVersion"
  val ICT_ENABLEMENT_TIMESTAMP_KEY =
    "delta.inCommitTimestampEnablementTimestamp"

  def forPath(spark: SparkSession, path: String): DeltaTable =
    new DeltaTable(spark, path)

  /** Handle to a catalog-managed table: snapshots read through the
    * catalog's log tail, commits stage-and-ratify.
    */
  def forPath(spark: SparkSession, path: String,
      catalog: CatalogClient): DeltaTable =
    new DeltaTable(spark, path, Some(catalog))

  /** Handle whose commits go through a custom [[Committer]] — e.g. an
    * [[ObjectStoreCommitter]] doing conditional puts against an object
    * store instead of filesystem put-if-absent.
    */
  def forPath(spark: SparkSession, path: String,
      committer: Committer): DeltaTable =
    new DeltaTable(spark, path, None, Some(committer))

  def isDeltaTable(spark: SparkSession, path: String): Boolean = {
    val p = FileNames.logDir(new Path(path))
    val fs = Storage.fs(p, spark.sessionState.newHadoopConf())
    fs.exists(p) && Storage.listSorted(fs, p)
      .exists(st => FileNames.parse(st.getPath).isDefined)
  }

  /** CREATE TABLE: commit 0 with protocol + metadata (reference
    * transaction/builder/create_table.rs).
    */
  def create(spark: SparkSession, path: String, schema: StructType,
      partitionColumns: Seq[String] = Nil,
      configuration: Map[String, String] = Map.empty,
      name: Option[String] = None,
      clusterBy: Seq[String] = Nil,
      catalog: Option[CatalogClient] = None,
      correlationId: Option[String] = None): DeltaTable = {
    require(partitionColumns.forall(schema.fieldNames.contains),
      "partition column not in schema")
    // ANSI interval columns may exist in the schema but cannot key the
    // layout: no serialized partition-value form and no ordering stats
    // (reference create_table/interval.rs
    // test_create_table_rejects_interval_clustering)
    partitionColumns.foreach { c =>
      val bad = schema(c).dataType match {
        case _: org.apache.spark.sql.types.YearMonthIntervalType => true
        case _: org.apache.spark.sql.types.DayTimeIntervalType => true
        case org.apache.spark.sql.types.CalendarIntervalType => true
        case _ => false
      }
      require(!bad, s"partition column '$c' has unsupported type " +
        schema(c).dataType.simpleString)
      // WKB payloads have no partition-value string form and no
      // meaningful equality-based layout
      require(!schema(c).metadata.contains(GeoTypes.GEO_KEY),
        s"partition column '$c' has unsupported geospatial type " +
          schema(c).metadata.getString(GeoTypes.GEO_KEY))
    }
    require(clusterBy.forall(schema.fieldNames.contains),
      "clustering column not in schema")
    require(clusterBy.intersect(partitionColumns).isEmpty,
      "a column cannot be both a partition and a clustering column")
    clusterBy.foreach { c =>
      require(DataSkipping.isEligible(schema(c).dataType),
        s"clustering column '$c' has no min/max stats " +
          s"(${schema(c).dataType.simpleString}) — clustering would " +
          "never help skipping")
    }
    val t = new DeltaTable(spark, path, catalog,
      committerOverride = None,
      correlationId = correlationId.filter(_.nonEmpty))
    // catalog-managed tables REQUIRE in-commit timestamps (reference
    // table_features CATALOG_MANAGED_INFO feature dependency — file
    // mtimes of staged commits are meaningless to readers)
    val configuration0 =
      if (catalog.isDefined) configuration + (ICT_ENABLED_KEY -> "true")
      else configuration
    // column mapping: annotate physical names/ids at CREATE (reference
    // transaction/builder/create_table.rs column mapping assignment)
    val cmMode = configuration0.getOrElse(ColumnMapping.MODE_KEY, "none")
    require(ColumnMapping.SUPPORTED_MODES.contains(cmMode),
      s"unsupported ${ColumnMapping.MODE_KEY} '$cmMode'")
    val (finalSchema, finalConfig) =
      // mode none: strip any caller-carried CM annotations — a write
      // never ORIGINATES a table with stale annotations (#2886)
      if (cmMode == "none")
        (ColumnMapping.stripAnnotations(schema), configuration0)
      else {
        val (annotated, maxId) = ColumnMapping.assignMetadata(schema)
        (annotated,
          configuration0 + (ColumnMapping.MAX_ID_KEY -> maxId.toString))
      }
    val wantsCdf = finalConfig.get(TableChanges.CDF_ENABLED_KEY)
      .exists(_.equalsIgnoreCase("true"))
    val wantsRowTracking = finalConfig.get(RowTracking.ENABLED_KEY)
      .exists(_.equalsIgnoreCase("true"))
    def hasVariant(dt: org.apache.spark.sql.types.DataType): Boolean =
      dt match {
        case _: org.apache.spark.sql.types.VariantType => true
        case st: StructType => st.fields.exists(f => hasVariant(f.dataType))
        case a: org.apache.spark.sql.types.ArrayType =>
          hasVariant(a.elementType)
        case m: org.apache.spark.sql.types.MapType =>
          hasVariant(m.keyType) || hasVariant(m.valueType)
        case _ => false
      }
    val wantsVariant = hasVariant(finalSchema)
    val wantsGeo = GeoTypes.containsGeo(finalSchema)
    // variantShredding (reference table_features/mod.rs:630-645,
    // ReaderWriter): files may store variant as
    // {metadata, value, typed_value} — opt-in via table property
    val wantsShredding = finalConfig.get(VARIANT_SHREDDING_KEY)
      .exists(_.equalsIgnoreCase("true"))
    require(!wantsShredding || wantsVariant,
      s"$VARIANT_SHREDDING_KEY=true requires a variant column")
    val hasConstraints = finalConfig.keys
      .exists(_.startsWith(WriteValidation.CONSTRAINT_PREFIX))
    val hasGenerated =
      finalSchema.json.contains(WriteValidation.GENERATION_KEY)
    val hasIdentity =
      finalSchema.json.contains(IdentityColumns.START_KEY)
    val legacy = Protocol(
      if (cmMode != "none") 2 else 1,
      Seq(2, if (wantsCdf) 4 else 2,
        if (hasConstraints) 3 else 2,
        if (hasGenerated) 4 else 2,
        if (cmMode != "none") 5 else 2,
        if (hasIdentity) 6 else 2).max)
    val wantsIct = finalConfig.get(ICT_ENABLED_KEY)
      .exists(_.equalsIgnoreCase("true"))
    // delta.enableDeletionVectors=true declares the feature at CREATE
    // (delta-spark's coupling); reader-writer, so both lists
    val wantsDv = finalConfig.get("delta.enableDeletionVectors")
      .exists(_.equalsIgnoreCase("true"))
    val wantsIcebergV3 = finalConfig.get(IcebergCompat.V3_KEY)
      .exists(_.equalsIgnoreCase("true"))
    val wantsIcebergV1 = finalConfig.get(IcebergCompat.V1_KEY)
      .exists(_.equalsIgnoreCase("true"))
    val wantsIcebergV2 = finalConfig.get(IcebergCompat.V2_KEY)
      .exists(_.equalsIgnoreCase("true"))
    // `delta.feature.<name>=supported` convention: declare a feature in
    // the protocol without a dedicated enablement property (e.g.
    // materializePartitionColumns, which is AlwaysIfSupported)
    val explicitFeatures = finalConfig.collect {
      case (k, v) if k.startsWith("delta.feature.") &&
          v.equalsIgnoreCase("supported") =>
        k.stripPrefix("delta.feature.")
    }.toSeq
    // a column with a stored CURRENT_DEFAULT requires the writer-only
    // allowColumnDefaults feature (protocol: writers must apply it to
    // missing-column inserts)
    val hasDefaults =
      finalSchema.json.contains(WriteValidation.DEFAULT_KEY)
    val featureAdds =
      (if (wantsRowTracking) Seq("rowTracking", "domainMetadata") else Nil) ++
      (if (wantsIct) Seq("inCommitTimestamp") else Nil) ++
      (if (wantsDv) Seq("deletionVectors") else Nil) ++
      (if (hasDefaults) Seq("allowColumnDefaults") else Nil) ++
      (if (catalog.isDefined) Seq(CatalogManaged.FEATURE) else Nil) ++
      (if (wantsIcebergV3) Seq(IcebergCompat.V3_FEATURE) else Nil) ++
      (if (wantsIcebergV1) Seq(IcebergCompat.V1_FEATURE) else Nil) ++
      (if (wantsIcebergV2) Seq(IcebergCompat.V2_FEATURE) else Nil) ++
      explicitFeatures ++
      (if (clusterBy.nonEmpty)
        Seq(Clustering.FEATURE, "domainMetadata") else Nil)
    val readerFeatureAdds =
      (if (wantsVariant) Seq("variantType") else Nil) ++
      (if (wantsDv) Seq("deletionVectors") else Nil) ++
      (if (wantsGeo) Seq(GeoTypes.FEATURE) else Nil) ++
      (if (wantsShredding) Seq("variantShredding") else Nil) ++
      (if (catalog.isDefined) Seq(CatalogManaged.FEATURE) else Nil) ++
      // reader-writer features declared via delta.feature.<name> must
      // appear on the reader side too (a v2Checkpoint-only writer list
      // would let legacy readers miss the checkpoint format)
      explicitFeatures.filter(TableFeatures.readerWriterFeatures.contains)
    val protocol =
      if (featureAdds.nonEmpty || wantsVariant || wantsGeo || wantsIct ||
          wantsDv)
        TableFeatures.upgraded(legacy, readerFeatureAdds,
          featureAdds ++ readerFeatureAdds)
      else legacy
    // row tracking fixes its materialized column names at enablement
    // (delta.rowTracking.materializedRowId/RowCommitVersionColumnName):
    // rewrites (OPTIMIZE/REORG) write the ORIGINAL ids under these
    // names so row ids stay stable across file rewrites
    val finalConfigRt =
      if (wantsRowTracking &&
          !finalConfig.contains(RowTracking.MAT_ROW_ID_KEY))
        finalConfig ++ RowTracking.freshMaterializedNames()
      else finalConfig
    val meta = graft.delta.Metadata(
      id = UUID.randomUUID().toString,
      name = name, description = None, format = Format(),
      schemaString = GeoTypes.toSchemaString(finalSchema),
      partitionColumns = partitionColumns,
      configuration = finalConfigRt,
      createdTime = Some(System.currentTimeMillis()))
    // icebergCompat invariants fail the CREATE before anything reaches the log
    // (reference table_configuration.rs:235)
    IcebergCompat.validate(protocol, meta, finalSchema)
    // feature-dependency validation (reference
    // validate_feature_requirements): a CREATE whose declared features
    // have unmet dependencies must fail here, not at first read
    FeatureRequirements.validateEnabled(protocol, meta)
    val createTs = System.currentTimeMillis()
    val lines = Seq(
      JsonLog.writeAction(SingleAction(commitInfo = Some(CommitInfo(
        createTs, "CREATE TABLE",
        Map("partitionBy" -> partitionColumns.mkString(",")),
        Some("graft-spark/0.1.0"),
        inCommitTimestamp = if (wantsIct) Some(createTs) else None,
        correlationId = t.correlationId)))),
      JsonLog.writeAction(SingleAction(protocol = Some(protocol))),
      JsonLog.writeAction(SingleAction(metaData = Some(meta)))) ++
      (if (wantsRowTracking)
        Seq(JsonLog.writeAction(SingleAction(domainMetadata = Some(
          RowTracking.domainMetadataFor(
            RowTracking.MISSING_HIGH_WATER_MARK)))))
      else Nil) ++
      (if (clusterBy.nonEmpty) {
        // the domain records PHYSICAL column paths (clustering.rs)
        val physPaths = clusterBy.map(c => Seq(ColumnMapping.physicalName(
          finalSchema.fields.find(_.name == c).get)))
        Seq(JsonLog.writeAction(SingleAction(domainMetadata = Some(
          Clustering.domainFor(physPaths)))))
      } else Nil)
    val fs = Storage.fs(t.root, spark.sessionState.newHadoopConf())
    fs.mkdirs(FileNames.logDir(t.root))
    t.committer.commit(fs, FileNames.logDir(t.root), 0L,
        lines.mkString("", "\n", "\n")) match {
      case CommitResponse.Committed(_, _) => ()
      case CommitResponse.Conflict(_) =>
        throw new IllegalStateException(s"table already exists at $path")
    }
    Checksum.write(fs, FileNames.logDir(t.root), 0L,
      Checksum.VersionChecksum(0L, 0L, protocol, meta,
        Some(FileSizeHistogram.empty)))
    t
  }

  /** CONVERT TO DELTA — in-place adoption of a plain parquet
    * directory (delta-spark's `CONVERT TO DELTA`; the reference has
    * no analog, but it is the on-ramp every existing lake crosses
    * first). Lists the directory's parquet files, derives hive-style
    * partition values from the paths (TYPES come from the declared
    * `partitionSchema` — inference from strings is unsafe, the same
    * reason delta-spark requires `PARTITIONED BY`), collects
    * protocol-exact footer stats, and commits protocol + metadata +
    * every add as ONE atomic version-0 commit: a concurrent reader
    * sees either no table or the complete table, never an empty
    * shell. Data files are neither moved nor rewritten. Stats fan out
    * to executors past the driver-read bound, so adopting a
    * million-file directory is a distributed footer sweep, not a
    * driver loop.
    */
  def convert(spark: SparkSession, path: String,
      partitionSchema: StructType = new StructType()): DeltaTable = {
    require(!isDeltaTable(spark, path),
      s"already a delta table: $path")
    val root = new Path(path)
    val conf = spark.sessionState.newHadoopConf()
    val fs = Storage.fs(root, conf)
    val rootQ = fs.makeQualified(root)
    val files = Storage.listFilesRecursive(fs, root).filter { st =>
      val n = st.getPath.getName
      n.endsWith(".parquet") && !n.startsWith(".") && !n.startsWith("_")
    }
    require(files.nonEmpty, s"no parquet files under $path")

    // data schema from the files; partition columns must be declared,
    // and (with a basePath) spark infers exactly the path-borne ones —
    // require the two sets to agree so a typo fails loudly
    val inferred = spark.read.option("basePath", path)
      .parquet(path).schema
    val partNames = partitionSchema.fieldNames.toSet
    val dataFields = inferred.fields.filterNot(f => partNames(f.name))
    val missing = partNames -- inferred.fieldNames.toSet
    require(missing.isEmpty,
      s"declared partition columns not present in the layout: " +
        missing.mkString(", "))
    val schema = StructType(
      dataFields.toIndexedSeq ++ partitionSchema.fields)
    val dataSchema = StructType(dataFields.toIndexedSeq)

    def uriDecodeSeg(s: String): String =
      try java.net.URLDecoder.decode(s.replace("+", "%2B"), "UTF-8")
      catch { case _: IllegalArgumentException => s }
    def unescape(s: String): String = {
      val b = new StringBuilder
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '%' && i + 3 <= s.length) {
          try {
            b.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
            i += 3
          } catch { case _: NumberFormatException => b.append(c); i += 1 }
        } else { b.append(c); i += 1 }
      }
      b.toString
    }

    val statsByPath = ParquetFooterStats.collect(spark,
      files.map(_.getPath.toString).toSeq, dataSchema, conf)
    val partCols = partitionSchema.fieldNames.toSeq
    val adds = files.map { st =>
      val rel = st.getPath.toUri.getRawPath
        .stripPrefix(rootQ.toUri.getRawPath).stripPrefix("/")
      val pv: Map[String, String] = rel.split('/').dropRight(1)
        .map(uriDecodeSeg).filter(_.contains('='))
        .map { seg =>
          val Array(k, v) = seg.split("=", 2)
          k -> (if (v == "__HIVE_DEFAULT_PARTITION__") null
                else unescape(v))
        }.toMap
      AddFile(
        path = rel,
        partitionValues = partCols.map(c => c -> pv.getOrElse(c, null))
          .toMap,
        size = st.getLen,
        modificationTime = st.getModificationTime,
        dataChange = true,
        stats = Some(statsByPath(st.getPath.toString)))
    }

    val ts = System.currentTimeMillis()
    val meta = graft.delta.Metadata(
      id = UUID.randomUUID().toString,
      name = None, description = None, format = Format(),
      schemaString = schema.json,
      partitionColumns = partCols,
      configuration = Map.empty,
      createdTime = Some(ts))
    val protocol = Protocol(1, 2)
    val lines = Seq(
      JsonLog.writeAction(SingleAction(commitInfo = Some(CommitInfo(
        ts, "CONVERT",
        Map("numFiles" -> adds.size.toString,
          "partitionBy" -> partCols.mkString(",")),
        Some("graft-spark/0.1.0"))))),
      JsonLog.writeAction(SingleAction(protocol = Some(protocol))),
      JsonLog.writeAction(SingleAction(metaData = Some(meta)))) ++
      adds.map(a => JsonLog.writeAction(SingleAction(add = Some(a))))
    fs.mkdirs(FileNames.logDir(root))
    require(Storage.putIfAbsent(fs,
      FileNames.commitFile(FileNames.logDir(root), 0L),
      lines.mkString("", "\n", "\n")),
      s"concurrent CONVERT/CREATE at $path")
    Checksum.write(fs, FileNames.logDir(root), 0L,
      Checksum.VersionChecksum(adds.map(_.size).sum, adds.size.toLong,
        protocol, meta,
        Some(FileSizeHistogram.of(adds.map(_.size)))))
    new DeltaTable(spark, path, None)
  }
}
