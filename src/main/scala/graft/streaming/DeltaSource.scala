package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.graft.StreamingShim
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SQLContext}

import graft.delta.{DeltaScan, FileNames, JsonLog, RowCodec, Snapshot, Storage, TableChanges}

/** Structured Streaming source over a Delta table: offsets are table
  * VERSIONS, each microbatch is the add-file diff of a commit range
  * (reference: kernel/src/incremental_scan/mod.rs:26-60 — the file-action
  * diff over (base, target] — exposed the way delta-spark's DeltaSource
  * does, as a v1 `Source`).
  *
  * Options:
  *  - `path` (required): table root
  *  - `startingVersion` (optional): numeric N = emit adds from version N
  *    onward; "latest" = only commits after the stream starts. ABSENT =
  *    delta-spark's default semantics: the FIRST batch is the full
  *    snapshot at stream start, then per-commit tailing — the only
  *    mode that works on tables whose early commits were vacuumed or
  *    compacted away
  *  - `maxVersionsPerTrigger` (default unbounded): rate limit — at most
  *    this many commit versions per microbatch
  *  - `maxFilesPerTrigger` (default unbounded): rate limit — at most
  *    this many data FILES per microbatch, splitting WITHIN a version
  *    (and within the initial snapshot) via (version, fileIndex)
  *    offsets, delta-spark's DeltaSourceOffset design. At 100 TB the
  *    initial snapshot is millions of files — it must stream as many
  *    bounded batches, not one. Ignored in readChangeFeed mode (CDF
  *    batches stay version-granular)
  *  - `ignoreDeletes` (default false): tolerate commits that ONLY drop
  *    whole files (remove actions with no accompanying adds — e.g. a
  *    partition delete). A commit that both removes and adds data files
  *    (a DELETE/UPDATE rewrite or DV swap) still fails: its adds carry
  *    rows already streamed, and re-emitting them would duplicate
  *    downstream (delta-spark's ignoreDeletes has the same boundary)
  *  - `ignoreChanges` (default false): additionally accept rewrite
  *    commits, re-emitting the rewritten files' rows (downstream must
  *    tolerate duplicates); implies ignoreDeletes
  *  - `readChangeFeed` (default false): emit CDF rows (table columns +
  *    `_change_type`/`_commit_version`/`_commit_timestamp`) per commit
  *    range instead of plain appends — deletes and DV swaps flow as
  *    `delete` rows rather than failing the stream
  *
  * Scale: per microbatch the driver reads only the range's commit JSONs
  * (metadata); the data read is a distributed parquet scan of exactly
  * the newly added files.
  */
class DeltaSource(
    sqlContext: SQLContext,
    tablePath: String,
    options: Map[String, String]) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {

  private val spark = sqlContext.sparkSession
  private val maxVersions =
    options.get("maxVersionsPerTrigger").map(_.toLong)
  private val maxFiles =
    options.get("maxFilesPerTrigger").map(_.toLong)
  private val ignoreChanges =
    options.get("ignoreChanges").exists(_.equalsIgnoreCase("true"))
  private val ignoreDeletes = ignoreChanges ||
    options.get("ignoreDeletes").exists(_.equalsIgnoreCase("true"))
  private val readChangeFeed =
    options.get("readChangeFeed").exists(_.equalsIgnoreCase("true"))

  // schema is pinned at source creation (delta-spark does the same)
  private val initialSnapshot = Snapshot.forTable(spark, tablePath)
  override val schema: StructType =
    if (readChangeFeed) DeltaSource.cdfSchema(initialSnapshot.schema)
    else initialSnapshot.schema

  /** No option = initial-snapshot mode: the first batch carries the
    * whole table as of stream start (offset = that snapshot's version),
    * then per-commit tailing.
    */
  private val startingVersionOpt: Option[Long] =
    options.get("startingVersion").map {
      case s if s.equalsIgnoreCase("latest") => initialSnapshot.version + 1
      case s => s.toLong
    }
  private val initialSnapshotMode = startingVersionOpt.isEmpty
  private val startingVersion =
    startingVersionOpt.getOrElse(initialSnapshot.version)

  private def latestVersion: Long =
    Snapshot.forTable(spark, tablePath).version

  /** Version delivered (or to be delivered) as a full snapshot, so
    * later offsets at that version keep a stable JSON encoding.
    */
  private var snapshotVersion: Option[Long] =
    if (initialSnapshotMode) Some(initialSnapshot.version) else None

  /** Furthest position OFFERED: `included` = number of `version`'s
    * files already covered when partial, -1 = version complete;
    * `inSnapshot` = still inside the (possibly partial) initial
    * snapshot.
    */
  private case class Cursor(version: Long, included: Long,
    inSnapshot: Boolean)

  private var offeredCursor: Cursor =
    if (initialSnapshotMode)
      Cursor(initialSnapshot.version, 0L, inSnapshot = true)
    else Cursor(startingVersion - 1, -1L, inSnapshot = false)

  /** Sorted add list of the pinned snapshot at `v` (deterministic order
    * for stable sub-snapshot offsets across restarts). Driver memory =
    * file metadata, the TahoeFileIndex-size envelope.
    */
  private val snapFilesCache =
    scala.collection.mutable.Map.empty[Long, IndexedSeq[graft.delta.AddFile]]
  private def snapshotFilesAt(v: Long): IndexedSeq[graft.delta.AddFile] =
    snapFilesCache.getOrElseUpdate(v, {
      val snap = if (v == initialSnapshot.version) initialSnapshot
        else Snapshot.forTable(spark, tablePath, Some(v))
      new DeltaScan(snap, None).collectAddFiles()
        .sortBy(_.path).toIndexedSeq
    })

  /** One commit's streamed adds (validated for delete/rewrite
    * boundaries), in commit-file order — deterministic across restarts.
    */
  private val tailAddsCache =
    scala.collection.mutable.Map.empty[Long, IndexedSeq[graft.delta.AddFile]]
  private def tailAdds(v: Long): IndexedSeq[graft.delta.AddFile] =
    tailAddsCache.getOrElseUpdate(v, {
      if (tailAddsCache.size > 256) tailAddsCache.clear() // bounded
      val conf = spark.sessionState.newHadoopConf()
      val root = new Path(tablePath)
      val fs = Storage.fs(root, conf)
      val p = FileNames.commitFile(FileNames.logDir(root), v)
      if (!fs.exists(p))
        // silently skipping would LOSE the commit's rows downstream
        throw new IllegalStateException(
          s"commit $v is missing from the log (vacuumed or compacted " +
            "away) — restart the stream without startingVersion to " +
            "begin from a fresh snapshot")
      val lines = Storage.readLines(fs, p).filter(_.nonEmpty)
        .map(JsonLog.parseLine)
      val vAdds = lines.flatMap(n =>
        Option(n.get("add")).filterNot(_.isNull))
        .map(RowCodec.jsonToAdd).filter(_.dataChange)
      val hasRemoves = lines.exists { n =>
        val rem = n.get("remove")
        rem != null && !rem.isNull && RowCodec.jsonToRemove(rem).dataChange
      }
      if (hasRemoves && !ignoreDeletes)
        throw new IllegalStateException(
          s"delete detected in streamed commit $v — appends-only " +
            "source (set ignoreDeletes=true to skip whole-file deletes)")
      // a commit that removes AND adds data files rewrote rows already
      // streamed in earlier batches — silently re-emitting its adds
      // duplicates downstream, so ignoreDeletes alone must not pass it
      if (hasRemoves && vAdds.nonEmpty && !ignoreChanges)
        throw new IllegalStateException(
          s"commit $v rewrites data files (DELETE/UPDATE rewrite or " +
            "DV swap) — set ignoreChanges=true to accept re-emitted " +
            "rows, or consume readChangeFeed for row-level changes")
      vAdds.toIndexedSeq
    })

  private def toOffset(c: Cursor): DeltaSourceOffset =
    if (c.inSnapshot) {
      val n = snapshotFilesAt(c.version).size
      DeltaSourceOffset(c.version, isInitialSnapshot = true,
        index = if (c.included >= n) -1 else c.included - 1)
    } else DeltaSourceOffset(c.version,
      isInitialSnapshot = snapshotVersion.contains(c.version),
      index = if (c.included < 0) -1 else c.included - 1)

  private def toCursor(o: DeltaSourceOffset): Cursor =
    if (o.isInitialSnapshot && o.index >= 0)
      Cursor(o.version, o.index + 1, inSnapshot = true)
    else Cursor(o.version, if (o.index < 0) -1 else o.index + 1,
      inSnapshot = false)

  /** `a` strictly behind `b`? (partial positions rank below complete) */
  private def behind(a: Cursor, b: Cursor): Boolean = {
    def rank(c: Cursor): (Long, Long) =
      (c.version, if (c.included < 0) Long.MaxValue else c.included)
    val (av, ai) = rank(a); val (bv, bi) = rank(b)
    av < bv || (av == bv && ai < bi)
  }

  override def getOffset: Option[Offset] =
    if (maxFiles.isEmpty || readChangeFeed) legacyGetOffset()
    else fileCappedGetOffset()

  /** Whole-version offsets (no file cap): the original behavior. */
  private def legacyGetOffset(): Option[Offset] = {
    // initial-snapshot mode: the first offer is the PINNED snapshot
    // version, flagged so a restart replays the same snapshot instead
    // of re-resolving the table (which may have advanced)
    if (initialSnapshotMode && offeredCursor.inSnapshot) {
      offeredCursor = Cursor(initialSnapshot.version, -1L, inSnapshot = false)
      return Some(DeltaSourceOffset(initialSnapshot.version,
        isInitialSnapshot = true))
    }
    val latest = latestVersion
    val base = math.max(offeredCursor.version, startingVersion - 1)
    val capped = maxVersions match {
      case Some(m) => math.min(latest, base + m)
      case None => latest
    }
    if (capped < startingVersion || capped <= offeredCursor.version) {
      if (offeredCursor.version < startingVersion) None
      else Some(toOffset(offeredCursor)) // re-offer the stable position
    } else {
      offeredCursor = Cursor(capped, -1L, inSnapshot = false)
      Some(toOffset(offeredCursor))
    }
  }

  /** File-capped offsets: advance through the snapshot's file list,
    * then through per-commit add lists, stopping mid-version when the
    * budget runs out.
    */
  private def fileCappedGetOffset(): Option[Offset] = {
    var cur = offeredCursor
    var fBudget = maxFiles.get
    var vBudget = maxVersions.getOrElse(Long.MaxValue)
    var advanced = false

    if (cur.inSnapshot) {
      val n = snapshotFilesAt(cur.version).size.toLong
      if (cur.included < n) {
        val take = math.min(fBudget, n - cur.included)
        if (take > 0) {
          cur = cur.copy(included = cur.included + take)
          fBudget -= take
          advanced = true
        }
      }
      if (cur.included >= n) // snapshot fully covered — tail may follow
        cur = Cursor(cur.version, -1L, inSnapshot = false)
    }

    if (!cur.inSnapshot) {
      // continue a partially-offered tail version first
      if (cur.included >= 0) {
        val n = tailAdds(cur.version).size.toLong
        val take = math.min(fBudget, n - cur.included)
        if (take > 0) { advanced = true; fBudget -= take }
        cur =
          if (cur.included + math.max(take, 0) >= n)
            Cursor(cur.version, -1L, inSnapshot = false)
          else cur.copy(included = cur.included + take)
      }
      val latest = latestVersion
      while (fBudget > 0 && vBudget > 0 && cur.included < 0 &&
          cur.version < latest) {
        val v = cur.version + 1
        val n = tailAdds(v).size.toLong
        if (n <= fBudget) { cur = Cursor(v, -1L, inSnapshot = false); fBudget -= n }
        else { cur = Cursor(v, fBudget, inSnapshot = false); fBudget = 0 }
        vBudget -= 1
        advanced = true
      }
    }

    if (!advanced) {
      if (offeredCursor.inSnapshot && offeredCursor.included == 0) None
      else if (offeredCursor.version < startingVersion) None
      else Some(toOffset(offeredCursor)) // stable re-offer
    } else {
      offeredCursor = cur
      Some(toOffset(cur))
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endOff = parseOffset(end)
    val hi = endOff.version
    // a fresh stream (or a restart replaying batch 0) in
    // initial-snapshot mode emits the snapshot AT THE OFFSET'S PINNED
    // VERSION — never a re-resolved one, which may have advanced and
    // would duplicate rows of the next commit range downstream
    val snapshotBatch =
      start.isEmpty && (endOff.isInitialSnapshot || initialSnapshotMode)
    val snapAt =
      if (!snapshotBatch) initialSnapshot
      else if (hi == initialSnapshot.version) initialSnapshot
      else Snapshot.forTable(spark, tablePath, Some(hi))
    if (snapshotBatch) snapshotVersion = Some(hi)
    // the snapshot batch covers everything through hi; no tail inside it
    val lo =
      if (snapshotBatch) hi + 1
      else start.map(parseOffset(_).version + 1).getOrElse(startingVersion)
    // restart recovery replays the last committed batch through here —
    // advance the rate-limit watermark so the next getOffset continues
    // from the checkpointed position instead of re-offering old versions
    val endCursor = toCursor(endOff)
    if (behind(offeredCursor, endCursor)) offeredCursor = endCursor
    // sub-version (file-sliced) offsets: either boundary carries a
    // file index — assemble the exact file slice instead of whole
    // version ranges
    val startOffOpt = start.map(parseOffset)
    val sliced = endOff.index >= 0 ||
      startOffOpt.exists(o => o.index >= 0)
    if (sliced && !readChangeFeed)
      return slicedBatch(startOffOpt, endOff)
    if (readChangeFeed) {
      val tail =
        if (lo > hi) None
        else Some(TableChanges.read(spark, tablePath, lo, Some(hi)))
      val df = (snapshotBatch, tail) match {
        case (true, t) =>
          val snapAsInserts = DeltaSource.snapshotAsInserts(spark, snapAt)
          t.map(snapAsInserts.unionByName(_)).getOrElse(snapAsInserts)
        case (false, Some(t)) => t
        case (false, None) =>
          // offset-encoding changes across restarts can produce an
          // empty replay range; an empty batch is correct, not an error
          DeltaSource.snapshotAsInserts(spark, snapAt).limit(0)
      }
      return StreamingShim.internalCreateStreamingDF(
        sqlContext, df.queryExecution.toRdd, df.schema)
    }
    val adds = (lo to hi).flatMap(tailAdds)
    val scan = new DeltaScan(initialSnapshot, None)
    val tailDF = scan.assemble(adds, keepMeta = false)
    val df =
      if (snapshotBatch) new DeltaScan(snapAt, None).toDF.unionByName(tailDF)
      else tailDF
    StreamingShim.internalCreateStreamingDF(
      sqlContext, df.queryExecution.toRdd, df.schema)
  }

  /** Batch content when either boundary is a sub-version (file-sliced)
    * offset: exact file slices of the pinned snapshot list and/or
    * per-commit add lists — deterministic across restarts because both
    * lists have stable order.
    */
  private def slicedBatch(startOff: Option[DeltaSourceOffset],
      endOff: DeltaSourceOffset): DataFrame = {
    val snapParts =
      scala.collection.mutable.ArrayBuffer.empty[graft.delta.AddFile]
    val tailParts =
      scala.collection.mutable.ArrayBuffer.empty[graft.delta.AddFile]
    var snapVer: Option[Long] = None

    if (endOff.isInitialSnapshot) {
      // the whole batch lies inside the pinned snapshot
      snapVer = Some(endOff.version)
      val files = snapshotFilesAt(endOff.version)
      val eCnt = if (endOff.index < 0) files.size else endOff.index.toInt + 1
      val sCnt = startOff match {
        case Some(o) if o.isInitialSnapshot && o.index >= 0 => o.index.toInt + 1
        case Some(_) => files.size // start already past the snapshot
        case None => 0
      }
      if (sCnt < eCnt) snapParts ++= files.slice(sCnt, eCnt)
    } else {
      val tailFrom = startOff match {
        case Some(o) if o.isInitialSnapshot && o.index >= 0 =>
          // finish the pinned snapshot's remainder, then tail
          snapVer = Some(o.version)
          val files = snapshotFilesAt(o.version)
          snapParts ++= files.slice(o.index.toInt + 1, files.size)
          o.version + 1
        case Some(o) if o.index >= 0 =>
          val n = tailAdds(o.version)
          tailParts ++= n.slice(o.index.toInt + 1, n.size)
          o.version + 1
        case Some(o) => o.version + 1
        case None => startingVersion
      }
      (tailFrom to endOff.version).foreach { v =>
        val n = tailAdds(v)
        if (v == endOff.version && endOff.index >= 0)
          tailParts ++= n.slice(0, endOff.index.toInt + 1)
        else tailParts ++= n
      }
    }
    snapVer.foreach(v => snapshotVersion = Some(v))

    val dfSnap = snapVer.filter(_ => snapParts.nonEmpty).map { sv =>
      val snap = if (sv == initialSnapshot.version) initialSnapshot
        else Snapshot.forTable(spark, tablePath, Some(sv))
      new DeltaScan(snap, None).assemble(snapParts.toSeq, keepMeta = false)
    }
    val scanTail = new DeltaScan(initialSnapshot, None)
    val dfTail =
      if (tailParts.isEmpty) None
      else Some(scanTail.assemble(tailParts.toSeq, keepMeta = false))
    val df = (dfSnap, dfTail) match {
      case (Some(a), Some(b)) => a.unionByName(b)
      case (Some(a), None) => a
      case (None, Some(b)) => b
      case (None, None) => scanTail.assemble(Nil, keepMeta = false)
    }
    StreamingShim.internalCreateStreamingDF(
      sqlContext, df.queryExecution.toRdd, df.schema)
  }

  private def parseOffset(o: Offset): DeltaSourceOffset = o match {
    case d: DeltaSourceOffset => d
    case LongOffset(v) => DeltaSourceOffset(v, isInitialSnapshot = false)
    case other => DeltaSourceOffset.fromJson(other.json)
  }

  override def stop(): Unit = {}
}

/** Offset = table version + whether that position was delivered as a
  * full initial snapshot (delta-spark's reservoirVersion /
  * isInitialSnapshot pair): replaying batch 0 after a restart rebuilds
  * the snapshot at the PINNED version, immune to the table advancing
  * between stream start and the first checkpoint.
  */
case class DeltaSourceOffset(version: Long, isInitialSnapshot: Boolean,
    index: Long = -1) extends Offset {
  /** `index` = last file index of `version` (or of the pinned snapshot
    * when `isInitialSnapshot`) included by this offset; -1 = the whole
    * version. Complete offsets keep the original two-field encoding so
    * checkpoints from earlier versions of this source parse unchanged.
    */
  override def json: String =
    if (index < 0)
      s"""{"version":$version,"isInitialSnapshot":$isInitialSnapshot}"""
    else
      s"""{"version":$version,"isInitialSnapshot":$isInitialSnapshot,""" +
        s""""index":$index}"""
}

object DeltaSourceOffset {
  def fromJson(s: String): DeltaSourceOffset = {
    val t = s.trim
    if (t.startsWith("{")) {
      val n = JsonLog.parseLine(t)
      DeltaSourceOffset(n.path("version").asLong,
        n.path("isInitialSnapshot").asBoolean(false),
        if (n.has("index")) n.path("index").asLong else -1L)
    } else DeltaSourceOffset(t.toLong, isInitialSnapshot = false)
  }
}

object DeltaSource {

  /** The initial snapshot rendered as CDF insert rows at its version —
    * the first batch of a readChangeFeed stream with no startingVersion
    * (delta-spark's default CDF stream shape).
    */
  private[streaming] def snapshotAsInserts(
      spark: org.apache.spark.sql.SparkSession,
      snap: Snapshot): DataFrame = {
    import org.apache.spark.sql.functions._
    val conf = spark.sessionState.newHadoopConf()
    val fs = Storage.fs(snap.tableRoot, conf)
    val ts =
      try fs.getFileStatus(FileNames.commitFile(
        FileNames.logDir(snap.tableRoot), snap.version)).getModificationTime
      catch { case _: Exception => System.currentTimeMillis() }
    new DeltaScan(snap, None).toDF
      .withColumn(TableChanges.CHANGE_TYPE, lit("insert"))
      .withColumn(TableChanges.COMMIT_VERSION, lit(snap.version))
      .withColumn(TableChanges.COMMIT_TIMESTAMP,
        lit(new java.sql.Timestamp(ts)))
  }

  def cdfSchema(table: StructType): StructType = StructType(
    table.fields ++ Seq(
      org.apache.spark.sql.types.StructField(TableChanges.CHANGE_TYPE,
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField(TableChanges.COMMIT_VERSION,
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField(TableChanges.COMMIT_TIMESTAMP,
        org.apache.spark.sql.types.TimestampType)))
}

/** `.format("graft-delta")` / `.format(classOf[DeltaSourceProvider].getName)`
  * — streaming source + sink AND batch read/write: `spark.read
  * .format("graft-delta").load(path)` scans through the log-backed
  * skipping path (with `versionAsOf`/`timestampAsOf` time travel);
  * `df.write.format("graft-delta").mode(...).save(path)` creates or
  * appends/overwrites through the transactional commit path.
  */
class DeltaSourceProvider extends StreamSourceProvider
    with org.apache.spark.sql.sources.StreamSinkProvider
    with org.apache.spark.sql.sources.RelationProvider
    with org.apache.spark.sql.sources.CreatableRelationProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-delta"

  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String])
      : org.apache.spark.sql.sources.BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("option 'path' is required"))
    val version = parameters.get("versionAsOf").map(_.toLong)
      .orElse(parameters.get("timestampAsOf").map { ts =>
        val millis =
          try java.sql.Timestamp.valueOf(ts).getTime
          catch { case _: IllegalArgumentException => ts.toLong }
        graft.delta.DeltaTable.forPath(sqlContext.sparkSession, path)
          .versionAtTimestamp(millis)
      })
    new graft.delta.GraftDeltaRelation(sqlContext, path, version)
  }

  override def createRelation(
      sqlContext: SQLContext,
      mode: org.apache.spark.sql.SaveMode,
      parameters: Map[String, String],
      data: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.sources.BaseRelation = {
    import org.apache.spark.sql.SaveMode
    val spark = sqlContext.sparkSession
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("option 'path' is required"))
    val exists = graft.delta.DeltaTable.isDeltaTable(spark, path)
    if (!exists) {
      val partitionCols = parameters.get("partitionBy")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Nil)
      graft.delta.DeltaTable.create(spark, path, data.schema, partitionCols)
      graft.delta.DeltaTable.forPath(spark, path).append(data)
    } else mode match {
      case SaveMode.Append =>
        graft.delta.DeltaTable.forPath(spark, path).append(data)
      case SaveMode.Overwrite =>
        graft.delta.DeltaTable.forPath(spark, path).overwrite(data)
      case SaveMode.ErrorIfExists =>
        throw new IllegalStateException(s"delta table already exists: $path")
      case SaveMode.Ignore => ()
    }
    new graft.delta.GraftDeltaRelation(sqlContext, path, None)
  }

  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("option 'path' is required"))
    new DeltaSink(sqlContext, path, outputMode)
  }

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("option 'path' is required"))
    val table = Snapshot.forTable(sqlContext.sparkSession, path).schema
    val cdf = parameters.get("readChangeFeed")
      .exists(_.equalsIgnoreCase("true"))
    (shortName(), schema.getOrElse(
      if (cdf) DeltaSource.cdfSchema(table) else table))
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("option 'path' is required"))
    new DeltaSource(sqlContext, path, parameters)
  }
}
