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
    options: Map[String, String]) extends Source {

  private val spark = sqlContext.sparkSession
  private val maxVersions =
    options.get("maxVersionsPerTrigger").map(_.toLong)
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

  /** Highest version already handed out (rate-limit bookkeeping). */
  private var lastOffered: Long = startingVersion - 1
  /** Version delivered (or to be delivered) as a full snapshot, so
    * later offsets at that version keep a stable JSON encoding.
    */
  private var snapshotVersion: Option[Long] =
    if (initialSnapshotMode) Some(initialSnapshot.version) else None

  override def getOffset: Option[Offset] = {
    // initial-snapshot mode: the first offer is the PINNED snapshot
    // version, flagged so a restart replays the same snapshot instead
    // of re-resolving the table (which may have advanced)
    if (initialSnapshotMode && lastOffered < startingVersion) {
      lastOffered = initialSnapshot.version
      return Some(DeltaSourceOffset(initialSnapshot.version,
        isInitialSnapshot = true))
    }
    val latest = latestVersion
    val capped = maxVersions match {
      case Some(m) => math.min(latest, math.max(lastOffered, startingVersion - 1) + m)
      case None => latest
    }
    if (capped < startingVersion) None
    else {
      lastOffered = math.max(lastOffered, capped)
      Some(DeltaSourceOffset(capped, snapshotVersion.contains(capped)))
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
    lastOffered = math.max(lastOffered, hi)
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
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(tablePath)
    val fs = Storage.fs(root, conf)
    val logDir = FileNames.logDir(root)

    val adds = (lo to hi).flatMap { v =>
      val p = FileNames.commitFile(logDir, v)
      if (!fs.exists(p))
        // silently skipping would LOSE the commit's rows downstream
        throw new IllegalStateException(
          s"commit $v is missing from the log (vacuumed or compacted " +
            "away) — restart the stream without startingVersion to " +
            "begin from a fresh snapshot")
      else {
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
        vAdds
      }
    }
    val scan = new DeltaScan(initialSnapshot, None)
    val tailDF = scan.assemble(adds, keepMeta = false)
    val df =
      if (snapshotBatch) new DeltaScan(snapAt, None).toDF.unionByName(tailDF)
      else tailDF
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
case class DeltaSourceOffset(version: Long, isInitialSnapshot: Boolean)
    extends Offset {
  override def json: String =
    s"""{"version":$version,"isInitialSnapshot":$isInitialSnapshot}"""
}

object DeltaSourceOffset {
  def fromJson(s: String): DeltaSourceOffset = {
    val t = s.trim
    if (t.startsWith("{")) {
      val n = JsonLog.parseLine(t)
      DeltaSourceOffset(n.path("version").asLong,
        n.path("isInitialSnapshot").asBoolean(false))
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
