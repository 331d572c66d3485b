package graft.delta

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Adaptive-Metadata-Tree content-tree support (reference
  * kernel/src/content_tree/{mod,stats,dv_conversion}.rs; RFC
  * delta-io/delta#6978). The manifest-commit `checkpoint` ACTION model
  * lives in [[AdaptiveMetadata]]; this module is the tree CONTENT:
  * the node-entry row shape, the Delta→Iceberg deletion-vector
  * conversion, and the stats field-id space.
  *
  * Spark-first shape: a content-tree node is a parquet file of entry
  * rows, so construction is a distributed `DataFrame` transform over
  * the snapshot's live adds ([[entriesDF]]) and reading is a parquet
  * scan + streamed decode back to add actions ([[addFileIterator]]) —
  * at millions of files neither direction materializes the file list
  * on the driver beyond the scan's own compact index.
  */
object ContentTree {

  // ==== stats field-id space (reference content_tree/stats.rs) ====

  /** Stats-per-column stride: each column owns a 200-id block. */
  val NUM_SUPPORTED_STATS_PER_COLUMN: Int = 200

  /** Start of the data-column stats space. */
  val STATS_SPACE_FIELD_ID_START_FOR_DATA_FIELDS: Int = 10000

  /** Start of the reserved-metadata stats space `[9000, 10000)`. */
  val STATS_SPACE_FIELD_ID_START_FOR_METADATA_FIELDS: Int = 9000

  /** Exclusive upper bound of the whole stats field-id range. */
  val STATS_SPACE_FIELD_ID_END: Int = 200000000

  /** Base id of the last data-column stats block that fits. */
  val MAX_DATA_STATS_FIELD_ID: Int =
    STATS_SPACE_FIELD_ID_END - NUM_SUPPORTED_STATS_PER_COLUMN

  /** Largest data field id whose stats block fits in the range. */
  val MAX_DATA_FIELD_ID: Int =
    (MAX_DATA_STATS_FIELD_ID - STATS_SPACE_FIELD_ID_START_FOR_DATA_FIELDS) /
      NUM_SUPPORTED_STATS_PER_COLUMN

  /** Iceberg reserved id for `_last_updated_sequence_number`. */
  val LAST_UPDATED_SEQUENCE_NUMBER_FIELD_ID: Int = 2147483539

  /** Iceberg reserved id for `_row_id`. */
  val ROW_ID_FIELD_ID: Int = 2147483540

  /** The only reserved metadata field ids with tracked stats. */
  val SUPPORTED_METADATA_FIELD_IDS: Seq[Int] =
    Seq(LAST_UPDATED_SEQUENCE_NUMBER_FIELD_ID, ROW_ID_FIELD_ID)

  /** Base field id of a column's shredded stats struct
    * (stats.rs `field_id_to_statistics_base`): metadata fields map
    * into `[9000, 10000)`, data fields `[0, MAX_DATA_FIELD_ID]` into
    * `[10000, 200000000)`; anything else has no stats space.
    */
  def fieldIdToStatisticsBase(fieldId: Int): Option[Int] =
    if (SUPPORTED_METADATA_FIELD_IDS.contains(fieldId))
      Some(STATS_SPACE_FIELD_ID_START_FOR_METADATA_FIELDS +
        NUM_SUPPORTED_STATS_PER_COLUMN *
          (fieldId - LAST_UPDATED_SEQUENCE_NUMBER_FIELD_ID))
    else if (fieldId >= 0 && fieldId <= MAX_DATA_FIELD_ID)
      Some(STATS_SPACE_FIELD_ID_START_FOR_DATA_FIELDS +
        NUM_SUPPORTED_STATS_PER_COLUMN * fieldId)
    else None

  // ==== enums (content_tree/mod.rs) ====

  object DataContentType {
    val Data = 0
    val PositionDeletes = 1
    val EqualityDeletes = 2
    val DataManifest = 3
    val DeleteManifest = 4
  }

  object TrackingStatus {
    val Existing = 0
    val Added = 1
    val Deleted = 2
    val Replaced = 3
    val Modified = 4
  }

  // ==== DV conversion (content_tree/dv_conversion.rs) ====

  /** Iceberg-side deletion-vector reference of a content-tree entry
    * (mod.rs `DeletionVectorInfo`): resolved location, blob offset,
    * FULL-blob size (Delta's `sizeInBytes` + 8 for the 4-byte length
    * prefix and 4-byte trailing CRC of the Iceberg framing), and the
    * set-bit count.
    */
  case class DeletionVectorInfo(location: String, offset: Long,
      sizeInBytes: Long, cardinality: Long)

  /** Delta descriptor → Iceberg DV info (dv_conversion.rs
    * `extract_deletion_vector_content`): relative descriptors z85-
    * decode to `<prefix>/deletion_vector_<uuid>.bin`, absolute ones
    * pass through verbatim, inline ones fail (they must be persisted
    * before entering tree metadata). Absent offset defaults to 1 — a
    * persisted DV file opens with a 1-byte version header.
    */
  def extractDeletionVectorContent(
      dv: DeletionVectorDescriptor): DeletionVectorInfo = {
    val location = dv.storageType match {
      case "p" => dv.pathOrInlineDv
      case "u" => DeletionVectors.relativePath("u", dv.pathOrInlineDv, "")
        .getOrElse(throw new IllegalArgumentException(
          s"cannot decode relative DV '${dv.pathOrInlineDv}'"))
      case "i" => throw new IllegalArgumentException(
        "Inline deletion vectors are not supported. They must be " +
          "persisted first.")
      case other => throw new IllegalArgumentException(
        s"unknown DV storage type '$other'")
    }
    DeletionVectorInfo(location,
      dv.offset.map(_.toLong).getOrElse(1L),
      dv.sizeInBytes.toLong + 8L,
      dv.cardinality)
  }

  /** Iceberg DV info → Delta descriptor for the read path: the
    * location becomes an absolute persisted descriptor against the
    * table root, the framing +8 is removed. Inverse of
    * [[extractDeletionVectorContent]] up to storage-type
    * normalization (relative descriptors come back as absolute ones —
    * the bitmap bytes read identically).
    */
  def dvInfoToDescriptor(info: DeletionVectorInfo,
      tableRootUriPath: String): DeletionVectorDescriptor = {
    val abs =
      if (AdaptiveMetadata.hasScheme(info.location) ||
          info.location.startsWith("/")) info.location
      else tableRootUriPath.stripSuffix("/") + "/" + info.location
    DeletionVectorDescriptor("p", abs,
      Some(info.offset.toInt), (info.sizeInBytes - 8L).toInt,
      info.cardinality)
  }

  // ==== entry rows ====

  private val dvInfoSchema = StructType(Seq(
    StructField("location", StringType),
    StructField("offset", LongType),
    StructField("sizeInBytes", LongType),
    StructField("cardinality", LongType)))

  private val trackingSchema = StructType(Seq(
    StructField("status", IntegerType, nullable = false),
    StructField("snapshotId", LongType),
    StructField("dvSnapshotId", LongType),
    StructField("sequenceNumber", LongType),
    StructField("fileSequenceNumber", LongType),
    StructField("firstRowId", LongType)))

  /** The content-tree node-entry row shape (mod.rs
    * `ContentTreeNodeEntry`), restricted to the fields a Delta-sourced
    * Data entry carries; `partition` holds Delta's string-serialized
    * partition values (the typed Iceberg partition tuple is spec-id
    * driven and out of scope until the RFC fixes the spec encoding).
    */
  val entrySchema: StructType = StructType(Seq(
    StructField("contentType", IntegerType, nullable = false),
    StructField("location", StringType, nullable = false),
    StructField("fileFormat", StringType, nullable = false),
    StructField("tracking", trackingSchema, nullable = false),
    StructField("deletionVector", dvInfoSchema),
    StructField("specId", IntegerType, nullable = false),
    StructField("partition", MapType(StringType, StringType)),
    StructField("sortOrderId", IntegerType),
    StructField("recordCount", LongType),
    StructField("fileSizeInBytes", LongType),
    StructField("formatVersion", IntegerType, nullable = false),
    StructField("tags", MapType(StringType, StringType))))

  /** Distributed content-tree construction: one entry row per live
    * add of the snapshot (status Added at its commit version, DV
    * converted per [[extractDeletionVectorContent]], recordCount from
    * the add's stats). The z85 DV decode is per-FILE work — metadata
    * cardinality — so the single row-level map here never touches
    * data rows.
    */
  def entriesDF(snap: Snapshot): DataFrame =
    entriesFromAdds(snap.allAdds)

  /** Entry construction over any adds-shaped DataFrame (columns `add`
    * struct + `version`): the shared mapping for full-tree builds and
    * incremental updates.
    */
  private def entriesFromAdds(adds: DataFrame): DataFrame = {
    val numRec = from_json(col("add.stats"),
      StructType(Seq(StructField("numRecords", LongType))))
      .getField("numRecords")
    val flat = adds.select(
      col("add.path").as("_path"),
      col("add.partitionValues").as("_pv"),
      col("add.size").as("_size"),
      numRec.as("_numRecords"),
      col("add.tags").as("_tags"),
      col("add.baseRowId").as("_firstRowId"),
      col("add.deletionVector").as("_dv"),
      col("version").as("_v"))
    flat.map { r =>
      val dvRow = if (r.isNullAt(6)) null else r.getStruct(6)
      val dvInfo =
        if (dvRow == null || dvRow.isNullAt(dvRow.fieldIndex("storageType")))
          null
        else {
          val d = DeletionVectorDescriptor(
            dvRow.getAs[String]("storageType"),
            dvRow.getAs[String]("pathOrInlineDv"),
            Option(dvRow.getAs[Any]("offset"))
              .map(_.asInstanceOf[Number].intValue),
            dvRow.getAs[Number]("sizeInBytes").intValue,
            dvRow.getAs[Number]("cardinality").longValue)
          val i = extractDeletionVectorContent(d)
          Row(i.location, i.offset, i.sizeInBytes, i.cardinality)
        }
      val v = r.getLong(7)
      Row(
        DataContentType.Data,
        Storage.decodeUriPath(r.getString(0)),
        "parquet",
        Row(TrackingStatus.Added, v, null, v, v,
          if (r.isNullAt(5)) null else r.getLong(5)),
        dvInfo,
        0, // specId: single Delta partition spec
        r.getMap[String, String](1),
        null, // sortOrderId
        if (r.isNullAt(3)) null else r.getLong(3),
        r.getLong(2),
        4, // Iceberg/AMT format version
        if (r.isNullAt(4)) null else r.getMap[String, String](4))
    }(Encoders.row(entrySchema))
  }

  /** Write the snapshot's content tree as one parquet node under
    * `_delta_log/_amt/` and return a [[AdaptiveMetadata.ContentRoot]]
    * pointing at it (path relative to the table root, per the Iceberg
    * V4 relative-path rule AdaptiveMetadata.resolve applies).
    */
  def writeRoot(snap: Snapshot): AdaptiveMetadata.ContentRoot =
    writeEntries(snap, entriesDF(snap))

  private def writeEntries(snap: Snapshot,
      entries: DataFrame): AdaptiveMetadata.ContentRoot = {
    val spark = snap.spark
    val rel = s"_delta_log/_amt/content-tree-${snap.version}-" +
      java.util.UUID.randomUUID() + ".parquet"
    val abs = snap.tableRoot.toString.stripSuffix("/") + "/" + rel
    entries.coalesce(1).write.mode("overwrite").parquet(abs)
    val fs = Storage.fs(snap.tableRoot,
      spark.sessionState.newHadoopConf())
    val size = Storage.listFilesRecursive(fs,
      new org.apache.hadoop.fs.Path(abs)).map(_.getLen).sum
    AdaptiveMetadata.ContentRoot(rel, size, snap.version)
  }

  /** INCREMENTAL root maintenance — the adaptiveMetadata RFC's point:
    * advance a tree from `prev.version` to `snap.version` by applying
    * the commit-range file diff to the previous tree instead of
    * replaying the whole log. Tracking statuses carry the history
    * (reference mod.rs `TrackingStatus` semantics):
    *  - carried live entries → Existing, inheriting their original
    *    snapshotId / sequence numbers;
    *  - a same-path re-add (DV swap, restore) → Modified, keeping the
    *    inherited identity with `dvSnapshotId` = the swapping commit;
    *  - removed paths → Deleted tombstones stamped with the removal
    *    commit (kept in the tree; readers filter them);
    *  - fresh paths → Added at their commit.
    * All plan work is joins on `location` over the previous tree +
    * the range diff — never a log replay, never a driver loop.
    */
  def updateRoot(snap: Snapshot,
      prev: AdaptiveMetadata.ContentRoot): AdaptiveMetadata.ContentRoot = {
    val spark = snap.spark
    require(prev.version <= snap.version,
      s"tree at ${prev.version} is ahead of snapshot ${snap.version}")
    if (prev.version == snap.version) return prev

    val diff = IncrementalScan.fileDiff(spark, snap.tableRoot.toString,
      prev.version, snap.version)
    // decoded per-path NET winner: newest version; within a version an
    // add (the new state of a DV swap) beats the remove of the old copy
    def decodeCol(c: org.apache.spark.sql.Column) =
      url_decode(regexp_replace(c, "\\+", "%2B"))
    val winner = diff
      .withColumn("loc", decodeCol(
        coalesce(col("add.path"), col("remove.path"))))
      .withColumn("isAdd",
        when(col("add").isNotNull, 1).otherwise(0))
      .groupBy(col("loc"))
      .agg(max_by(struct(col("add"), col("version"), col("isAdd")),
        struct(col("version"), col("isAdd"))).as("w"))
      .select(col("loc"), col("w.add").as("add"),
        col("w.version").as("version"), col("w.isAdd").as("isAdd"))
    winner.persist()
    val newE = entriesFromAdds(
      winner.filter(col("isAdd") === 1).select(col("add"), col("version")))
    val removed = winner.filter(col("isAdd") === 0)
      .select(col("loc").as("location"), col("version").as("rmVersion"))

    val prevE = spark.read.schema(entrySchema)
      .parquet(prev.resolve(snap.tableRoot.toString))
      .filter(col("tracking.status") =!= TrackingStatus.Deleted)

    val j = prevE.as("p")
      .join(newE.as("n"), Seq("location"), "full_outer")
      .join(removed.as("r"), Seq("location"), "left")
    val hasPrev = col("p.tracking").isNotNull
    val hasNew = col("n.tracking").isNotNull
    val status =
      when(hasPrev && hasNew, lit(TrackingStatus.Modified))
        .when(hasPrev && col("r.rmVersion").isNotNull,
          lit(TrackingStatus.Deleted))
        .when(hasPrev, lit(TrackingStatus.Existing))
        .otherwise(lit(TrackingStatus.Added))
    val tracking = struct(
      status.as("status"),
      when(hasPrev && col("r.rmVersion").isNotNull, col("r.rmVersion"))
        .when(hasPrev, col("p.tracking.snapshotId"))
        .otherwise(col("n.tracking.snapshotId")).as("snapshotId"),
      when(hasPrev && hasNew, col("n.tracking.snapshotId"))
        .otherwise(col("p.tracking.dvSnapshotId")).as("dvSnapshotId"),
      coalesce(col("p.tracking.sequenceNumber"),
        col("n.tracking.sequenceNumber")).as("sequenceNumber"),
      coalesce(col("p.tracking.fileSequenceNumber"),
        col("n.tracking.fileSequenceNumber")).as("fileSequenceNumber"),
      coalesce(col("n.tracking.firstRowId"),
        col("p.tracking.firstRowId")).as("firstRowId"))
    val updated = j.select(
      lit(DataContentType.Data).as("contentType"),
      col("location"),
      lit("parquet").as("fileFormat"),
      tracking.as("tracking"),
      when(hasNew, col("n.deletionVector"))
        .otherwise(col("p.deletionVector")).as("deletionVector"),
      lit(0).as("specId"),
      coalesce(col("n.partition"), col("p.partition")).as("partition"),
      coalesce(col("n.sortOrderId"), col("p.sortOrderId"))
        .as("sortOrderId"),
      coalesce(col("n.recordCount"), col("p.recordCount"))
        .as("recordCount"),
      coalesce(col("n.fileSizeInBytes"), col("p.fileSizeInBytes"))
        .as("fileSizeInBytes"),
      lit(4).as("formatVersion"),
      coalesce(col("n.tags"), col("p.tags")).as("tags"))
    val root = writeEntries(snap, updated)
    winner.unpersist()
    root
  }

  /** Stream a content-tree node back as add actions (the read path:
    * resolve the root via [[AdaptiveMetadata.ContentRoot.resolve]],
    * parquet-scan it, decode entries one at a time — driver memory
    * stays O(batch), the same streamed-handoff envelope as
    * DeltaScan.addFileIterator).
    */
  def addFileIterator(spark: org.apache.spark.sql.SparkSession,
      rootLocation: String, tableRootUriPath: String)
      : Iterator[AddFile] = {
    val df = spark.read.schema(entrySchema).parquet(rootLocation)
      .filter(col("contentType") === DataContentType.Data &&
        col("tracking.status") =!= TrackingStatus.Deleted)
    df.toLocalIterator().asScala.map(entryToAdd(_, tableRootUriPath))
  }

  /** One entry row → AddFile (inverse of the [[entriesDF]] mapping). */
  private[delta] def entryToAdd(r: Row,
      tableRootUriPath: String): AddFile = {
    val tracking = r.getStruct(r.fieldIndex("tracking"))
    val dvIdx = r.fieldIndex("deletionVector")
    val dv =
      if (r.isNullAt(dvIdx)) None
      else {
        val d = r.getStruct(dvIdx)
        Some(dvInfoToDescriptor(DeletionVectorInfo(
          d.getAs[String]("location"), d.getAs[Long]("offset"),
          d.getAs[Long]("sizeInBytes"), d.getAs[Long]("cardinality")),
          tableRootUriPath))
      }
    AddFile(
      path = r.getAs[String]("location"),
      partitionValues = Option(r.getAs[Map[String, String]]("partition"))
        .getOrElse(Map.empty),
      size = r.getAs[Long]("fileSizeInBytes"),
      modificationTime = 0L,
      dataChange = false,
      tags = Option(r.getAs[Map[String, String]]("tags")),
      deletionVector = dv,
      baseRowId = Option(tracking.getAs[Any]("firstRowId"))
        .map(_.asInstanceOf[Number].longValue))
  }
}
