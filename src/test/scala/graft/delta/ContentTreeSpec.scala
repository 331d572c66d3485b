package graft.delta

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Content-tree parity with reference kernel/src/content_tree/:
  * the stats field-id space (stats.rs tests), the Delta→Iceberg DV
  * conversion (dv_conversion.rs tests), and a manifest `checkpoint`
  * action round trip over a tree-backed table.
  */
class ContentTreeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import ContentTree._

  // ---- stats.rs `valid_mapping_roundtrips` ----
  test("field id → stats base: data and metadata spaces") {
    assert(fieldIdToStatisticsBase(0).contains(10000))
    assert(fieldIdToStatisticsBase(1).contains(10200))
    assert(fieldIdToStatisticsBase(2).contains(10400))
    assert(fieldIdToStatisticsBase(5).contains(11000))
    assert(fieldIdToStatisticsBase(100).contains(30000))
    assert(fieldIdToStatisticsBase(MAX_DATA_FIELD_ID)
      .contains(MAX_DATA_STATS_FIELD_ID))
    assert(fieldIdToStatisticsBase(LAST_UPDATED_SEQUENCE_NUMBER_FIELD_ID)
      .contains(9000))
    assert(fieldIdToStatisticsBase(ROW_ID_FIELD_ID).contains(9200))
  }

  // ---- stats.rs `field_id_to_statistics_base_rejects_invalid` ----
  test("field id → stats base: rejects negative, overflow and " +
      "unsupported reserved metadata ids") {
    assert(fieldIdToStatisticsBase(-1).isEmpty)
    assert(fieldIdToStatisticsBase(MAX_DATA_FIELD_ID + 1).isEmpty)
    assert(fieldIdToStatisticsBase(2147483541).isEmpty) // _commit_snapshot_id
    assert(fieldIdToStatisticsBase(2147483645).isEmpty) // _pos
    assert(fieldIdToStatisticsBase(2147483646).isEmpty) // _file
  }

  // ---- dv_conversion.rs `sample_dv` / absolute / inline ----
  test("DV conversion: relative z85 decodes, absolute passes through, " +
      "inline rejects; +8 Iceberg framing; absent offset defaults to 1") {
    val rel = DeletionVectorDescriptor("u", "ab^-aqEH.-t@S}K{vb[*k^",
      Some(4), 40, 6)
    val relInfo = extractDeletionVectorContent(rel)
    assert(relInfo == DeletionVectorInfo(
      "ab/deletion_vector_d2c639aa-8816-431a-aaf6-d3fe2512ff61.bin",
      4L, 48L, 6L))

    val absPath =
      "s3://another-bucket/deletion_vector_d2c639aa-8816-431a-aaf6-d3fe2512ff61.bin"
    val abs = DeletionVectorDescriptor("p", absPath, None, 40, 6)
    val absInfo = extractDeletionVectorContent(abs)
    assert(absInfo == DeletionVectorInfo(absPath, 1L, 48L, 6L))

    val inline = DeletionVectorDescriptor("i", "xyz", None, 40, 6)
    val e = intercept[IllegalArgumentException] {
      extractDeletionVectorContent(inline)
    }
    assert(e.getMessage.contains("Inline deletion vectors"))
  }

  test("manifest checkpoint round trip over a tree-backed table: " +
      "entries rebuild the exact live file set, DVs included") {
    val dir = TestSpark.tmpDir("amt-tree")
    val src = (1 to 60000).map(i => (i.toLong, s"v$i", s"p${i % 3}"))
      .toDF("k", "s", "p")
    DeltaTable.create(spark, dir, src.schema, Seq("p"))
    val t = DeltaTable.forPath(spark, dir)
    t.append(src)                  // v1
    // alternating deletes blow past the 512-byte inline cap so the DVs
    // PERSIST to files — inline DVs must be rejected by tree
    // construction (reference dv_conversion.rs), verified above
    t.deleteWhereDV("k % 2 = 0")   // v2: file DVs on every partition
    val snap = t.snapshot()
    val expected = t.toDF.orderBy("k").collect().toSeq

    // build + persist the content tree, wrap it in a manifest commit's
    // checkpoint action, and round-trip through the JSON line
    val root = ContentTree.writeRoot(snap)
    val action = AdaptiveMetadata.CheckpointAction(
      version = snap.version,
      contentRoot = root,
      protocol = snap.protocol,
      metadata = snap.metadata,
      transactions = Nil, domainMetadata = Nil,
      txnSidecars = Nil, domainMetadataSidecars = Nil)
    val line = AdaptiveMetadata.writeCheckpointAction(action)
    val parsed = AdaptiveMetadata.parseCheckpointAction(line).get
    assert(parsed.contentRoot == root)
    assert(parsed.metadata.schemaString == snap.metadata.schemaString)

    // read the tree back through the parsed root and rebuild the scan
    val resolved = parsed.contentRoot.resolve(snap.tableRoot.toString)
    val fs = Storage.fs(snap.tableRoot,
      spark.sessionState.newHadoopConf())
    val rootUri = fs.makeQualified(snap.tableRoot).toUri.getPath
    val adds = ContentTree.addFileIterator(spark, resolved, rootUri).toSeq
    val origAdds = new DeltaScan(snap, None).collectAddFiles(slim = true)
    assert(adds.map(_.path).sorted ==
      origAdds.map(a => Storage.decodeUriPath(a.path)).sorted)
    // DV cardinalities survive the Delta→Iceberg→Delta conversion
    assert(adds.flatMap(_.deletionVector).map(_.cardinality).sum ==
      origAdds.flatMap(_.deletionVector).map(_.cardinality).sum)
    assert(adds.flatMap(_.deletionVector).nonEmpty)

    // the rebuilt adds assemble to EXACTLY the table's rows: DV masks
    // from the converted absolute descriptors apply in-scan
    val rebuilt = new DeltaScan(snap, None)
      .assemble(adds, keepMeta = false)
    assert(rebuilt.orderBy("k").collect().toSeq == expected)

    // entry invariants: every entry is Data/parquet/Added at a real
    // commit version, recordCount from stats, formatVersion 4
    val entries = spark.read.schema(ContentTree.entrySchema)
      .parquet(resolved)
    assert(entries.filter(col("contentType") =!=
      ContentTree.DataContentType.Data).count() == 0)
    assert(entries.filter(col("fileFormat") =!= "parquet").count() == 0)
    assert(entries.filter(col("tracking.status") =!=
      ContentTree.TrackingStatus.Added).count() == 0)
    assert(entries.filter(col("formatVersion") =!= 4).count() == 0)
    assert(entries.agg(sum("recordCount")).head.getLong(0) == 60000L)
  }

  test("incremental updateRoot: diff-applied tree matches a fresh " +
      "build, with Existing/Modified/Deleted/Added tracking statuses " +
      "and inherited identity") {
    val dir = TestSpark.tmpDir("amt-incr")
    val src = (1 to 30000).map(i => (i.toLong, s"v$i", s"p${i % 3}"))
      .toDF("k", "s", "p")
    DeltaTable.create(spark, dir, src.schema, Seq("p"))
    val t = DeltaTable.forPath(spark, dir)
    t.append(src)                                   // v1: p0 p1 p2
    val tree1 = ContentTree.writeRoot(t.snapshot())
    t.append(src.filter($"p" === "p0" && $"k" <= 300)
      .withColumn("k", $"k" + 100000L))             // v2: new p0 files
    t.deleteWhereDV("k % 2 = 0 and p = 'p1'")       // v3: DV swap on p1
    t.deleteWhere("p = 'p2'")                       // v4: p2 removed whole
    val snap = t.snapshot()
    assert(snap.version == 4L)

    val tree2 = ContentTree.updateRoot(snap, tree1)
    assert(tree2.version == 4L)
    val rootUri = Storage.fs(snap.tableRoot,
        spark.sessionState.newHadoopConf())
      .makeQualified(snap.tableRoot).toUri.getPath

    // the updated tree reads back to EXACTLY the table's rows
    val adds = ContentTree.addFileIterator(spark,
      tree2.resolve(snap.tableRoot.toString), rootUri).toSeq
    val rebuilt = new DeltaScan(snap, None)
      .assemble(adds, keepMeta = false)
    assert(rebuilt.orderBy("k").collect().toSeq ==
      t.toDF.orderBy("k").collect().toSeq)

    // live entries equal a FRESH full build (identity fields aside)
    def liveSet(root: graft.delta.AdaptiveMetadata.ContentRoot) =
      spark.read.schema(ContentTree.entrySchema)
        .parquet(root.resolve(snap.tableRoot.toString))
        .filter(col("tracking.status") =!=
          ContentTree.TrackingStatus.Deleted)
        .select(col("location"), col("fileSizeInBytes"),
          coalesce(col("deletionVector.cardinality"), lit(-1L)))
        .collect().map(_.toString).toSet
    assert(liveSet(tree2) == liveSet(ContentTree.writeRoot(snap)))

    // tracking statuses tell the history
    val e = spark.read.schema(ContentTree.entrySchema)
      .parquet(tree2.resolve(snap.tableRoot.toString))
      .select(col("location"), col("tracking.status").as("st"),
        col("tracking.snapshotId").as("sid"),
        col("tracking.dvSnapshotId").as("dvSid"))
      .collect()
    import ContentTree.TrackingStatus._
    val p0 = e.filter(_.getString(0).contains("/p=p0/"))
    val p1 = e.filter(_.getString(0).contains("/p=p1/"))
    val p2 = e.filter(_.getString(0).contains("/p=p2/"))
    assert(p0.nonEmpty && p1.nonEmpty && p2.nonEmpty)
    // untouched v1 p0 files carried as Existing with inherited sid=1;
    // v2's fresh p0 files Added at 2
    assert(p0.map(_.getInt(1)).toSet == Set(Existing, Added))
    assert(p0.filter(_.getInt(1) == Existing).forall(_.getLong(2) == 1L))
    assert(p0.filter(_.getInt(1) == Added).forall(_.getLong(2) == 2L))
    // p1 files DV-swapped at v3: Modified, identity INHERITED from v1,
    // dvSnapshotId = the swapping commit
    assert(p1.map(_.getInt(1)).toSet == Set(Modified))
    assert(p1.forall(r => r.getLong(2) == 1L && r.getLong(3) == 3L))
    // p2 files tombstoned at v4
    assert(p2.map(_.getInt(1)).toSet == Set(Deleted))
    assert(p2.forall(_.getLong(2) == 4L))

    // a same-version update is a no-op handle
    assert(ContentTree.updateRoot(snap, tree2) eq tree2)
  }
}
