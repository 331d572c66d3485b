package graft.delta

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Equality-delete semantics over the content tree: Iceberg V2
  * sequence ordering (a delete at sequence S reaches only data files
  * with sequence strictly below S), null-safe key matching, multiple
  * equality-id groups, and the equality→position conversion
  * (matched rows → merged per-file DVs, equality entries leave the
  * tree, touched entries come back Modified with delta bitmaps).
  * The reference models `equality_ids`
  * (kernel/src/content_tree/mod.rs:214-219) but not application —
  * these semantics follow the published Iceberg spec.
  */
class EqualityDeletesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("k", StringType),
    StructField("v", IntegerType)))

  private def df(rows: Seq[(Any, Any, Any)]): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      rows.map(r => Row(r._1, r._2, r._3)).asJava, schema)
  }

  /** Build a table from per-version batches; returns (table, snapshot). */
  private def build(batches: Seq[DataFrame]): (DeltaTable, Snapshot) = {
    val dir = TestSpark.tmpDir("eqdel")
    DeltaTable.create(spark, dir, schema)
    val t = DeltaTable.forPath(spark, dir)
    batches.foreach(b => t.append(b.coalesce(1)))
    (t, t.snapshot())
  }

  private def treeRootWith(snap: Snapshot,
      files: Seq[EqualityDeletes.EqDeleteFile])
      : AdaptiveMetadata.ContentRoot = {
    val entries = ContentTree.entriesDF(snap).unionByName(
      EqualityDeletes.deleteEntriesDF(spark, files, Some(snap)))
    ContentTree.writeTree(snap, entries, 2)
  }

  private def treeWith(snap: Snapshot,
      files: Seq[EqualityDeletes.EqDeleteFile]): String =
    treeRootWith(snap, files).resolve(snap.tableRoot.toString)

  private def readIds(snap: Snapshot, resolved: String): Set[Long] =
    EqualityDeletes.readApplying(snap, resolved)
      .select("id").collect().map(_.getLong(0)).toSet

  test("sequence ordering is strict: a delete reaches older files " +
      "only, same-sequence and younger files survive") {
    val (_, snap) = build(Seq(
      df(Seq((1L, "a", 1), (2L, "b", 1))),  // seq 1
      df(Seq((3L, "a", 2), (4L, "b", 2))),                  // seq 2
      df(Seq((5L, "a", 3)))))                               // seq 3
    // delete every k='a' at sequence 2: id=1 (seq 1) dies; id=3
    // (seq 2, equal) and id=5 (seq 3, younger) survive
    val files = EqualityDeletes.writeDeleteFiles(snap,
      Seq("a").toDF("k"), Seq(1), sequenceNumber = 2L)
    assert(files.map(_.recordCount).sum == 1L)
    val resolved = treeWith(snap, files)
    assert(readIds(snap, resolved) == Set(2L, 3L, 4L, 5L))
  }

  test("null-safe matching: a NULL delete key matches NULL values") {
    val (_, snap) = build(Seq(
      df(Seq((1L, null, 1), (2L, "b", 1), (3L, null, 2)))))
    val files = EqualityDeletes.writeDeleteFiles(snap,
      df(Seq((null, null, null))).select("k"),
      Seq(1), sequenceNumber = 5L)
    val resolved = treeWith(snap, files)
    assert(readIds(snap, resolved) == Set(2L))
  }

  test("multiple equality-id groups apply independently; duplicate " +
      "keys collapse to their widest (highest-sequence) reach") {
    val (_, snap) = build(Seq(
      df(Seq((1L, "a", 10), (2L, "b", 20),
        (3L, "c", 30))),                                    // seq 1
      df(Seq((4L, "a", 40)))))                              // seq 2
    // group 1: delete on k — 'a' at seq 2 (reaches seq 1 only) AND
    // 'a' again at seq 3 (reaches both) → max-seq collapse must win
    val g1 = EqualityDeletes.writeDeleteFiles(snap,
      Seq("a").toDF("k"), Seq(1), sequenceNumber = 2L) ++
      EqualityDeletes.writeDeleteFiles(snap,
        Seq("a").toDF("k"), Seq(1), sequenceNumber = 3L)
    // group 2: delete on (id, v)
    val g2 = EqualityDeletes.writeDeleteFiles(snap,
      Seq((2L, 20)).toDF("id", "v"), Seq(0, 2), sequenceNumber = 9L)
    val resolved = treeWith(snap, g1 ++ g2)
    assert(readIds(snap, resolved) == Set(3L))
  }

  test("delete entries validate and carry ids + sequence; empty key " +
      "frames produce no descriptors") {
    val (_, snap) = build(Seq(df(Seq((1L, "a", 1)))))
    val files = EqualityDeletes.writeDeleteFiles(snap,
      Seq(("x", 1)).toDF("k", "v"), Seq(1, 2), sequenceNumber = 7L)
    assert(files.nonEmpty)
    assert(files.forall(f => f.equalityIds == Seq(1, 2) &&
      f.sequenceNumber == 7L && f.location.startsWith("_delta_log/_amt/")))
    val entries = EqualityDeletes.deleteEntriesDF(spark, files, None)
    val r = entries.collect().head
    assert(r.getAs[Int]("contentType") ==
      ContentTree.DataContentType.EqualityDeletes)
    assert(r.getSeq[Int](r.fieldIndex("equalityIds")) == Seq(1, 2))
    val none = EqualityDeletes.writeDeleteFiles(snap,
      Seq.empty[String].toDF("k"), Seq(1), sequenceNumber = 8L)
    assert(none.isEmpty)
  }

  test("conversion: applying read == converted plain read; equality " +
      "entries leave; touched entries Modified with delta bitmaps; " +
      "existing DVs merge at bitmap level") {
    val dir = TestSpark.tmpDir("eqconv")
    DeltaTable.create(spark, dir, schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(df((1L to 6L).map(i =>
      (i, if (i % 2 == 0) "e" else "o", i.toInt)).toSeq).coalesce(1))                                  // v1
    t.deleteWhereDV("id = 5")                               // v2: DV
    val snap = t.snapshot()
    val files = EqualityDeletes.writeDeleteFiles(snap,
      Seq("e").toDF("k"), Seq(1), snap.version + 1)
    val resolved0 = treeWith(snap, files)
    val before = readIds(snap, resolved0)
    assert(before == Set(1L, 3L))

    val newRoot = EqualityDeletes.convertToPositionDeletes(
      snap, resolved0, 2)
    val resolved = newRoot.resolve(snap.tableRoot.toString)
    val after = ContentTree.readEntriesDF(spark, resolved,
      snap.tableRoot.toString)
    assert(after.filter(col("contentType") ===
      ContentTree.DataContentType.EqualityDeletes).count() == 0)
    val mod = after.filter(col("tracking.status") ===
      ContentTree.TrackingStatus.Modified).collect()
    assert(mod.length == 1)
    val tr = mod.head.getStruct(mod.head.fieldIndex("tracking"))
    assert(tr.getAs[Long]("dvSnapshotId") == snap.version)
    // delta bitmap = the NEWLY dead rows only (ids 2,4,6 at
    // positions 1,3,5 of the single ordered file) — id 5 was already
    // DV-dead and must not reappear in the delta
    val delta = DeletionVectors.deserialize(
      tr.getAs[Array[Byte]]("deletedPositions"))
    assert(delta.getLongCardinality == 3)
    // merged DV cardinality = old (1) + new (3)
    val dv = mod.head.getStruct(mod.head.fieldIndex("deletionVector"))
    assert(dv.getAs[Long]("cardinality") == 4L)

    // the converted tree reads through the PLAIN DV scan path
    val rootUri = Storage.fs(snap.tableRoot,
      spark.sessionState.newHadoopConf())
      .makeQualified(snap.tableRoot).toUri.getPath
    val adds = ContentTree.addFileIterator(spark, resolved,
      snap.tableRoot.toString, rootUri).toSeq
    val plain = snap.scanBuilder().build()
      .assemble(adds, keepMeta = false)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(plain == before)
  }

  test("equality entries survive incremental tree maintenance " +
      "(updateRoot) and keep applying with the original sequence") {
    val dir = TestSpark.tmpDir("equpd")
    DeltaTable.create(spark, dir, schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(df(Seq((1L, "a", 1), (2L, "b", 1))).coalesce(1))   // v1
    val snap1 = t.snapshot()
    // delete k='a' at sequence 2: reaches the v1 file only
    val files = EqualityDeletes.writeDeleteFiles(snap1,
      Seq("a").toDF("k"), Seq(1), sequenceNumber = 2L)
    val root1 = treeRootWith(snap1, files)
    // advance the TABLE past the tree: new 'a' rows land at seq 2+
    t.append(df(Seq((3L, "a", 2), (4L, "b", 2))).coalesce(1))   // v2
    t.append(df(Seq((5L, "a", 3))).coalesce(1))                 // v3
    val snap2 = t.snapshot()
    val root2 = ContentTree.updateRoot(snap2, root1, 2)
    val resolved2 = root2.resolve(snap2.tableRoot.toString)
    val eq = ContentTree.readEntriesDF(spark, resolved2,
      snap2.tableRoot.toString)
      .filter(col("contentType") ===
        ContentTree.DataContentType.EqualityDeletes)
    assert(eq.count() == files.size.toLong,
      "updateRoot must carry equality-delete entries through")
    // id=1 ('a' @ seq 1) stays dead; ids 3 and 5 ('a' @ seq 2,3)
    // survive the seq-2 delete
    assert(readIds(snap2, resolved2) == Set(2L, 3L, 4L, 5L))
  }

  test("plan shape: the apply is ONE data scan arm + a broadcast " +
      "anti-join per id group; the sequence rides as a partition " +
      "column, not a per-row join") {
    val (_, snap) = build(Seq(
      df(Seq((1L, "a", 1), (2L, "b", 1))),
      df(Seq((3L, "a", 2), (4L, "b", 2)))))
    val files = EqualityDeletes.writeDeleteFiles(snap,
      Seq("a").toDF("k"), Seq(1), sequenceNumber = 3L)
    val resolved = treeWith(snap, files)
    val applied = EqualityDeletes.readApplying(snap, resolved)
    // string-level pins (the AQE wrapper hides children from collect)
    val s = applied.queryExecution.executedPlan.toString
    // ONE log-backed data arm (2 commits, 1 scan — the sequence is a
    // per-file constant partition column served by the FileIndex, so
    // it appears in the scan's column list, never via a join)
    assert("GraftFileIndex\\(".r.findAllIn(s).size == 1, s.take(1200))
    assert(s.contains("__seq"), s.take(1200))
    // the delete side broadcasts and the apply is a hash ANTI join
    assert(s.contains("BroadcastHashJoin") && s.contains("LeftAnti"),
      s.take(1200))
  }

  test("foreign delete files (no stored sequence column) mix with " +
      "graft-written ones in one id group; the descriptor sequence " +
      "applies and the plan stays two scan arms") {
    val (_, snap) = build(Seq(
      df(Seq((1L, "a", 1), (2L, "b", 1))),   // data sequence 1
      df(Seq((3L, "c", 2), (4L, "d", 2))))) // data sequence 2
    // graft-written delete (stores __del_seq) at sequence 3
    val f1 = EqualityDeletes.writeDeleteFiles(snap,
      Seq("a").toDF("k"), Seq(1), sequenceNumber = 3L)
    // FOREIGN delete file, as an Iceberg writer would produce it: the
    // key column only, no stored sequence — the descriptor carries it
    val rel = "_delta_log/_amt/foreign-del"
    val abs = snap.tableRoot.toString.stripSuffix("/") + "/" + rel
    Seq("b", "c").toDF("k").coalesce(1).write.parquet(abs)
    val fs = Storage.fs(snap.tableRoot,
      spark.sessionState.newHadoopConf())
    val part = Storage.listFilesRecursive(fs,
      new org.apache.hadoop.fs.Path(abs))
      .filter(_.getPath.getName.endsWith(".parquet")).head
    val f2 = EqualityDeletes.EqDeleteFile(
      rel + "/" + part.getPath.getName, Seq(1), sequenceNumber = 2L,
      recordCount = 2L, sizeInBytes = part.getLen)
    val applied = EqualityDeletes.readApplying(snap,
      treeWith(snap, f1 :+ f2))
    // 'a' (seq 1) dropped by the graft delete (1 < 3); 'b' (seq 1)
    // dropped by the FOREIGN delete (1 < 2); 'c' (seq 2) SURVIVES —
    // its file is not strictly below the foreign delete's sequence 2
    assert(applied.select("id").collect().map(_.getLong(0)).toSet ==
      Set(3L, 4L))
    // mixing did not widen the plan: one data arm + one delete arm
    val s = applied.queryExecution.executedPlan.toString
    assert("FileScan parquet".r.findAllIn(s).size == 2, s.take(1500))
  }

  test("appendDeleteEntries: chained O(root) delete commits reuse " +
      "every leaf by reference; conversion folds the loose entries") {
    val (_, snap) = build(Seq(
      df(Seq((1L, "a", 1), (2L, "b", 1), (3L, "c", 1)))))     // seq 1
    val root0 = ContentTree.writeRoot(snap, 2)
    def leafLocs(resolved: String): Set[String] =
      spark.read.parquet(resolved)
        .filter(col("contentType") ===
          ContentTree.DataContentType.DataManifest)
        .select("location").collect().map(_.getString(0)).toSet
    val leaves0 = leafLocs(root0.resolve(snap.tableRoot.toString))
    assert(leaves0.nonEmpty)
    // two chained delete commits, each a root-only rewrite
    val f1 = EqualityDeletes.writeDeleteFiles(snap,
      Seq("a").toDF("k"), Seq(1), sequenceNumber = 2L)
    val root1 = EqualityDeletes.appendDeleteEntries(snap, root0, f1)
    val f2 = EqualityDeletes.writeDeleteFiles(snap,
      Seq("b").toDF("k"), Seq(1), sequenceNumber = 3L)
    val root2 = EqualityDeletes.appendDeleteEntries(snap, root1, f2)
    val resolved2 = root2.resolve(snap.tableRoot.toString)
    // leaves carried by reference through BOTH commits
    assert(leafLocs(resolved2) == leaves0)
    assert(readIds(snap, resolved2) == Set(3L))
    // conversion folds both loose entry generations into DVs
    val root3 = EqualityDeletes.convertToPositionDeletes(
      snap, resolved2, 2)
    val resolved3 = root3.resolve(snap.tableRoot.toString)
    val after = ContentTree.readEntriesDF(spark, resolved3,
      snap.tableRoot.toString)
    assert(after.filter(col("contentType") ===
      ContentTree.DataContentType.EqualityDeletes).count() == 0)
    val rootUri = Storage.fs(snap.tableRoot,
      spark.sessionState.newHadoopConf())
      .makeQualified(snap.tableRoot).toUri.getPath
    val adds = ContentTree.addFileIterator(spark, resolved3,
      snap.tableRoot.toString, rootUri).toSeq
    val plain = snap.scanBuilder().build()
      .assemble(adds, keepMeta = false)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(plain == Set(3L))
  }

  test("stats-column selection shrink: updateRoot projects carried " +
      "stats into the narrower schema instead of nulling them") {
    val (t, snap1) = build(Seq(
      df(Seq((1L, "a", 1), (2L, "b", 2), (3L, "c", 3)))))
    // full-selection tree: stats structs for id, k, v
    val root0 = ContentTree.writeRoot(snap1, 2)
    // shrink the selection to the FIRST column only, then advance
    t.setProperties(Map("delta.dataSkippingNumIndexedCols" -> "1"))
    t.append(df(Seq((9L, "z", 9))).coalesce(1))
    val snap2 = t.snapshot()
    val root1 = ContentTree.updateRoot(snap2, root0, 2)
    val entries = ContentTree.readEntriesDF(spark,
      root1.resolve(snap2.tableRoot.toString), snap2.tableRoot.toString)
    val st = entries.schema(ContentTree.CONTENT_STATS).dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(st.fieldNames.toSeq == Seq("id"),
      s"selection must shrink the stats struct, got ${st.fieldNames.toSeq}")
    // the CARRIED (pre-shrink) entry keeps its id bounds — pruning on
    // id still works on the migrated tree
    val carried = entries.filter(col("location").isNotNull &&
      col("tracking.snapshotId") === 1L)
      .select(col(s"${ContentTree.CONTENT_STATS}.id.lower_bound"),
        col(s"${ContentTree.CONTENT_STATS}.id.upper_bound"))
      .collect()
    assert(carried.nonEmpty && carried.forall(r =>
      !r.isNullAt(0) && r.getLong(0) == 1L && r.getLong(1) == 3L),
      s"carried stats must project, not null: ${carried.mkString(",")}")
    val rootUri = Storage.fs(snap2.tableRoot,
      spark.sessionState.newHadoopConf())
      .makeQualified(snap2.tableRoot).toUri.getPath
    val kept = ContentTree.prunedAddFileIterator(spark,
      root1.resolve(snap2.tableRoot.toString), snap2.tableRoot.toString,
      rootUri, "id = 9").toSeq
    assert(kept.size == 1, s"prune must keep only the matching file")
  }

  test("loose delete entries do not break manifest reuse: updateRoot " +
      "across an append carries unaffected leaves by reference and " +
      "folds the loose deletes into the new generation") { withReuseProbe {
    val (t, snap1) = build(Seq(
      df(Seq((1L, "a", 1), (2L, "b", 1), (3L, "c", 1)))))
    val root0 = ContentTree.writeRoot(snap1, 2)
    def leafLocs(root: AdaptiveMetadata.ContentRoot): Set[String] =
      spark.read.parquet(root.resolve(snap1.tableRoot.toString))
        .filter(col("contentType") ===
          ContentTree.DataContentType.DataManifest)
        .select("location").collect().map(_.getString(0)).toSet
    val leaves0 = leafLocs(root0)
    assert(leaves0.nonEmpty)
    val f = EqualityDeletes.writeDeleteFiles(snap1,
      Seq("a").toDF("k"), Seq(1), sequenceNumber = 2L)
    val root1 = EqualityDeletes.appendDeleteEntries(snap1, root0, f)
    // a plain append touches no existing leaf: every original leaf
    // must carry into the new root BY REFERENCE (a loose delete row
    // previously disqualified the whole layout and forced a full
    // rewrite), with the loose deletes folded into the new generation
    t.append(df(Seq((4L, "d", 2))).coalesce(1))
    val snap2 = t.snapshot()
    val root2 = ContentTree.updateRoot(snap2, root1, 2)
    assert(leaves0.subsetOf(leafLocs(root2)),
      "unaffected leaves must be carried by reference, not rewritten")
    // the folded deletes still apply; the new row is visible
    assert(readIds(snap2,
      root2.resolve(snap2.tableRoot.toString)) == Set(2L, 3L, 4L))
    // and pending deletes now parked INSIDE a carried leaf still trip
    // the compaction guard (the probe covers the whole tree, not just
    // the affected slice)
    t.optimizeCompact()
    val snap3 = t.snapshot()
    val e = intercept[IllegalArgumentException] {
      ContentTree.updateRoot(snap3, root2, 2)
    }
    assert(e.getMessage.contains("dataChange=false"))
  } }

  test("plan width is independent of the delete-commit count: many " +
      "sequences of one id group still read as ONE delete scan arm") {
    val (_, snap) = build(Seq(df(Seq((1L, "a", 1), (2L, "b", 1),
      (3L, "c", 1), (4L, "d", 1)))))
    var root = ContentTree.writeRoot(snap, 2)
    // four delete commits at four different sequences, same id group
    (2 to 5).foreach { seq =>
      val f = EqualityDeletes.writeDeleteFiles(snap,
        Seq(s"${('a' + seq - 2).toChar}").toDF("k"), Seq(1), seq.toLong)
      root = EqualityDeletes.appendDeleteEntries(snap, root, f)
    }
    val applied = EqualityDeletes.readApplying(snap,
      root.resolve(snap.tableRoot.toString))
    assert(applied.select("id").collect().isEmpty)
    val s = applied.queryExecution.executedPlan.toString
    // exactly TWO parquet scans: the data arm + ONE delete-keys arm
    // (the stored __del_seq column collapses the per-sequence arms)
    assert("FileScan parquet".r.findAllIn(s).size == 2, s.take(1500))
  }

  test("pruned applying read: content_stats skip drops whole files " +
      "before the scan, the residual predicate reaches the parquet " +
      "read, and equality deletes still apply") {
    val (_, snap) = build(Seq(
      df(Seq((1L, "a", 1), (2L, "b", 1), (3L, "a", 1))),      // ids 1-3
      df(Seq((100L, "a", 2), (101L, "b", 2), (102L, "c", 2)))))
    val files = EqualityDeletes.writeDeleteFiles(snap,
      Seq("a").toDF("k"), Seq(1), sequenceNumber = 9L)
    val resolved = treeWith(snap, files)
    val prunedDf = EqualityDeletes.readApplyingPruned(snap, resolved,
      "id < 50")
    assert(prunedDf.select("id").collect().map(_.getLong(0)).toSet
      == Set(2L))
    val s = prunedDf.queryExecution.executedPlan.toString
    // stats skipping kept ONE of the two data files
    assert(s.contains("GraftFileIndex(1 paths)"), s.take(1200))
    // the residual reaches the parquet scan as a pushed filter
    assert(s.contains("PushedFilters") && s.contains("LessThan(id,50"),
      s.take(1200))
    // and the unpruned read filtered post-hoc agrees
    val ref = EqualityDeletes.readApplying(snap, resolved)
      .filter(col("id") < 50)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ref == Set(2L))
  }

  test("compaction guard: updateRoot refuses to advance pending " +
      "equality deletes across a dataChange=false rewrite; convert " +
      "first and the same advance succeeds without resurrection") {
    val dir = TestSpark.tmpDir("eqopt")
    DeltaTable.create(spark, dir, schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(df(Seq((1L, "a", 1), (2L, "b", 1))).coalesce(1))   // v1
    t.append(df(Seq((3L, "a", 2))).coalesce(1))                 // v2
    val snap2 = t.snapshot()
    // delete at seq 2: reaches the v1 file only — id 1 dies, id 3
    // (seq 2, equal) survives
    val files = EqualityDeletes.writeDeleteFiles(snap2,
      Seq("a").toDF("k"), Seq(1), sequenceNumber = 2L)
    val rootEq = treeRootWith(snap2, files)
    assert(readIds(snap2, rootEq.resolve(snap2.tableRoot.toString))
      == Set(2L, 3L))
    // OPTIMIZE moves the surviving rows into a new file whose
    // sequence postdates the delete — advancing the tree as-is would
    // resurrect id 1
    t.optimizeCompact()
    val snap3 = t.snapshot()
    val e = intercept[IllegalArgumentException] {
      ContentTree.updateRoot(snap3, rootEq, 2)
    }
    assert(e.getMessage.contains("convert"), e.getMessage)
  }

  test("materializing equality deletes as a LOG DV commit makes them " +
      "cross-engine visible and compaction-safe") {
    val dir = TestSpark.tmpDir("eqmat")
    DeltaTable.create(spark, dir, schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(df(Seq((1L, "a", 1), (2L, "b", 1))).coalesce(1))   // v1
    t.append(df(Seq((3L, "a", 2))).coalesce(1))                 // v2
    val snap2 = t.snapshot()
    val files = EqualityDeletes.writeDeleteFiles(snap2,
      Seq("a").toDF("k"), Seq(1), sequenceNumber = 2L)
    val rootEq = treeRootWith(snap2, files)
    // BEFORE: the log knows nothing of the delete
    assert(t.toDF.count() == 3)

    val (vDv, rootClean) = EqualityDeletes.commitAsDeletionVectors(
      t, rootEq.resolve(snap2.tableRoot.toString))
    assert(vDv == snap2.version + 1)
    // AFTER: a plain log-level read (any engine) sees the delete
    assert(t.toDF.select("id").collect().map(_.getLong(0)).toSet
      == Set(2L, 3L))
    // the advanced tree has no equality entries and reads identically
    assert(ContentTree.readEntriesDF(spark,
      rootClean.resolve(snap2.tableRoot.toString),
      snap2.tableRoot.toString)
      .filter(col("contentType") ===
        ContentTree.DataContentType.EqualityDeletes).count() == 0)
    assert(readIds(t.snapshot(), rootClean.resolve(
      snap2.tableRoot.toString)) == Set(2L, 3L))

    // compaction now reads THROUGH the materialized DVs — the full
    // maintenance chain composes with no resurrection
    t.optimizeCompact()
    val snapOpt = t.snapshot()
    val rootAdv = ContentTree.updateRoot(snapOpt, rootClean, 2)
    val rootUri = Storage.fs(snapOpt.tableRoot,
      spark.sessionState.newHadoopConf())
      .makeQualified(snapOpt.tableRoot).toUri.getPath
    val adds = ContentTree.addFileIterator(spark,
      rootAdv.resolve(snapOpt.tableRoot.toString),
      snapOpt.tableRoot.toString, rootUri).toSeq
    val got = snapOpt.scanBuilder().build()
      .assemble(adds, keepMeta = false)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 3L), s"resurrection check failed: $got")
  }

  test("the materialization commit is first-class CDF: deleted rows " +
      "surface as 'delete' changes at the committed version") {
    val dir = TestSpark.tmpDir("eqcdf")
    DeltaTable.create(spark, dir, schema, configuration = Map(
      "delta.enableChangeDataFeed" -> "true"))
    val t = DeltaTable.forPath(spark, dir)
    t.append(df(Seq((1L, "a", 1), (2L, "b", 1), (3L, "a", 2),
      (4L, "c", 2))).coalesce(1))                              // v1
    val snap = t.snapshot()
    val files = EqualityDeletes.writeDeleteFiles(snap,
      Seq("a").toDF("k"), Seq(1), sequenceNumber = 2L)
    val rootEq = treeRootWith(snap, files)
    val (vDv, _) = EqualityDeletes.commitAsDeletionVectors(
      t, rootEq.resolve(snap.tableRoot.toString))
    val cdf = TableChanges.read(spark, dir, vDv, Some(vDv))
    val dels = cdf.filter(col("_change_type") === "delete")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(dels == Set(1L, 3L),
      s"materialized deletes must flow through CDF, got $dels")
    assert(cdf.filter(col("_change_type") =!= "delete").count() == 0,
      "a pure materialization commit emits only deletes")
  }

  test("materialization removes fully-dead files outright") {
    val dir = TestSpark.tmpDir("eqmatgone")
    DeltaTable.create(spark, dir, schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(df(Seq((1L, "a", 1), (2L, "a", 1))).coalesce(1))   // v1
    t.append(df(Seq((3L, "b", 2))).coalesce(1))                 // v2
    val snap = t.snapshot()
    val files = EqualityDeletes.writeDeleteFiles(snap,
      Seq("a").toDF("k"), Seq(1), sequenceNumber = 2L)
    val rootEq = treeRootWith(snap, files)
    val (_, rootClean) = EqualityDeletes.commitAsDeletionVectors(
      t, rootEq.resolve(snap.tableRoot.toString))
    // the v1 file was entirely 'a' rows: it must be REMOVED, not
    // re-added with an all-dead DV
    val adds = t.snapshot().scanBuilder().build().collectAddFiles()
    assert(adds.size == 1 && adds.head.deletionVector.isEmpty)
    assert(t.toDF.select("id").collect().map(_.getLong(0)).toSet
      == Set(3L))
    assert(readIds(t.snapshot(),
      rootClean.resolve(snap.tableRoot.toString)) == Set(3L))
  }

  test("vacuum cannot strand delete files: they live under " +
      "_delta_log/_amt, outside vacuum's data-root sweep") {
    val dir = TestSpark.tmpDir("eqvac")
    DeltaTable.create(spark, dir, schema, configuration = Map(
      "delta.deletedFileRetentionDuration" -> "interval 0 milliseconds"))
    val t = DeltaTable.forPath(spark, dir)
    t.append(df(Seq((1L, "a", 1), (2L, "b", 1))).coalesce(1))
    val snap = t.snapshot()
    val files = EqualityDeletes.writeDeleteFiles(snap,
      Seq("a").toDF("k"), Seq(1), sequenceNumber = 2L)
    val resolved = treeWith(snap, files)
    t.vacuum()
    assert(readIds(snap, resolved) == Set(2L),
      "vacuum must not reach equality-delete files")
  }

  test("conversion with nothing matched drops the equality entries " +
      "and leaves data entries untouched") {
    val (_, snap) = build(Seq(df(Seq((1L, "a", 1)))))
    val files = EqualityDeletes.writeDeleteFiles(snap,
      Seq("zzz").toDF("k"), Seq(1), snap.version + 1)
    val resolved0 = treeWith(snap, files)
    val newRoot = EqualityDeletes.convertToPositionDeletes(
      snap, resolved0, 2)
    val after = ContentTree.readEntriesDF(spark,
      newRoot.resolve(snap.tableRoot.toString), snap.tableRoot.toString)
    assert(after.filter(col("contentType") ===
      ContentTree.DataContentType.EqualityDeletes).count() == 0)
    assert(after.filter(col("deletionVector").isNotNull).count() == 0)
    assert(readIds(snap, newRoot.resolve(snap.tableRoot.toString))
      == Set(1L))
  }
  /** Pin the manifest-reuse probe ON for small fixtures: updateRoot
    * skips the probe below graft.tree.reuseProbeMinEntries (merging a
    * tiny tree outright is cheaper), but these tests exist to verify
    * the reuse mechanics themselves.
    */
  private def withReuseProbe[A](f: => A): A = {
    System.setProperty("graft.tree.reuseProbeMinEntries", "0")
    try f finally System.clearProperty("graft.tree.reuseProbeMinEntries")
  }
}
