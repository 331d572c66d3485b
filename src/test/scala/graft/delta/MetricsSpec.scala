package graft.delta

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.TestSpark

/** Operation metrics (reference kernel/src/metrics/): snapshot builds,
  * commits, scans and crc reads emit correlated typed events to the
  * registered reporter; a broken reporter never breaks the operation.
  */
class MetricsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import MetricEvent._

  private def src(lo: Int, hi: Int) =
    (lo to hi).map(i => (i.toLong, s"v$i")).toDF("k", "s")

  private def withReporter[A](f: InMemoryReporter => A): A = {
    val r = new InMemoryReporter
    val prev = Metrics.reporter
    Metrics.reporter = r
    try f(r) finally Metrics.reporter = prev
  }

  test("snapshot build, commit and scan emit correlated events") {
    val dir = TestSpark.tmpDir("mx")
    withReporter { r =>
      DeltaTable.create(spark, dir, src(1, 1).schema)
      val t = DeltaTable.forPath(spark, dir)
      t.append(src(1, 10))
      r.clear()

      val cnt = t.toDF.count()
      assert(cnt == 10)
      val events = r.events

      val seg = events.collect { case e: LogSegmentLoadSuccess => e }
      assert(seg.nonEmpty && seg.head.version == 1L
        && seg.head.numDeltas == 2 && seg.head.numCheckpointParts == 0)

      val snapBuilt = events.collect { case e: SnapshotBuildSuccess => e }
      assert(snapBuilt.nonEmpty && snapBuilt.head.version == 1L)
      // crc chain is intact after create+append → crc fast path
      assert(snapBuilt.head.pmSource == "crc")
      assert(events.exists { case e: CrcReadSuccess => e.version == 1L
        case _ => false })
      // the build's events share one operation id
      assert(seg.head.operationId == snapBuilt.head.operationId)

      val scans = events.collect { case e: ScanFilesCollected => e }
      assert(scans.nonEmpty && scans.head.numFiles >= 1
        && scans.head.predicate.isEmpty)
    }
  }

  test("scan emits per-phase sub-durations: planNs+execNs partition " +
      "the total; executor-attributed phase times are harvested") {
    val dir = TestSpark.tmpDir("mx-ph")
    withReporter { r =>
      DeltaTable.create(spark, dir, src(1, 1).schema)
      val t = DeltaTable.forPath(spark, dir)
      // several commits so the replay-dedup aggregate does real work,
      // and stats so the skip filter parses JSON
      (0 until 4).foreach(i => t.append(src(i * 100 + 1, i * 100 + 100)))
      r.clear()

      val files = new DeltaScan(t.snapshot(), Some("k > 150"))
        .collectAddFiles()
      assert(files.nonEmpty)
      val e = r.events.collect { case s: ScanFilesCollected => s }.head
      assert(e.predicate.contains("k > 150"))
      // driver phases partition the wall total (boundary-measured, so
      // the sum must match the total up to clock-read jitter)
      assert(e.planNs >= 0 && e.execNs >= 0)
      assert(math.abs((e.planNs + e.execNs) - e.durationNs) <=
        math.max(e.durationNs / 100, 2000000L),
        s"plan=${e.planNs} exec=${e.execNs} total=${e.durationNs}")
      // executor-attributed phases are measured (>=0), not the -1
      // "not measured" sentinel of paths that skip the harvest
      assert(e.scanExecMs >= 0 && e.dedupExecMs >= 0 &&
        e.pipelineExecMs >= 0)
    }
  }

  test("commit success counts rebase attempts; typed conflicts report " +
      "failure") {
    val dir = TestSpark.tmpDir("mx-c")
    withReporter { r =>
      DeltaTable.create(spark, dir, src(1, 1).schema)
      val t = DeltaTable.forPath(spark, dir)
      val stale = t.snapshot()
      t.append(src(1, 5)) // v1
      r.clear()
      t.appendFrom(stale, src(6, 9)) // conflict at v1 → rebase to v2
      val ok = r.events.collect { case e: TransactionCommitSuccess => e }
      assert(ok.nonEmpty && ok.head.version == 2L && ok.head.attempts == 1)

      r.clear()
      val stale2 = t.snapshot()
      t.setProperties(Map("foo" -> "bar"))
      intercept[MetadataChangedException] { t.appendFrom(stale2, src(1, 2)) }
      val bad = r.events.collect { case e: TransactionCommitFailure => e }
      assert(bad.nonEmpty
        && bad.head.reason == "MetadataChangedException"
        && bad.head.attempts == 1)
    }
  }

  test("a 50-commit CDF range read buffers exactly the range's file " +
      "actions on the driver (envelope gauge), one parse per commit") {
    val dir = TestSpark.tmpDir("mx-cdf")
    withReporter { r =>
      DeltaTable.create(spark, dir, src(1, 1).schema,
        configuration = Map(TableChanges.CDF_ENABLED_KEY -> "true"))
      val t = DeltaTable.forPath(spark, dir)
      (1 to 50).foreach(i =>
        t.append(src(i * 10, i * 10 + 5).repartition(1)))
      r.clear()

      val n = TableChanges.read(spark, dir, 1, Some(50L)).count()
      assert(n == 50L * 6)
      val parsed = r.events.collect { case e: CdfCommitParsed => e }
      assert(parsed.size == 50 &&
        parsed.map(_.version).sorted == (1L to 50L))
      val env = r.events.collect { case e: CdfRangeClassified => e }
      // exactly ONE envelope event; the buffered count is the range's
      // file actions — one add per commit, nothing fatter (a regression
      // to buffering parsed JSON or per-commit plans can't satisfy this
      // equality while staying O(actions))
      assert(env.size == 1)
      assert(env.head.numCommits == 50)
      assert(env.head.numFileActions == 50L)
      assert(env.head.operationId == parsed.head.operationId)
      // planned CDF I/O: one add per commit, bytes from the actions
      val io = r.events.collect { case e: IoBytes => e }
        .filter(_.phase == "cdf_scan")
      assert(io.size == 1 && io.head.files == 50L && io.head.bytes > 0,
        s"cdf read not metered: $io")
    }
  }

  test("a throwing reporter never fails the operation") {
    val dir = TestSpark.tmpDir("mx-t")
    val prev = Metrics.reporter
    Metrics.reporter = new MetricsReporter {
      override def report(event: MetricEvent): Unit =
        throw new RuntimeException("boom")
    }
    try {
      DeltaTable.create(spark, dir, src(1, 1).schema)
      val t = DeltaTable.forPath(spark, dir)
      t.append(src(1, 5))
      assert(t.toDF.count() == 5)
    } finally Metrics.reporter = prev
  }

  test("failed snapshot builds report SnapshotBuildFailure") {
    withReporter { r =>
      intercept[Exception] {
        Snapshot.forTable(spark, TestSpark.tmpDir("mx-f") + "/absent")
      }
      assert(r.events.exists(_.isInstanceOf[SnapshotBuildFailure]))
    }
  }

  test("tree handoff gauge: small manifest trees collect in one job; " +
      "unknown-size trees stream behind the shuffle") {
    val dir = TestSpark.tmpDir("mx-tree")
    withReporter { r =>
      DeltaTable.create(spark, dir, src(1, 1).schema)
      val t = DeltaTable.forPath(spark, dir)
      t.append(src(1, 50).repartition(2))
      val snap = t.snapshot()
      val root = ContentTree.writeRoot(snap)
      val tableRoot = snap.tableRoot.toString
      val rootUri = Storage
        .fs(snap.tableRoot, spark.sessionState.newHadoopConf())
        .makeQualified(snap.tableRoot).toUri.getPath
      r.clear()
      val adds = ContentTree.addFileIterator(spark,
        root.resolve(tableRoot), tableRoot, rootUri).toSeq
      assert(adds.size == 2)
      val h = r.events.collect { case e: TreeHandoff => e }
      // root manifests record 2 entries → one-job collect arm
      assert(h.size == 1 && !h.head.shuffled && h.head.entryCount == 2L)

      // a single-node tree (data entries directly in the root, no
      // manifest level) records no entry count → the handoff must take
      // the conservative shuffled arm and report the count unknown
      val flatLoc = TestSpark.tmpDir("mx-tree-flat")
      ContentTree.readEntriesDF(spark, root.resolve(tableRoot), tableRoot)
        .filter(col("contentType") ===
          ContentTree.DataContentType.Data)
        .coalesce(1).write.mode("overwrite").parquet(flatLoc)
      r.clear()
      val flatAdds = ContentTree.addFileIterator(spark, flatLoc,
        tableRoot, rootUri).toSeq
      assert(flatAdds.map(_.path).sorted == adds.map(_.path).sorted)
      val h2 = r.events.collect { case e: TreeHandoff => e }
      assert(h2.size == 1 && h2.head.shuffled && h2.head.entryCount == -1L)
    }
  }

  test("equality-delete apply reports groups, descriptor/key counts " +
      "and the broadcast arm") {
    val dir = TestSpark.tmpDir("mx-eq")
    withReporter { r =>
      DeltaTable.create(spark, dir, src(1, 1).schema)
      val t = DeltaTable.forPath(spark, dir)
      t.append(src(1, 20).coalesce(1))
      val snap = t.snapshot()
      // two id groups: keys on k (1 row) and on s (2 rows)
      val f1 = EqualityDeletes.writeDeleteFiles(snap,
        Seq(3L).toDF("k"), Seq(0), sequenceNumber = 5L)
      val f2 = EqualityDeletes.writeDeleteFiles(snap,
        Seq("v5", "v6").toDF("s"), Seq(1), sequenceNumber = 5L)
      val entries = ContentTree.entriesDF(snap).unionByName(
        EqualityDeletes.deleteEntriesDF(spark, f1 ++ f2,
          Some(snap)))
      val root = ContentTree.writeTree(snap, entries, 2)
      r.clear()
      val rows = EqualityDeletes.readApplying(snap,
        root.resolve(snap.tableRoot.toString)).count()
      assert(rows == 17)
      val ev = r.events.collect { case e: EqDeleteApply => e }
      assert(ev.size == 1)
      assert(ev.head.groups == 2 &&
        ev.head.deleteFiles == (f1 ++ f2).size &&
        ev.head.deleteKeys == 3L &&
        ev.head.broadcastGroups == 2)
    }
  }

  test("I/O byte accounting: a snapshot replay meters its log segment, " +
      "a scan meters its planned data files, a tree read its nodes") {
    val dir = TestSpark.tmpDir("mx-io")
    withReporter { r =>
      DeltaTable.create(spark, dir, src(1, 1).schema)
      val t = DeltaTable.forPath(spark, dir)
      t.append(src(1, 40).repartition(2))
      r.clear()
      assert(Snapshot.forTable(spark, dir).scanBuilder().build()
        .toDF.count() == 40)
      val io = r.events.collect { case e: IoBytes => e }
      val seg = io.filter(_.phase == "log_segment")
      assert(seg.nonEmpty && seg.head.files >= 2 && seg.head.bytes > 0,
        s"log segment not metered: $io")
      val scan = io.filter(_.phase == "data_scan")
      assert(scan.nonEmpty && scan.head.files == 2 &&
        scan.head.bytes > 0, s"data scan not metered: $io")

      val snap = t.snapshot()
      val root = ContentTree.writeRoot(snap)
      r.clear()
      val rootUri = Storage
        .fs(snap.tableRoot, spark.sessionState.newHadoopConf())
        .makeQualified(snap.tableRoot).toUri.getPath
      ContentTree.addFileIterator(spark,
        root.resolve(snap.tableRoot.toString),
        snap.tableRoot.toString, rootUri).size
      val tree = r.events.collect { case e: IoBytes => e }
        .filter(_.phase == "tree_read")
      assert(tree.nonEmpty && tree.head.files >= 2 &&
        tree.head.bytes > 0, s"tree read not metered: $tree")
    }
  }

  test("DML candidate collection is SLIM: rewrite/tombstone paths " +
      "never pull stats JSON onto the driver") {
    val dir = TestSpark.tmpDir("mx-slim")
    withReporter { r =>
      DeltaTable.create(spark, dir, src(1, 1).schema)
      val t = DeltaTable.forPath(spark, dir)
      t.append(src(1, 40).repartition(2))
      r.clear()
      t.deleteWhere("k <= 10")
      val del = r.events.collect { case e: ScanFilesCollected => e }
      assert(del.nonEmpty && del.forall(_.slim),
        s"non-slim collect inside DELETE: $del")
      r.clear()
      t.optimizeCompact()
      val opt = r.events.collect { case e: ScanFilesCollected => e }
      assert(opt.nonEmpty && opt.forall(_.slim),
        s"non-slim collect inside OPTIMIZE: $opt")
      // DV DML: candidate collect slim, swapped files' stats fetched
      // by reference — the re-add must still carry non-tight stats
      r.clear()
      t.deleteWhereDV("k > 35")
      val dv = r.events.collect { case e: ScanFilesCollected => e }
      assert(dv.nonEmpty && dv.forall(_.slim),
        s"non-slim collect inside DV DELETE: $dv")
      val swapped = t.scan(None).collectAddFiles()
        .filter(_.deletionVector.isDefined)
      assert(swapped.nonEmpty, "DV delete produced no swapped add")
      assert(swapped.forall(_.stats.exists(
          _.contains("\"tightBounds\":false"))),
        s"swapped adds lost their referenced stats: " +
          s"${swapped.map(_.stats)}")
    }
  }

  test("write-side I/O byte accounting: an append meters its data " +
      "files and commit JSON, a checkpoint its parts, a tree write " +
      "its fresh nodes") {
    val dir = TestSpark.tmpDir("mx-iow")
    withReporter { r =>
      DeltaTable.create(spark, dir, src(1, 1).schema)
      val t = DeltaTable.forPath(spark, dir)
      r.clear()
      t.append(src(1, 40).repartition(2))
      val io = r.events.collect { case e: IoBytes => e }
      val dw = io.filter(_.phase == "data_write")
      assert(dw.nonEmpty && dw.head.files == 2 && dw.head.bytes > 0,
        s"data write not metered: $io")
      val cw = io.filter(_.phase == "commit_write")
      assert(cw.nonEmpty && cw.head.files == 1 && cw.head.bytes > 0,
        s"commit write not metered: $io")

      r.clear()
      t.checkpoint()
      val ck = r.events.collect { case e: IoBytes => e }
        .filter(_.phase == "checkpoint_write")
      assert(ck.nonEmpty && ck.head.files == 1 && ck.head.bytes > 0,
        s"checkpoint write not metered: ${r.events}")

      val snap = t.snapshot()
      r.clear()
      ContentTree.writeRoot(snap)
      val tw = r.events.collect { case e: IoBytes => e }
        .filter(_.phase == "tree_write")
      assert(tw.nonEmpty && tw.head.files >= 2 && tw.head.bytes > 0,
        s"tree write not metered: ${r.events}")
    }
  }

  test("equality-delete read routes the data handoff through the " +
      "slim-stream gate: above-threshold trees take the shuffled arm") {
    val dir = TestSpark.tmpDir("mx-eq-gate")
    withReporter { r =>
      DeltaTable.create(spark, dir, src(1, 1).schema)
      val t = DeltaTable.forPath(spark, dir)
      t.append(src(1, 20).repartition(2))
      val snap = t.snapshot()
      val f1 = EqualityDeletes.writeDeleteFiles(snap,
        Seq(3L).toDF("k"), Seq(0), sequenceNumber = 5L)
      val entries = ContentTree.entriesDF(snap).unionByName(
        EqualityDeletes.deleteEntriesDF(spark, f1, Some(snap)))
      val root = ContentTree.writeTree(snap, entries, 2)
      val loc = root.resolve(snap.tableRoot.toString)
      // small tree, default gate: one-job collect arm
      r.clear()
      val base = EqualityDeletes.readApplying(snap, loc)
        .orderBy("k").collect().map(_.getLong(0)).toSeq
      assert(base == ((1 to 20).map(_.toLong).filterNot(_ == 3L)))
      val h = r.events.collect { case e: TreeHandoff => e }
      assert(h.size == 1 && !h.head.shuffled && h.head.entryCount > 0)
      // force the gate shut: the SAME read must flip to the shuffled
      // streamed handoff (what a >100k-entry tree takes) and return
      // identical rows — proving readApplying's data half is gated,
      // not an unconditional collect
      System.setProperty("graft.tree.smallHandoffEntries", "1")
      try {
        r.clear()
        val gated = EqualityDeletes.readApplying(snap, loc)
          .orderBy("k").collect().map(_.getLong(0)).toSeq
        assert(gated == base)
        val h2 = r.events.collect { case e: TreeHandoff => e }
        assert(h2.size == 1 && h2.head.shuffled)
      } finally System.clearProperty("graft.tree.smallHandoffEntries")
    }
  }
}
