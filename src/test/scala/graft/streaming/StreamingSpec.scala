package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.delta.{DeltaTable, IncrementalScan}

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("incremental scan: file diff over (base, target]") {
    val dir = TestSpark.tmpDir("incr")
    val src = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s")
    DeltaTable.create(spark, dir, src.schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(src.filter($"k" === 1))       // v1
    t.append(src.filter($"k" === 2))       // v2
    t.deleteWhere("k = 1")                 // v3: remove v1's file
    val diff = IncrementalScan.fileDiff(spark, dir, 1, 3).collect()
    // net effect vs v1: one add (v2 file) and one remove (v1 file)
    assert(diff.count(_.getAs[String]("action") == "add") == 1)
    assert(diff.count(_.getAs[String]("action") == "remove") == 1)
    // over (0, 2]: two adds, no removes
    val diff2 = IncrementalScan.fileDiff(spark, dir, 0, 2).collect()
    assert(diff2.forall(_.getAs[String]("action") == "add"))
    assert(diff2.length == 2)
  }

  test("streaming source: microbatches = per-commit adds") {
    val dir = TestSpark.tmpDir("stream")
    val ckpt = TestSpark.tmpDir("stream-ckpt")
    val src = (1 to 30).map(i => (i.toLong, s"v$i")).toDF("k", "s")
    DeltaTable.create(spark, dir, src.schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(src.filter($"k" <= 10))              // v1
    t.append(src.filter($"k" > 10 && $"k" <= 20)) // v2
    t.append(src.filter($"k" > 20))               // v3

    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    def runOnce(rateLimit: Option[Int]): Unit = {
      val reader = spark.readStream
        .format(classOf[DeltaSourceProvider].getName)
        .option("path", dir)
        .option("startingVersion", "0") // tail from the log start
      rateLimit.foreach(m =>
        reader.option("maxVersionsPerTrigger", m.toString))
      val q = reader.load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          batches.synchronized { batches += df.count() }
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }

    // rate-limited AvailableNow run: drains ALL available commits as a
    // sequence of one-version microbatches (Spark's admission-control
    // semantics — the cap bounds each batch, not the run)
    runOnce(Some(1)) // v0 (metadata only), v1, v2, v3 — four batches
    assert(batches.toSeq == Seq(0L, 10L, 10L, 10L), s"got $batches")

    // a drained source offers nothing new
    batches.clear()
    runOnce(None)
    assert(batches.isEmpty, s"got $batches")

    // restart picks up only NEW commits
    t.append(Seq((31L, "v31")).toDF("k", "s")) // v4
    batches.clear()
    runOnce(None)
    assert(batches.toSeq == Seq(1L), s"got $batches")
  }

  test("maxFilesPerTrigger splits the initial snapshot and tail commits " +
      "into bounded file batches") {
    val dir = TestSpark.tmpDir("mft")
    // partitioned by k → exactly 1 file per key per append: 6 snapshot
    // files (v1) + 4 more (v2), deterministically
    val src = (1 to 10).map(i => (i.toLong, s"v$i")).toDF("k", "s")
    DeltaTable.create(spark, dir, src.schema, Seq("k"))
    val t = DeltaTable.forPath(spark, dir)
    t.append(src.filter($"k" <= 6))                 // v1: 6 files
    t.append(src.filter($"k" > 6))                  // v2: 4 files

    val ckpt = TestSpark.tmpDir("mft-ckpt")
    // per-batch (file count, sorted keys); the cap bounds FILES, and
    // repartition(n) does not promise n non-empty files, so assert on
    // the files each batch actually read
    val seen =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long])]
    def runOnce(): Unit = {
      val q = spark.readStream
        .format(classOf[DeltaSourceProvider].getName)
        .option("path", dir)
        .option("maxFilesPerTrigger", "4")
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val nf = df.select(input_file_name()).distinct().count()
          val ks = df.select($"k").collect().map(_.getLong(0)).toSeq.sorted
          seen.synchronized { seen += ((nf, ks)) }
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    def tableFiles(): Long = spark.read
      .format(classOf[DeltaSourceProvider].getName)
      .option("path", dir).load()
      .select(input_file_name()).distinct().count()

    // ONE AvailableNow run drains the snapshot as ceil(n/4) batches of
    // at most 4 files (all but the last exactly 4), rows exact, no dups
    val snapFiles = tableFiles()
    assert(snapFiles > 4, s"need >4 files to split, got $snapFiles")
    runOnce()
    val sizes = seen.map(_._1).toSeq
    assert(sizes.init.forall(_ == 4) && sizes.last <= 4 &&
      sizes.sum == snapFiles, s"got $sizes for $snapFiles files")
    assert(sizes.length == ((snapFiles + 3) / 4).toInt, s"got $sizes")
    val flat = seen.flatMap(_._2)
    assert(flat.sorted == (1L to 10L), s"got $flat")

    // a drained source offers nothing new
    runOnce()
    assert(seen.map(_._1).toSeq == sizes, s"got $seen")

    // tail: one multi-file commit splits under the same cap
    t.append((11 to 16).map(i => (i.toLong, s"v$i")).toDF("k", "s")) // v3: 6 files
    val v3Files = tableFiles() - snapFiles
    assert(v3Files > 4, s"need >4 files to split, got $v3Files")
    seen.clear()
    runOnce()
    val tailSizes = seen.map(_._1).toSeq.filter(_ > 0)
    assert(tailSizes.init.forall(_ == 4) && tailSizes.last <= 4 &&
      tailSizes.sum == v3Files, s"got $tailSizes for $v3Files files")
    assert(seen.flatMap(_._2).sorted == (11L to 16L),
      s"got ${seen.flatMap(_._2)}")
  }

  test("maxBytesPerTrigger bounds batches by size; a file larger than " +
      "the cap still streams") {
    val dir = TestSpark.tmpDir("mbt")
    val src = (1 to 6).map(i => (i.toLong, s"v$i")).toDF("k", "s")
    DeltaTable.create(spark, dir, src.schema, Seq("k"))
    val t = DeltaTable.forPath(spark, dir)
    t.append(src) // 6 one-row files, each far larger than a 1-byte cap

    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long])]
    def runOnce(ckpt: String, opts: Map[String, String]): Unit = {
      val reader = spark.readStream
        .format(classOf[DeltaSourceProvider].getName)
        .option("path", dir)
      opts.foreach { case (k, v) => reader.option(k, v) }
      val q = reader.load().writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val nf = df.select(input_file_name()).distinct().count()
          val ks = df.select($"k").collect().map(_.getLong(0)).toSeq.sorted
          seen.synchronized { seen += ((nf, ks)) }
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }

    // a 1-byte cap forces one file per batch (soft cap: the first file
    // always streams even though it exceeds the budget)
    runOnce(TestSpark.tmpDir("mbt-c1"), Map("maxBytesPerTrigger" -> "1b"))
    assert(seen.map(_._1).toSeq.filter(_ > 0) == Seq.fill(6)(1L),
      s"got ${seen.map(_._1)}")
    assert(seen.flatMap(_._2).sorted == (1L to 6L))

    // a generous cap drains the snapshot in one batch
    seen.clear()
    runOnce(TestSpark.tmpDir("mbt-c2"), Map("maxBytesPerTrigger" -> "1g"))
    assert(seen.map(_._1).toSeq == Seq(6L), s"got ${seen.map(_._1)}")

    // composed with maxFilesPerTrigger: the tighter budget wins
    seen.clear()
    runOnce(TestSpark.tmpDir("mbt-c3"),
      Map("maxBytesPerTrigger" -> "1g", "maxFilesPerTrigger" -> "2"))
    assert(seen.map(_._1).toSeq.filter(_ > 0) == Seq(2L, 2L, 2L),
      s"got ${seen.map(_._1)}")
  }

  test("maxFilesPerTrigger: restart mid-snapshot stays pinned and the " +
      "advancing table tails without duplicates") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val dir = TestSpark.tmpDir("mft2")
    val src = (1 to 6).map(i => (i.toLong, s"v$i")).toDF("k", "s")
    // partitioned by k → exactly 1 file per key per append
    DeltaTable.create(spark, dir, src.schema, Seq("k"))
    val t = DeltaTable.forPath(spark, dir)
    t.append(src)                                    // v1: 6 files

    // drive the admission-control contract directly so the crash
    // timing is exact (a query-level restart can't stop mid-snapshot
    // deterministically — AvailableNow drains all batches)
    spark.conf.set("spark.sql.streaming.unsupportedOperationCheck", "false")
    try {
      def keys(df: org.apache.spark.sql.DataFrame): Seq[Long] =
        org.apache.spark.sql.graft.StreamingShim.internalCreateBatchDF(
          spark.sqlContext, df.queryExecution.toRdd, df.schema)
          .select("k").as[Long].collect().toSeq.sorted
      val lim = ReadLimit.maxFiles(4)
      val opts = Map("maxFilesPerTrigger" -> "4")

      // batch 0: 4 of the 6 snapshot files, snapshot pinned at v1; the
      // offset reaches the WAL, then the app dies before committing
      val a = new DeltaSource(spark.sqlContext, dir, opts)
      val o0 = a.latestOffset(null, lim)
      assert(o0 != null)
      val batch0 = keys(a.getBatch(None,
        o0.asInstanceOf[org.apache.spark.sql.execution.streaming.Offset]))
      assert(batch0.size == 4, s"got $batch0")

      // the table advances while the snapshot is partially delivered
      t.append(Seq((7L, "v7"), (8L, "v8")).toDF("k", "s")) // v2: 2 files

      // restart: a NEW source replays batch 0 from the checkpointed
      // offset — it must emit the SAME slice of the v1-pinned list
      val b = new DeltaSource(spark.sqlContext, dir, opts)
      val replay0 = keys(b.getBatch(None,
        o0.asInstanceOf[org.apache.spark.sql.execution.streaming.Offset]))
      assert(replay0 == batch0, s"replay diverged: $replay0 vs $batch0")

      // next offsets: snapshot remainder (2 files of the v1 list),
      // then the v2 commit — no losses, no duplicates
      val got = scala.collection.mutable.ArrayBuffer.empty[Long]
      got ++= replay0
      var prev = o0
      var next = b.latestOffset(prev, lim)
      while (next != null) {
        got ++= keys(b.getBatch(
          Some(prev.asInstanceOf[org.apache.spark.sql.execution.streaming.Offset]),
          next.asInstanceOf[org.apache.spark.sql.execution.streaming.Offset]))
        prev = next
        next = b.latestOffset(prev, lim)
      }
      assert(got.sorted.toSeq == (1L to 8L), s"got $got")
      assert(got.size == got.distinct.size, s"duplicates in $got")
    } finally
      spark.conf.unset("spark.sql.streaming.unsupportedOperationCheck")
  }

  test("CDF streaming honors maxFilesPerTrigger: a multi-commit " +
      "backfill arrives as bounded version-packed batches") {
    val dir = TestSpark.tmpDir("cdfrate")
    val ckpt = TestSpark.tmpDir("cdfrate-ckpt")
    // partitioned by b = k%2 → exactly 2 files per append
    val src = (1 to 30).map(i => (i.toLong, s"v$i", i % 2))
      .toDF("k", "s", "b")
    DeltaTable.create(spark, dir, src.schema, Seq("b"),
      configuration = Map(
        graft.delta.TableChanges.CDF_ENABLED_KEY -> "true"))
    val t = DeltaTable.forPath(spark, dir)
    // coalesce(1): exactly one file per partition value → 2 files per
    // version, so the file cap of 2 packs whole versions deterministically
    t.append(src.filter($"k" <= 10).coalesce(1))              // v1: 2 files
    t.append(src.filter($"k" > 10 && $"k" <= 20).coalesce(1)) // v2: 2 files
    t.append(src.filter($"k" > 20).coalesce(1))               // v3: 2 files

    val seen = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    val q = spark.readStream
      .format(classOf[DeltaSourceProvider].getName)
      .option("path", dir)
      .option("readChangeFeed", "true")
      .option("startingVersion", "0")
      .option("maxFilesPerTrigger", "2")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val ks = df.select($"k").collect().map(_.getLong(0)).toSeq.sorted
        seen.synchronized { seen += ks }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    // 3 commits × 2 change files at cap 2 → three bounded batches (plus
    // possibly an empty v0 batch), exact rows, no duplicates
    val nonEmpty = seen.filter(_.nonEmpty)
    assert(nonEmpty.map(_.size).toSeq == Seq(10, 10, 10),
      s"got ${seen.map(_.size)}")
    assert(nonEmpty.flatten.sorted == (1L to 30L), s"got ${seen.flatten}")
  }

  test("CDF streaming slices WITHIN a large cdc commit: one huge " +
      "delete arrives as several bounded batches with exact rows") {
    val dir = TestSpark.tmpDir("cdfslice")
    // partitioned by p = k%4 → a delete touching every partition writes
    // (at least) 4 cdc files in ONE commit
    val src = (1 to 40).map(i => (i.toLong, s"v$i", i % 4)).toDF("k", "s", "p")
    DeltaTable.create(spark, dir, src.schema, Seq("p"),
      configuration = Map(
        graft.delta.TableChanges.CDF_ENABLED_KEY -> "true"))
    val t = DeltaTable.forPath(spark, dir)
    t.append(src)                 // v1
    t.deleteWhere("k <= 20")      // v2: >= 4 cdc delete files
    val expected = (1L to 20L)

    def runFrom(opts: Map[String, String]): Seq[Seq[Long]] = {
      val seen = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
      val reader = spark.readStream
        .format(classOf[DeltaSourceProvider].getName)
        .option("path", dir)
        .option("readChangeFeed", "true")
        .option("startingVersion", "2") // the cdc commit only
      opts.foreach { case (k, v) => reader.option(k, v) }
      val q = reader.load()
        .writeStream
        .option("checkpointLocation", TestSpark.tmpDir("cdfslice-ckpt"))
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val ks = df.filter($"_change_type" === "delete")
            .select($"k").collect().map(_.getLong(0)).toSeq.sorted
          seen.synchronized { seen += ks }
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      seen.toSeq.filter(_.nonEmpty)
    }

    // file cap 1: the single cdc commit must arrive as >= 4 batches
    val byFiles = runFrom(Map("maxFilesPerTrigger" -> "1"))
    assert(byFiles.size >= 4,
      s"one cdc commit should slice into >=4 batches, got ${byFiles.size}")
    assert(byFiles.flatten.sorted == expected, s"got ${byFiles.flatten}")

    // byte cap of 1 byte: every batch admits exactly one file — the
    // byte budget is honored in readChangeFeed mode
    val byBytes = runFrom(Map("maxBytesPerTrigger" -> "1"))
    assert(byBytes.size == byFiles.size,
      s"byte-capped run should match file-capped slicing: " +
        s"${byBytes.size} vs ${byFiles.size}")
    assert(byBytes.flatten.sorted == expected, s"got ${byBytes.flatten}")
  }

  test("CDF slicing restart: a checkpoint mid-cdc-version resumes " +
      "exactly-once across update and delete commits") {
    val dir = TestSpark.tmpDir("cdfslice-rs")
    val src = (1 to 24).map(i => (i.toLong, s"v$i", i % 3)).toDF("k", "s", "p")
    DeltaTable.create(spark, dir, src.schema, Seq("p"),
      configuration = Map(
        graft.delta.TableChanges.CDF_ENABLED_KEY -> "true"))
    val t = DeltaTable.forPath(spark, dir)
    t.append(src)                                  // v1
    t.updateWhere("k <= 6", Map("s" -> "'u'"))     // v2: cdc pre+post files
    t.deleteWhere("k > 18")                        // v3: cdc delete files

    // drive the admission-control contract directly so the "restart"
    // lands exactly mid-version (a query-level stop can't cut there
    // deterministically — the batch/checkpoint race duplicates batches)
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    spark.conf.set("spark.sql.streaming.unsupportedOperationCheck", "false")
    val all = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    try {
      def rows(df: org.apache.spark.sql.DataFrame): Seq[(String, Long)] =
        org.apache.spark.sql.graft.StreamingShim.internalCreateBatchDF(
          spark.sqlContext, df.queryExecution.toRdd, df.schema)
          .select($"_change_type", $"k").collect()
          .map(r => (r.getString(0), r.getLong(1))).toSeq
      val lim = ReadLimit.maxFiles(1)
      val opts = Map("readChangeFeed" -> "true",
        "startingVersion" -> "2", "maxFilesPerTrigger" -> "1")
      def off(o: org.apache.spark.sql.connector.read.streaming.Offset) =
        o.asInstanceOf[org.apache.spark.sql.execution.streaming.Offset]

      // first instance: two single-file batches, then the app "dies"
      // with the second offset checkpointed — mid-way into v2's cdc list
      val a = new DeltaSource(spark.sqlContext, dir, opts)
      val o0 = a.latestOffset(null, lim)
      all ++= rows(a.getBatch(None, off(o0)))
      val o1 = a.latestOffset(o0, lim)
      all ++= rows(a.getBatch(Some(off(o0)), off(o1)))

      // restart: a NEW source resumes from the checkpointed offset and
      // drains the rest one file at a time
      val b = new DeltaSource(spark.sqlContext, dir, opts)
      var prev = o1
      var next = b.latestOffset(prev, lim)
      while (next != null) {
        all ++= rows(b.getBatch(Some(off(prev)), off(next)))
        prev = next
        next = b.latestOffset(prev, lim)
      }
    } finally
      spark.conf.unset("spark.sql.streaming.unsupportedOperationCheck")
    // exactly-once despite the mid-version restart: 6 update_preimage,
    // 6 update_postimage, 6 deletes — no row lost or duplicated
    assert(all.count(_._1 == "update_preimage") == 6, s"got $all")
    assert(all.count(_._1 == "update_postimage") == 6, s"got $all")
    assert(all.count(_._1 == "delete") == 6, s"got $all")
    assert(all.filter(_._1 == "delete").map(_._2).sorted == (19L to 24L))
    assert(all.distinct.size == all.size,
      s"duplicated rows after restart: $all")
  }

  test("a mid-stream schema change fails loudly; pre-stream history " +
      "replays fine") {
    val dir = TestSpark.tmpDir("schemachg")
    val src = (1 to 4).map(i => (i.toLong, s"v$i")).toDF("k", "s")
    DeltaTable.create(spark, dir, src.schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(src.filter($"k" <= 2))   // v1
    t.addColumn("extra", org.apache.spark.sql.types.StringType) // v2
    t.append(src.filter($"k" > 2)
      .withColumn("extra", lit("e"))) // v3, new schema

    // stream created AFTER the evolution replays history fine (the
    // pinned schema is the latest; old files reconcile into it)
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    def runOnce(ckpt: String): Unit = {
      val q = spark.readStream
        .format(classOf[DeltaSourceProvider].getName)
        .option("path", dir)
        .option("startingVersion", "0")
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          got.synchronized { got ++= df.select("k").as[Long].collect() }
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    runOnce(TestSpark.tmpDir("schemachg-ckpt"))
    assert(got.sorted.toSeq == (1L to 4L), s"got $got")

    // a RUNNING stream that encounters a schema change must fail
    // loudly, not silently project into its pinned shape (a restart
    // then re-pins the evolved schema — the remedy in the error)
    val q = spark.readStream
      .format(classOf[DeltaSourceProvider].getName)
      .option("path", dir)
      .option("startingVersion", "0")
      .load()
      .writeStream
      .option("checkpointLocation", TestSpark.tmpDir("schemachg-ckpt2"))
      .format("noop")
      .trigger(Trigger.ProcessingTime(100))
      .start()
    try {
      q.processAllAvailable() // pinned at the pre-evolution schema
      t.addColumn("extra2", org.apache.spark.sql.types.LongType) // v4
      t.append(src.filter($"k" === 1)
        .withColumn("extra", lit("e")).withColumn("extra2", lit(9L))) // v5
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
        q.awaitTermination(60000)
        throw q.exception.getOrElse(
          fail("stream must fail on the schema change"))
      }
      assert(Iterator.iterate(ex: Throwable)(_.getCause)
        .takeWhile(_ != null).exists(e => e.getMessage != null &&
          e.getMessage.contains("schema of the streamed table changed")), ex)
    } finally q.stop()
  }

  test("CDF + maxFilesPerTrigger: the initial snapshot itself arrives " +
      "as bounded insert batches") {
    val dir = TestSpark.tmpDir("cdfsnapcap")
    val ckpt = TestSpark.tmpDir("cdfsnapcap-ckpt")
    val src = (1 to 6).map(i => (i.toLong, s"v$i")).toDF("k", "s")
    // partitioned by k → 6 one-row files in the snapshot
    DeltaTable.create(spark, dir, src.schema, Seq("k"),
      configuration = Map(
        graft.delta.TableChanges.CDF_ENABLED_KEY -> "true"))
    DeltaTable.forPath(spark, dir).append(src) // v1: 6 files

    val seen = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, String)]]
    val q = spark.readStream
      .format(classOf[DeltaSourceProvider].getName)
      .option("path", dir)
      .option("readChangeFeed", "true")
      .option("maxFilesPerTrigger", "4")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = df.select($"k", $"_change_type")
          .as[(Long, String)].collect().toSeq.sortBy(_._1)
        seen.synchronized { seen += rows }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    assert(seen.map(_.size).toSeq == Seq(4, 2), s"got ${seen.map(_.size)}")
    val flat = seen.flatten
    assert(flat.map(_._1).sorted == (1L to 6L), s"got $flat")
    assert(flat.forall(_._2 == "insert"), s"got $flat")
  }

  test("AvailableNow pins a ceiling: commits landing mid-run wait for " +
      "the next run") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val dir = TestSpark.tmpDir("ceil")
    val src = (1 to 9).map(i => (i.toLong, s"v$i")).toDF("k", "s")
    DeltaTable.create(spark, dir, src.schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(src.filter($"k" <= 3)) // v1

    spark.conf.set("spark.sql.streaming.unsupportedOperationCheck", "false")
    try {
      val s1 = new DeltaSource(spark.sqlContext, dir,
        Map("startingVersion" -> "0"))
      s1.prepareForTriggerAvailableNow() // ceiling = v1
      t.append(src.filter($"k" > 3 && $"k" <= 6)) // v2, lands mid-run
      val o1 = s1.latestOffset(null, ReadLimit.allAvailable())
      assert(o1 != null)
      // drained through the ceiling: nothing more this run
      assert(s1.latestOffset(o1, ReadLimit.allAvailable()) == null)
      val batch = org.apache.spark.sql.graft.StreamingShim
        .internalCreateBatchDF(spark.sqlContext,
          s1.getBatch(None, o1.asInstanceOf[
            org.apache.spark.sql.execution.streaming.Offset])
            .queryExecution.toRdd,
          s1.schema)
        .select("k").as[Long].collect().toSeq.sorted
      assert(batch == (1L to 3L), s"ceiling leaked: $batch")

      // the next run (new prepare) picks up the mid-run commit
      val s2 = new DeltaSource(spark.sqlContext, dir,
        Map("startingVersion" -> "0"))
      s2.prepareForTriggerAvailableNow()
      val o2 = s2.latestOffset(o1, ReadLimit.allAvailable())
      assert(o2 != null)
      val batch2 = org.apache.spark.sql.graft.StreamingShim
        .internalCreateBatchDF(spark.sqlContext,
          s2.getBatch(Some(o1.asInstanceOf[
            org.apache.spark.sql.execution.streaming.Offset]),
            o2.asInstanceOf[
              org.apache.spark.sql.execution.streaming.Offset])
            .queryExecution.toRdd,
          s2.schema)
        .select("k").as[Long].collect().toSeq.sorted
      assert(batch2 == (4L to 6L), s"got $batch2")
    } finally
      spark.conf.unset("spark.sql.streaming.unsupportedOperationCheck")
  }

  test("streaming source: ignoreDeletes covers whole-file deletes only; " +
      "rewrites need ignoreChanges") {
    def run(dir: String, opts: Map[String, String]): Unit = {
      val reader = spark.readStream
        .format(classOf[DeltaSourceProvider].getName)
        .option("path", dir)
        .option("startingVersion", "0") // tail through the delete commits
      opts.foreach { case (k, v) => reader.option(k, v) }
      val q = reader.load()
        .writeStream
        .option("checkpointLocation", TestSpark.tmpDir("stream-del-ckpt"))
        .format("noop")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    def fails(dir: String, opts: Map[String, String]): Unit = {
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        run(dir, opts)
      }
      ()
    }

    // whole-file delete (each key in its own file; no survivors rewritten)
    val dir = TestSpark.tmpDir("stream-del")
    val src = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    DeltaTable.create(spark, dir, src.schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(src.filter($"k" === 1).repartition(1))
    t.append(src.filter($"k" === 2).repartition(1))
    t.deleteWhere("k = 1") // removes v1's file, adds nothing
    fails(dir, Map.empty)
    run(dir, Map("ignoreDeletes" -> "true"))

    // rewrite delete: survivor rows re-staged in the same commit — rows
    // already streamed would re-emit, so ignoreDeletes must NOT pass it
    val dir2 = TestSpark.tmpDir("stream-rw")
    DeltaTable.create(spark, dir2, src.schema)
    val t2 = DeltaTable.forPath(spark, dir2)
    t2.append(src.repartition(1)) // both keys in ONE file
    t2.deleteWhere("k = 1")       // remove + survivor add
    fails(dir2, Map.empty)
    fails(dir2, Map("ignoreDeletes" -> "true"))
    run(dir2, Map("ignoreChanges" -> "true"))
  }

  test("skipChangeCommits skips rewrite commits entirely: no failure, " +
      "no re-emitted rows, later appends still stream") {
    val dir = TestSpark.tmpDir("stream-skipcc")
    val src = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    DeltaTable.create(spark, dir, src.schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(src.repartition(1))       // v1: both keys in one file
    t.deleteWhere("k = 1")             // v2: rewrite (remove + survivor)
    t.append(Seq((3L, "c")).toDF("k", "s")) // v3: pure append
    val outDir = TestSpark.tmpDir("stream-skipcc-out")
    val q = spark.readStream
      .format(classOf[DeltaSourceProvider].getName)
      .option("path", dir)
      .option("startingVersion", "0")
      .option("skipChangeCommits", "true")
      .load()
      .writeStream
      .option("checkpointLocation", TestSpark.tmpDir("stream-skipcc-ckpt"))
      .format("parquet")
      .option("path", outDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // v1's two rows + v3's append; v2's survivor re-stage skipped
    val got = spark.read.parquet(outDir).as[(Long, String)]
      .collect().sorted.toSeq
    assert(got == Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("CDF streaming: deletes flow as delete rows") {
    val dir = TestSpark.tmpDir("cdfstream")
    val ckpt = TestSpark.tmpDir("cdfstream-ckpt")
    val src = (1 to 20).map(i => (i.toLong, s"v$i")).toDF("k", "s")
    DeltaTable.create(spark, dir, src.schema,
      configuration = Map(
        graft.delta.TableChanges.CDF_ENABLED_KEY -> "true"))
    val t = DeltaTable.forPath(spark, dir)
    t.append(src)                 // v1: 20 inserts
    t.deleteWhere("k <= 5")       // v2: 5 cdc deletes

    val rows = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val q = spark.readStream
      .format(classOf[DeltaSourceProvider].getName)
      .option("path", dir)
      .option("readChangeFeed", "true")
      .option("startingVersion", "0") // replay the feed from the start
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        rows.synchronized {
          df.groupBy("_change_type").count().collect().foreach(r =>
            rows += ((r.getString(0), r.getLong(1))))
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(rows.toMap == Map("insert" -> 20L, "delete" -> 5L), rows)
  }

  test("default mode: first batch = initial snapshot, then tailing") {
    val dir = TestSpark.tmpDir("stream-snap")
    val ckpt = TestSpark.tmpDir("stream-snap-ckpt")
    val src = (1 to 30).map(i => (i.toLong, s"v$i")).toDF("k", "s")
    DeltaTable.create(spark, dir, src.schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(src.filter($"k" <= 10))
    t.append(src.filter($"k" > 10 && $"k" <= 20))

    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    def runOnce(): Unit = {
      val q = spark.readStream
        .format(classOf[DeltaSourceProvider].getName)
        .option("path", dir)
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          batches.synchronized { batches += df.count() }
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    runOnce() // both pre-stream appends arrive as ONE snapshot batch
    assert(batches.toSeq == Seq(20L), s"got $batches")
    t.append(src.filter($"k" > 20)) // post-stream commit tails
    batches.clear()
    runOnce()
    assert(batches.toSeq == Seq(10L), s"got $batches")
  }

  test("streaming never collects fat adds: every driver-side file " +
      "collect on the stream path is slim (no stats/tags payloads)") {
    val dir = TestSpark.tmpDir("stream-slim")
    val ckpt = TestSpark.tmpDir("stream-slim-ckpt")
    val src = (1 to 30).map(i => (i.toLong, s"v$i")).toDF("k", "s")
    DeltaTable.create(spark, dir, src.schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(src.filter($"k" <= 10))  // pre-stream: initial snapshot path
    t.append(src.filter($"k" > 10 && $"k" <= 20))
    val reporter = new graft.delta.InMemoryReporter
    val prev = graft.delta.Metrics.reporter
    graft.delta.Metrics.reporter = reporter
    try {
      val total = new java.util.concurrent.atomic.AtomicLong(0)
      def runOnce(): Unit = {
        val q = spark.readStream
          .format(classOf[DeltaSourceProvider].getName)
          .option("path", dir)
          .load()
          .writeStream
          .option("checkpointLocation", ckpt)
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            total.addAndGet(df.count()); ()
          }
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination(120000)
      }
      runOnce()                        // snapshot batch
      t.append(src.filter($"k" > 20))  // tail batch on restart
      runOnce()
      assert(total.get() == 30L)
      val collects = reporter.events.collect {
        case e: graft.delta.MetricEvent.ScanFilesCollected => e
      }
      assert(collects.nonEmpty, "expected at least the snapshot collect")
      val fat = collects.filterNot(_.slim)
      assert(fat.isEmpty,
        s"streaming path collected FAT adds (stats/tags on the driver): $fat")
    } finally graft.delta.Metrics.reporter = prev
  }

  test("startingVersion=latest skips pre-stream history; missing " +
      "commits fail instead of losing rows") {
    val dir = TestSpark.tmpDir("stream-latest")
    val src = (1 to 20).map(i => (i.toLong, s"v$i")).toDF("k", "s")
    DeltaTable.create(spark, dir, src.schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(src.filter($"k" <= 10)) // pre-stream: must NOT be emitted
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    def runOnce(opts: Map[String, String], ckpt: String): Unit = {
      val reader = spark.readStream
        .format(classOf[DeltaSourceProvider].getName)
        .option("path", dir)
      opts.foreach { case (k, v) => reader.option(k, v) }
      val q = reader.load().writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          got.synchronized { got ++= df.select("k").as[Long].collect() }
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    val ckpt = TestSpark.tmpDir("stream-latest-ckpt")
    runOnce(Map("startingVersion" -> "latest"), ckpt)
    assert(got.isEmpty, s"latest must skip history, got $got")

    // tailing after the anchor needs a RUNNING stream (each AvailableNow
    // restart without a committed offset re-anchors to the new latest)
    val reader = spark.readStream
      .format(classOf[DeltaSourceProvider].getName)
      .option("path", dir)
      .option("startingVersion", "latest")
    val q = reader.load().writeStream
      .option("checkpointLocation", TestSpark.tmpDir("stream-latest-ckpt2"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized { got ++= df.select("k").as[Long].collect() }
        ()
      }
      .trigger(Trigger.ProcessingTime(100))
      .start()
    try {
      // wait for the source to anchor, then commit new data
      q.processAllAvailable()
      t.append(src.filter($"k" > 10))
      val deadline = System.currentTimeMillis() + 60000
      while (got.synchronized(got.size) < 10 &&
          System.currentTimeMillis() < deadline) Thread.sleep(200)
    } finally q.stop()
    assert(got.toSet == (11L to 20L).toSet, got)

    // a vacuumed/compacted-away commit must fail the tail loudly
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = graft.delta.Storage.fs(root,
      spark.sessionState.newHadoopConf())
    fs.delete(graft.delta.FileNames.commitFile(
      graft.delta.FileNames.logDir(root), 1L), false)
    val ex = intercept[Exception] {
      runOnce(Map("startingVersion" -> "0"),
        TestSpark.tmpDir("stream-miss-ckpt"))
    }
    assert(Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).exists(e =>
        e.getMessage != null && e.getMessage.contains("missing")), ex)
  }

  test("default CDF mode: snapshot rows arrive as inserts, then " +
      "row-level changes") {
    val dir = TestSpark.tmpDir("cdfsnap")
    val ckpt = TestSpark.tmpDir("cdfsnap-ckpt")
    val src = (1 to 20).map(i => (i.toLong, s"v$i")).toDF("k", "s")
    DeltaTable.create(spark, dir, src.schema,
      configuration = Map(
        graft.delta.TableChanges.CDF_ENABLED_KEY -> "true"))
    val t = DeltaTable.forPath(spark, dir)
    t.append(src)            // v1, pre-stream
    t.deleteWhere("k <= 3")  // v2, pre-stream

    val rows = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    def runOnce(): Unit = {
      val q = spark.readStream
        .format(classOf[DeltaSourceProvider].getName)
        .option("path", dir)
        .option("readChangeFeed", "true")
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          rows.synchronized {
            df.groupBy("_change_type").count().collect().foreach(r =>
              rows += ((r.getString(0), r.getLong(1))))
          }
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    runOnce() // snapshot at v2 = 17 live rows as inserts
    assert(rows.toMap == Map("insert" -> 17L), rows)
    rows.clear()
    t.deleteWhere("k <= 6") // post-stream: row-level deletes tail
    runOnce()
    assert(rows.toMap == Map("delete" -> 3L), rows)
  }

  test("initial-snapshot replay is pinned: restart before batch 0 " +
      "commits does not duplicate rows") {
    val dir = TestSpark.tmpDir("stream-pin")
    val src = (1 to 10).map(i => (i.toLong, s"v$i")).toDF("k", "s")
    DeltaTable.create(spark, dir, src.schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(src.filter($"k" <= 5)) // v1

    // drive the Source contract directly so the crash timing is exact
    spark.conf.set("spark.sql.streaming.unsupportedOperationCheck", "false")
    try {
      def keys(df: org.apache.spark.sql.DataFrame): Seq[Long] =
        org.apache.spark.sql.graft.StreamingShim.internalCreateBatchDF(
          spark.sqlContext, df.queryExecution.toRdd, df.schema)
          .select("k").as[Long].collect().toSeq.sorted

      // stream starts in initial-snapshot mode; offset 0 reaches the
      // WAL, then the app dies before batch 0 commits …
      val a = new DeltaSource(spark.sqlContext, dir, Map.empty)
      val o0 = a.getOffset.get
      // … and the table advances meanwhile
      t.append(src.filter($"k" > 5)) // v2

      // restart: a NEW source replays batch 0 from the checkpointed
      // offset — it must pin the snapshot at v1, not re-resolve to v2
      val b = new DeltaSource(spark.sqlContext, dir, Map.empty)
      val batch0 = keys(b.getBatch(None, o0))
      assert(batch0 == (1L to 5L), s"snapshot not pinned: $batch0")
      val o1 = b.getOffset.get
      val batch1 = keys(b.getBatch(Some(o0), o1))
      assert(batch1 == (6L to 10L), s"tail duplicated rows: $batch1")
    } finally
      spark.conf.unset("spark.sql.streaming.unsupportedOperationCheck")
  }

  test("delta sink: exactly-once microbatch writes with txn markers") {
    val dir = TestSpark.tmpDir("sink")
    val ckpt = TestSpark.tmpDir("sink-ckpt")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q1 = mem.toDF().toDF("k", "s")
      .writeStream
      .format(classOf[DeltaSourceProvider].getName)
      .option("path", dir)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())

    mem.addData((1L, "a"), (2L, "b"))
    val r1 = q1.start(); r1.awaitTermination(120000)
    val t = DeltaTable.forPath(spark, dir)
    assert(t.toDF.count() == 2)
    // the batch carries its idempotency marker
    assert(t.snapshot().setTransactions.exists(_.version >= 0))

    mem.addData((3L, "c"))
    val r2 = q1.start(); r2.awaitTermination(120000)
    assert(t.toDF.select("k").as[Long].collect().toSet ==
      Set(1L, 2L, 3L))

    // a replayed batch id must NOT double-write: simulate by calling
    // the sink directly with an already-committed batch id
    val sink = new DeltaSink(spark.sqlContext, dir,
      org.apache.spark.sql.streaming.OutputMode.Append())
    val lastMarker = t.snapshot().setTransactions.map(_.version).max
    spark.sparkContext.setLocalProperty("sql.streaming.queryId",
      t.snapshot().setTransactions.head.appId)
    try {
      sink.addBatch(lastMarker,
        Seq((99L, "dup")).toDF("k", "s"))
      assert(t.toDF.count() == 3, "replayed batch must be skipped")
    } finally spark.sparkContext.setLocalProperty(
      "sql.streaming.queryId", null)
  }

  test("delta sink: Complete mode replaces the table with each " +
      "aggregation batch; replays skip") {
    val dir = TestSpark.tmpDir("sink-complete")
    val ckpt = TestSpark.tmpDir("sink-complete-ckpt")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long)]
    val agg = mem.toDF().toDF("g", "n")
      .groupBy($"g").agg(sum($"n").as("total"))
    val q = agg.writeStream
      .format(classOf[DeltaSourceProvider].getName)
      .option("path", dir)
      .option("checkpointLocation", ckpt)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())

    mem.addData(("a", 1L), ("a", 2L), ("b", 10L))
    val r1 = q.start(); r1.awaitTermination(120000)
    val t = DeltaTable.forPath(spark, dir)
    assert(t.toDF.as[(String, Long)].collect().toMap ==
      Map("a" -> 3L, "b" -> 10L))

    // next batch REPLACES: totals reflect all input, row count stays
    // one-per-group (an append-mode sink would accumulate stale rows)
    mem.addData(("a", 4L), ("c", 7L))
    val r2 = q.start(); r2.awaitTermination(120000)
    assert(t.toDF.as[(String, Long)].collect().toMap ==
      Map("a" -> 7L, "b" -> 10L, "c" -> 7L))
    assert(t.toDF.count() == 3)

    // a replayed Complete batch id skips, leaving the table untouched
    val sink = new DeltaSink(spark.sqlContext, dir,
      org.apache.spark.sql.streaming.OutputMode.Complete())
    val marker = t.snapshot().setTransactions.map(_.version).max
    val vBefore = t.snapshot().version
    spark.sparkContext.setLocalProperty("sql.streaming.queryId",
      t.snapshot().setTransactions.head.appId)
    try {
      sink.addBatch(marker, Seq(("z", 1L)).toDF("g", "total"))
      assert(t.snapshot().version == vBefore)
    } finally spark.sparkContext.setLocalProperty(
      "sql.streaming.queryId", null)
    // Update mode stays rejected
    intercept[IllegalArgumentException] {
      new DeltaSink(spark.sqlContext, dir,
        org.apache.spark.sql.streaming.OutputMode.Update())
    }
  }

  test("startingTimestamp streams changes committed at or after the " +
      "timestamp; a pre-log timestamp reads everything") {
    val dir = TestSpark.tmpDir("start-ts")
    val t = DeltaTable.forPath(spark,
      { DeltaTable.create(spark,
          dir, Seq((0L, "x")).toDF("k", "s").schema); dir })
    t.append(Seq((1L, "a")).toDF("k", "s"))  // v1
    Thread.sleep(30)
    val cut = System.currentTimeMillis()
    Thread.sleep(30)
    t.append(Seq((2L, "b")).toDF("k", "s"))  // v2 (after cut)
    t.append(Seq((3L, "c")).toDF("k", "s"))  // v3

    def streamed(ts: String): Set[Long] = {
      val out = TestSpark.tmpDir("start-ts-out")
      val ckpt = TestSpark.tmpDir("start-ts-ckpt")
      val q = spark.readStream
        .format(classOf[DeltaSourceProvider].getName)
        .option("path", dir)
        .option("startingTimestamp", ts)
        .load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      spark.read.parquet(out).select("k").as[Long].collect().toSet
    }
    // millis form: only versions committed after the cut
    assert(streamed(cut.toString) == Set(2L, 3L))
    // a timestamp before the table existed: everything
    assert(streamed("1970-01-02 00:00:00") == Set(1L, 2L, 3L))

    // the BATCH CDF read shares the window contract: startingTimestamp
    // maps through first-version-after, so a cut between v1 and v2
    // starts the change feed at v2 — not at v1, whose changes were
    // committed before the requested timestamp
    val cdfDir = TestSpark.tmpDir("start-ts-cdf")
    DeltaTable.create(spark, cdfDir, Seq((0L, "x")).toDF("k", "s").schema,
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    val ct = DeltaTable.forPath(spark, cdfDir)
    ct.append(Seq((1L, "a")).toDF("k", "s"))  // v1
    Thread.sleep(30)
    val cdfCut = System.currentTimeMillis()
    Thread.sleep(30)
    ct.append(Seq((2L, "b")).toDF("k", "s"))  // v2 (after cut)
    ct.append(Seq((3L, "c")).toDF("k", "s"))  // v3
    val batch = spark.read
      .format(classOf[DeltaSourceProvider].getName)
      .option("path", cdfDir)
      .option("readChangeFeed", "true")
      .option("startingTimestamp", cdfCut.toString)
      .load()
    assert(batch.select("_commit_version").as[Long].collect().toSet
      == Set(2L, 3L))
  }

  test("delta sink: a restarted query with a wider schema evolves the " +
      "table under mergeSchema and fails loudly without it") {
    val dir = TestSpark.tmpDir("sink-ev")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem1 = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    mem1.addData((1L, "a"))
    val q1 = mem1.toDF().toDF("k", "s").writeStream
      .format(classOf[DeltaSourceProvider].getName)
      .option("path", dir)
      .option("checkpointLocation", TestSpark.tmpDir("sink-ev-c1"))
      .trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination(120000)

    // same table, upstream grew a column: without mergeSchema -> abort
    val mem2 = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Double)]
    mem2.addData((2L, "b", 1.5))
    val qBad = mem2.toDF().toDF("k", "s", "x").writeStream
      .format(classOf[DeltaSourceProvider].getName)
      .option("path", dir)
      .option("checkpointLocation", TestSpark.tmpDir("sink-ev-c2"))
      .trigger(Trigger.AvailableNow()).start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      qBad.awaitTermination(120000)
    }
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 1)

    // with mergeSchema -> table evolves, old row reads NULL
    val mem3 = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Double)]
    mem3.addData((3L, "c", 2.5))
    val qOk = mem3.toDF().toDF("k", "s", "x").writeStream
      .format(classOf[DeltaSourceProvider].getName)
      .option("path", dir)
      .option("mergeSchema", "true")
      .option("checkpointLocation", TestSpark.tmpDir("sink-ev-c3"))
      .trigger(Trigger.AvailableNow()).start()
    qOk.awaitTermination(120000)
    val t = DeltaTable.forPath(spark, dir)
    assert(t.toDF.columns.toSeq == Seq("k", "s", "x"))
    val byK = t.toDF.orderBy("k").collect()
    assert(byK(0).isNullAt(2) && byK(1).getDouble(2) == 2.5)
  }

  test("windowed aggregation with watermark over the delta stream") {
    val dir = TestSpark.tmpDir("winagg")
    val ckpt = TestSpark.tmpDir("winagg-ckpt")
    import java.sql.Timestamp
    val rows = (0 until 60).map { i =>
      (Timestamp.valueOf(f"2026-01-01 10:${i / 6}%02d:${(i % 6) * 10}%02d"),
        s"u${i % 3}", i.toDouble)
    }
    val src = rows.toDF("ts", "user", "value")
    DeltaTable.create(spark, dir, src.schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(src)

    val agg = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val q = spark.readStream
      .format(classOf[DeltaSourceProvider].getName)
      .option("path", dir)
      .load()
      .withWatermark("ts", "2 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("user"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        agg.synchronized {
          df.collect().foreach(r =>
            agg += ((r.getAs[String]("user"), r.getAs[Long]("n"))))
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // 60 events over 10 minutes -> two 5-minute windows x 3 users,
    // 10 events per (window, user)
    assert(agg.size == 6, agg)
    assert(agg.forall(_._2 == 10), agg)
    assert(agg.map(_._1).distinct.sorted == Seq("u0", "u1", "u2"))
  }
}
