package graft.delta

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DeletionVectorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("z85 round trip (ZeroMQ reference vector)") {
    // the canonical ZeroMQ test vector: 0x86 0x4F 0xD2 0x6F 0xB5 0x59 0xF7 0x5B => "HelloWorld"
    val bytes = Array(0x86, 0x4f, 0xd2, 0x6f, 0xb5, 0x59, 0xf7, 0x5b)
      .map(_.toByte)
    assert(DeletionVectors.z85Encode(bytes) == "HelloWorld")
    assert(DeletionVectors.z85Decode("HelloWorld").toSeq == bytes.toSeq)
    val uuid = java.util.UUID.randomUUID()
    val enc = DeletionVectors.encodeUUID(uuid)
    assert(enc.length == 20)
  }

  test("bitmap portable serde round trip incl. >32-bit positions") {
    val pos = Array(0L, 1L, 63L, 100000L, (1L << 33) + 7)
    val ser = DeletionVectors.serializeBitmap(pos)
    assert(DeletionVectors.deserializeBitmap(ser).toSeq == pos.toSeq)
  }

  test("DV file write/read round trip with offsets and checksum") {
    val dir = TestSpark.tmpDir("dvfile")
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(dir)
    val descs = DeletionVectors.write(Seq(
      "f1" -> Array(1L, 5L, 9L),
      "f2" -> Array(0L, 2L)), root, conf)
    assert(descs("f1").cardinality == 3)
    assert(descs("f2").offset.get > descs("f1").offset.get)
    assert(DeletionVectors.readRowIndexes(descs("f1"), root, conf).toSeq ==
      Seq(1L, 5L, 9L))
    assert(DeletionVectors.readRowIndexes(descs("f2"), root, conf).toSeq ==
      Seq(0L, 2L))
  }

  test("deleteWhereDV: rows vanish without rewriting data files") {
    val dir = TestSpark.tmpDir("dvdel")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .filter($"l_quantity" < 10)
    DeltaTable.create(spark, dir, li.schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(li)
    val beforeFiles = t.scan(None).collectAddFiles()
      .map(_.path).toSet

    t.deleteWhereDV("l_quantity < 3")
    val snap = t.snapshot()
    assert(snap.protocol.minReaderVersion == 3)
    assert(snap.protocol.readerFeatures.get.contains("deletionVectors"))

    val files = t.scan(None).collectAddFiles()
    // same data files, now carrying DVs
    assert(files.map(_.path).toSet == beforeFiles)
    assert(files.exists(_.deletionVector.isDefined))

    val expected = li.filter(not(coalesce($"l_quantity" < 3, lit(false))))
    assert(t.toDF.count() == expected.count())
    assert(t.toDF.agg(sum($"l_quantity")).head.getDouble(0) ==
      expected.agg(sum($"l_quantity")).head.getDouble(0))

    // second DV delete merges bitmaps
    t.deleteWhereDV("l_quantity >= 8")
    val expected2 = expected.filter(not(coalesce($"l_quantity" >= 8, lit(false))))
    assert(t.toDF.count() == expected2.count())

    // full-file delete drops the file instead of writing an empty DV
    t.deleteWhereDV("l_quantity >= 0") // everything
    assert(t.toDF.count() == 0)
    assert(t.scan(None).collectAddFiles().isEmpty)
  }

  test("large DV delete: >1M rows masked, no driver position arrays, " +
      "join-free scan") {
    val dir = TestSpark.tmpDir("dvbig")
    val src = spark.range(2200000)
      .select(col("id").as("k"), (col("id") % 97).as("m"))
    DeltaTable.create(spark, dir, src.schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(src.repartition(4))
    // delete ~1.09M rows through the DV path (bitmaps built on
    // executors; read path probes broadcast bitmap bytes in-scan)
    t.deleteWhereDV("m < 48")
    assert(t.toDF.count() == 2200000L - src.filter($"m" < 48).count())
    assert(t.toDF.filter($"m" < 48).count() == 0)
    val totalCard = t.scan(None).collectAddFiles()
      .flatMap(_.deletionVector).map(_.cardinality).sum
    assert(totalCard == src.filter($"m" < 48).count())
    assert(totalCard >= 1000000L)
    // scale contract: the DV mask applies inside the scan stage — the
    // physical plan has NO join and NO position broadcast-explode
    val plan = t.toDF.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(800))
    // stats flagged non-tight on DV adds
    val dvStats = t.scan(None).collectAddFiles()
      .filter(_.deletionVector.isDefined).flatMap(_.stats)
    assert(dvStats.nonEmpty &&
      dvStats.forall(_.contains("\"tightBounds\":false")))
  }

  test("z85 tail-padding round trip for every length 0..64") {
    val rnd = new scala.util.Random(42)
    (0 to 64).foreach { n =>
      val bytes = Array.fill(n)(rnd.nextInt(256).toByte)
      val enc = DeletionVectors.z85Encode(bytes)
      assert(enc.length == (n + 3) / 4 * 5)
      val dec = DeletionVectors.z85Decode(enc, n)
      assert(java.util.Arrays.equals(dec, bytes), s"length $n")
    }
  }

  test("small DV deletes inline into the log: no extra storage object") {
    val dir = TestSpark.tmpDir("dvinline")
    val src = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("k", "s")
    DeltaTable.create(spark, dir, src.schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(src.repartition(1))
    t.deleteWhereDV("k <= 7") // tiny bitmap -> inline descriptor
    val adds = t.scan(None).collectAddFiles()
    val dv = adds.flatMap(_.deletionVector)
    assert(dv.nonEmpty && dv.forall(_.storageType == "i"), dv)
    assert(dv.map(_.cardinality).sum == 7)
    // no deletion_vector_*.bin appeared
    val fs = Storage.fs(new org.apache.hadoop.fs.Path(dir),
      spark.sessionState.newHadoopConf())
    val binFiles = Storage.listFilesRecursive(fs,
      new org.apache.hadoop.fs.Path(dir))
      .filter(_.getPath.getName.startsWith("deletion_vector_"))
    assert(binFiles.isEmpty)
    // reads respect the inline mask; a second DV delete merges into it
    assert(t.toDF.count() == 993)
    t.deleteWhereDV("k <= 12")
    assert(t.toDF.count() == 988)
    assert(t.toDF.filter($"k" <= 12).count() == 0)
    // CDF-style swap resolution handles the inline pre/post pair
    val latest = t.scan(None).collectAddFiles()
      .flatMap(_.deletionVector)
    assert(latest.forall(_.storageType == "i"))
  }

  test("orBitmaps merges at bitmap level") {
    val a = DeletionVectors.serializeBitmap(Array(1L, 5L, (1L << 34) + 1))
    val b = DeletionVectors.serializeBitmap(Array(2L, 5L))
    val m = DeletionVectors.orBitmaps(a, b)
    assert(DeletionVectors.deserializeBitmap(m).toSeq ==
      Seq(1L, 2L, 5L, (1L << 34) + 1))
  }

  test("checkpoint preserves DV descriptors") {
    val dir = TestSpark.tmpDir("dvckpt")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .filter($"l_quantity" < 6)
    DeltaTable.create(spark, dir, li.schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(li)
    t.deleteWhereDV("l_quantity < 2")
    val expected = t.toDF.count()
    t.checkpoint()
    t.append(li.filter($"l_quantity" < 0)) // empty commit keeps log moving
    assert(t.snapshot().segment.checkpointVersion.contains(2L))
    assert(t.toDF.count() == expected)
  }

  test("DV-based UPDATE: untouched bytes stay put, updated copies " +
      "append, CDF images exact, row ids survive") {
    val dir = TestSpark.tmpDir("upddv")
    val src = (1 to 300).map(i => (i.toLong, i.toDouble)).toDF("k", "v")
    DeltaTable.create(spark, dir, src.schema, configuration = Map(
      TableChanges.CDF_ENABLED_KEY -> "true",
      RowTracking.ENABLED_KEY -> "true"))
    val t = DeltaTable.forPath(spark, dir)
    t.append(src.repartition(3))
    val before = new DeltaScan(t.snapshot(), None).collectAddFiles()
    val idsBefore = t.scan(None).toDFWithRowIds
      .filter(col("k") <= 10).select("k", "_row_id")
      .as[(Long, Long)].collect().toMap
    t.updateWhereDV("k <= 10", Map("v" -> "v + 1000.0"))
    val after = new DeltaScan(t.snapshot(), None).collectAddFiles()
    // every original file still live (DV-swapped), plus new update files
    assert(before.map(_.path).toSet.subsetOf(after.map(_.path).toSet))
    assert(after.count(_.deletionVector.isDefined) > 0)
    assert(after.size > before.size)
    // swapped adds carry non-tight stats (dead rows behind the DV)
    after.filter(_.deletionVector.isDefined).foreach(a =>
      assert(a.stats.exists(_.contains("\"tightBounds\":false"))))
    // table content exact
    val rows = t.toDF.select("k", "v").as[(Long, Double)].collect().toMap
    assert(rows.size == 300)
    (1 to 10).foreach(i => assert(rows(i.toLong) == i + 1000.0))
    (11 to 300).foreach(i => assert(rows(i.toLong) == i.toDouble))
    // CDF pre/post images for exactly the touched rows
    val cdf = TableChanges.read(spark, dir, 2, Some(2))
      .select(col("k"), col("v"), col("_change_type"))
      .as[(Long, Double, String)].collect()
    assert(cdf.count(_._3 == "update_preimage") == 10)
    assert(cdf.count(_._3 == "update_postimage") == 10)
    assert(cdf.filter(_._3 == "update_postimage").forall(r => r._2 == r._1 + 1000.0))
    // row ids survive the update (updated rows keep their id)
    val idsAfter = t.scan(None).toDFWithRowIds
      .filter(col("k") <= 10).select("k", "_row_id")
      .as[(Long, Long)].collect().toMap
    assert(idsAfter == idsBefore, s"row ids moved: $idsBefore -> $idsAfter")
  }

  test("DV-based UPDATE: fully-matched file drops; repeat merges DVs") {
    val dir = TestSpark.tmpDir("upddv2")
    val src = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("k", "v")
    DeltaTable.create(spark, dir, src.schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(src.repartition(1))                 // one file
    t.updateWhereDV("k > 0", Map("v" -> "v * 2.0")) // matches ALL rows
    val adds = new DeltaScan(t.snapshot(), None).collectAddFiles()
    // the fully-matched file dropped; only the updated copies remain
    assert(adds.forall(_.deletionVector.isEmpty))
    assert(t.toDF.count() == 100)
    // second DV update on the new files merges into fresh DVs
    t.updateWhereDV("k <= 5", Map("v" -> "v + 0.5"))
    t.updateWhereDV("k <= 3", Map("v" -> "v + 0.25"))
    val rows = t.toDF.select("k", "v").as[(Long, Double)].collect().toMap
    assert(rows(1L) == 2.75 && rows(4L) == 8.5 && rows(10L) == 20.0)
    assert(t.toDF.count() == 100)
  }

  test("REORG PURGE: only DV-carrying files rewritten, DVs gone, " +
      "rows identical, no CDF rows for the reorg commit") {
    val dir = TestSpark.tmpDir("reorg")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .filter($"l_quantity" < 10)
    DeltaTable.create(spark, dir, li.schema, Seq("l_returnflag"),
      Map("delta.enableChangeDataFeed" -> "true"))
    val t = DeltaTable.forPath(spark, dir)
    t.append(li)
    t.deleteWhereDV("l_returnflag = 'A' AND l_quantity < 3")
    val before = t.scan(None).collectAddFiles()
    val dvPaths = before.filter(_.deletionVector.isDefined).map(_.path).toSet
    val cleanPaths = before.filter(_.deletionVector.isEmpty).map(_.path).toSet
    assert(dvPaths.nonEmpty && cleanPaths.nonEmpty)
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic corpus,
    // so compare fully-sorted row renderings, not an orderBy collect
    val rowsBefore = t.toDF.collect().map(_.toString).sorted

    val v = t.reorgPurge()
    val after = t.scan(None).collectAddFiles()
    // no DV descriptors anywhere; untouched files keep their paths
    assert(after.forall(_.deletionVector.isEmpty))
    assert(cleanPaths.subsetOf(after.map(_.path).toSet))
    assert(after.map(_.path).toSet.intersect(dvPaths).isEmpty)
    // identical rows
    assert(t.toDF.collect().map(_.toString).sorted.sameElements(rowsBefore))
    // dataChange=false: the reorg commit contributes no CDF rows
    val cdf = TableChanges.read(spark, dir, v, Some(v))
    assert(cdf.count() == 0)
    // idempotent: nothing left to purge
    assert(t.reorgPurge() == v)
  }

  test("REORG PURGE WHERE scopes to matching partitions; rejects " +
      "non-partition predicates") {
    val dir = TestSpark.tmpDir("reorgw")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .filter($"l_quantity" < 10)
    DeltaTable.create(spark, dir, li.schema, Seq("l_returnflag"))
    val t = DeltaTable.forPath(spark, dir)
    t.append(li)
    t.deleteWhereDV("l_quantity < 2") // DVs across partitions
    val dvByPart = t.scan(None).collectAddFiles()
      .filter(_.deletionVector.isDefined)
    assert(dvByPart.map(_.partitionValues.values.head).toSet.size > 1)

    t.reorgPurge(Some("l_returnflag = 'A'"))
    val after = t.scan(None).collectAddFiles()
    // 'A' partition purged; other partitions still carry DVs
    assert(!after.exists(a => a.deletionVector.isDefined &&
      a.partitionValues.values.head == "A"))
    assert(after.exists(_.deletionVector.isDefined))

    intercept[IllegalArgumentException](
      t.reorgPurge(Some("l_quantity < 5")))
  }
}
