package graft.delta

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Randomized equality-delete workloads cross-checked against an
  * independent in-memory model: several appends (one file each, so
  * the file sequence is the commit version), an optional DV DELETE
  * (which re-adds touched files at the DV commit's version — the
  * sequence interplay a correct apply must honor), a base tree, a
  * chain of O(root) delete commits at random sequences over random
  * key shapes (single column, composite, NULL keys, missing keys),
  * then the applying read AND the post-conversion plain read must
  * both equal the model.
  */
class EqualityDeleteFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("k", StringType),
    StructField("v", IntegerType)))

  private case class MRow(id: Long, k: String, v: Int,
      var seq: Long, var live: Boolean)

  private def runSeed(seed: Int): Unit = {
    val rnd = new Random(seed)
    val dir = TestSpark.tmpDir(s"eqfuzz$seed")
    DeltaTable.create(spark, dir, schema)
    val t = DeltaTable.forPath(spark, dir)
    val model = scala.collection.mutable.ArrayBuffer.empty[MRow]
    var nextId = 0L
    val kAlpha = Seq("a", "b", "c", null)

    val nAppends = 2 + rnd.nextInt(3)
    (1 to nAppends).foreach { v =>
      val rows = (0 until (3 + rnd.nextInt(6))).map { _ =>
        val id = { nextId += 1; nextId }
        val k = kAlpha(rnd.nextInt(kAlpha.length))
        val vv = rnd.nextInt(5)
        model += MRow(id, k, vv, v.toLong, live = true)
        Row(id, k, vv)
      }
      import scala.jdk.CollectionConverters._
      t.append(spark.createDataFrame(rows.asJava, schema).coalesce(1))
    }

    // optional DV DELETE: kills matching rows AND bumps the file
    // sequence of every touched file to the DV commit version
    if (rnd.nextBoolean()) {
      val m = 2 + rnd.nextInt(3)
      val dvVersion = t.deleteWhereDV(s"id % $m = 0")
      val touched = model.groupBy(_.seq).collect {
        case (s, rs) if rs.exists(r => r.live && r.id % m == 0) => s
      }.toSet
      model.foreach { r =>
        if (r.live && r.id % m == 0) r.live = false
        else if (r.live && touched(r.seq)) r.seq = dvVersion
      }
    }

    val snap = t.snapshot()
    var root = ContentTree.writeRoot(snap, 2)
    val maxSeq = snap.version

    // chained loose delete commits
    val applied = scala.collection.mutable.ArrayBuffer
      .empty[(Seq[Int], Seq[Row], Long)]
    val nDeletes = 1 + rnd.nextInt(3)
    (1 to nDeletes).foreach { _ =>
      val delSeq = 1L + rnd.nextInt(maxSeq.toInt + 2)
      val (ids, keys) = rnd.nextInt(3) match {
        case 0 => // on k, possibly NULL
          val ks = rnd.shuffle(kAlpha).take(1 + rnd.nextInt(2))
          (Seq(1), ks.map(Row(_)))
        case 1 => // on id, mixing live / dead / nonexistent
          val cand = (0 until (1 + rnd.nextInt(3))).map(_ =>
            1L + rnd.nextInt((nextId + 3).toInt).toLong)
          (Seq(0), cand.map(Row(_)))
        case _ => // composite (k, v)
          val pairs = (0 until (1 + rnd.nextInt(2))).map(_ =>
            Row(kAlpha(rnd.nextInt(kAlpha.length)), rnd.nextInt(5)))
          (Seq(1, 2), pairs)
      }
      import scala.jdk.CollectionConverters._
      val keySchema = StructType(ids.map(i => schema.fields(i)))
      val keysDf = spark.createDataFrame(keys.asJava, keySchema)
      val files = EqualityDeletes.writeDeleteFiles(snap, keysDf,
        ids, delSeq)
      if (files.nonEmpty) {
        root = EqualityDeletes.appendDeleteEntries(snap, root, files)
        applied += ((ids, keys, delSeq))
      }
      // model apply: null-safe match on the id columns, strict seq
      model.foreach { r =>
        val rv: Seq[Any] = Seq(r.id, r.k, r.v)
        if (r.live && r.seq < delSeq &&
            keys.exists(key => ids.zipWithIndex.forall {
              case (colIdx, ki) =>
                val a = rv(colIdx); val b = key.get(ki)
                (a == null && b == null) || (a != null && a == b)
            })) r.live = false
      }
    }

    val expected = model.filter(_.live).map(_.id).toSet
    val resolved = root.resolve(snap.tableRoot.toString)
    val got = EqualityDeletes.readApplying(snap, resolved)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == expected,
      s"seed=$seed applying read drifted from model " +
        s"(missing=${expected -- got}, extra=${got -- expected}, " +
        s"deletes=$applied)")

    // folding the deletes into DVs must preserve the row set — by
    // seed parity either TREE-locally (convertToPositionDeletes, read
    // back through the plain DV'd tree scan) or into the DELTA LOG
    // (commitAsDeletionVectors, read back as a log scan any engine
    // would run)
    if (applied.nonEmpty && seed % 2 == 1) {
      val newRoot = EqualityDeletes.convertToPositionDeletes(
        snap, resolved, 2)
      val resolvedNew = newRoot.resolve(snap.tableRoot.toString)
      assert(ContentTree.readEntriesDF(spark, resolvedNew,
        snap.tableRoot.toString)
        .filter(col("contentType") ===
          ContentTree.DataContentType.EqualityDeletes).count() == 0)
      val rootUri = Storage.fs(snap.tableRoot,
        spark.sessionState.newHadoopConf())
        .makeQualified(snap.tableRoot).toUri.getPath
      val adds = ContentTree.addFileIterator(spark, resolvedNew,
        snap.tableRoot.toString, rootUri).toSeq
      val plain = snap.scanBuilder().build()
        .assemble(adds, keepMeta = false)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(plain == expected,
        s"seed=$seed converted read drifted from model")
    } else if (applied.nonEmpty) {
      val (_, rootClean) = EqualityDeletes.commitAsDeletionVectors(
        t, resolved)
      val logRead = t.toDF
        .select("id").collect().map(_.getLong(0)).toSet
      assert(logRead == expected,
        s"seed=$seed materialized LOG read drifted from model")
      assert(readIds(t.snapshot(),
        rootClean.resolve(snap.tableRoot.toString)) == expected,
        s"seed=$seed advanced tree drifted from model")
    }
  }

  private def readIds(snap: Snapshot, resolved: String): Set[Long] =
    EqualityDeletes.readApplying(snap, resolved)
      .select("id").collect().map(_.getLong(0)).toSet

  // odd seeds fold tree-locally, even seeds materialize into the log
  Seq(11, 28, 53, 64).foreach { seed =>
    test(s"random equality-delete workload matches the model (seed $seed)") {
      runSeed(seed)
    }
  }
}
