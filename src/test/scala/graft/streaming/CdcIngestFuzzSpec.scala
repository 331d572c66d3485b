package graft.streaming

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.delta.{AdaptiveMetadata, ContentTree, DeltaTable,
  EqualityDeletes}

/** Randomized model check of the CDC-ingest contract: upsert/delete
  * batches with random fold thresholds, idempotent replays (with the
  * CURRENT root and with a STALE pre-batch root — the crash window),
  * and periodic equality→position conversion must always read back
  * exactly the state a driver-side map computes. Covers the
  * version+1 sequencing rule, the marker replay gate's delete
  * re-derivation, loose-row folding, and conversion invariance in one
  * interleaving.
  */
class CdcIngestFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("k", StringType),
    StructField("v", IntegerType)))

  private def run(seed: Int): Unit = {
    val rng = new Random(seed)
    val dir = TestSpark.tmpDir(s"cdcfuzz$seed")
    DeltaTable.create(spark, dir, schema)
    val t = DeltaTable.forPath(spark, dir)
    var root: AdaptiveMetadata.ContentRoot =
      ContentTree.writeRoot(t.snapshot(), 2)
    val model = scala.collection.mutable.Map.empty[Long, (String, Int)]
    val appId = s"cdc-fuzz-$seed"

    def state(r: AdaptiveMetadata.ContentRoot): Map[Long, (String, Int)] =
      CdcIngest.currentState(t, r).collect()
        .map(x => x.getLong(0) -> (x.getString(1), x.getInt(2))).toMap

    (1 to 8).foreach { b =>
      // distinct ids per batch (the CDC contract: one op per key)
      val ids = rng.shuffle((0L to 12L).toList)
        .take(1 + rng.nextInt(5))
      val ops = ids.map { id =>
        if (rng.nextBoolean())
          ("upsert", id, s"k$id-$b", b * 100 + id.toInt)
        else ("delete", id, "", 0)
      }
      import scala.jdk.CollectionConverters._
      val batch = spark.createDataFrame(
        ops.map(o => Row(o._1, o._2, o._3, o._4)).asJava,
        StructType(StructField("_op", StringType) +: schema.fields))
      // model: ALL batch keys die against prior state, upserts insert
      ops.foreach { o => model.remove(o._2) }
      ops.collect { case ("upsert", id, k, v) =>
        model(id) = (k, v) }

      val fold = rng.nextInt(3) match {
        case 0 => 0       // fold every batch
        case 1 => 2       // fold when >2 loose rows
        case _ => 1 << 20 // never fold
      }
      val preBatch = root
      // foreign-writer race arm: a second handle commits between the
      // batch's snapshot and its append. The fresh foreign key (90+,
      // outside the batch key space) must SURVIVE; the foreign row of
      // a batch key must DIE — the batch's deletes stamp the LANDED
      // sequence, which postdates the foreign commit. Only armed when
      // the batch has upserts (a pure-delete batch commits nothing;
      // its single-writer contract is documented).
      val race = rng.nextInt(4) == 0 && ops.exists(_._1 == "upsert")
      val beforeAppend: () => Unit =
        if (!race) () => ()
        else {
          val fid = 90L + b
          val batchKey = ops.head._2
          model(fid) = (s"f$b", 7)
          () => {
            import scala.jdk.CollectionConverters._
            DeltaTable.forPath(spark, dir).append(
              spark.createDataFrame(Seq(
                Row(fid, s"f$b", 7),
                Row(batchKey, "foreign", 1)).asJava, schema))
            ()
          }
        }
      root = CdcIngest.processBatch(t, root, batch, Seq(0), appId,
        batchId = b.toLong, foldThreshold = fold, beforeAppend)
      assert(state(root) == model.toMap,
        s"seed $seed batch $b${if (race) " (raced)" else ""}")

      if (rng.nextInt(3) == 0) {
        // replay with the CURRENT root: must be a no-op
        root = CdcIngest.processBatch(t, root, batch, Seq(0), appId,
          batchId = b.toLong, foldThreshold = fold)
        assert(state(root) == model.toMap, s"seed $seed batch $b replay")
      }
      if (rng.nextInt(3) == 0) {
        // crash replay: the caller lost the batch's root and replays
        // with the PRE-batch one — recovery must re-derive the
        // tree-only deletes
        root = CdcIngest.processBatch(t, preBatch, batch, Seq(0), appId,
          batchId = b.toLong, foldThreshold = fold)
        assert(state(root) == model.toMap,
          s"seed $seed batch $b stale replay")
      }
      if (b % 3 == 0) {
        val snap = t.snapshot()
        val resolved = root.resolve(snap.tableRoot.toString)
        val hasEq = ContentTree.readEntriesDF(spark, resolved,
          snap.tableRoot.toString)
          .filter(org.apache.spark.sql.functions.col("contentType") ===
            ContentTree.DataContentType.EqualityDeletes)
          .limit(1).count() > 0
        if (hasEq) {
          root = EqualityDeletes.convertToPositionDeletes(snap,
            resolved, 2)
          assert(state(root) == model.toMap,
            s"seed $seed batch $b conversion")
        }
      }
    }
  }

  Seq(7, 31, 83).foreach { seed =>
    test(s"randomized CDC batches with folds, replays and conversion " +
        s"match the model (seed $seed)") {
      run(seed)
    }
  }

  // wide sweep on demand (GRAFT_CDC_FUZZ_SEEDS=n) — the shake-out tool
  sys.env.get("GRAFT_CDC_FUZZ_SEEDS").map(_.toInt).foreach { n =>
    test(s"wide CDC-ingest fuzz: $n seeds") {
      (200 until 200 + n).foreach(run)
    }
  }
}
