package graft.delta

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Randomized DML sequences verified against an in-memory model after
  * EVERY commit: append / rewrite-delete / DV-delete / update /
  * checkpoint / compaction / OPTIMIZE / restore compose in arbitrary
  * order and the table must read exactly like the model at each step —
  * including model rollback on restore. Fixed seed: reproducible.
  */
class DmlFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  Seq((7, 24), (23, 14)).foreach { case (seed, steps) =>
    test(s"randomized DML sequence matches the model at every version " +
        s"(seed $seed)") { run(seed, steps) }
  }

  // the same model check with HALF the mutations routed through the
  // SQL surface (UPDATE/DELETE/MERGE INTO via the extension rule and
  // DSv2 delete) and delta.checkpointInterval auto-checkpoints firing
  // mid-sequence — SQL-typed and API-typed DML must be one engine
  test("randomized DML via SQL + API with auto-checkpoint interleaved " +
      "(seed 41)") { run(41, 20, sqlRoute = true) }

  private def run(seed: Int, steps: Int,
      sqlRoute: Boolean = false): Unit = {
    val rnd = new scala.util.Random(seed)
    val dir = TestSpark.tmpDir("fuzz")
    val schema = Seq((0L, 0.0)).toDF("k", "v").schema
    DeltaTable.create(spark, dir, schema, configuration =
      Map(TableChanges.CDF_ENABLED_KEY -> "true") ++
        (if (sqlRoute) Map("delta.checkpointInterval" -> "4") else Map.empty))
    val t = DeltaTable.forPath(spark, dir)
    val sqlName = s"gd_fuzz.default.`$dir`"
    if (sqlRoute) {
      spark.conf.set("spark.sql.catalog.gd_fuzz",
        "graft.sql.GraftDeltaCatalog")
      spark.conf.set("spark.sql.catalog.gd_fuzz.warehouse",
        TestSpark.tmpDir("fuzz-wh"))
    }
    def viaSql(): Boolean = sqlRoute && rnd.nextBoolean()

    var model = Vector.empty[(Long, Double)]
    var nextK = 0L
    // model state at each committed version (restore targets)
    val history = scala.collection.mutable.Map(0L -> model)
    var version = 0L

    def record(v: Long): Unit = { version = v; history(v) = model }

    def checkTable(context: String): Unit = {
      val got = t.toDF.select($"k", $"v").as[(Long, Double)]
        .collect().sorted.toSeq
      assert(got == model.sorted.toSeq,
        s"$context diverged at version $version: " +
          s"got ${got.take(5)}... model ${model.sorted.take(5)}...")
    }

    (1 to steps).foreach { step =>
      val op = rnd.nextInt(10)
      op match {
        case 0 | 1 | 2 => // append a fresh batch
          val n = 20 + rnd.nextInt(80)
          val rows = (nextK until nextK + n)
            .map(k => (k, (k % 13).toDouble))
          nextK += n
          val df0 = rows.toDF("k", "v").repartition(1 + rnd.nextInt(3))
          // half the time, reorder columns and go through the
          // mergeSchema path (no-op evolution + alignment projection)
          val v = if (rnd.nextBoolean()) t.append(df0)
            else t.append(df0.select($"v", $"k"), mergeSchema = true)
          model = model ++ rows
          record(v)
        case 3 => // rewrite delete (sometimes as SQL DELETE FROM)
          if (viaSql()) {
            // DSv2 DELETE needs a source-Filter-translatable predicate
            val lo = rnd.nextInt(math.max(1, nextK.toInt)).toLong
            val hi = lo + 1 + rnd.nextInt(40)
            spark.sql(s"DELETE FROM $sqlName WHERE k >= $lo AND k < $hi")
            model = model.filterNot { case (k, _) => k >= lo && k < hi }
            record(t.snapshot().version)
          } else {
            val m = 2 + rnd.nextInt(5)
            val r = rnd.nextInt(m)
            val v = t.deleteWhere(s"k % $m = $r")
            model = model.filterNot { case (k, _) => k % m == r }
            record(v)
          }
        case 4 => // DV delete
          val c = rnd.nextInt(math.max(1, nextK.toInt))
          val v = t.deleteWhereDV(s"k < $c AND v > 5")
          model = model.filterNot { case (k, vv) => k < c && vv > 5 }
          record(v)
        case 5 => // update (sometimes as SQL UPDATE)
          val c = rnd.nextInt(math.max(1, nextK.toInt))
          val v = if (viaSql()) {
            spark.sql(
              s"UPDATE $sqlName SET v = v + 100 WHERE k >= $c AND v < 4")
            t.snapshot().version
          } else t.updateWhere(s"k >= $c AND v < 4",
            Map("v" -> "v + 100"))
          model = model.map { case (k, vv) =>
            if (k >= c && vv < 4) (k, vv + 100) else (k, vv)
          }
          record(v)
        case 6 => // checkpoint (no data change)
          t.checkpoint(); history(version) = model
        case 7 => // compaction / optimize / auto-compact (no data change)
          rnd.nextInt(3) match {
            case 0 => record(t.optimizeCompact())
            case 1 => t.autoCompact(minNumFiles = 2).foreach(record)
            case _ =>
              if (version < 1) record(t.optimizeCompact())
              else try { t.compactLog(math.max(1, version - 2), version); () }
                catch { case _: IllegalStateException => () } // range exists
          }
        case 8 => // restore to a random earlier version
          val targets = history.keys.filter(_ < version)
          if (targets.nonEmpty) {
            val target = targets.toSeq(rnd.nextInt(targets.size))
            val v = t.restore(target)
            model = history(target)
            record(v)
          }
        case 9 => // merge: update-matched + delete-matched + insert
          import MergeClause._
          val n = 10 + rnd.nextInt(30)
          val lo = if (nextK > 0) rnd.nextLong(nextK) else 0L
          // source: half overlaps existing keys, half is fresh
          val overlap = (lo until math.min(lo + n / 2, nextK))
            .map(k => (k, -1.0))
          val fresh = (nextK until nextK + n / 2).map(k => (k, -2.0))
          nextK += n / 2
          val srcRows = overlap ++ fresh
          val v = if (viaSql()) {
            srcRows.toDF("k", "v").createOrReplaceTempView("fuzz_src")
            spark.sql(s"""MERGE INTO $sqlName AS tg USING fuzz_src AS sr
              ON tg.k = sr.k
              WHEN MATCHED AND tg.v > 200 THEN DELETE
              WHEN MATCHED THEN UPDATE SET v = tg.v + sr.v
              WHEN NOT MATCHED THEN INSERT (k, v) VALUES (sr.k, sr.v)""")
            t.snapshot().version
          } else t.merge(srcRows.toDF("k", "v"), "t.k = s.k", Seq(
            MatchedDelete(Some("t.v > 200")),
            MatchedUpdate(None, Map("v" -> "t.v + s.v")),
            NotMatchedInsert(None, Map("k" -> "s.k", "v" -> "s.v"))))
          if (v > version) {
            val srcMap = srcRows.toMap
            val matchedKeys = model.map(_._1).toSet
            model = model.flatMap { case (k, vv) =>
              if (!srcMap.contains(k)) Some((k, vv))
              else if (vv > 200) None
              else Some((k, vv + srcMap(k)))
            } ++ srcRows.filterNot { case (k, _) => matchedKeys(k) }
            record(v)
          }
      }
      checkTable(s"step $step (op $op)")
    }
    // the log survives a final checkpoint + full reread from scratch
    t.checkpoint()
    val fresh = DeltaTable.forPath(spark, dir)
    assert(fresh.toDF.select($"k", $"v").as[(Long, Double)]
      .collect().sorted.toSeq == model.sorted.toSeq)
  }
}
