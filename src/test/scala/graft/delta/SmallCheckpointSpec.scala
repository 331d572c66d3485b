package graft.delta

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The small-checkpoint driver collect (Snapshot.ckptRowsSmall): one
  * scan of a small classic checkpoint feeds latestActions' checkpoint
  * arm, setTransactions and domainMetadatas. These pins hold it
  * EQUIVALENT to the distributed path (forced via
  * graft.replay.driverMaxBytes=0) on a table exercising all three
  * consumers at once.
  */
class SmallCheckpointSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def src(lo: Int, hi: Int) =
    (lo to hi).map(i => (i.toLong, s"v$i")).toDF("k", "s")

  private def build(): String = {
    val dir = TestSpark.tmpDir("smallckpt")
    DeltaTable.create(spark, dir, src(1, 1).schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(src(1, 50), txn = Some(SetTransaction("appA", 3L, None)))
    t.append(src(51, 90), txn = Some(SetTransaction("appB", 7L, Some(99L))))
    t.alterClusterBy(Seq("k")) // domain metadata into the checkpoint
    t.deleteWhere("k > 80")    // a remove the checkpoint must reconcile
    t.checkpoint()
    // a post-checkpoint commit so the read is checkpoint + tail
    DeltaTable.forPath(spark, dir).append(src(91, 100))
    dir
  }

  test("driver-collected small checkpoint serves data, app txns and " +
      "domain metadata identically to the distributed read") {
    val dir = build()
    def observe(): (Set[Long], Map[String, (Long, Option[Long])],
        Set[String]) = {
      val snap = DeltaTable.forPath(spark, dir).snapshot()
      (snap.toDF.select("k").as[Long].collect().toSet,
        snap.setTransactions
          .map(t => t.appId -> (t.version, t.lastUpdated)).toMap,
        snap.domainMetadatas.map(_.domain).toSet)
    }
    val (rowsFast, txnsFast, domsFast) = observe()
    spark.conf.set("graft.replay.driverMaxBytes", "0")
    val (rowsDist, txnsDist, domsDist) =
      try observe() finally spark.conf.unset("graft.replay.driverMaxBytes")

    assert(rowsFast == (1L to 80L).toSet ++ (91L to 100L).toSet)
    assert(rowsFast == rowsDist)
    assert(txnsFast ==
      Map("appA" -> ((3L, None)), "appB" -> ((7L, Some(99L)))))
    assert(txnsFast == txnsDist)
    assert(domsFast.contains(Clustering.DOMAIN) && domsFast == domsDist)
  }

  test("OPTIMIZE's layout-input cache never lingers past the rewrite") {
    val dir = TestSpark.tmpDir("optcache")
    DeltaTable.create(spark, dir, src(1, 1).schema,
      clusterBy = Seq("k"))
    val t = DeltaTable.forPath(spark, dir)
    t.append(src(1, 500))
    t.append(src(501, 1000))
    val before = spark.sparkContext.getPersistentRDDs.keySet
    t.optimizeClustered()
    assert(spark.sparkContext.getPersistentRDDs.keySet == before,
      "optimizeRewrite left its input persisted")
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 1000)
  }

  test("OPTIMIZE above the cache gate (streaming path) rewrites to the " +
      "same table as the cached path") {
    def build(cacheMax: String): Set[(Long, String)] = {
      val dir = TestSpark.tmpDir("optgate")
      DeltaTable.create(spark, dir, src(1, 1).schema,
        clusterBy = Seq("k"))
      val t = DeltaTable.forPath(spark, dir)
      t.append(src(1, 700))
      t.append(src(701, 1500))
      spark.conf.set(DeltaTable.OPTIMIZE_CACHE_INPUT_KEY, cacheMax)
      try t.optimizeClustered()
      finally spark.conf.unset(DeltaTable.OPTIMIZE_CACHE_INPUT_KEY)
      val snap = DeltaTable.forPath(spark, dir).snapshot()
      // clustered layout intact either way: every staged file covers a
      // disjoint key range (min/max stats don't overlap)
      import org.apache.spark.sql.functions.{col, min => fmin, max => fmax}
      val ranges = snap.toDF.groupBy(
          org.apache.spark.sql.functions.input_file_name())
        .agg(fmin(col("k")), fmax(col("k")))
        .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
      ranges.sliding(2).foreach {
        case Array((_, hi), (lo2, _)) =>
          assert(hi < lo2, s"overlapping clustered ranges under $cacheMax")
        case _ => ()
      }
      snap.toDF.select("k", "s").as[(Long, String)].collect().toSet
    }
    assert(build("0") == build(Long.MaxValue.toString))
  }
}
