package graft.delta

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Randomized content-tree maintenance fuzz: arbitrary DML sequences
  * (append / DV-delete / rewrite-delete / update) on a PARTITIONED
  * table, a tree built at a random base version, then chained
  * `updateRoot` generations at random later versions. At every
  * generation the tree must be a faithful replacement for the log:
  *
  *  - assembling the tree's add actions reads EXACTLY the table's
  *    rows at that version (DV descriptors, partition values and
  *    row-tracking identity all survive the entry round trip,
  *    including across reused leaves);
  *  - a stats-pruned tree read returns the same file set as the
  *    pruned log read for the same predicate;
  *  - the root's manifest accounting (`recordCount` = entries per
  *    leaf) sums to the readable entry count.
  *
  * Fixed seeds: reproducible. Partitioned leaf grouping makes leaf
  * REUSE actually fire mid-chain (a delete touching one partition
  * leaves other partitions' leaves carried by reference), so the
  * reuse path is fuzzed, not just the targeted ContentTreeSpec pins.
  */
class ContentTreeFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  Seq(11, 29, 53).foreach { seed =>
    test(s"chained updateRoot stays equivalent to the log under " +
        s"random DML (seed $seed)") { run(seed) }
  }

  // wide sweep on demand (GRAFT_TREE_FUZZ_SEEDS=n): the pinned three
  // seeds stay cheap for every build; a wide run is the shake-out
  // tool — seed 53 of the original three is what surfaced the
  // inline-DV gap
  sys.env.get("GRAFT_TREE_FUZZ_SEEDS").map(_.toInt).foreach { n =>
    test(s"wide tree-maintenance fuzz: $n seeds") {
      (100 until 100 + n).foreach(run)
    }
  }

  private def run(seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val dir = TestSpark.tmpDir("treefuzz")
    val schema = Seq((0L, 0.0, "p0")).toDF("k", "v", "p").schema
    DeltaTable.create(spark, dir, schema, Seq("p"),
      Map(RowTracking.ENABLED_KEY -> "true"))
    val t = DeltaTable.forPath(spark, dir)
    var nextK = 0L

    def append(): Unit = {
      val n = 20 + rnd.nextInt(30)
      val rows = (nextK until nextK + n)
        .map(k => (k, (k % 7).toDouble, s"p${k % 4}"))
      nextK += n
      t.append(rows.toDF("k", "v", "p").coalesce(1 + rnd.nextInt(2)))
    }
    append() // never fuzz an empty table

    val conf = spark.sessionState.newHadoopConf()
    val tableRoot = new org.apache.hadoop.fs.Path(dir)
    val rootUri = Storage.fs(tableRoot, conf)
      .makeQualified(tableRoot).toUri.getPath

    def check(root: AdaptiveMetadata.ContentRoot, v: Long): Unit = {
      val snap = Snapshot.forTable(spark, dir, Some(v))
      val resolved = root.resolve(snap.tableRoot.toString)
      // 1. full equivalence: tree-planned scan rows == direct read
      val adds = ContentTree.addFileIterator(spark, resolved,
        snap.tableRoot.toString, rootUri).toSeq
      val viaTree = snap.scanBuilder().build()
        .assemble(adds, keepMeta = false)
        .select($"k", $"v", $"p").as[(Long, Double, String)]
        .collect().sorted.toSeq
      val direct = t.snapshot(Some(v)).toDF
        .select($"k", $"v", $"p").as[(Long, Double, String)]
        .collect().sorted.toSeq
      assert(viaTree == direct,
        s"seed $seed: tree read at v$v diverged from the log read " +
          s"(${viaTree.size} vs ${direct.size} rows)")
      // 2. pruned tree read == pruned log read (file sets)
      val bound = 1 + rnd.nextInt(math.max(nextK.toInt, 2))
      val pred = s"k < $bound"
      val treePruned = ContentTree.prunedAddFileIterator(spark,
        resolved, snap.tableRoot.toString, rootUri, pred).map(_.path).toSet
      val logPruned = new DeltaScan(snap, Some(pred))
        .collectAddFiles(slim = true).map(_.path)
        .map(Storage.decodeUriPath).toSet
      assert(treePruned == logPruned,
        s"seed $seed: pruned tree read at v$v ($pred) diverged")
      // 3. root manifest accounting sums to the readable entries
      val rootDf = spark.read.parquet(resolved)
      val manifests = rootDf.filter(col("contentType") ===
        ContentTree.DataContentType.DataManifest)
      val accounted = manifests.agg(sum("recordCount")).head.getLong(0)
      val readable = ContentTree.readEntriesDF(spark, resolved,
        snap.tableRoot.toString).count()
      assert(accounted == readable,
        s"seed $seed: manifest accounting $accounted != $readable")
    }

    def mutate(): Unit = rnd.nextInt(6) match {
      case 0 | 1 => append()
      case 2 =>
        val m = 2 + rnd.nextInt(4)
        t.deleteWhereDV(s"k % $m = ${rnd.nextInt(m)} AND p = 'p${rnd.nextInt(4)}'")
      case 3 =>
        t.deleteWhere(s"p = 'p${rnd.nextInt(4)}' AND k % 5 = ${rnd.nextInt(5)}")
      case 4 =>
        t.updateWhere(s"k % ${3 + rnd.nextInt(3)} = 0",
          Map("v" -> "v + 1.0"))
      case 5 =>
        t.deleteWhereDV(s"k % ${2 + rnd.nextInt(5)} = 0")
    }

    // a couple of commits before the base tree, then chained updates
    (1 to rnd.nextInt(3)).foreach(_ => mutate())
    val baseV = t.snapshot().version
    var root = ContentTree.writeRoot(
      Snapshot.forTable(spark, dir, Some(baseV)), numLeaves = 4)
    check(root, baseV)
    (1 to 3).foreach { _ =>
      (1 to 1 + rnd.nextInt(2)).foreach(_ => mutate())
      val v = t.snapshot().version
      root = ContentTree.updateRoot(
        Snapshot.forTable(spark, dir, Some(v)), root, numLeaves = 4)
      assert(root.version == v)
      check(root, v)
    }
    // one WIDE generation: >8 commits in the window, so the
    // DISTRIBUTED diff arm (the driver winner fast path declines
    // windows past 8 commits) stays fuzzed, not just the 5M bench's
    // a mutation matching zero rows commits nothing, so loop on the
    // VERSION gap, not the mutation count
    while (t.snapshot().version - root.version <= 8) mutate()
    val vWide = t.snapshot().version
    root = ContentTree.updateRoot(
      Snapshot.forTable(spark, dir, Some(vWide)), root, numLeaves = 4)
    assert(root.version == vWide)
    check(root, vWide)
  }
}
