package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emb = spark.read
    .parquet("/root/testdata/sf0.01/embeddings.parquet")

  test("cosinePairs is exact: matches the brute-force pair set") {
    val fast = Similarity.cosinePairs(emb, "vec_id", "embedding", 0.35, 8)
      .select($"vec_a", $"vec_b", round($"sim", 9).as("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val e = emb.select($"vec_id",
      expr("transform(embedding, x -> cast(x as double))").as("v"))
    val brute = e.as("a").join(broadcast(e.as("b")),
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(expr(
          "aggregate(zip_with(a.v, b.v, (x, y) -> x * y), 0.0D, (acc, z) -> acc + z)" +
          " / (sqrt(aggregate(transform(a.v, x -> x * x), 0.0D, (acc, z) -> acc + z))" +
          "  * sqrt(aggregate(transform(b.v, x -> x * x), 0.0D, (acc, z) -> acc + z)))"),
          9).as("sim"))
      .filter($"sim" >= 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fast == brute)
    assert(fast.nonEmpty)
  }

  test("cosinePairs plan has no BroadcastNestedLoopJoin / CartesianProduct") {
    val plan = Similarity.cosinePairs(emb, "vec_id", "embedding", 0.35, 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(500))
    assert(!plan.contains("CartesianProduct"), plan.take(500))
  }

  test("ivfTopK returns k per query, self excluded, candidates from probed cells") {
    val out = Similarity.ivfTopK(emb, "vec_id", "embedding",
      numCentroids = 16, nprobe = 4, k = 5, queryMaxId = 10)
    val rows = out.collect()
    assert(rows.length == 50)
    assert(rows.forall(r => r.getAs[Long]("qid") != r.getAs[Long]("nid")))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("k-means IVF: training improves quantization; recall@10 usable") {
    // ground truth: exact brute-force top-10 per query
    val e = emb.select($"vec_id",
      expr("transform(embedding, x -> cast(x as double))").as("v"))
    val q = e.filter($"vec_id" < 20)
      .select($"vec_id".as("qid"), $"v".as("qv"))
    val truth = e.select($"vec_id".as("nid"), $"v".as("nv"))
      .join(broadcast(q), $"qid" =!= $"nid")
      .withColumn("sim", expr(
        "aggregate(zip_with(qv, nv, (x, y) -> x * y), 0.0D, (acc, z) -> acc + z)" +
        " / (sqrt(aggregate(transform(qv, x -> x * x), 0.0D, (acc, z) -> acc + z))" +
        "  * sqrt(aggregate(transform(nv, x -> x * x), 0.0D, (acc, z) -> acc + z)))"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"qid").orderBy($"sim".desc, $"nid")))
      .filter($"rk" <= 10)
      .select($"qid", $"nid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select($"qid", $"nid").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val per = truth.map { case (qid, ts) =>
        got.get(qid).map(g => g.intersect(ts).size.toDouble / ts.size)
          .getOrElse(0.0)
      }
      per.sum / per.size
    }

    val untrained = recall(Similarity.ivfTopK(emb, "vec_id", "embedding",
      numCentroids = 16, nprobe = 2, k = 10, queryMaxId = 20))
    val trained = recall(Similarity.kmeansIvfTopK(emb, "vec_id",
      "embedding", numCentroids = 16, nprobe = 2, k = 10,
      queryMaxId = 20, iterations = 5))
    info(s"recall@10: untrained=$untrained trained=$trained")
    // on near-uniform synthetic embeddings recall at fixed nprobe is
    // noisy; the guarantee training gives is QUANTIZATION quality —
    // vectors sit closer to their best centroid after Lloyd iterations
    val vecs = e.select($"v").as[Array[Double]].collect()
    def meanBestSim(cents: Array[(Long, Array[Double])]): Double = {
      def dot(a: Array[Double], b: Array[Double]) =
        a.zip(b).map { case (x, y) => x * y }.sum
      val withNorm = cents.map { case (_, c) =>
        (c, math.sqrt(dot(c, c)))
      }
      vecs.map { v =>
        val nv = math.sqrt(dot(v, v))
        withNorm.map { case (c, nc) => dot(v, c) / (nv * nc) }.max
      }.sum / vecs.length
    }
    val seedQ = meanBestSim(Similarity.trainCentroids(
      emb, "vec_id", "embedding", 16, iterations = 0))
    val trainedQ = meanBestSim(Similarity.trainCentroids(
      emb, "vec_id", "embedding", 16, iterations = 5))
    info(s"mean best-centroid cosine: seed=$seedQ trained=$trainedQ")
    assert(trainedQ > seedQ,
      s"training must improve quantization: $trainedQ <= $seedQ")
    // both quantizers clear a usable recall bar at nprobe=2/16
    assert(trained >= 0.5, s"trained recall too low: $trained")
    assert(untrained >= 0.5)
  }

  test("persisted quantizer: train-once search-many, reload is " +
      "deterministic, centroid table is a real delta table") {
    val centDir = TestSpark.tmpDir("ivf-cent")
    def run() = Similarity.kmeansIvfTopKPersisted(emb, "vec_id",
        "embedding", centroidsPath = centDir, numCentroids = 16,
        nprobe = 4, k = 5, queryMaxId = 10, iterations = 3)
      .select($"qid", $"nid", round($"sim", 9).as("sim"))
      .orderBy($"qid", $"nid")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

    val first = run()   // trains + persists
    assert(first.size == 50)
    val v1 = graft.delta.DeltaTable.forPath(spark, centDir)
      .snapshot().version
    val second = run()  // loads the persisted quantizer — no retrain
    assert(second == first, "reload must reproduce results exactly")
    assert(graft.delta.DeltaTable.forPath(spark, centDir)
      .snapshot().version == v1, "second search must not retrain")

    // persisted centroids == the in-memory training result
    val trained = Similarity.trainCentroids(
      emb, "vec_id", "embedding", 16, iterations = 3)
    val loaded = Similarity.loadCentroids(spark, centDir)
    assert(loaded.map(_._1).toSeq == trained.map(_._1).toSeq)
    assert(loaded.zip(trained).forall { case ((_, a), (_, b)) =>
      a.toSeq == b.toSeq })
  }

  test("incrementalFuzzyNew: state rejects near-dups across batches, " +
      "txn marker makes replay exact") {
    val state = TestSpark.tmpDir("fuzzystate")
    // 4-sig toy space: docs 1/2 identical sigs, 3 half-agrees with 1,
    // 4 disjoint; batch2: 5 collides with admitted 1, 6 fresh
    def sigRows(rows: (Long, Long, Long, Long, Long)*) =
      rows.toSeq.toDF("doc_id", "mh0", "mh1", "mh2", "mh3")
    val b1 = sigRows(
      (1L, 10L, 11L, 12L, 13L),
      (2L, 10L, 11L, 12L, 13L),   // dup of 1 -> within-batch reject
      (3L, 10L, 11L, 99L, 98L),   // band0 collides, sim=0.5 -> grouped
      (4L, 50L, 51L, 52L, 53L))
    val a1 = Dedup.incrementalFuzzyNew(spark, state, b1, "doc_id",
      Seq("mh0", "mh1", "mh2", "mh3"), rowsPerBand = 2, threshold = 0.5,
      txn = Some(("fuzzy-app", 1L)))
      .select("doc_id").as[Long].collect().sorted
    assert(a1.toSeq == Seq(1L, 4L)) // 2 and 3 fold into 1's component
    val b2 = sigRows(
      (5L, 10L, 11L, 12L, 13L),   // identical to admitted 1 -> rejected
      (6L, 70L, 71L, 72L, 73L))
    val a2 = Dedup.incrementalFuzzyNew(spark, state, b2, "doc_id",
      Seq("mh0", "mh1", "mh2", "mh3"), rowsPerBand = 2, threshold = 0.5,
      txn = Some(("fuzzy-app", 2L)))
      .select("doc_id").as[Long].collect().sorted
    assert(a2.toSeq == Seq(6L))
    // replay of batch 2 AFTER its append: without the marker the
    // reject join would see 6's own state rows and drop it — with the
    // marker the replay returns exactly the first run's admissions
    val replay = Dedup.incrementalFuzzyNew(spark, state, b2, "doc_id",
      Seq("mh0", "mh1", "mh2", "mh3"), rowsPerBand = 2, threshold = 0.5,
      txn = Some(("fuzzy-app", 2L)))
      .select("doc_id").as[Long].collect().sorted
    assert(replay.toSeq == Seq(6L))
    // state is partitioned by band and holds one row per admitted doc
    // per band
    val st = graft.delta.DeltaTable.forPath(spark, state)
    assert(st.snapshot().partitionColumns == Seq("band"))
    val perDoc = st.toDF.groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    assert(perDoc == Map(1L -> 2L, 4L -> 2L, 6L -> 2L))
  }

  test("minhash band pairs: candidates share a band; high-sig_sim pairs kept") {
    val sigs = Seq(
      (1L, 10L, 20L, 30L, 40L, 50L, 60L, 70L, 80L),
      (2L, 10L, 20L, 31L, 41L, 51L, 61L, 71L, 81L), // shares band 0
      (3L, 99L, 98L, 97L, 96L, 95L, 94L, 93L, 92L)  // shares nothing
    ).toDF("doc_id", "mh0", "mh1", "mh2", "mh3", "mh4", "mh5", "mh6", "mh7")
    val pairs = Dedup.minhashBandPairs(sigs, "doc_id",
      (0 until 8).map(i => s"mh$i"), 2).collect()
    assert(pairs.length == 1)
    val p = pairs.head
    assert(p.getAs[Long]("doc_a") == 1L && p.getAs[Long]("doc_b") == 2L)
    assert(p.getAs[Double]("sig_sim") == 0.25) // 2 of 8 sigs agree
  }

  test("simHash64 produces 64-bit fingerprints, near-dups close in hamming") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different words entirely unrelated text")
    ).toDF("doc_id", "text")
    val fp = Dedup.simHash64(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash64")).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(1L), fp(2L)) < ham(fp(1L), fp(3L)))
  }

  test("multimodal plumbing: frames + hash over binary payload") {
    val docs = Seq((1L, "a" * 600), (2L, "b" * 100), (3L, ""))
      .toDF("doc_id", "text")
    val feats = Multimodal.extractFeatures(
      Multimodal.ingest(docs, "doc_id", "text", "text/plain"))
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).n_frames == 3 && feats(1L).n_bytes == 600)
    assert(feats(2L).n_frames == 1)
    assert(feats(3L).n_frames == 0)
    // frame0 hash = md5 of the first 256 bytes
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = md.digest("a".repeat(256).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(feats(1L).frame0_hash == expect)
  }

  test("PNG codec is real: genuine PNG stream out, faithful raster back") {
    // the synthesized payload is a real PNG (magic signature + decodable
    // by an independent ImageIO call), and the decoded raster carries
    // exactly the predicted pixel pattern
    val bytes = Multimodal.synthesizePng(seed = 7L, width = 13, height = 5)
    val magic = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    assert(bytes.take(8).sameElements(magic), "missing PNG signature")
    val f = Multimodal.decodePng(42L, bytes)
    assert(f.width == 13 && f.height == 5 && f.n_pixels == 65)
    assert(f.pixel_sum == (0 until 65).map(p => (p + 7) % 256).sum)
    assert(f.corner_pixel == (64 + 7) % 256)
    // and a corrupted payload is a decode ERROR, not silent garbage
    val broken = bytes.take(20)
    intercept[Exception] { Multimodal.decodePng(1L, broken) }

    // distributed round trip over a real dataframe
    val dims = Seq((1L, 9, 4), (2L, 3, 3), (3L, 40, 30))
      .toDF("doc_id", "width", "height")
    val out = Multimodal.pngRoundTrip(dims).collect()
      .map(r => r.doc_id -> r).toMap
    assert(out(1L).n_pixels == 36 && out(2L).n_pixels == 9)
    assert(out(3L).width == 40 && out(3L).height == 30)
    assert(out(2L).pixel_sum == (0 until 9).map(p => (p + 2) % 256).sum)
  }

  test("WAV codec is real: genuine RIFF/WAVE stream out, faithful PCM back") {
    val payload = Multimodal.synthesizeWav(seed = 42L, nSamples = 1000)
    // RIFF container magics, written by the JDK's real WAV writer
    assert(new String(payload.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(payload.slice(8, 12), "US-ASCII") == "WAVE")
    val f = Multimodal.decodeWav(7L, payload)
    assert(f.sample_rate == 16000L && f.n_samples == 1000L)
    assert(f.duration_ms == 62L) // 1000 * 1000 / 16000
    val amp = 1000 + 42 % 9000
    assert(f.peak == amp)
    // silent tail: rms strictly below peak, exactly floor(amp*sqrt(750/1000))
    assert(f.rms == math.sqrt(750.0 * amp * amp / 1000.0).toLong)
    assert(f.rms < f.peak)
    // a corrupted payload fails fast instead of returning junk
    intercept[Exception] {
      Multimodal.decodeWav(8L, payload.take(16))
    }
  }

  test("connectedComponents: driver and distributed paths agree") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L),     // chain -> rep 1
      (10L, 11L),             // pair -> rep 10
      (20L, 21L), (21L, 22L), (22L, 23L), (20L, 23L) // cycle -> rep 20
    ).toDF("vec_a", "vec_b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L)
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driver union-find path
    assert(toMap(Dedup.connectedComponents(pairs, "vec_a", "vec_b")) ==
      expected)
    // distributed min-label path, forced via driverMaxEdges = 0; a long
    // chain needs several propagation rounds
    assert(toMap(Dedup.connectedComponents(pairs, "vec_a", "vec_b",
      driverMaxEdges = 0)) == expected)
    val chain = (0 until 40).map(i => (i.toLong, (i + 1).toLong))
      .toDF("vec_a", "vec_b")
    val got = toMap(Dedup.connectedComponents(chain, "vec_a", "vec_b",
      driverMaxEdges = 0))
    assert(got.values.toSet == Set(0L))
    assert(got.size == 41)
  }

  test("deterministic sampling: low-rate sample is a prefix of high-rate") {
    val df = (1L to 2000L).toDF("id")
    val s10 = Sampling.uniform(df, col("id"), 0.10)
      .as[Long].collect().toSet
    val s30 = Sampling.uniform(df, col("id"), 0.30)
      .as[Long].collect().toSet
    assert(s10.subsetOf(s30), "10% sample must be a prefix of 30%")
    // md5 is uniform: 2000 trials at 10% land well within 5 sigma
    assert(s10.size > 120 && s10.size < 280, s"10% kept ${s10.size}/2000")
    // rerun is byte-identical (no RNG)
    assert(Sampling.uniform(df, col("id"), 0.10)
      .as[Long].collect().toSet == s10)
  }

  test("sequence packing: budgets respected at chunk starts, all docs kept") {
    val docs = (1L to 500L).map(i => (i, 10L + (i % 7) * 30L))
      .toDF("doc_id", "n_tokens")
    val packed = Packing.assignSequences(docs, col("doc_id"),
      col("n_tokens"), budget = 512, numBuckets = 4)
    assert(packed.count() == 500)
    val perSeq = packed.groupBy("bucket", "seq")
      .agg(sum("n_tokens").as("tok"), min("seq").as("s0"))
      .collect()
    // every chunk's START offset is below (seq+1)*budget by
    // construction; totals only exceed the budget by the final doc
    // spilling over the boundary
    perSeq.foreach { r =>
      assert(r.getLong(2) < 512 + 512, s"runaway chunk: $r")
    }
    // buckets partition the docs by pmod
    val buckets = packed.select("bucket").distinct()
      .as[Int].collect().toSet
    assert(buckets == Set(0, 1, 2, 3))
  }

  test("weighted mixture: floor(w) full copies + deterministic " +
      "fractional epoch; zero-weight groups vanish; reproducible") {
    val df = (0L until 1000L).map(i =>
      (i, if (i % 3 == 0) "up" else if (i % 3 == 1) "keep" else "down"))
      .toDF("id", "src")
    val mixed = Sampling.mixture(df, col("id"), col("src"),
      Map("up" -> 2.5, "keep" -> 1.0, "down" -> 0.0), 0.25)
    val byEpoch = mixed.groupBy("src", "epoch").count()
      .as[(String, Int, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

    // full epochs carry every row of the group
    assert(byEpoch(("up", 0)) == 334 && byEpoch(("up", 1)) == 334)
    assert(byEpoch(("keep", 0)) == 333)
    // fractional epoch ~50% of 334 up-rows; hash tolerance
    val frac = byEpoch(("up", 2))
    assert(frac > 100 && frac < 234, s"fractional epoch kept $frac")
    // zero weight drops the group entirely
    assert(!byEpoch.keys.exists(_._1 == "down"))
    // keep=1.0 has exactly one epoch
    assert(!byEpoch.contains(("keep", 1)))
    // deterministic: same output on re-run
    val again = Sampling.mixture(df, col("id"), col("src"),
      Map("up" -> 2.5, "keep" -> 1.0, "down" -> 0.0), 0.25)
    assert(again.orderBy("id", "epoch").collect()
      .sameElements(mixed.orderBy("id", "epoch").collect()))
  }

  test("splitAssign: total, disjoint, stable, proportional") {
    val df = (1L to 4000L).toDF("id")
    val sp = Sampling.splitAssign(df, col("id"),
      Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
    val byLabel = sp.groupBy("split").count().as[(String, Long)]
      .collect().toMap
    // every row labeled exactly once
    assert(byLabel.values.sum == 4000L)
    assert(byLabel.keySet == Set("train", "valid", "test"))
    // proportions within hash tolerance
    assert(math.abs(byLabel("train") - 3200L) < 200,
      s"train=${byLabel("train")}")
    assert(math.abs(byLabel("valid") - 400L) < 120)
    // stable: the same key gets the same split on re-evaluation and
    // under a different partitioning
    val a = sp.select("id", "split").as[(Long, String)].collect().toMap
    val b = Sampling.splitAssign(df.repartition(7), col("id"),
      Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(a == b)
    // a coarser split agrees with the finer one on the shared prefix:
    // 80% train here == train+valid of a (0.7, 0.1, 0.2) split prefix
    intercept[IllegalArgumentException](
      Sampling.splitAssign(df, col("id"), Seq("a" -> 0.5, "b" -> 0.2)))
  }

  test("IVF index: postings live in cell partitions; search scan " +
      "prunes to probed cells; append is monotone") {
    val centDir = graft.TestSpark.tmpDir("ivfx-cent")
    val idxDir = graft.TestSpark.tmpDir("ivfx-idx")
    def vec(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(8)(r.nextFloat() * 2 - 1)
    }
    val b1 = (0L until 64L by 2).map(i => (i, vec(i.toInt)))
      .toDF("vec_id", "embedding")
    val b2 = (1L until 64L by 2).map(i => (i, vec(i.toInt)))
      .toDF("vec_id", "embedding")
    Similarity.ivfIndexAppend(b1, "vec_id", "embedding", centDir,
      idxDir, numCentroids = 8, iterations = 2)
    Similarity.ivfIndexAppend(b2, "vec_id", "embedding", centDir,
      idxDir, numCentroids = 8, iterations = 2)
    val t = graft.delta.DeltaTable.forPath(spark, idxDir)
    assert(t.snapshot().partitionColumns == Seq("cell"))
    // a probe-scoped scan reads strictly fewer files than the full scan
    val full = new graft.delta.DeltaScan(t.snapshot(), None)
      .collectAddFiles()
    val cells = full.flatMap(_.partitionValues.get("cell")).distinct
    assert(cells.size > 1, s"want multiple cells, got $cells")
    val some = new graft.delta.DeltaScan(t.snapshot(),
      Some(s"cell IN (${cells.head})")).collectAddFiles()
    assert(some.nonEmpty && some.size < full.size,
      s"pruned ${some.size} vs full ${full.size}")
    // search returns k neighbors per query, never the query itself
    val res = Similarity.ivfIndexSearch(
      b1.filter(col("vec_id") < 4), "vec_id", "embedding",
      centDir, idxDir, nprobe = 3, k = 4)
      .as[(Long, Long, Double)].collect()
    assert(res.groupBy(_._1).forall(_._2.length == 4))
    assert(res.forall { case (q, n, _) => q != n })
  }
}
