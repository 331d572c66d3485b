package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Physical-plan shape of the composed temporal/pipeline operators —
  * the properties that make them survive a 100 TB input: a bounded
  * number of hash shuffles, never a cartesian/nested-loop join, and
  * equi-joins where an inequality join would be the naive shape.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def events = spark.read
    .parquet("/root/testdata/sf0.001/events.parquet")
  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def hashShuffles(p: String): Int =
    "Exchange hashpartitioning".r.findAllIn(p).length

  private def assertNoLoops(p: String): Unit = {
    assert(!p.contains("CartesianProduct"), p.take(1200))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1200))
  }

  test("sessionize is a single hash shuffle on the key") {
    val df = Relational.sessionize(events, "user_id", "ts", "event_id",
      6L * 3600L)
    val p = plan(df)
    assertNoLoops(p)
    assert(hashShuffles(p) == 1, p.take(1200))
  }

  test("as-of join is one hash shuffle, no inequality join") {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .agg(max(col("value")).as("p_value"))
    val df = Relational.asofJoin(clicks, purchases,
      "user_id", "p_user", "ts", "p_ts", Seq("p_value"))
    val p = plan(df)
    assertNoLoops(p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      p.take(1200)) // union + window, not a join at all
    // the purchases pre-agg shuffles once, the union window once
    assert(hashShuffles(p) <= 2, p.take(1200))
  }

  test("range join is a hash equi-join on (key, bucket) — never a " +
      "nested loop over the interval predicate") {
    val errors = events.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val all = events.select(col("user_id").as("r_user"),
      col("ts").as("r_ts"), col("value").as("r_value"))
    val df = Relational.rangeJoin(errors, all, "user_id", "r_user",
      "ts", "r_ts", -86400L, 0L, Seq("r_value"))
    val p = plan(df)
    assertNoLoops(p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p.take(1200))
  }

  test("funnel windows chain over ONE partitioning: a single hash " +
      "shuffle feeds all three conditional-min windows and the final agg") {
    val noSort = graft.queries.CoreQueries.queries("q_funnel")(
      spark, "/root/testdata/sf0.001")
    // strip the presentation orderBy's range exchange from the count
    val p = plan(noSort)
    assertNoLoops(p)
    assert(hashShuffles(p) == 1, p.take(1600))
  }

  test("document chunking is narrow: no shuffle before the " +
      "presentation sort") {
    val df = graft.queries.PipelineQueries.queries("q_doc_chunk")(
      spark, "/root/testdata/sf0.001")
    val p = plan(df)
    assertNoLoops(p)
    assert(hashShuffles(p) == 0, p.take(1200))
  }

  test("per-source quota cap shuffles once (the row_number window)") {
    val df = graft.queries.PipelineQueries.queries("q_domain_cap")(
      spark, "/root/testdata/sf0.001")
    val p = plan(df)
    assertNoLoops(p)
    assert(hashShuffles(p) == 1, p.take(1200))
  }

  test("skew-safe join spreads a hot key across saltFactor reducers") {
    val spark2 = spark
    import spark2.implicits._
    val fact = (1 to 1000).map(i => ("hot", i.toLong)) :+ (("cold", 0L))
    val dim = Seq(("hot", "H"), ("cold", "C"))
    val l = fact.toDF("k", "uid")
    val r = dim.toDF("rk", "tag")
    val joined = Relational.skewSafeJoin(l, r, "k", "rk", "uid", 8)
    val p = plan(joined)
    assertNoLoops(p)
    // correctness: equals the plain join
    val expect = l.join(r, l("k") === r("rk")).count()
    assert(joined.count() == expect)
  }

  test("split assignment is a pure narrow projection: zero shuffles, " +
      "whole-stage codegen") {
    val df = Sampling.splitAssign(docs, col("doc_id"),
      Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
    val p = plan(df)
    assert(hashShuffles(p) == 0, p.take(1200))
    assertNoLoops(p)
    // `*(n)` marks whole-stage-codegen'd operators in the plan string
    assert(p.contains("*(1) Project"), p.take(1200))
  }

  test("IVF assign + rerank stay vectorized: no typed-object ser/de " +
      "boundary, rerank projection inside whole-stage codegen") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = Similarity.ivfTopK(emb, "vec_id", "embedding",
      numCentroids = 8, nprobe = 3, k = 5, queryMaxId = 10)
    df.collect() // finalize AQE so codegen markers print
    val p = plan(df)
    assertNoLoops(p)
    // a typed Dataset.map would plant DeserializeToObject/MapElements/
    // SerializeFromObject nodes and sever codegen around the rerank
    assert(!p.contains("SerializeFromObject") &&
      !p.contains("MapElements"), p.take(1500))
    // the scored projection (rerank) is codegen'd
    assert("\\*\\(\\d+\\) Project".r.findFirstIn(p).isDefined, p.take(1500))
  }

  test("semantic-dedup assignment is a codegen'd projection; only the " +
      "cell-local pairwise loop crosses into objects") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = Similarity.semanticDedup(emb, "vec_id", "embedding",
      numCentroids = 8, tau = 0.99)
    val p = plan(df)
    assertNoLoops(p)
    // exactly ONE object boundary — the flatMapGroups pairwise pass;
    // the argmax cell assignment must NOT add a second one
    assert("MapGroups|FlatMapGroups".r.findAllIn(p).length >= 1)
    assert("SerializeFromObject".r.findAllIn(p).length <= 1, p.take(1500))
  }

  test("char entropy is two keyed aggregations: (doc, char) counts " +
      "then per-doc fold - no joins, bounded shuffles") {
    val counts = docs.filter(length(col("text")) > 0)
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .filter(col("ch") =!= "")
      .groupBy(col("doc_id"), col("ch"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n"))
    val p = plan(counts)
    assert(hashShuffles(p) <= 2, p.take(1200))
    assertNoLoops(p)
    // partial aggregation runs map-side before each exchange
    assert(p.contains("partial"), p.take(1200))
  }

  /** A BroadcastNestedLoopJoin is only tolerable when its build side
    * is a single-row scalar aggregate (the unigram/bigram/tfidf corpus
    * constants); anything else is a scale-killer.
    */
  private def assertOnlyScalarLoops(p: String): Unit = {
    assert(!p.contains("CartesianProduct"), p.take(1200))
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).length
    // each scalar crossJoin builds from a final agg with no grouping
    // keys — the plan shows the empty-key HashAggregate under an
    // Exchange SinglePartition
    if (bnlj > 0)
      assert(p.contains("SinglePartition"), p.take(1600))
  }

  test("tfidf: tf/df keyed aggs + per-doc window; the only loop join " +
      "is the one-row corpus-size broadcast") {
    val df = graft.queries.PipelineQueries.queries("q_tfidf")(
      spark, "/root/testdata/sf0.001")
    val p = plan(df)
    assertOnlyScalarLoops(p)
    assert(p.contains("partial"), p.take(1200))
  }

  test("bigram LM: counts keyed on the bigram and its head word; " +
      "loop joins only for the vocab scalar") {
    val df = graft.queries.PipelineQueries.queries("q_bigram_lm")(
      spark, "/root/testdata/sf0.001")
    val p = plan(df)
    assertOnlyScalarLoops(p)
  }

  test("minhash recall audit: equi-joins only (bands and pair keys)") {
    val df = graft.queries.PipelineQueries.queries("q_minhash_recall")(
      spark, "/root/testdata/sf0.001")
    val p = plan(df)
    assertNoLoops(p)
  }

  test("lang confusion matrix is one map-side-combined groupBy") {
    val df = graft.queries.PipelineQueries.queries("q_lang_confusion")(
      spark, "/root/testdata/sf0.001")
    val p = plan(df)
    assertNoLoops(p)
    assert(hashShuffles(p) <= 1, p.take(1200))
    assert(p.contains("partial"), p.take(1200))
  }

  test("type-token ratio is a pure narrow projection: the distinct " +
      "set never leaves its row, zero hash shuffles") {
    val df = graft.queries.PipelineQueries.queries("q_ttr")(
      spark, "/root/testdata/sf0.001")
    val p = plan(df)
    assertNoLoops(p)
    assert(hashShuffles(p) == 0, p.take(1200))
  }

  test("gopher rules: (doc, token) histogram then per-doc fold — two " +
      "keyed aggs, map-side combined, no joins") {
    val df = graft.queries.PipelineQueries.queries("q_gopher_rules")(
      spark, "/root/testdata/sf0.001")
    val p = plan(df)
    assertNoLoops(p)
    assert(hashShuffles(p) <= 2, p.take(1200))
    assert(p.contains("partial"), p.take(1200))
  }

  test("temperature mixture: one per-source agg; the only loop join " +
      "is the one-row normalizer broadcast") {
    val df = graft.queries.PipelineQueries.queries("q_mix_temperature")(
      spark, "/root/testdata/sf0.001")
    val p = plan(df)
    assertOnlyScalarLoops(p)
    assert(hashShuffles(p) <= 2, p.take(1200))
    assert(p.contains("partial"), p.take(1200))
  }

  test("SQ8 ANN: quantizer stats are one keyed agg + scalar broadcast; " +
      "candidates never shuffle their vectors, rank is one window") {
    val df = graft.queries.PipelineQueries.queries("q_knn_sq8")(
      spark, "/root/testdata/sf0.001")
    val p = plan(df)
    // the query-side broadcast join is intentionally a small-side NLJ
    // (same shape as bruteTopK); the corpus side must never cartesian
    assert(!p.contains("CartesianProduct"), p.take(1600))
    assert(hashShuffles(p) <= 3, p.take(1600))
  }

  test("cluster topics: centroid assignment broadcasts the 16-row " +
      "side; (cell, term) agg map-side combined; no cartesian") {
    val df = graft.queries.PipelineQueries.queries("q_cluster_topics")(
      spark, "/root/testdata/sf0.001")
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), p.take(1600))
    assert(p.contains("partial"), p.take(1600))
  }
}
