package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Edge-case semantics of the curation query rows added with the
  * chunking/quota/percentile batch — boundary geometry the sf0.01
  * oracle corpus doesn't necessarily exercise.
  */
class CurationOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Run a PipelineQueries row against a synthetic documents table. */
  private def onDocs(name: String, rows: Seq[(Long, String)]) = {
    val dir = TestSpark.tmpDir("cur")
    rows.toDF("doc_id", "text")
      .withColumn("n_chars", length($"text").cast("long"))
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("src0"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    graft.queries.PipelineQueries.queries(name)(spark, dir)
  }

  test("chunking boundary geometry: 400-char windows, 300 stride") {
    // lengths straddling every boundary case of
    // n_chunks = (len-1) div 300 + 1
    val docs = Seq(
      1L -> "a",          // len 1   -> 1 chunk, len 1
      2L -> ("b" * 300),  // len 300 -> 1 chunk, len 300
      3L -> ("c" * 301),  // len 301 -> 2 chunks, lens 301, 1
      4L -> ("d" * 400),  // len 400 -> 2 chunks, lens 400, 100
      5L -> ("e" * 600),  // len 600 -> 2 chunks, lens 400, 300
      6L -> ("f" * 601),  // len 601 -> 3 chunks, lens 400, 301, 1
      7L -> ("g" * 1000)) // len 1000 -> 4 chunks, 400/400/400/100
    val out = onDocs("q_doc_chunk", docs)
      .select($"doc_id", $"chunk_idx", $"chunk_len")
      .as[(Long, Long, Long)].collect().toSeq
    val byDoc = out.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3)).toMap
    assert(byDoc(1L) == Seq(1L))
    assert(byDoc(2L) == Seq(300L))
    assert(byDoc(3L) == Seq(301L, 1L))
    assert(byDoc(4L) == Seq(400L, 100L))
    assert(byDoc(5L) == Seq(400L, 300L))
    assert(byDoc(6L) == Seq(400L, 301L, 1L))
    assert(byDoc(7L) == Seq(400L, 400L, 400L, 100L))
    // adjacent chunks overlap by exactly 100 chars: every character
    // position is covered, chunk i starts at i*300
    assert(out.forall { case (_, idx, len) => len <= 400 && idx >= 0 })
  }

  test("quota cap keeps every row of a source smaller than the cap") {
    val docs = (1L to 7L).map(i => i -> s"doc $i")
    val out = onDocs("q_domain_cap", docs)
    assert(out.count() == 7) // 7 docs < cap of 20: all kept
    // ranks are 1..7 with no gaps
    assert(out.select("rn").as[Long].collect().sorted.toSeq ==
      (1L to 7L))
  }

  test("percentile agg ignores NULLs and interpolates linearly " +
      "(the quantile_cont contract the oracle compares against)") {
    val df = Seq[(String, Option[Double])](
      ("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("a", Some(4.0)), ("a", None),
      ("b", Some(10.0))).toDF("k", "v")
    val got = df.groupBy($"k")
      .agg(expr("percentile(v, 0.5)").as("p50"),
        expr("percentile(v, 0.75)").as("p75"))
      .orderBy($"k")
      .as[(String, Double, Double)].collect().toSeq
    // 4 non-null values 1..4: p50 = 2.5, p75 = 1 + 0.75*3 = 3.25
    assert(got == Seq(("a", 2.5, 3.25), ("b", 10.0, 10.0)))
  }
}
