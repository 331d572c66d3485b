package graft.delta

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import MergeClause._

/** MERGE INTO semantics: clause ordering, matched update/delete,
  * not-matched insert, ambiguity detection, CDF images, identity
  * generation on inserted rows (Delta MERGE contract over the
  * kernel's file-granular remove+add rewrite).
  */
class MergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(dir: String,
      cdf: Boolean = false): DeltaTable = {
    val schema = Seq((1L, "a", 0.0)).toDF("k", "s", "v").schema
    DeltaTable.create(spark, dir, schema,
      configuration =
        if (cdf) Map(TableChanges.CDF_ENABLED_KEY -> "true")
        else Map.empty)
    DeltaTable.forPath(spark, dir)
  }

  private def rows(t: DeltaTable): Set[(Long, String, Double)] =
    t.toDF.as[(Long, String, Double)].collect().toSet

  test("upsert: matched update + not matched insert") {
    val t = freshTable(TestSpark.tmpDir("mrg_upsert"))
    t.append(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("k", "s", "v"))
    val src = Seq((2L, "B", 20.0), (4L, "D", 40.0)).toDF("k", "s", "v")
    t.merge(src, "t.k = s.k", Seq(
      MatchedUpdate(None, Map("s" -> "s.s", "v" -> "s.v + t.v")),
      NotMatchedInsert(None,
        Map("k" -> "s.k", "s" -> "s.s", "v" -> "s.v"))))
    assert(rows(t) == Set((1L, "a", 1.0), (2L, "B", 22.0),
      (3L, "c", 3.0), (4L, "D", 40.0)))
  }

  test("schemaEvolution=true: assigned source-only column is added " +
      "nullable and untouched rows read NULL") {
    val t = freshTable(TestSpark.tmpDir("mrg_evolve"))
    t.append(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("k", "s", "v"))
    val src = Seq((2L, "B", 20.0, 7), (4L, "D", 40.0, 9))
      .toDF("k", "s", "v", "n")
    t.merge(src, "t.k = s.k", Seq(
      MatchedUpdate(None, Map("v" -> "s.v", "n" -> "s.n")),
      NotMatchedInsert(None, Map(
        "k" -> "s.k", "s" -> "s.s", "v" -> "s.v", "n" -> "s.n"))),
      schemaEvolution = true)
    // new column exists, typed from the source, nullable
    val f = t.snapshot().schema("n")
    assert(f.dataType == org.apache.spark.sql.types.IntegerType
      && f.nullable)
    val got = t.toDF.select($"k", $"s", $"v", $"n")
      .as[(Long, String, Double, Option[Int])].collect().toSet
    assert(got == Set(
      (1L, "a", 1.0, None), (2L, "b", 20.0, Some(7)),
      (3L, "c", 3.0, None), (4L, "D", 40.0, Some(9))))
    // without the flag the same merge still refuses the unknown column
    val e = intercept[IllegalArgumentException] {
      t.merge(src, "t.k = s.k",
        Seq(MatchedUpdate(None, Map("n2" -> "s.n"))))
    }
    assert(e.getMessage.contains("no such column"))
    // and with the flag, a column in neither table nor source is an error
    val e2 = intercept[IllegalArgumentException] {
      t.merge(src, "t.k = s.k",
        Seq(MatchedUpdate(None, Map("n2" -> "s.n"))),
        schemaEvolution = true)
    }
    assert(e2.getMessage.contains("neither"))
  }

  test("clause order: first matching clause wins") {
    val t = freshTable(TestSpark.tmpDir("mrg_order"))
    t.append(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("k", "s", "v"))
    val src = Seq((1L, "x", 0.0), (2L, "x", 0.0), (3L, "x", 0.0))
      .toDF("k", "s", "v")
    t.merge(src, "t.k = s.k", Seq(
      MatchedDelete(Some("t.k = 1")),
      MatchedUpdate(Some("t.k <= 2"), Map("s" -> "'hit2'")),
      MatchedUpdate(None, Map("s" -> "'hit3'"))))
    assert(rows(t) == Set((2L, "hit2", 2.0), (3L, "hit3", 3.0)))
  }

  test("unconditioned keep: matched rows with no applying clause survive") {
    val t = freshTable(TestSpark.tmpDir("mrg_keep"))
    t.append(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "s", "v"))
    val src = Seq((1L, "x", 0.0), (2L, "x", 0.0)).toDF("k", "s", "v")
    t.merge(src, "t.k = s.k", Seq(
      MatchedUpdate(Some("t.v > 1.5"), Map("s" -> "'upd'"))))
    assert(rows(t) == Set((1L, "a", 1.0), (2L, "upd", 2.0)))
  }

  test("insert-only merge never rewrites existing files") {
    val t = freshTable(TestSpark.tmpDir("mrg_insonly"))
    t.append(Seq((1L, "a", 1.0)).toDF("k", "s", "v"))
    val addsBefore = new DeltaScan(t.snapshot(), None).collectAddFiles()
      .map(_.path).toSet
    val src = Seq((1L, "dup", 0.0), (9L, "new", 9.0)).toDF("k", "s", "v")
    t.merge(src, "t.k = s.k", Seq(
      NotMatchedInsert(None,
        Map("k" -> "s.k", "s" -> "s.s", "v" -> "s.v"))))
    assert(rows(t) == Set((1L, "a", 1.0), (9L, "new", 9.0)))
    val addsAfter = new DeltaScan(t.snapshot(), None).collectAddFiles()
      .map(_.path).toSet
    assert(addsBefore.subsetOf(addsAfter), "insert-only merge rewrote files")
  }

  test("ambiguous multi-match raises") {
    val t = freshTable(TestSpark.tmpDir("mrg_amb"))
    t.append(Seq((1L, "a", 1.0)).toDF("k", "s", "v"))
    val src = Seq((1L, "x", 0.0), (1L, "y", 0.0)).toDF("k", "s", "v")
    val e = intercept[IllegalArgumentException] {
      t.merge(src, "t.k = s.k", Seq(
        MatchedUpdate(None, Map("s" -> "s.s"))))
    }
    assert(e.getMessage.contains("multiple"))
  }

  test("CDF images: update pre/post, delete, insert") {
    val dir = TestSpark.tmpDir("mrg_cdf")
    val t = freshTable(dir, cdf = true)
    t.append(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("k", "s", "v"))                                       // v1
    val src = Seq((1L, "A", 10.0), (2L, "-", 0.0), (5L, "E", 50.0))
      .toDF("k", "s", "v")
    val v = t.merge(src, "t.k = s.k", Seq(
      MatchedDelete(Some("s.s = '-'")),
      MatchedUpdate(None, Map("s" -> "s.s", "v" -> "s.v")),
      NotMatchedInsert(None,
        Map("k" -> "s.k", "s" -> "s.s", "v" -> "s.v"))))          // v2
    val feed = TableChanges.read(spark, dir, v, Some(v))
      .select($"k", $"s", $"v", $"_change_type")
      .as[(Long, String, Double, String)].collect().toSet
    assert(feed == Set(
      (1L, "a", 1.0, "update_preimage"),
      (1L, "A", 10.0, "update_postimage"),
      (2L, "b", 2.0, "delete"),
      (5L, "E", 50.0, "insert")))
    assert(rows(t) == Set((1L, "A", 10.0), (3L, "c", 3.0),
      (5L, "E", 50.0)))
  }

  test("identity column generates on merge inserts and advances the mark") {
    val dir = TestSpark.tmpDir("mrg_ident")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = false,
        metadata = new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("delta.identity.start", 1L)
          .putLong("delta.identity.step", 1L)
          .putBoolean("delta.identity.allowExplicitInsert", false)
          .build()),
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.StringType)))
    DeltaTable.create(spark, dir, schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(Seq((10L, "a"), (20L, "b")).toDF("k", "s"))
    val src = Seq((20L, "B"), (30L, "C")).toDF("k", "s")
    t.merge(src, "t.k = s.k", Seq(
      MatchedUpdate(None, Map("s" -> "s.s")),
      NotMatchedInsert(None, Map("k" -> "s.k", "s" -> "s.s"))))
    val got = t.toDF.as[(Long, Long, String)].collect().toSeq
    assert(got.map(_._1).distinct.size == 3, "identity ids must be unique")
    assert(got.map(r => (r._2, r._3)).toSet ==
      Set((10L, "a"), (20L, "B"), (30L, "C")))
    // a further append must not reuse ids (mark advanced)
    t.append(Seq((40L, "d")).toDF("k", "s"))
    val ids = t.toDF.as[(Long, Long, String)].collect().map(_._1)
    assert(ids.distinct.length == ids.length)
  }

  test("not matched by source: update + delete with conditions") {
    val t = freshTable(TestSpark.tmpDir("mrg_bys"))
    t.append(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0),
      (4L, "d", 4.0)).toDF("k", "s", "v"))
    val src = Seq((1L, "A", 10.0)).toDF("k", "s", "v")
    // k=1 matched->update; k=2 unmatched v<=2.5 -> stale-mark;
    // k=3,4 unmatched v>2.5 -> deleted
    t.merge(src, "t.k = s.k", Seq(
      MatchedUpdate(None, Map("s" -> "s.s", "v" -> "s.v")),
      NotMatchedBySourceDelete(Some("t.v > 2.5")),
      NotMatchedBySourceUpdate(None, Map("s" -> "'stale'"))))
    assert(rows(t) == Set((1L, "A", 10.0), (2L, "stale", 2.0)))
  }

  test("by source sync: full mirror of the source via all three groups") {
    val dir = TestSpark.tmpDir("mrg_sync")
    val t = freshTable(dir, cdf = true)
    t.append(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "s", "v"))
    val src = Seq((2L, "B", 20.0), (3L, "C", 30.0)).toDF("k", "s", "v")
    val v = t.merge(src, "t.k = s.k", Seq(
      MatchedUpdate(None, Map("s" -> "s.s", "v" -> "s.v")),
      NotMatchedInsert(None,
        Map("k" -> "s.k", "s" -> "s.s", "v" -> "s.v")),
      NotMatchedBySourceDelete(None)))
    assert(rows(t) == Set((2L, "B", 20.0), (3L, "C", 30.0)))
    val feed = TableChanges.read(spark, dir, v, Some(v))
      .select($"k", $"_change_type")
      .as[(Long, String)].collect().toSet
    assert(feed == Set((1L, "delete"), (2L, "update_preimage"),
      (2L, "update_postimage"), (3L, "insert")))
  }

  test("partitioned table: merge moves rows across partitions") {
    val dir = TestSpark.tmpDir("mrg_part")
    val df = Seq((1L, "p1", 1.0), (2L, "p1", 2.0), (3L, "p2", 3.0))
      .toDF("k", "p", "v")
    DeltaTable.create(spark, dir, df.schema, Seq("p"))
    val t = DeltaTable.forPath(spark, dir)
    t.append(df)
    val src = Seq((2L, "p2", 20.0)).toDF("k", "p", "v")
    t.merge(src, "t.k = s.k", Seq(
      MatchedUpdate(None, Map("p" -> "s.p", "v" -> "s.v"))))
    assert(t.toDF.as[(Long, String, Double)].collect().toSet ==
      Set((1L, "p1", 1.0), (2L, "p2", 20.0), (3L, "p2", 3.0)))
    // partition pruning still serves the moved row from its new dir
    assert(t.scan(Some("p = 'p2'")).toDF
      .as[(Long, String, Double)].collect().toSet ==
      Set((2L, "p2", 20.0), (3L, "p2", 3.0)))
  }
}
