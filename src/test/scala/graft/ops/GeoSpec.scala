package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.GeoExprs._

/** WKB codec + spatial predicate surface (GeoWkb/GeoExprs): byte-level
  * vectors against hand-encoded WKB, ray-cast geometry on crafted
  * polygons (concave, holes, multi), total decode on garbage, and the
  * Catalyst surface (codegen span, SQL registration, 3VL nulls).
  */
class GeoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hex(b: Array[Byte]): String =
    b.map(x => f"$x%02x").mkString

  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // -------------------------------------------------------- codec bytes

  test("point encodes to the canonical little-endian WKB bytes") {
    // POINT(1 2): byteOrder=01, type=01000000, x=1.0, y=2.0 —
    // the standard textbook WKB example
    assert(hex(GeoWkb.encodePoint(1.0, 2.0)) ==
      "0101000000000000000000f03f0000000000000040")
  }

  test("big-endian (XDR) points decode identically") {
    // same POINT(1 2) in big-endian
    val xdr = unhex("00000000013ff00000000000004000000000000000")
    assert(GeoWkb.stX(xdr) == 1.0)
    assert(GeoWkb.stY(xdr) == 2.0)
    assert(GeoWkb.geomType(xdr) == "POINT")
  }

  test("round trip: every encoder output decodes to itself") {
    val p = GeoWkb.encodePoint(-123.25, 45.5)
    assert(GeoWkb.stX(p) == -123.25 && GeoWkb.stY(p) == 45.5)
    val ls = GeoWkb.encodeLineString(Array(0, 0, 1, 1, 2, 0.5))
    assert(GeoWkb.geomType(ls) == "LINESTRING")
    assert(GeoWkb.numPoints(ls) == 3)
    assert(GeoWkb.envelope(ls).toSeq == Seq(0.0, 0.0, 2.0, 1.0))
    val poly = GeoWkb.encodePolygon(Array(
      Array[Double](0, 0, 4, 0, 4, 4, 0, 4, 0, 0),
      Array[Double](1, 1, 2, 1, 2, 2, 1, 2, 1, 1)))
    assert(GeoWkb.geomType(poly) == "POLYGON")
    assert(GeoWkb.numPoints(poly) == 10)
    assert(GeoWkb.envelope(poly).toSeq == Seq(0.0, 0.0, 4.0, 4.0))
  }

  test("decode is total: garbage, truncation, Z/M and EWKB flags -> null") {
    assert(GeoWkb.stX(null) == null)
    assert(GeoWkb.stX(Array[Byte]()) == null)
    assert(GeoWkb.stX(Array[Byte](9, 9, 9)) == null)
    assert(GeoWkb.geomType("garbage!".getBytes) == null)
    // truncated point (x only)
    assert(GeoWkb.stX(unhex("0101000000000000000000f03f")) == null)
    // ISO wkbPointZ (1001) and EWKB z-flagged point must be rejected
    assert(GeoWkb.geomType(unhex("01e903000000000000")) == null)
    assert(GeoWkb.geomType(unhex("010100008000000000")) == null)
    // corrupt interior count can't crash or loop
    assert(GeoWkb.numPoints(unhex("0102000000ffffff7f")) == null)
    assert(GeoWkb.asText(unhex("0103000000ffffff7f")) == null)
  }

  test("WKT rendering for display") {
    assert(GeoWkb.asText(GeoWkb.encodePoint(1.0, 2.5)) == "POINT (1 2.5)")
    assert(GeoWkb.asText(GeoWkb.encodeLineString(Array(0, 0, 1, 1))) ==
      "LINESTRING (0 0, 1 1)")
    assert(GeoWkb.asText(GeoWkb.encodePolygon(Array(
      Array[Double](0, 0, 1, 0, 1, 1, 0, 0)))) ==
      "POLYGON ((0 0, 1 0, 1 1, 0 0))")
  }

  // -------------------------------------------------------- geometry

  private val square = GeoWkb.encodePolygon(Array(
    Array[Double](0, 0, 10, 0, 10, 10, 0, 10, 0, 0)))
  private val withHole = GeoWkb.encodePolygon(Array(
    Array[Double](0, 0, 10, 0, 10, 10, 0, 10, 0, 0),
    Array[Double](4, 4, 6, 4, 6, 6, 4, 6, 4, 4)))
  // concave "C" shape: a 10x10 square with a bite from the right
  private val concave = GeoWkb.encodePolygon(Array(
    Array[Double](0, 0, 10, 0, 10, 3, 4, 3, 4, 7, 10, 7, 10, 10, 0, 10, 0, 0)))

  private def pt(x: Double, y: Double) = GeoWkb.encodePoint(x, y)

  test("ray cast: square, hole, concave, multipolygon") {
    assert(GeoWkb.containsPoint(square, pt(5, 5)) == true)
    assert(GeoWkb.containsPoint(square, pt(-1, 5)) == false)
    assert(GeoWkb.containsPoint(square, pt(11, 5)) == false)
    // hole: inside outer but inside the hole -> outside
    assert(GeoWkb.containsPoint(withHole, pt(5, 5)) == false)
    assert(GeoWkb.containsPoint(withHole, pt(2, 2)) == true)
    // concave bite: (7,5) sits in the bite (outside), (2,5) inside
    assert(GeoWkb.containsPoint(concave, pt(7, 5)) == false)
    assert(GeoWkb.containsPoint(concave, pt(2, 5)) == true)
    // ray through the bite still counts crossings correctly
    assert(GeoWkb.containsPoint(concave, pt(2, 3.5)) == true)
    // multipolygon: two disjoint squares
    val mp = {
      val a = GeoWkb.encodePolygon(Array(
        Array[Double](0, 0, 2, 0, 2, 2, 0, 2, 0, 0)))
      val b = GeoWkb.encodePolygon(Array(
        Array[Double](5, 5, 7, 5, 7, 7, 5, 7, 5, 5)))
      val buf = java.nio.ByteBuffer.allocate(9 + a.length + b.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put(1.toByte).putInt(GeoWkb.MULTIPOLYGON).putInt(2).put(a).put(b)
      buf.array()
    }
    assert(GeoWkb.containsPoint(mp, pt(1, 1)) == true)
    assert(GeoWkb.containsPoint(mp, pt(6, 6)) == true)
    assert(GeoWkb.containsPoint(mp, pt(3.5, 3.5)) == false)
    // non-polygon left side -> null, not false
    assert(GeoWkb.containsPoint(pt(0, 0), pt(0, 0)) == null)
  }

  test("envelope intersection: closed intervals, touching counts") {
    val a = GeoWkb.encodeLineString(Array(0, 0, 2, 2))
    val b = GeoWkb.encodeLineString(Array(2, 2, 4, 4)) // touches at (2,2)
    val c = GeoWkb.encodeLineString(Array(3, 0, 4, 1))
    assert(GeoWkb.envelopesIntersect(a, b) == true)
    assert(GeoWkb.envelopesIntersect(a, c) == false)
    assert(GeoWkb.envelopesIntersect(a, Array[Byte](1, 2)) == null)
  }

  test("distances: planar exact, haversine on known geodesics") {
    assert(GeoWkb.distance(pt(0, 0), pt(3, 4)) == 5.0)
    // one degree of latitude along a meridian ≈ 111.195 km on the sphere
    val oneDegLat = GeoWkb.distanceSphere(pt(0, 0), pt(0, 1))
    assert(math.abs(oneDegLat - 111195.0) < 10.0, s"got $oneDegLat")
    // quarter circumference: (0,0) to (90,0)
    val quarter = GeoWkb.distanceSphere(pt(0, 0), pt(90, 0))
    assert(math.abs(quarter - math.Pi / 2 * GeoWkb.EARTH_RADIUS_M) < 1e-6)
    // non-points -> null
    assert(GeoWkb.distance(square, pt(0, 0)) == null)
  }

  // -------------------------------------------------------- Catalyst

  test("expressions evaluate through the Column API with 3VL nulls") {
    val df = Seq(
      (1L, Some(1.0), Some(2.0)),
      (2L, None, Some(3.0))).toDF("id", "x", "y")
      .withColumn("g", st_point(col("x"), col("y")))
    val rows = df.select(col("id"), st_x(col("g")).as("gx"),
        st_contains(lit(square), col("g")).as("c"))
      .orderBy(col("id")).collect()
    assert(rows(0).getDouble(1) == 1.0 && rows(0).getBoolean(2))
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2)) // null in -> null out
    // malformed wkb -> null result, and a filter drops the row (3VL)
    val bad = Seq((1L, Array[Byte](1, 2, 3))).toDF("id", "g")
    assert(bad.select(st_x(col("g"))).collect()(0).isNullAt(0))
    assert(bad.filter(st_contains(lit(square), col("g"))).count() == 0)
  }

  test("geo predicates stay inside WholeStageCodegen") {
    // spark.range (not a local Seq) so constant folding can't collapse
    // the plan before the codegen stage materializes
    val df = spark.range(10)
      .select(((col("id") % 12).cast("double") + 0.5).as("x"),
        ((col("id") % 7).cast("double") + 0.5).as("y"))
      .filter(st_contains(lit(square), st_point(col("x"), col("y"))))
    val wsc = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wsc.nonEmpty, df.queryExecution.executedPlan.toString.take(800))
    // the filter runs INSIDE the codegen stage (the `*(n)` span), not
    // as a separate interpreted node above it
    assert(wsc.exists(_.toString.contains("st_contains")),
      df.queryExecution.executedPlan.toString.take(800))
    assert(df.count() == 10) // all +0.5-offset points strictly inside
  }

  test("SQL registration: st_* callable from spark.sql") {
    val n = spark.sql(
      """SELECT st_astext(st_point(1.0D, 2.0D)) AS wkt,
        |  st_x(st_point(1.0D, 2.0D)) AS x,
        |  st_distance(st_point(0.0D, 0.0D), st_point(3.0D, 4.0D)) AS d
        |""".stripMargin).collect()(0)
    assert(n.getString(0) == "POINT (1 2)")
    assert(n.getDouble(1) == 1.0)
    assert(n.getDouble(2) == 5.0)
    // arity misuse fails loudly, not wrongly
    intercept[Exception] { spark.sql("SELECT st_x(1, 2)").collect() }
  }

  test("semanticDedup: duplicates only within cells, against lower ids") {
    val out = Similarity.semanticDedup(
      spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet"),
      "vec_id", "embedding", numCentroids = 16, tau = 0.35).cache()
    val rows = out.collect()
    assert(rows.nonEmpty)
    val byId = rows.map(r => r.getLong(0) ->
      (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getInt(3))).toMap
    // flags consistent; dup_of is an earlier member of the same cell
    byId.foreach { case (id, (cell, dupOf, isDup)) =>
      assert((isDup == 1) == dupOf.isDefined)
      dupOf.foreach { d =>
        assert(d < id)
        assert(byId(d)._1 == cell, s"dup_of $d of $id crosses cells")
      }
    }
    // sanity: the corpus has some semantic dups at 0.35 but not all
    val nDup = byId.values.count(_._3 == 1)
    assert(nDup > 0 && nDup < rows.length)
    out.unpersist()
  }
}
