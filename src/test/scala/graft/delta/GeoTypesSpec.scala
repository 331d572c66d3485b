package graft.delta

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Geospatial columns (reference kernel/src/schema/mod.rs:1867-1935,
  * table_features/geospatial.rs): parameterized primitive spellings in
  * schemaString, WKB-as-binary physical layout, and the dual-sided
  * `geospatial` feature gate.
  */
class GeoTypesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("schemaString round-trip preserves the exact geo spellings") {
    val s = """{"type":"struct","fields":[
      {"name":"id","type":"long","nullable":true,"metadata":{}},
      {"name":"geom","type":"geometry(EPSG:4326)","nullable":true,"metadata":{}},
      {"name":"geog","type":"geography(OGC:CRS84, vincenty)","nullable":true,"metadata":{}}]}"""
    val st = GeoTypes.parseSchemaString(s)
    assert(st("geom").dataType == BinaryType)
    assert(st("geog").dataType == BinaryType)
    assert(st("geom").metadata.getString(GeoTypes.GEO_KEY) ==
      "geometry(EPSG:4326)")
    val back = GeoTypes.toSchemaString(st)
    assert(back.contains("\"geometry(EPSG:4326)\""), back)
    assert(back.contains("\"geography(OGC:CRS84, vincenty)\""), back)
    assert(!back.contains(GeoTypes.GEO_KEY), back)
  }

  test("create + WKB round trip; feature lands in BOTH feature lists") {
    val dir = TestSpark.tmpDir("geo")
    val schema = StructType(Seq(
      StructField("id", LongType),
      GeoTypes.geoField("g", "geometry(EPSG:4326)")))
    DeltaTable.create(spark, dir, schema)
    val t = DeltaTable.forPath(spark, dir)
    val p = t.snapshot().protocol
    assert(p.readerFeatures.get.contains(GeoTypes.FEATURE))
    assert(p.writerFeatures.get.contains(GeoTypes.FEATURE))
    assert(t.snapshot().metadata.schemaString
      .contains("\"geometry(EPSG:4326)\""))

    val wkb: Array[Byte] =
      Array(0x01, 0x01, 0x00, 0x00, 0x00).map(_.toByte)
    t.append(Seq((1L, wkb), (2L, null)).toDF("id", "g"))
    val rows = t.toDF.orderBy("id").collect()
    assert(rows(0).getAs[Array[Byte]]("g").toSeq == wkb.toSeq)
    assert(rows(1).isNullAt(1))
    // the logical schema still carries the geo annotation after replay
    assert(t.snapshot().schema("g").metadata.getString(GeoTypes.GEO_KEY) ==
      "geometry(EPSG:4326)")
  }

  test("schema evolution introducing a geo column upgrades the " +
      "protocol in the same commit — table stays readable") {
    val dir = TestSpark.tmpDir("geo-evolve")
    val base = Seq((1L, "a")).toDF("id", "s")
    DeltaTable.create(spark, dir, base.schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(base)
    assert(!t.snapshot().protocol.readerFeatures
      .exists(_.contains(GeoTypes.FEATURE)))
    // evolution (the mergeSchema-append path routes through alterSchema)
    t.alterSchema(StructType(t.snapshot().schema.fields :+
      GeoTypes.geoField("g", "geometry(EPSG:4326)")))
    // without the protocol upgrade every subsequent snapshot load would
    // throw geo-feature validation — the table would be bricked
    val snap = Snapshot.forTable(spark, dir)
    assert(snap.protocol.readerFeatures.get.contains(GeoTypes.FEATURE))
    assert(snap.protocol.writerFeatures.get.contains(GeoTypes.FEATURE))
    assert(snap.schema("g").metadata.getString(GeoTypes.GEO_KEY) ==
      "geometry(EPSG:4326)")
    assert(t.toDF.count() == 1) // old rows read NULL under the new column
  }

  test("a geo table without the feature declared fails loudly") {
    val dir = TestSpark.tmpDir("geo-nofeat")
    val log = Paths.get(dir, "_delta_log")
    Files.createDirectories(log)
    val geoSchema = """{\"type\":\"struct\",\"fields\":[{\"name\":\"g\",""" +
      """\"type\":\"geometry(EPSG:4326)\",\"nullable\":true,\"metadata\":{}}]}"""
    val lines = Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":[],"writerFeatures":[]}}""",
      s"""{"metaData":{"id":"t","format":{"provider":"parquet",""" +
        s""""options":{}},"schemaString":"$geoSchema",""" +
        """"partitionColumns":[],"configuration":{},"createdTime":1}}""")
    Files.write(log.resolve("00000000000000000000.json"),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    val e = intercept[IllegalArgumentException] {
      Snapshot.forTable(spark, dir)
    }
    assert(e.getMessage.contains("geospatial"), e.getMessage)
  }

  test("invalid CRS and unknown algorithms are rejected") {
    intercept[IllegalArgumentException] {
      GeoTypes.geoField("g", "geometry(EPSG4326)")
    }
    intercept[IllegalArgumentException] {
      GeoTypes.geoField("g", "geometry( EPSG:4326)")
    }
    intercept[IllegalArgumentException] {
      GeoTypes.geoField("g", "geography(EPSG:4326, cubic)")
    }
    intercept[IllegalArgumentException] {
      GeoTypes.geoField("g", "geography(EPSG:4326)")
    }
    GeoTypes.geoField("g", "geography(EPSG:4326, karney)") // fine
  }

  test("geo inside array/map element slots is rejected, not corrupted") {
    val s = """{"type":"struct","fields":[
      {"name":"gs","type":{"type":"array",
        "elementType":"geometry(EPSG:4326)","containsNull":true},
       "nullable":true,"metadata":{}}]}"""
    val e = intercept[IllegalArgumentException] {
      GeoTypes.parseSchemaString(s)
    }
    assert(e.getMessage.contains("not supported"), e.getMessage)
  }

  private def geoSchema = StructType(Seq(
    StructField("id", LongType),
    GeoTypes.geoField("g", "geometry(EPSG:4326)")))

  private def wkbPoint(i: Int): Array[Byte] =
    Array(0x01, 0x01, 0x00, 0x00, 0x00, i).map(_.toByte)

  private def addStats(t: DeltaTable, v: Long)
      : Seq[com.fasterxml.jackson.databind.JsonNode] = {
    val fs = Storage.fs(t.root, spark.sessionState.newHadoopConf())
    Storage.readLines(fs, FileNames.commitFile(FileNames.logDir(t.root), v))
      .filter(_.nonEmpty).map(JsonLog.parseLine)
      .flatMap(n => Option(n.get("add")).filterNot(_.isNull))
      .map(a => JsonLog.parseLine(a.get("stats").asText))
  }

  test("geo columns are excluded from stats: no min/max ever; naming " +
      "one in dataSkippingStatsColumns is rejected") {
    // written stats carry numRecords + nullCount for the geo column
    // but never WKB min/max (no ordering; reference feature-gates the
    // type and collects nothing, kernel/src/schema/mod.rs:2009-2016)
    val dir = TestSpark.tmpDir("geo-stats")
    DeltaTable.create(spark, dir, geoSchema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(Seq((1L, wkbPoint(1)), (2L, null)).toDF("id", "g"))
    addStats(t, 1L).foreach { s =>
      assert(s.get("minValues").has("id") && s.get("maxValues").has("id"), s)
      assert(!s.get("minValues").has("g") && !s.get("maxValues").has("g"), s)
      assert(s.get("nullCount").has("g"), s) // null counting is exact
    }

    // delta.dataSkippingStatsColumns naming the geo column fails loudly
    // at write time, like an unknown column — not a silent no-op
    val dir2 = TestSpark.tmpDir("geo-statscols")
    DeltaTable.create(spark, dir2, geoSchema,
      configuration = Map("delta.dataSkippingStatsColumns" -> "id,g"))
    val t2 = DeltaTable.forPath(spark, dir2)
    val e = intercept[IllegalArgumentException] {
      t2.append(Seq((1L, wkbPoint(1))).toDF("id", "g"))
    }
    assert(e.getMessage.contains("geospatial") &&
      e.getMessage.contains("geometry(EPSG:4326)"), e.getMessage)
    // without the geo column the same property works
    val dir3 = TestSpark.tmpDir("geo-statscols-ok")
    DeltaTable.create(spark, dir3, geoSchema,
      configuration = Map("delta.dataSkippingStatsColumns" -> "id"))
    DeltaTable.forPath(spark, dir3)
      .append(Seq((1L, wkbPoint(1))).toDF("id", "g"))
  }

  test("clustering or partitioning by a geo column is rejected") {
    intercept[IllegalArgumentException] {
      DeltaTable.create(spark, TestSpark.tmpDir("geo-clus"), geoSchema,
        clusterBy = Seq("g"))
    }
    val e = intercept[IllegalArgumentException] {
      DeltaTable.create(spark, TestSpark.tmpDir("geo-part"), geoSchema,
        partitionColumns = Seq("g"))
    }
    assert(e.getMessage.contains("geospatial"), e.getMessage)
  }

  test("overwriteSchema introducing a geo column upgrades the " +
      "protocol in the SAME commit (table stays readable)") {
    val dir = TestSpark.tmpDir("geo-ow")
    val plain = Seq((1L, "a")).toDF("id", "s")
    DeltaTable.create(spark, dir, plain.schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(plain)
    assert(!t.snapshot().protocol.readerFeatures
      .exists(_.contains(GeoTypes.FEATURE)))
    // replacement frame carries a geo-annotated column (as a df read
    // from another geo table would)
    val geoDf = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(5L, wkbPoint(5))),
      geoSchema)
    t.overwrite(geoDf, overwriteSchema = true)
    // the table MUST still load: feature upgraded with the schema
    val snap = DeltaTable.forPath(spark, dir).snapshot()
    assert(snap.protocol.readerFeatures.get.contains(GeoTypes.FEATURE))
    assert(snap.protocol.writerFeatures.get.contains(GeoTypes.FEATURE))
    assert(snap.metadata.schemaString.contains("\"geometry(EPSG:4326)\""))
    val rows = DeltaTable.forPath(spark, dir).toDF.collect()
    assert(rows.length == 1 &&
      rows.head.getAs[Array[Byte]]("g").toSeq == wkbPoint(5).toSeq)
  }

  test("DV deletes and row tracking compose with geo tables") {
    val dir = TestSpark.tmpDir("geo-dv")
    DeltaTable.create(spark, dir, geoSchema,
      configuration = Map(RowTracking.ENABLED_KEY -> "true"))
    val t = DeltaTable.forPath(spark, dir)
    t.append((1 to 10).map(i => (i.toLong, wkbPoint(i))).toDF("id", "g"))
    val idsBefore = t.scan(None).toDFWithRowIds
      .select("id", "_row_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    t.deleteWhereDV("id <= 4")

    // DV masked the rows in-scan; surviving WKB payloads are intact
    val rows = t.toDF.orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == (5L to 10L))
    assert(rows.head.getAs[Array[Byte]]("g").toSeq == wkbPoint(5).toSeq)
    // row ids stayed stable across the DV delete (no rewrite)
    val idsAfter = t.scan(None).toDFWithRowIds
      .select("id", "_row_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(idsAfter == idsBefore.filter(_._1 > 4))
    // the geo spelling survived both commits
    assert(t.snapshot().metadata.schemaString
      .contains("\"geometry(EPSG:4326)\""))
  }
}
