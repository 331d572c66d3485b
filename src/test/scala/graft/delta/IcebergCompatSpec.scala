package graft.delta

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** IcebergCompatV3 + materializePartitionColumns (reference
  * kernel/src/table_features/iceberg_compat/{mod,v3}.rs and
  * table_configuration.rs:510-530, 900-907).
  */
class IcebergCompatSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def v3Config = Map(
    IcebergCompat.V3_KEY -> "true",
    ColumnMapping.MODE_KEY -> "name",
    RowTracking.ENABLED_KEY -> "true")

  test("V3 table: feature declared, partition values materialized in " +
    "data files, reads exact") {
    val dir = TestSpark.tmpDir("icv3")
    val src = spark.range(100).toDF("id")
      .withColumn("grp", (col("id") % 4).cast("int"))
      .withColumn("s", concat(lit("v"), col("id")))
    val t = DeltaTable.create(spark, dir, src.schema, Seq("grp"),
      configuration = v3Config)
    assert(t.snapshot().protocol.writerFeatures.get
      .contains("icebergCompatV3"))
    t.append(src)

    // the staged parquet must CONTAIN the partition column (physical
    // name), not just the dir segment
    val snap = t.snapshot()
    val physGrp = ColumnMapping.physicalName(snap.schema("grp"))
    val fs = Storage.fs(new Path(dir), spark.sessionState.newHadoopConf())
    val dataFile = Storage.listFilesRecursive(fs, new Path(dir))
      .map(_.getPath)
      .find(p => p.getName.endsWith(".parquet") &&
        !p.toString.contains("_delta_log")).get
    val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
      spark.sessionState.newHadoopConf(), dataFile)
    val names = footer.getFileMetaData.getSchema.getFields.toString
    assert(names.contains(physGrp),
      s"expected materialized partition column $physGrp in: $names")

    // adds carry numRecords and partitionValues keyed by the PHYSICAL
    // name (no alias leakage)
    val adds = new DeltaScan(snap, None).collectAddFiles()
    assert(adds.forall(_.stats.exists(_.contains("\"numRecords\""))))
    assert(adds.forall(_.partitionValues.keySet == Set(physGrp)))

    // scan is exact
    val got = DeltaTable.forPath(spark, dir).toDF
      .orderBy(col("id")).collect()
    assert(got.length == 100)
    assert(got.map(_.getAs[Int]("grp")).toSeq ==
      (0L until 100L).map(i => (i % 4).toInt))
    // partition pruning still works through the materialized layout
    assert(DeltaTable.forPath(spark, dir).scan(Some("grp = 2"))
      .toDF.count() == 25)
  }

  test("V3 requires column mapping and row tracking") {
    val schema = StructType(Seq(StructField("id", LongType)))
    intercept[IllegalArgumentException] {
      DeltaTable.create(spark, TestSpark.tmpDir("icv3-nocm"), schema,
        configuration = Map(IcebergCompat.V3_KEY -> "true",
          RowTracking.ENABLED_KEY -> "true"))
    }
    intercept[IllegalArgumentException] {
      DeltaTable.create(spark, TestSpark.tmpDir("icv3-nort"), schema,
        configuration = Map(IcebergCompat.V3_KEY -> "true",
          ColumnMapping.MODE_KEY -> "name"))
    }
  }

  test("V3 type allowlist rejects void columns with a dotted path") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("nested", StructType(Seq(
        StructField("bad", NullType))))))
    val e = intercept[IllegalArgumentException] {
      DeltaTable.create(spark, TestSpark.tmpDir("icv3-void"), schema,
        configuration = v3Config)
    }
    assert(e.getMessage.contains("nested.bad"))
    // the walker descends array elements too
    assert(IcebergCompat.offendingType(StructType(Seq(
      StructField("a", ArrayType(NullType))))).get.startsWith("a.element"))
  }

  test("V3 rejects legacy parquet.field.nested.ids metadata") {
    val md = new MetadataBuilder()
      .putString(IcebergCompat.LEGACY_NESTED_IDS_KEY, "{}").build()
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("arr", ArrayType(IntegerType), nullable = true, md)))
    val e = intercept[IllegalArgumentException] {
      DeltaTable.create(spark, TestSpark.tmpDir("icv3-legacy"), schema,
        configuration = v3Config)
    }
    assert(e.getMessage.contains("arr"))
  }

  test("V3 DML sequence: delete, update, merge, optimize keep the " +
    "materialized layout and exact content") {
    import MergeClause._
    val dir = TestSpark.tmpDir("icv3-dml")
    val src = spark.range(200).toDF("id")
      .withColumn("grp", (col("id") % 4).cast("int"))
      .withColumn("v", (col("id") % 10).cast("double"))
    val t = DeltaTable.create(spark, dir, src.schema, Seq("grp"),
      configuration = v3Config)
    t.append(src)
    t.deleteWhere("grp = 3")                       // drop 50
    t.updateWhere("v < 2.0", Map("v" -> "v + 100.0"))
    t.merge(
      spark.range(190, 210).toDF("id")
        .withColumn("grp", (col("id") % 4).cast("int"))
        .withColumn("v", lit(-1.0)),
      "t.id = s.id",
      Seq(MatchedUpdate(None, Map("v" -> "s.v")),
        NotMatchedInsert(None,
          Map("id" -> "s.id", "grp" -> "s.grp", "v" -> "s.v"))))
    // (OPTIMIZE stays gated here: V3 requires row tracking, and
    // dataChange=false rewrites of row-tracking tables need
    // materialized row ids — same not-yet as the reference's #2538)
    t.checkpoint()

    // model: 0..199 minus grp==3, v updated, then merge over 190..209
    var model = (0L until 200L).map(i => (i, (i % 4).toInt, (i % 10).toDouble))
      .filterNot(_._2 == 3)
      .map { case (i, g, v) => (i, g, if (v < 2.0) v + 100.0 else v) }
    val merged = (190L until 210L).map(i => (i, (i % 4).toInt, -1.0))
    val existing = model.map(_._1).toSet
    model = model.map { case (i, g, v) =>
      if (i >= 190 && i < 210) (i, g, -1.0) else (i, g, v) } ++
      merged.filterNot { case (i, _, _) => existing(i) }
    val got = DeltaTable.forPath(spark, dir).toDF
      .select(col("id"), col("grp"), col("v"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(got == model.sortBy(_._1),
      s"got ${got.take(8)} vs ${model.sortBy(_._1).take(8)}")

    // every live data file still materializes the partition column
    val snap = DeltaTable.forPath(spark, dir).snapshot()
    val physGrp = ColumnMapping.physicalName(snap.schema("grp"))
    val fs = Storage.fs(new Path(dir), spark.sessionState.newHadoopConf())
    val adds = new DeltaScan(snap, None).collectAddFiles()
    adds.foreach { a =>
      val p = new Path(dir, Storage.decodeUriPath(a.path))
      val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
        spark.sessionState.newHadoopConf(), p)
      assert(footer.getFileMetaData.getSchema.getFields.toString
        .contains(physGrp), s"file ${a.path} lost the materialized column")
      assert(a.stats.exists(_.contains("\"numRecords\"")))
    }
  }

  test("V1: name-mode column mapping required, list/map/void rejected, " +
    "valid table round-trips") {
    val v1Config = Map(IcebergCompat.V1_KEY -> "true",
      ColumnMapping.MODE_KEY -> "name")
    // valid: flat primitives + struct
    val dir = TestSpark.tmpDir("icv1")
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("s", StructType(Seq(StructField("x", StringType))))))
    val t = DeltaTable.create(spark, dir, schema, configuration = v1Config)
    assert(t.snapshot().protocol.writerFeatures.get
      .contains("icebergCompatV1"))
    val src = spark.range(10).toDF("id")
      .withColumn("s", struct(concat(lit("v"), col("id")).as("x")))
    t.append(src)
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 10)

    // id-mode column mapping is NOT enough for V1 (Delta Spark
    // CheckOnlyNameMappingMode)
    val e1 = intercept[IllegalArgumentException] {
      DeltaTable.create(spark, TestSpark.tmpDir("icv1-id"), schema,
        configuration = Map(IcebergCompat.V1_KEY -> "true",
          ColumnMapping.MODE_KEY -> "id"))
    }
    assert(e1.getMessage.contains("name"))

    // array and map columns rejected (CheckNoListMapNullType)
    val arrSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("a", ArrayType(LongType))))
    val e2 = intercept[IllegalArgumentException] {
      DeltaTable.create(spark, TestSpark.tmpDir("icv1-arr"), arrSchema,
        configuration = v1Config)
    }
    assert(e2.getMessage.contains("a (array<bigint>)"))
  }

  test("V2: array/map allowed, variant rejected, mutual exclusion " +
    "with V1/V3 enforced") {
    val v2Config = Map(IcebergCompat.V2_KEY -> "true",
      ColumnMapping.MODE_KEY -> "id")
    val dir = TestSpark.tmpDir("icv2")
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("a", ArrayType(LongType)),
      StructField("m", MapType(StringType, LongType))))
    val t = DeltaTable.create(spark, dir, schema, configuration = v2Config)
    assert(t.snapshot().protocol.writerFeatures.get
      .contains("icebergCompatV2"))
    val src = spark.range(5).toDF("id")
      .withColumn("a", array(col("id"), col("id") * 2))
      .withColumn("m", map(lit("k"), col("id")))
    t.append(src)
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 5)

    // V1+V2 together rejected (pairwise exclusion,
    // table_features/mod.rs:410-476)
    val e = intercept[IllegalArgumentException] {
      DeltaTable.create(spark, TestSpark.tmpDir("icv2-x"), schema,
        configuration = v2Config +
          (IcebergCompat.V1_KEY -> "true") +
          (ColumnMapping.MODE_KEY -> "name"))
    }
    assert(e.getMessage.toLowerCase.contains("not be enabled") ||
      e.getMessage.contains("icebergCompat"))
  }

  test("materializePartitionColumns alone (delta.feature convention) " +
    "materializes without V3") {
    val dir = TestSpark.tmpDir("matpart")
    val src = spark.range(20).toDF("id")
      .withColumn("p", (col("id") % 2).cast("int"))
    val t = DeltaTable.create(spark, dir, src.schema, Seq("p"),
      configuration =
        Map("delta.feature.materializePartitionColumns" -> "supported"))
    assert(t.snapshot().protocol.writerFeatures.get
      .contains("materializePartitionColumns"))
    t.append(src)
    val fs = Storage.fs(new Path(dir), spark.sessionState.newHadoopConf())
    val dataFile = Storage.listFilesRecursive(fs, new Path(dir))
      .map(_.getPath)
      .find(p => p.getName.endsWith(".parquet") &&
        !p.toString.contains("_delta_log")).get
    val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
      spark.sessionState.newHadoopConf(), dataFile)
    assert(footer.getFileMetaData.getSchema.getFields.toString
      .contains("p"))
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 20)
  }
}
