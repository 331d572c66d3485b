package graft.delta

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** ALTER TABLE + schema evolution (reference schema_evolution.rs,
  * alter_table.rs, widening matrix schema/mod.rs:2030-2055).
  */
class AlterTableSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("widen int->long: old int32 files read under the new schema") {
    val dir = TestSpark.tmpDir("widen")
    val v1 = Seq((1, 1.5), (2, 2.5)).toDF("k", "x")
    DeltaTable.create(spark, dir, v1.schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(v1)
    t.widenColumn("k", LongType)
    t.append(Seq((3000000000L, 3.5)).toDF("k", "x")) // needs 64 bits
    val got = t.toDF
    assert(got.schema("k").dataType == LongType)
    assert(got.select("k").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3000000000L))
  }

  test("add nullable column: old files read NULL") {
    val dir = TestSpark.tmpDir("addcol")
    val v1 = Seq((1, "a")).toDF("k", "s")
    DeltaTable.create(spark, dir, v1.schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(v1)
    t.addColumn("extra", DoubleType)
    t.append(Seq((2, "b", 9.9)).toDF("k", "s", "extra"))
    val rows = t.toDF.orderBy("k").collect()
    assert(rows(0).isNullAt(2) && rows(1).getDouble(2) == 9.9)
  }

  test("nested ADD COLUMN: field added inside a struct, old rows NULL, " +
      "mergeSchema append evolves nested too") {
    val dir = TestSpark.tmpDir("addnested")
    val v1 = Seq((1L, ("a", 10))).toDF("k", "st")
      .select($"k", $"st".cast("struct<s:string,n:int>").as("st"))
    DeltaTable.create(spark, dir, v1.schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(v1)
    t.addColumn(Seq("st", "extra"), DoubleType)
    val st1 = t.snapshot().schema("st").dataType.asInstanceOf[StructType]
    assert(st1.fieldNames.toSeq == Seq("s", "n", "extra"))
    assert(st1("extra").dataType == DoubleType && st1("extra").nullable)
    // old file reads the new nested field as NULL
    val r0 = t.toDF.select($"st.extra").collect()
    assert(r0.length == 1 && r0(0).isNullAt(0))
    // mergeSchema append: incoming struct carries ANOTHER new nested
    // field, in a different inner order — aligned by name, not position
    val v2 = spark.sql(
      """SELECT CAST(2 AS BIGINT) AS k,
        |named_struct('extra', 7.5D, 'n', 20, 's', 'b', 'deep', 99L)
        |  AS st""".stripMargin)
    t.append(v2, mergeSchema = true)
    val schema2 = t.snapshot().schema("st").dataType.asInstanceOf[StructType]
    assert(schema2.fieldNames.toSeq == Seq("s", "n", "extra", "deep"))
    val rows = t.toDF.orderBy("k")
      .select($"k", $"st.s", $"st.n", $"st.extra", $"st.deep").collect()
    assert(rows(0).getString(1) == "a" && rows(0).getInt(2) == 10 &&
      rows(0).isNullAt(3) && rows(0).isNullAt(4))
    assert(rows(1).getString(1) == "b" && rows(1).getInt(2) == 20 &&
      rows(1).getDouble(3) == 7.5 && rows(1).getLong(4) == 99L)
    // dropping a nested field is rejected
    val bad = StructType(Seq(StructField("k", LongType),
      StructField("st", StructType(Seq(StructField("s", StringType))))))
    val e = intercept[IllegalArgumentException] { t.alterSchema(bad) }
    assert(e.getMessage.contains("st.n"))
  }

  test("nested widen through struct / array-of-struct paths") {
    val dir = TestSpark.tmpDir("widennested")
    val v1 = spark.sql(
      """SELECT 1L AS k, named_struct('n', CAST(5 AS INT)) AS st,
        |array(named_struct('m', CAST(6 AS INT))) AS arr""".stripMargin)
    DeltaTable.create(spark, dir, v1.schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(v1)
    t.widenColumn(Seq("st", "n"), LongType)
    t.widenColumn(Seq("arr", "m"), LongType)
    val s = t.snapshot().schema
    assert(s("st").dataType.asInstanceOf[StructType]("n")
      .dataType == LongType)
    assert(s("arr").dataType.asInstanceOf[ArrayType].elementType
      .asInstanceOf[StructType]("m").dataType == LongType)
    val r = t.toDF.select($"st.n", $"arr"(0)("m")).collect()(0)
    assert(r.getLong(0) == 5L && r.getLong(1) == 6L)
  }

  test("column mapping: nested add gets a fresh id; stale maxColumnId " +
      "self-heals against the schema walk") {
    // reconcile: survivors keep ids, the new nested field gets a fresh
    // one seeded past the ACTUAL schema max even when the persisted
    // property is stale (reference schema_evolution.rs:764-783)
    val base = StructType(Seq(
      StructField("k", LongType),
      StructField("st", StructType(Seq(StructField("s", StringType))))))
    val (annotated, max0) = ColumnMapping.assignMetadata(base)
    assert(max0 == 3 && ColumnMapping.maxAssignedId(annotated) == 3)
    val evolved = StructType(Seq(
      annotated("k"),
      annotated("st").copy(dataType = StructType(
        annotated("st").dataType.asInstanceOf[StructType].fields :+
          StructField("extra", DoubleType)))))
    // stale seed (1) must rebase on the schema max (3), not collide
    val seed = math.max(1L, ColumnMapping.maxAssignedId(annotated))
    val (rec, maxId) = ColumnMapping.reconcile(annotated, evolved, seed)
    assert(maxId == 4)
    val st = rec("st").dataType.asInstanceOf[StructType]
    val ids = Seq(rec("k"), rec("st"), st("s"), st("extra"))
      .map(_.metadata.getLong(ColumnMapping.ID_KEY))
    assert(ids.distinct.length == 4, s"id collision: $ids")
    assert(st("extra").metadata.getLong(ColumnMapping.ID_KEY) == 4)
    // survivors keep their physical names
    assert(rec("k").metadata.getString(ColumnMapping.PHYS_NAME_KEY) ==
      annotated("k").metadata.getString(ColumnMapping.PHYS_NAME_KEY))
  }

  test("column-mapped table: nested add end-to-end keeps old data " +
      "readable and annotates the new field") {
    val dir = TestSpark.tmpDir("cmnested")
    val v1 = Seq((1L, ("a", 10))).toDF("k", "st")
      .select($"k", $"st".cast("struct<s:string,n:int>").as("st"))
    DeltaTable.create(spark, dir, v1.schema,
      configuration = Map(ColumnMapping.MODE_KEY -> "name"))
    val t = DeltaTable.forPath(spark, dir)
    t.append(v1)
    t.addColumn(Seq("st", "extra"), DoubleType)
    t.append(spark.sql(
      """SELECT 2L AS k, named_struct('s', 'b', 'n', 20,
        |'extra', 1.25D) AS st""".stripMargin))
    val rows = t.toDF.orderBy("k")
      .select($"st.s", $"st.n", $"st.extra").collect()
    assert(rows(0).getString(0) == "a" && rows(0).isNullAt(2))
    assert(rows(1).getString(0) == "b" && rows(1).getDouble(2) == 1.25)
    val st = t.snapshot().schema("st").dataType.asInstanceOf[StructType]
    assert(st("extra").metadata.contains(ColumnMapping.ID_KEY) &&
      st("extra").metadata.contains(ColumnMapping.PHYS_NAME_KEY))
  }

  test("float->double widening and stats skipping still work") {
    val dir = TestSpark.tmpDir("widenf")
    val v1 = Seq((1, 1.5f), (2, 2.5f)).toDF("k", "f")
    DeltaTable.create(spark, dir, v1.schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(v1)
    t.widenColumn("f", DoubleType)
    t.append(Seq((3, 3.5)).toDF("k", "f"))
    assert(t.toDF.schema("f").dataType == DoubleType)
    assert(t.scan(Some("f > 3.0")).toDF.count() == 1)
  }

  test("widening chain byte->short->int->long: every file generation " +
      "reads natively under the final schema") {
    val dir = TestSpark.tmpDir("widenchain")
    val v1 = Seq((1.toByte, "a"), (2.toByte, "b")).toDF("k", "s")
    DeltaTable.create(spark, dir, v1.schema)
    val t = DeltaTable.forPath(spark, dir)
    assert(t.snapshot().schema("k").dataType == ByteType)
    t.append(v1)
    t.widenColumn("k", ShortType)
    t.append(Seq((300.toShort, "c")).toDF("k", "s"))
    t.widenColumn("k", IntegerType)
    t.append(Seq((70000, "d")).toDF("k", "s"))
    t.widenColumn("k", LongType)
    t.append(Seq((3000000000L, "e")).toDF("k", "s"))

    assert(t.toDF.schema("k").dataType == LongType)
    assert(t.toDF.select("k").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 300L, 70000L, 3000000000L))
    // stats written under narrower types still skip under the wide
    // schema (mixed-generation min/max comparisons)
    assert(t.scan(Some("k > 200")).toDF.count() == 3)
    assert(t.scan(Some("k <= 2")).toDF.count() == 2)
    // the protocol carries typeWidening exactly once
    assert(t.snapshot().protocol.writerFeatures.get.count(
      _ == "typeWidening") == 1)
    // skipped-ahead widening is also one legal step: byte -> long
    val dir2 = TestSpark.tmpDir("widenskip")
    DeltaTable.create(spark, dir2, v1.schema)
    val t2 = DeltaTable.forPath(spark, dir2)
    t2.append(v1)
    t2.widenColumn("k", LongType)
    t2.append(Seq((3000000000L, "z")).toDF("k", "s"))
    assert(t2.toDF.count() == 3)
  }

  test("timestamp <-> timestamp_ntz interchange reads i64 micros " +
      "either way") {
    val dir = TestSpark.tmpDir("widents")
    val ts = java.sql.Timestamp.valueOf("2024-03-01 10:30:00")
    val v1 = Seq((1L, ts)).toDF("k", "t")
    DeltaTable.create(spark, dir, v1.schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(v1)
    t.widenColumn("t", TimestampNTZType)
    assert(t.toDF.schema("t").dataType == TimestampNTZType)
    assert(t.toDF.count() == 1)
    // and back: the physical int64 micros are identical
    t.widenColumn("t", TimestampType)
    assert(t.toDF.schema("t").dataType == TimestampType)
    assert(t.toDF.select("t").collect().head.getTimestamp(0) == ts)
  }

  test("illegal evolutions rejected") {
    val dir = TestSpark.tmpDir("illegal")
    val v1 = Seq((1L, "a")).toDF("k", "s")
    DeltaTable.create(spark, dir, v1.schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(v1)
    // narrow
    intercept[IllegalArgumentException] {
      t.alterSchema(StructType(Seq(
        StructField("k", IntegerType), StructField("s", StringType))))
    }
    // drop
    intercept[IllegalArgumentException] {
      t.alterSchema(StructType(Seq(StructField("k", LongType))))
    }
    // non-nullable addition
    intercept[IllegalArgumentException] {
      t.alterSchema(StructType(v1.schema.fields :+
        StructField("n", LongType, nullable = false)))
    }
    // incompatible widen
    intercept[IllegalArgumentException] {
      t.widenColumn("s", LongType)
    }
  }

  test("column-mapped table keeps physical names across ALTER") {
    val dir = TestSpark.tmpDir("altercm")
    val v1 = Seq((1, "a")).toDF("k", "s")
    DeltaTable.create(spark, dir, v1.schema,
      configuration = Map(ColumnMapping.MODE_KEY -> "name"))
    val t = DeltaTable.forPath(spark, dir)
    t.append(v1)
    val physBefore = ColumnMapping.physicalName(t.snapshot().schema("k"))
    t.widenColumn("k", LongType)
    t.addColumn("z", StringType)
    val snap = t.snapshot()
    assert(ColumnMapping.physicalName(snap.schema("k")) == physBefore)
    assert(ColumnMapping.physicalName(snap.schema("z")).startsWith("col-"))
    t.append(Seq((2L, "b", "zz")).toDF("k", "s", "z"))
    assert(t.toDF.count() == 2)
    assert(t.toDF.schema("k").dataType == LongType)
  }

  test("mergeSchema append: new column, widening, null fill") {
    val dir = TestSpark.tmpDir("mergesch")
    val v1 = Seq((1, "a")).toDF("k", "s")
    DeltaTable.create(spark, dir, v1.schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(v1)
    // extra column WITHOUT the option: rejected, table untouched
    intercept[Exception] {
      t.append(Seq((2, "b", 9.9)).toDF("k", "s", "x"))
    }
    assert(t.toDF.count() == 1)
    // with mergeSchema: k widens int->long, x appends nullable
    t.append(Seq((3000000000L, "c", 9.9)).toDF("k", "s", "x"),
      mergeSchema = true)
    val snap = t.snapshot()
    assert(snap.schema("k").dataType == LongType)
    assert(snap.schema("x").dataType == DoubleType && snap.schema("x").nullable)
    assert(snap.protocol.writerFeatures.exists(_.contains("typeWidening")))
    // old rows read x as NULL
    val rows = t.toDF.orderBy("k").collect()
    assert(rows(0).isNullAt(2) && rows(1).getDouble(2) == 9.9)
    // a narrower batch missing a column: k upcasts, s fills NULL
    t.append(Seq((7, 1.1)).toDF("k", "x"), mergeSchema = true)
    assert(t.toDF.filter($"k" === 7).select($"s").head().isNullAt(0))
    assert(t.toDF.count() == 3)
    // incompatible type pair fails loudly
    intercept[IllegalArgumentException] {
      t.append(Seq(("oops", "d")).toDF("k", "s"), mergeSchema = true)
    }
  }

  test("mergeSchema on a column-mapped table assigns fresh ids") {
    val dir = TestSpark.tmpDir("mergecm")
    val v1 = Seq((1L, "a")).toDF("k", "s")
    DeltaTable.create(spark, dir, v1.schema,
      configuration = Map(ColumnMapping.MODE_KEY -> "name"))
    val t = DeltaTable.forPath(spark, dir)
    t.append(v1)
    t.append(Seq((2L, "b", 5L)).toDF("k", "s", "n"), mergeSchema = true)
    val snap = t.snapshot()
    assert(ColumnMapping.physicalName(snap.schema("n")).startsWith("col-"))
    assert(t.toDF.orderBy("k").select($"n").as[java.lang.Long]
      .collect().toSeq == Seq(null, java.lang.Long.valueOf(5L)))
  }

  test("writer options: mergeSchema append and overwriteSchema replace") {
    val dir = TestSpark.tmpDir("wropts")
    Seq((1L, "a")).toDF("k", "s").write.format("graft-delta").save(dir)
    // append a wider frame through the format writer
    Seq((2L, "b", 1.5)).toDF("k", "s", "x").write.format("graft-delta")
      .mode("append").option("mergeSchema", "true").save(dir)
    val t = DeltaTable.forPath(spark, dir)
    assert(t.toDF.columns.toSeq == Seq("k", "s", "x"))
    assert(t.toDF.count() == 2)
    // overwriteSchema: schema REPLACED (s dropped, v introduced)
    val vBefore = t.snapshot().version
    Seq((9L, 42L)).toDF("k", "v").write.format("graft-delta")
      .mode("overwrite").option("overwriteSchema", "true").save(dir)
    assert(t.toDF.columns.toSeq == Seq("k", "v"))
    assert(t.toDF.as[(Long, Long)].collect().toSeq == Seq((9L, 42L)))
    // schema replacement and data replacement land in ONE commit — no
    // intermediate version durably pairs the new schema with old files
    assert(t.snapshot().version == vBefore + 1)
    // time travel still reads the OLD schema over the OLD data
    val old = DeltaTable.forPath(spark, dir).snapshot(Some(vBefore))
    assert(old.schema.fieldNames.toSeq == Seq("k", "s", "x"))
    assert(new DeltaScan(old, None).toDF.count() == 2)
  }

  test("ADD COLUMN FIRST / AFTER places logically; reads by name " +
      "ignore order; DROP NOT NULL loosens, SET NOT NULL refuses") {
    val dir = TestSpark.tmpDir("addpos")
    val v1 = spark.sql("SELECT CAST(1 AS BIGINT) AS k, 'a' AS s")
      .select($"k", $"s".cast("string").as("s"))
    val strict = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.StringType, nullable = true)))
    DeltaTable.create(spark, dir, strict)
    val t = DeltaTable.forPath(spark, dir)
    t.append(v1)
    t.addColumn(Seq("lead"), DoubleType, Some(DeltaTable.First))
    t.addColumn(Seq("mid"), IntegerType, Some(DeltaTable.After("k")))
    assert(t.snapshot().schema.fieldNames.toSeq ==
      Seq("lead", "k", "mid", "s"))
    // old file reads correctly under the reordered schema
    val r = t.toDF.collect()(0)
    assert(r.isNullAt(0) && r.getLong(1) == 1L && r.isNullAt(2) &&
      r.getString(3) == "a")
    intercept[IllegalArgumentException](
      t.addColumn(Seq("x"), DoubleType, Some(DeltaTable.After("nope"))))

    // DROP NOT NULL on k; SET NOT NULL refuses
    assert(!t.snapshot().schema("k").nullable)
    t.setColumnNullable(Seq("k"), nullable = true)
    assert(t.snapshot().schema("k").nullable)
    intercept[IllegalArgumentException](
      t.setColumnNullable(Seq("s"), nullable = false))
  }

  test("addCheckConstraint probes existing rows; unset/drop via API") {
    val dir = TestSpark.tmpDir("conapi")
    val src = Seq((1L, 2.0), (2L, 5.0)).toDF("k", "v")
    DeltaTable.create(spark, dir, src.schema,
      configuration = Map("custom.x" -> "1"))
    val t = DeltaTable.forPath(spark, dir)
    t.append(src)
    // violating constraint rejected by the engine's distributed probe
    val e = intercept[IllegalArgumentException](
      t.addCheckConstraint("hi", "v > 3.0"))
    assert(e.getMessage.contains("violates"))
    t.addCheckConstraint("Pos", "v > 0.0") // name lowercases
    val snap = t.snapshot()
    assert(snap.metadata.configuration
      .get("delta.constraints.pos").contains("v > 0.0"))
    assert(snap.protocol.writerFeatures
      .exists(_.contains("checkConstraints")))
    intercept[Exception](t.append(Seq((3L, -1.0)).toDF("k", "v")))
    // drop lifts the gate; unknown drop throws unless ifExists
    t.dropCheckConstraint("POS")
    t.append(Seq((3L, -1.0)).toDF("k", "v"))
    assert(t.toDF.count() == 3)
    intercept[IllegalArgumentException](t.dropCheckConstraint("nope"))
    t.dropCheckConstraint("nope", ifExists = true)
    // unsetProperties removes plain config keys
    t.unsetProperties(Seq("custom.x", "never.was"))
    assert(!t.snapshot().metadata.configuration.contains("custom.x"))
  }

  test("setColumnDefault: writes fill omitted columns; feature declared") {
    val dir = TestSpark.tmpDir("defapi")
    val src = Seq((1L, "a")).toDF("k", "s")
    DeltaTable.create(spark, dir, src.schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(src)
    t.setColumnDefault(Seq("s"), Some("'filled'"))
    assert(t.snapshot().protocol.writerFeatures
      .exists(_.contains("allowColumnDefaults")))
    // DataFrame append missing the column takes the default
    t.append(Seq(Tuple1(2L)).toDF("k"))
    assert(t.toDF.orderBy("k").select("s").as[String].collect().toSeq ==
      Seq("a", "filled"))
    // DROP DEFAULT: the omission becomes an analysis error again
    t.setColumnDefault(Seq("s"), None)
    intercept[Exception](t.append(Seq(Tuple1(3L)).toDF("k")))
    // invalid default rejected up front
    intercept[IllegalArgumentException](
      t.setColumnDefault(Seq("s"), Some("no_such_col + 1")))
  }

  test("guards: nondeterministic DML predicates, protected property " +
      "unset, explicit NULL into a generated column") {
    val dir = TestSpark.tmpDir("guards")
    val src = Seq((1L, 2.0)).toDF("k", "v")
    DeltaTable.create(spark, dir, src.schema,
      configuration = Map(RowTracking.ENABLED_KEY -> "true"))
    val t = DeltaTable.forPath(spark, dir)
    t.append(src)
    // nondeterministic / time-dependent predicates refuse (the DV
    // paths evaluate the predicate in separate jobs)
    intercept[IllegalArgumentException](t.deleteWhere("rand() < 0.5"))
    intercept[IllegalArgumentException](
      t.updateWhereDV("v < rand()", Map("v" -> "v + 1")))
    intercept[IllegalArgumentException](
      t.deleteWhereDV("v IS NULL OR rand() > 0"))
    intercept[IllegalArgumentException](
      t.updateWhere("current_timestamp() > TIMESTAMP'2020-01-01'",
        Map("v" -> "v + 1")))
    // structural properties cannot be unset
    intercept[IllegalArgumentException](
      t.unsetProperties(Seq(RowTracking.MAT_ROW_ID_KEY)))
    intercept[IllegalArgumentException](
      t.unsetProperties(Seq("delta.columnMapping.mode")))

    // explicit NULL into a generated column rejects on the DataFrame
    // path (delta-spark parity); the SQL path computes it instead
    val gdir = TestSpark.tmpDir("guards-gen")
    val base = Seq((1L, 2.0, 4.0)).toDF("k", "v", "v2")
    val fields = base.schema.fields.map {
      case f if f.name == "v2" => f.copy(metadata =
        new org.apache.spark.sql.types.MetadataBuilder()
          .putString("delta.generationExpression", "v * 2.0").build())
      case f => f
    }
    DeltaTable.create(spark, gdir,
      org.apache.spark.sql.types.StructType(fields))
    val gt = DeltaTable.forPath(spark, gdir)
    gt.append(base)
    intercept[Exception](gt.append(
      Seq((2L, 3.0, null.asInstanceOf[java.lang.Double]))
        .toDF("k", "v", "v2")))
  }

  test("field-id schema diff: renames pair by column-mapping id, " +
      "drops/adds/widenings classify, and the diff round-trips " +
      "through ALTER") {
    val dir = TestSpark.tmpDir("iddiff")
    val v1 = Seq((1, "a", 1.5f, 7)).toDF("k", "s", "x", "gone")
    DeltaTable.create(spark, dir, v1.schema,
      configuration = Map(ColumnMapping.MODE_KEY -> "name"))
    val t = DeltaTable.forPath(spark, dir)
    t.append(v1)
    val before = t.snapshot().schema
    val kId = before("k").metadata.getLong(ColumnMapping.ID_KEY)

    t.renameColumn(Seq("k"), "key")      // same id, new name
    t.dropColumn(Seq("gone"))            // id disappears
    t.widenColumn("x", DoubleType)       // same id, widened type
    t.addColumn("fresh", StringType)     // new id
    val after = t.snapshot().schema

    val d = SchemaEvolution.diffByFieldId(before, after)
    assert(d.renamed == Seq(("k", "key", kId)))
    assert(d.dropped.map(_._1) == Seq("gone"))
    assert(d.added.map(_._1) == Seq("fresh"))
    assert(d.widened == Seq(("x", FloatType, DoubleType)))
    assert(d.incompatible.isEmpty)

    // round trip: applying the diffed operations to the BEFORE schema
    // through ALTER on a second table converges to an empty diff
    val dir2 = TestSpark.tmpDir("iddiff2")
    // clone: same logical schema AND same mapping ids (create from the
    // before schema verbatim, ids ride in the field metadata)
    DeltaTable.create(spark, dir2, before,
      configuration = Map(ColumnMapping.MODE_KEY -> "name"))
    val t2 = DeltaTable.forPath(spark, dir2)
    d.renamed.foreach { case (op, np, _) =>
      t2.renameColumn(op.split('.').toSeq,
        np.substring(np.lastIndexOf('.') + 1)) }
    d.dropped.foreach { case (p, _) => t2.dropColumn(p.split('.').toSeq) }
    d.widened.foreach { case (p, _, to) => t2.widenColumn(p, to) }
    d.added.foreach { case (p, f) => t2.addColumn(p, f.dataType) }
    val replayed = SchemaEvolution.diffByFieldId(t2.snapshot().schema,
      after)
    assert(replayed.renamed.isEmpty && replayed.dropped.isEmpty &&
      replayed.widened.isEmpty && replayed.incompatible.isEmpty,
      s"replayed ALTERs did not converge: $replayed")

    // id-less schemas degrade to path pairing: the rename reads as
    // drop+add (Delta semantics without column mapping)
    val plainBefore = StructType(before.fields.map(f =>
      StructField(f.name, f.dataType)))
    val plainAfter = StructType(after.fields.map(f =>
      StructField(f.name, f.dataType)))
    val pd = SchemaEvolution.diffByFieldId(plainBefore, plainAfter)
    assert(pd.renamed.isEmpty)
    assert(pd.dropped.map(_._1).toSet == Set("k", "gone"))
    assert(pd.added.map(_._1).toSet == Set("key", "fresh"))
  }
}
