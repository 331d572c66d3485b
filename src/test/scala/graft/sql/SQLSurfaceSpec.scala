package graft.sql

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.delta.DeltaTable

/** The Spark SQL surface: DDL/DML/queries through `spark.sql` against
  * the GraftDeltaCatalog (DSv2 TableCatalog with V1 scan/write bridges)
  * and the session catalog (`USING graft-delta` v1 datasource tables).
  * The reference leaves this layer to its embedding engines
  * (kernel/src/lib.rs:1075-1107); a Spark-native engine must speak SQL.
  */
class SQLSurfaceSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.gd", classOf[GraftDeltaCatalog].getName)
    s.conf.set("spark.sql.catalog.gd.warehouse", TestSpark.tmpDir("gd-wh"))
    s
  }
  import spark.implicits._

  test("CREATE / INSERT / SELECT / time travel through the catalog") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gd.ns1")
    spark.sql("""CREATE TABLE gd.ns1.t (k BIGINT, s STRING, p STRING)
      USING `graft-delta` PARTITIONED BY (p)
      TBLPROPERTIES ('delta.enableChangeDataFeed' = 'true')""")

    spark.sql("INSERT INTO gd.ns1.t VALUES (1, 'a', 'x'), (2, 'b', 'y')")
    spark.sql("INSERT INTO gd.ns1.t VALUES (3, 'c', 'x')")

    val rows = spark.sql(
      "SELECT k, s FROM gd.ns1.t WHERE p = 'x' ORDER BY k")
      .as[(Long, String)].collect().toSeq
    assert(rows == Seq((1L, "a"), (3L, "c")))
    assert(spark.sql("SELECT count(*) AS n FROM gd.ns1.t")
      .as[Long].head() == 3L)

    // time travel: version 1 = first INSERT only
    assert(spark.sql("SELECT count(*) AS n FROM gd.ns1.t VERSION AS OF 1")
      .as[Long].head() == 2L)

    // the table is a real delta table with the declared property
    val loc = spark.sql("DESCRIBE TABLE EXTENDED gd.ns1.t")
      .filter($"col_name" === "Location").select("data_type")
      .as[String].head()
    val t = DeltaTable.forPath(spark, loc)
    assert(t.snapshot().metadata.configuration
      .get("delta.enableChangeDataFeed").contains("true"))
    assert(t.snapshot().metadata.partitionColumns == Seq("p"))
  }

  test("delta.enableDeletionVectors routes SQL UPDATE/DELETE through DVs") {
    spark.sql("""CREATE TABLE gd.default.dvdml (k BIGINT, v DOUBLE)
      USING `graft-delta`
      TBLPROPERTIES ('delta.enableDeletionVectors' = 'true')""")
    // two wide files so neither DML fully matches a file (a fully
    // matched file legitimately drops instead of DV-marking)
    spark.sql("INSERT INTO gd.default.dvdml SELECT id, id * 1.0 " +
      "FROM range(0, 200, 1, 2)")
    val loc = spark.sql("DESCRIBE TABLE EXTENDED gd.default.dvdml")
      .filter(org.apache.spark.sql.functions.col("col_name") === "Location")
      .select("data_type").as[String].head().stripPrefix("file:")
    val t = graft.delta.DeltaTable.forPath(spark, loc)
    val before = new graft.delta.DeltaScan(t.snapshot(), None)
      .collectAddFiles().map(_.path).toSet
    spark.sql("UPDATE gd.default.dvdml SET v = v + 100.0 WHERE k < 10")
    spark.sql("DELETE FROM gd.default.dvdml WHERE k >= 190")
    val after = new graft.delta.DeltaScan(t.snapshot(), None)
      .collectAddFiles()
    // original files never rewritten: both DML ops DV-marked in place
    assert(before.subsetOf(after.map(_.path).toSet))
    assert(after.count(_.deletionVector.isDefined) > 0)
    val rows = spark.sql(
      "SELECT k, v FROM gd.default.dvdml ORDER BY k")
      .as[(Long, Double)].collect()
    assert(rows.length == 190)
    assert(rows.take(10).forall { case (k, v) => v == k + 100.0 })
    assert(rows.drop(10).forall { case (k, v) => v == k.toDouble })
  }

  test("ADD/DROP CONSTRAINT and UNSET TBLPROPERTIES through SQL") {
    spark.sql("""CREATE TABLE gd.default.conz (k BIGINT, v DOUBLE)
      USING `graft-delta` TBLPROPERTIES ('custom.tag' = 'keep-me')""")
    spark.sql("INSERT INTO gd.default.conz VALUES (1, 1.5), (2, 2.5)")

    // adding a constraint existing rows violate must fail atomically
    val bad = intercept[Exception](spark.sql(
      "ALTER TABLE gd.default.conz ADD CONSTRAINT big CHECK (v > 2.0)"))
    // Spark's analyzer probes existing rows itself
    // (NEW_CHECK_CONSTRAINT_VIOLATION); the engine's own probe in
    // addCheckConstraint covers the direct-API path
    assert(bad.getMessage.contains("violat") ||
      Option(bad.getCause).exists(_.getMessage.contains("violat")))

    spark.sql(
      "ALTER TABLE gd.default.conz ADD CONSTRAINT pos CHECK (v > 0.0)")
    val loc = spark.sql("DESCRIBE TABLE EXTENDED gd.default.conz")
      .filter($"col_name" === "Location").select("data_type")
      .as[String].head()
    val t = DeltaTable.forPath(spark, loc)
    assert(t.snapshot().metadata.configuration
      .get("delta.constraints.pos").contains("v > 0.0"))
    assert(t.snapshot().protocol.writerFeatures
      .exists(_.contains("checkConstraints")))

    // the constraint now gates every write path
    val ins = intercept[Exception](spark.sql(
      "INSERT INTO gd.default.conz VALUES (3, -1.0)"))
    assert(ins.getMessage.contains("pos") ||
      Option(ins.getCause).exists(_.getMessage.contains("pos")))

    // duplicate name rejected; DROP removes the gate
    intercept[Exception](spark.sql(
      "ALTER TABLE gd.default.conz ADD CONSTRAINT pos CHECK (v > 1.0)"))
    spark.sql("ALTER TABLE gd.default.conz DROP CONSTRAINT pos")
    spark.sql("INSERT INTO gd.default.conz VALUES (3, -1.0)")
    assert(spark.sql("SELECT count(*) AS n FROM gd.default.conz")
      .as[Long].head() == 3L)
    intercept[Exception](spark.sql(
      "ALTER TABLE gd.default.conz DROP CONSTRAINT nope"))
    spark.sql(
      "ALTER TABLE gd.default.conz DROP CONSTRAINT IF EXISTS nope")

    // UNSET TBLPROPERTIES removes config keys through the same path
    spark.sql(
      "ALTER TABLE gd.default.conz UNSET TBLPROPERTIES ('custom.tag')")
    assert(!DeltaTable.forPath(spark, loc).snapshot()
      .metadata.configuration.contains("custom.tag"))
  }

  test("column DEFAULT through SQL: CREATE, INSERT omission, " +
      "SET/DROP DEFAULT") {
    spark.sql("""CREATE TABLE gd.default.defs (
      k BIGINT, v DOUBLE DEFAULT 1.5, tag STRING DEFAULT 'none')
      USING `graft-delta`""")
    val loc = spark.sql("DESCRIBE TABLE EXTENDED gd.default.defs")
      .filter($"col_name" === "Location").select("data_type")
      .as[String].head()
    // CREATE with a DEFAULT declares the writer-only feature
    assert(DeltaTable.forPath(spark, loc).snapshot().protocol
      .writerFeatures.exists(_.contains("allowColumnDefaults")))

    spark.sql("INSERT INTO gd.default.defs (k) VALUES (1)")
    spark.sql("INSERT INTO gd.default.defs (k, v) VALUES (2, 9.0)")
    spark.sql("INSERT INTO gd.default.defs VALUES (3, 2.5, 'full')")
    assert(spark.sql(
      "SELECT k, v, tag FROM gd.default.defs ORDER BY k")
      .as[(Long, Double, String)].collect().toSeq ==
      Seq((1L, 1.5, "none"), (2L, 9.0, "none"), (3L, 2.5, "full")))

    // SET DEFAULT changes only FUTURE inserts; DROP DEFAULT makes the
    // column required-or-null again
    spark.sql(
      "ALTER TABLE gd.default.defs ALTER COLUMN v SET DEFAULT 7.25")
    spark.sql("INSERT INTO gd.default.defs (k) VALUES (4)")
    spark.sql("ALTER TABLE gd.default.defs ALTER COLUMN tag DROP DEFAULT")
    spark.sql("INSERT INTO gd.default.defs (k) VALUES (5)")
    val rows = spark.sql(
      "SELECT k, v, tag FROM gd.default.defs WHERE k >= 4 ORDER BY k")
      .collect()
    assert(rows(0).getDouble(1) == 7.25 && rows(0).getString(2) == "none")
    assert(rows(1).getDouble(1) == 7.25 && rows(1).isNullAt(2))

    // an unevaluable default is rejected at ALTER time, not first write
    intercept[Exception](spark.sql(
      "ALTER TABLE gd.default.defs ALTER COLUMN v SET DEFAULT no_col"))
  }

  test("GENERATED ALWAYS AS (expr) through DSv2 CREATE TABLE") {
    spark.sql("""CREATE TABLE gd.default.genc (
      k BIGINT, v DOUBLE,
      v2 DOUBLE GENERATED ALWAYS AS (v * 2.0))
      USING `graft-delta`""")
    val loc = spark.sql("DESCRIBE TABLE EXTENDED gd.default.genc")
      .filter($"col_name" === "Location").select("data_type")
      .as[String].head()
    val t = DeltaTable.forPath(spark, loc)
    assert(t.snapshot().schema("v2").metadata
      .getString("delta.generationExpression") == "v * 2.0")

    // omitted -> computed; wrong explicit value -> rejected
    spark.sql("INSERT INTO gd.default.genc (k, v) VALUES (1, 3.5)")
    assert(spark.sql("SELECT v2 FROM gd.default.genc WHERE k = 1")
      .as[Double].head() == 7.0)
    val bad = intercept[Exception](
      t.append(Seq((2L, 1.0, 99.0)).toDF("k", "v", "v2")))
    assert(bad.getMessage.contains("generat") ||
      Option(bad.getCause).exists(_.getMessage.contains("generat")))
  }

  test("table_changes TVF reads the change feed through spark.sql") {
    spark.sql("""CREATE TABLE gd.default.cdft (k BIGINT, s STRING)
      USING `graft-delta`
      TBLPROPERTIES ('delta.enableChangeDataFeed' = 'true')""")
    spark.sql("INSERT INTO gd.default.cdft VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO gd.default.cdft VALUES (3, 'c')")
    spark.sql("DELETE FROM gd.default.cdft WHERE k = 1")
    // by catalog name
    val byName = spark.sql(
      """SELECT k, _change_type, _commit_version
        |FROM table_changes('gd.default.cdft', 1, 3)
        |ORDER BY _commit_version, k""".stripMargin).collect()
    assert(byName.map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq == Seq((1L, "insert", 1L), (2L, "insert", 1L),
        (3L, "insert", 2L), (1L, "delete", 3L)))
    // by path, open-ended range, usable as a plain relation (joins etc.)
    val loc = spark.sql("DESCRIBE TABLE EXTENDED gd.default.cdft")
      .filter(org.apache.spark.sql.functions.col("col_name") === "Location")
      .select("data_type").as[String].head()
    val path = loc.stripPrefix("file:")
    val n = spark.sql(
      s"""SELECT count(*) AS n FROM table_changes('$path', 2)
         |WHERE _change_type = 'insert'""".stripMargin)
      .as[Long].head()
    assert(n == 1)
    // bad arity / non-literal args fail with the documented message
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM table_changes('gd.default.cdft')").collect()
    }
    assert(e.getMessage.contains("table_changes") ||
      e.getMessage.toLowerCase.contains("unresolv"))

    // 4th arg = file-skipping predicate: conservative — matching rows
    // survive; the insert file that provably holds only k>=3 is pruned
    val pruned = spark.sql(
      """SELECT k, _change_type FROM table_changes(
        |'gd.default.cdft', 1, 3, 'k < 3')
        |ORDER BY _change_type, k""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(pruned == Seq((1L, "delete"), (1L, "insert"), (2L, "insert")))
  }

  test("INSERT OVERWRITE replaces; filter pushdown prunes files") {
    spark.sql("""CREATE TABLE gd.default.ow (k BIGINT, p STRING)
      USING `graft-delta` PARTITIONED BY (p)""")
    spark.sql("INSERT INTO gd.default.ow VALUES (1, 'x'), (2, 'y')")
    spark.sql("INSERT OVERWRITE gd.default.ow VALUES (9, 'z')")
    assert(spark.sql("SELECT k FROM gd.default.ow").as[Long]
      .collect().toSeq == Seq(9L))

    // partition filter reaches the skipping path: the v1-bridged scan
    // prunes to ONE file before the parquet read
    spark.sql("INSERT INTO gd.default.ow VALUES (10, 'w')")
    val pruned = spark.sql(
      "SELECT k, input_file_name() AS f FROM gd.default.ow WHERE p = 'z'")
    assert(pruned.select($"k").as[Long].collect().toSeq == Seq(9L))
    assert(pruned.select($"f").distinct().count() == 1L,
      "partition filter must prune the file set")
    val allFiles = spark.sql(
      "SELECT input_file_name() AS f FROM gd.default.ow")
      .distinct().count()
    assert(allFiles >= 2L, s"fixture needs >1 file, got $allFiles")
  }

  test("CTAS, SHOW TABLES, DROP TABLE, path-addressed tables") {
    spark.sql("""CREATE TABLE gd.default.src (k BIGINT, v DOUBLE)
      USING `graft-delta`""")
    spark.sql(
      "INSERT INTO gd.default.src VALUES (1, 1.5), (2, 2.5), (3, 3.5)")
    spark.sql("""CREATE TABLE gd.default.agg USING `graft-delta` AS
      SELECT k % 2 AS odd, sum(v) AS total FROM gd.default.src GROUP BY 1""")
    val agg = spark.sql("SELECT odd, total FROM gd.default.agg ORDER BY odd")
      .as[(Long, Double)].collect().toSeq
    assert(agg == Seq((0L, 2.5), (1L, 5.0)))

    val names = spark.sql("SHOW TABLES IN gd.default")
      .select("tableName").as[String].collect().toSet
    assert(names.contains("src") && names.contains("agg"))

    // path-addressed read of an existing table (delta-spark's
    // `delta.`/path`` idiom)
    val dir = TestSpark.tmpDir("sql-path")
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    DeltaTable.create(spark, dir, df.schema)
    DeltaTable.forPath(spark, dir).append(df)
    assert(spark.sql(s"SELECT count(*) AS n FROM gd.default.`$dir`")
      .as[Long].head() == 2L)

    spark.sql("DROP TABLE gd.default.agg")
    assert(!spark.sql("SHOW TABLES IN gd.default")
      .select("tableName").as[String].collect().contains("agg"))
    intercept[Exception] { spark.sql("SELECT * FROM gd.default.agg") }
  }

  test("ALTER TABLE: properties and ADD COLUMN") {
    spark.sql("""CREATE TABLE gd.default.alt (k BIGINT)
      USING `graft-delta`""")
    spark.sql("INSERT INTO gd.default.alt VALUES (1)")
    spark.sql(
      "ALTER TABLE gd.default.alt SET TBLPROPERTIES ('foo.bar' = 'baz')")
    spark.sql("ALTER TABLE gd.default.alt ADD COLUMN extra STRING")
    spark.sql("INSERT INTO gd.default.alt VALUES (2, 'e')")
    val rows = spark.sql(
      "SELECT k, extra FROM gd.default.alt ORDER BY k")
      .as[(Long, Option[String])].collect().toSeq
    assert(rows == Seq((1L, None), (2L, Some("e"))))
  }

  test("CALL procedures: checkpoint, optimize, history, vacuum dry run") {
    spark.sql("""CREATE TABLE gd.default.maint (k BIGINT)
      USING `graft-delta`""")
    spark.sql("INSERT INTO gd.default.maint VALUES (1), (2)")
    spark.sql("INSERT INTO gd.default.maint VALUES (3)")

    val ckptV = spark.sql("CALL gd.system.checkpoint('default.maint')")
      .as[Long].head()
    assert(ckptV == 2L)

    val optV = spark.sql("CALL gd.system.optimize('default.maint')")
      .as[Long].head()
    assert(optV == 3L) // compaction commit
    assert(spark.sql("SELECT sum(k) AS s FROM gd.default.maint")
      .as[Long].head() == 6L)

    val ops = spark.sql("CALL gd.system.history('default.maint')")
      .select("operation").as[String].collect().toSeq
    assert(ops.exists(_.contains("OPTIMIZE")) ||
      ops.exists(_.contains("WRITE")), ops)

    // dry-run vacuum lists the compacted-away files without deleting
    val candidates = spark.sql(
      "CALL gd.system.vacuum('default.maint', dry_run => true)")
      .as[String].collect()
    assert(spark.sql("SELECT count(*) AS n FROM gd.default.maint")
      .as[Long].head() == 3L, s"vacuum dry run must not delete: " +
        candidates.mkString(", "))

    // auto_compact: the table is already packed (optimize ran above),
    // so the threshold is not met and no commit happens
    assert(spark.sql(
      "CALL gd.system.auto_compact('default.maint', min_num_files => 2)")
      .count() == 0L)
    // fragment it again: two more single-row inserts cross min_num_files
    spark.sql("INSERT INTO gd.default.maint VALUES (4)")
    spark.sql("INSERT INTO gd.default.maint VALUES (5)")
    val acV = spark.sql(
      "CALL gd.system.auto_compact('default.maint', min_num_files => 2)")
      .as[Long].collect()
    assert(acV.length == 1, "auto_compact should commit once")
    assert(spark.sql("SELECT sum(k) AS s FROM gd.default.maint")
      .as[Long].head() == 15L)

    // optimize with a where predicate (unpartitioned table: the only
    // legal predicates reference partition columns, so this rejects)
    intercept[Exception] {
      spark.sql(
        "CALL gd.system.optimize('default.maint', where => 'k > 1')")
        .collect()
    }

    // shallow clone through SQL: zero-copy fork reads identically
    val cloneDir = graft.TestSpark.tmpDir("sql-clone")
    assert(spark.sql(
      s"CALL gd.system.clone('default.maint', '$cloneDir')")
      .as[Long].head() == 0L)
    assert(graft.delta.DeltaTable.forPath(spark, cloneDir)
      .toDF.count() == 5L)

    // SQL DELETE routes through the transactional deleteWhere
    spark.sql("DELETE FROM gd.default.maint WHERE k >= 4")
    assert(spark.sql("SELECT sum(k) AS s FROM gd.default.maint")
      .as[Long].head() == 6L)
    // complex but exact predicates translate (AND/OR/NOT/IN)
    spark.sql(
      "DELETE FROM gd.default.maint WHERE k IN (2, 3) AND NOT (k = 2)")
    assert(spark.sql("SELECT sum(k) AS s FROM gd.default.maint")
      .as[Long].head() == 3L)

    // RESTORE back to before the deletes, through SQL
    val preDeleteV = spark.sql("CALL gd.system.history('default.maint')")
      .select("version").as[Long].collect().max - 2
    spark.sql(
      s"CALL gd.system.restore('default.maint', $preDeleteV)").collect()
    assert(spark.sql("SELECT sum(k) AS s FROM gd.default.maint")
      .as[Long].head() == 15L)

    // DESCRIBE DETAIL analog: one row of table facts; file totals
    // match the data (checksum fast path or one distributed agg)
    val det = spark.sql("CALL gd.system.detail('default.maint')").head()
    assert(det.getAs[String]("format") == "delta")
    assert(det.getAs[String]("id").nonEmpty)
    assert(det.getAs[Long]("num_files") >= 1L)
    assert(det.getAs[Long]("size_bytes") > 0L)
    assert(det.getAs[Int]("min_writer_version") >= 2)
    assert(det.getAs[Long]("version") ==
      spark.sql("CALL gd.system.history('default.maint')")
        .agg(org.apache.spark.sql.functions.max("version"))
        .as[Long].head())

    // reorg_purge: DV-delete a row, then materialize the delete —
    // remaining rows identical, no DV descriptors left (table is
    // k=1..5 after the RESTORE above)
    val loc = spark.sql("DESCRIBE TABLE EXTENDED gd.default.maint")
      .filter($"col_name" === "Location").select("data_type")
      .as[String].head()
    DeltaTable.forPath(spark, loc).deleteWhereDV("k = 4")
    val purgeV = spark.sql(
      "CALL gd.system.reorg_purge('default.maint')").as[Long].head()
    assert(purgeV > 0)
    assert(DeltaTable.forPath(spark, loc).scan(None)
      .collectAddFiles().forall(_.deletionVector.isEmpty))
    assert(spark.sql("SELECT sum(k) AS s FROM gd.default.maint")
      .as[Long].head() == 11L)
  }

  test("SQL UPDATE and MERGE INTO rewrite to the engine's " +
      "transactional DML (extension rule)") {
    spark.sql("""CREATE TABLE gd.default.dml (k BIGINT, v DOUBLE,
      s STRING) USING `graft-delta`
      TBLPROPERTIES ('delta.enableChangeDataFeed' = 'true')""")
    spark.sql(
      "INSERT INTO gd.default.dml VALUES (1, 1.0, 'a'), (2, 2.0, 'b')," +
        " (3, 3.0, 'c')")

    // UPDATE with expression assignments and a predicate
    spark.sql(
      "UPDATE gd.default.dml SET v = v * 10, s = concat(s, '!') " +
        "WHERE k >= 2")
    assert(spark.sql(
      "SELECT k, v, s FROM gd.default.dml ORDER BY k")
      .as[(Long, Double, String)].collect().toSeq ==
      Seq((1L, 1.0, "a"), (2L, 20.0, "b!"), (3L, 30.0, "c!")))

    // MERGE: user aliases, all three clause families
    Seq((2L, 200.0), (3L, 300.0), (9L, 900.0))
      .toDF("k", "v").createOrReplaceTempView("dml_src")
    spark.sql("""MERGE INTO gd.default.dml AS tgt
      USING dml_src AS src ON tgt.k = src.k
      WHEN MATCHED AND tgt.k = 2 THEN UPDATE SET v = src.v, s = 'merged'
      WHEN MATCHED THEN DELETE
      WHEN NOT MATCHED THEN INSERT (k, v, s) VALUES (src.k, src.v, 'new')
      WHEN NOT MATCHED BY SOURCE AND tgt.k = 1 THEN UPDATE SET s = 'kept'
      """)
    assert(spark.sql(
      "SELECT k, v, s FROM gd.default.dml ORDER BY k")
      .as[(Long, Double, String)].collect().toSeq ==
      Seq((1L, 1.0, "kept"), (2L, 200.0, "merged"), (9L, 900.0, "new")))

    // CDF recorded the SQL DML like the API DML
    val types = spark.read.format("graft-delta")
      .option("readChangeFeed", "true").option("startingVersion", "0")
      .load(spark.sql("CALL gd.system.detail('default.dml')")
        .head().getAs[String]("location"))
      .select("_change_type").as[String].collect().toSet
    assert(types.contains("update_preimage") &&
      types.contains("update_postimage") && types.contains("delete"))
  }

  test("MERGE WITH SCHEMA EVOLUTION adds the source-only column " +
      "through the catalog and merges against the evolved schema") {
    spark.sql("""CREATE TABLE gd.default.mev (k BIGINT, v DOUBLE)
      USING `graft-delta`""")
    spark.sql(
      "INSERT INTO gd.default.mev VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
    Seq((2L, 20.0, "B"), (4L, 40.0, "D")).toDF("k", "v", "tag")
      .createOrReplaceTempView("mev_src")

    // explicit assignment of the new column
    spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO gd.default.mev AS t
      USING mev_src AS s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v, tag = s.tag
      WHEN NOT MATCHED THEN INSERT (k, v, tag) VALUES (s.k, s.v, s.tag)
      """)
    assert(spark.sql(
      "SELECT k, v, tag FROM gd.default.mev ORDER BY k")
      .as[(Long, Double, Option[String])].collect().toSeq ==
      Seq((1L, 1.0, None), (2L, 20.0, Some("B")),
        (3L, 3.0, None), (4L, 40.0, Some("D"))))
    // the evolution is a real validated engine commit: nullable column
    val loc = spark.sql("CALL gd.system.detail('default.mev')")
      .head().getAs[String]("location")
    val f = DeltaTable.forPath(spark, loc).snapshot().schema("tag")
    assert(f.nullable)

    // star actions under evolution: UPDATE SET * / INSERT * pick up a
    // second new column from the source
    Seq((1L, 100.0, "A2", 5L), (9L, 900.0, "N", 6L))
      .toDF("k", "v", "tag", "extra").createOrReplaceTempView("mev_src2")
    spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO gd.default.mev AS t
      USING mev_src2 AS s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.sql(
      "SELECT k, v, tag, extra FROM gd.default.mev ORDER BY k")
      .as[(Long, Double, Option[String], Option[Long])].collect().toSeq ==
      Seq((1L, 100.0, Some("A2"), Some(5L)), (2L, 20.0, Some("B"), None),
        (3L, 3.0, None, None), (4L, 40.0, Some("D"), None),
        (9L, 900.0, Some("N"), Some(6L))))

    // plain MERGE (no evolution clause) still refuses unknown columns
    Seq((1L, 0.0, "x", 0L, "boom")).toDF("k", "v", "tag", "extra", "zz")
      .createOrReplaceTempView("mev_src3")
    val e = intercept[Exception] {
      spark.sql("""MERGE INTO gd.default.mev AS t
        USING mev_src3 AS s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET zz = s.zz""")
    }
    assert(e.getMessage.toLowerCase.contains("zz"), e.getMessage)
  }

  test("nested ALTER TABLE ADD COLUMNS through SQL: st.extra") {
    spark.sql("""CREATE TABLE gd.default.nst
      (k BIGINT, st STRUCT<s: STRING, n: INT>) USING `graft-delta`""")
    spark.sql(
      "INSERT INTO gd.default.nst VALUES (1, named_struct('s','a','n',10))")
    spark.sql("ALTER TABLE gd.default.nst ADD COLUMNS (st.extra DOUBLE)")
    spark.sql("""INSERT INTO gd.default.nst VALUES
      (2, named_struct('s','b','n',20,'extra',7.5D))""")
    assert(spark.sql(
      "SELECT k, st.s, st.extra FROM gd.default.nst ORDER BY k")
      .as[(Long, String, Option[Double])].collect().toSeq ==
      Seq((1L, "a", None), (2L, "b", Some(7.5))))
  }

  test("CHECK constraint added via SQL TBLPROPERTIES gates SQL INSERT") {
    spark.sql("""CREATE TABLE gd.default.con (k BIGINT, v DOUBLE)
      USING `graft-delta`""")
    spark.sql("ALTER TABLE gd.default.con SET TBLPROPERTIES " +
      "('delta.constraints.positive_k' = 'k > 0')")
    spark.sql("INSERT INTO gd.default.con VALUES (1, 1.0)")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gd.default.con VALUES (-5, 2.0)")
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("positive_k")), msgs(e))
    // the failed INSERT committed nothing
    assert(spark.sql("SELECT count(*) AS n FROM gd.default.con")
      .as[Long].head() == 1L)
  }

  test("session catalog: CREATE ... USING graft-delta + INSERT + SELECT") {
    val loc = new java.io.File(TestSpark.tmpDir("sql-v1-tbl"))
      .getAbsolutePath
    spark.sql(s"""CREATE TABLE sess_t (k BIGINT, s STRING)
      USING `graft-delta` LOCATION '$loc'""")
    try {
      spark.sql("INSERT INTO sess_t VALUES (1, 'a'), (2, 'b')")
      assert(spark.sql("SELECT count(*) AS n FROM sess_t")
        .as[Long].head() == 2L)
      spark.sql("INSERT OVERWRITE sess_t VALUES (9, 'z')")
      assert(spark.sql("SELECT k FROM sess_t").as[Long]
        .collect().toSeq == Seq(9L))
      // it's a plain delta table underneath
      val desc = spark.sql("DESCRIBE TABLE EXTENDED sess_t")
        .collect().mkString("\n")
      assert(DeltaTable.isDeltaTable(spark, loc), desc)
      assert(DeltaTable.forPath(spark, loc).toDF.count() == 1L)
    } finally spark.sql("DROP TABLE IF EXISTS sess_t")
  }

  test("ALTER TABLE RENAME/DROP COLUMN through SQL (column mapping)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gd.ns_rd")
    spark.sql("""CREATE TABLE gd.ns_rd.t (k BIGINT, s STRING, n INT)
      USING `graft-delta`
      TBLPROPERTIES ('delta.columnMapping.mode' = 'name')""")
    spark.sql("INSERT INTO gd.ns_rd.t VALUES (1, 'a', 10), (2, 'b', 20)")

    spark.sql("ALTER TABLE gd.ns_rd.t RENAME COLUMN s TO label")
    assert(spark.sql("SELECT k FROM gd.ns_rd.t WHERE label = 'b'")
      .as[Long].collect().toSeq == Seq(2L))

    spark.sql("ALTER TABLE gd.ns_rd.t DROP COLUMN n")
    assert(spark.sql("SELECT * FROM gd.ns_rd.t").columns.toSeq ==
      Seq("k", "label"))

    // re-added column with the dropped name reads NULL for old rows
    spark.sql("ALTER TABLE gd.ns_rd.t ADD COLUMN n INT")
    assert(spark.sql(
      "SELECT count(*) AS c FROM gd.ns_rd.t WHERE n IS NOT NULL")
      .as[Long].head() == 0L)

    // without column mapping the rename refuses with a clear error
    spark.sql("""CREATE TABLE gd.ns_rd.plain (k BIGINT, s STRING)
      USING `graft-delta`""")
    val e = intercept[Exception](
      spark.sql("ALTER TABLE gd.ns_rd.plain RENAME COLUMN s TO x"))
    assert(e.getMessage.contains("columnMapping"))
  }

  test("ALTER TABLE column position + nullability through SQL") {
    spark.sql("""CREATE TABLE gd.default.pos
      (k BIGINT NOT NULL, s STRING) USING `graft-delta`""")
    spark.sql("INSERT INTO gd.default.pos VALUES (1, 'a')")
    spark.sql("ALTER TABLE gd.default.pos ADD COLUMNS (lead DOUBLE FIRST)")
    spark.sql("ALTER TABLE gd.default.pos ADD COLUMNS (mid INT AFTER k)")
    assert(spark.sql("SELECT * FROM gd.default.pos").columns.toSeq ==
      Seq("lead", "k", "mid", "s"))
    assert(spark.sql(
      "SELECT k FROM gd.default.pos WHERE lead IS NULL AND mid IS NULL")
      .as[Long].collect().toSeq == Seq(1L))
    spark.sql("ALTER TABLE gd.default.pos ALTER COLUMN k DROP NOT NULL")
    spark.sql("INSERT INTO gd.default.pos VALUES (NULL, NULL, NULL, 'n')")
    assert(spark.sql(
      "SELECT count(*) AS c FROM gd.default.pos WHERE k IS NULL")
      .as[Long].head() == 1L)
    // refused — by Spark's analyzer up front, or by the engine's
    // setColumnNullable guard if a future Spark delegates it down
    val e = intercept[Exception](spark.sql(
      "ALTER TABLE gd.default.pos ALTER COLUMN s SET NOT NULL"))
    assert(e.getMessage.contains("SET NOT NULL") ||
      e.getMessage.contains("non-nullable"), e.getMessage)
  }

  test("GENERATED ALWAYS AS IDENTITY through DSv2 CREATE TABLE") {
    spark.sql("""CREATE TABLE gd.default.ident (
      id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 100 INCREMENT BY 5),
      s STRING) USING `graft-delta`""")
    val loc = spark.sql("DESCRIBE TABLE EXTENDED gd.default.ident")
      .filter($"col_name" === "Location").select("data_type")
      .as[String].head()
    val t = DeltaTable.forPath(spark, loc)

    // the identity spec landed as protocol field metadata
    val specs = graft.delta.IdentityColumns.specs(t.snapshot().schema)
    assert(specs.map(s => (s.name, s.start, s.step,
      s.allowExplicitInsert)) == Seq(("id", 100L, 5L, false)))

    // generation through the shared write path: ids follow start/step
    val v = t.append(Seq("a", "b", "c").toDF("s"))
    assert(v == 1L)
    val got = spark.sql(
      "SELECT id, s FROM gd.default.ident ORDER BY id")
      .as[(Long, String)].collect().toSeq
    assert(got.map(_._1) == Seq(100L, 105L, 110L), got)

    // ALWAYS means explicit values are rejected
    val e = intercept[Exception] {
      t.append(Seq((999L, "x")).toDF("id", "s"))
    }
    assert(e.getMessage.contains("always generated"), e.getMessage)

    // BY DEFAULT allows explicit values
    spark.sql("""CREATE TABLE gd.default.identbd (
      id BIGINT GENERATED BY DEFAULT AS IDENTITY (START WITH 7 INCREMENT BY 2),
      s STRING) USING `graft-delta`""")
    val loc2 = spark.sql("DESCRIBE TABLE EXTENDED gd.default.identbd")
      .filter($"col_name" === "Location").select("data_type")
      .as[String].head()
    val t2 = DeltaTable.forPath(spark, loc2)
    t2.append(Seq("p").toDF("s"))             // generated: 7
    t2.append(Seq((1000L, "q")).toDF("id", "s")) // explicit, allowed
    val ids = spark.sql("SELECT id FROM gd.default.identbd ORDER BY id")
      .as[Long].collect().toSeq
    assert(ids == Seq(7L, 1000L), ids)
  }

  test("CALL gd.system.convert adopts a plain parquet directory") {
    val dir = java.nio.file.Files
      .createTempDirectory("sqlconvert").toString + "/t"
    spark.range(30).select($"id", ($"id" % 3).cast("int").as("p"))
      .write.partitionBy("p").parquet(dir)
    val n = spark.sql(
      s"CALL gd.system.convert('$dir', partition_schema => 'p INT')")
      .as[Long].head()
    assert(n >= 3L) // at least one file per partition value
    val t = DeltaTable.forPath(spark, dir)
    assert(t.toDF.count() == 30)
    assert(t.toDF.filter($"p" === 1).count() == 10)
  }
}
