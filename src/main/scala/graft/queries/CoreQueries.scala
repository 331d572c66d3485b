package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Core relational operators, mirroring the reference's declarative plan IR
  * (SURVEY.md §2.1/§2.3: ScanParquet, Values, Project, Filter, Aggregate
  * min/max/min_by/max_by, SemiJoin, AntiJoin, UnionAll, and the expression
  * language) re-expressed as Spark DataFrame pipelines on the TPC-H-ish
  * corpus, plus the canonical log-replay query shape
  * (reference kernel/src/scan/scan_plan.rs:51-133).
  *
  * Determinism contract with the DuckDB oracle:
  *  - every query ends with a total ORDER BY (unique tie-break columns);
  *  - double aggregation goes through DECIMAL(18,4) so partial-aggregation
  *    order cannot perturb low bits (sum of decimals is exact in both
  *    engines), then back to DOUBLE;
  *  - per-row double arithmetic is IEEE-deterministic and left alone.
  */
object CoreQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Exact decimal expressions for the money columns (all are exactly 2dp
    * doubles in this corpus): cast each SOURCE column to a tight decimal,
    * then multiply/sum decimals — exact integer arithmetic in both Spark
    * and DuckDB, so partial-agg order and double→decimal rounding-mode
    * differences can't perturb the result. Returned as double.
    */
  private val discPriceDec =
    "cast(l_extendedprice as decimal(10,2)) * (1 - cast(l_discount as decimal(4,2)))"
  private val chargeDec =
    s"$discPriceDec * (1 + cast(l_tax as decimal(4,2)))"

  private def dsum(sqlExpr: String): Column =
    sum(expr(sqlExpr)).cast("double")

  private def davg(sqlExpr: String): Column =
    sum(expr(sqlExpr)).cast("double") / count(lit(1))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ScanParquet + Project + Filter (predicate pushdown + column pruning;
    // reference nodes.rs:100-185, :281-328)
    "q_scan_project_filter" -> ((s, d) => {
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))
        .filter(col("l_quantity") < 10)
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // Values: inline literal rows (reference nodes.rs:212-279)
    "q_values" -> ((s, _) => {
      import s.implicits._
      Seq((1L, "add"), (2L, "remove"), (3L, "metaData"), (4L, "protocol"))
        .toDF("id", "action")
        .orderBy(col("id"))
    }),

    // Filter with SQL three-valued logic: NULL predicate result drops the
    // row (reference nodes.rs:323-328)
    "q_filter_3vl" -> ((s, d) => {
      t(s, d, "documents")
        .select(col("doc_id"),
          when(col("source") === "src0", lit(null)).otherwise(col("n_chars"))
            .as("nc"))
        .filter(col("nc") > 200)
        .orderBy(col("doc_id"))
    }),

    // Aggregate: group-by + min/max (the reference IR's only agg ops,
    // nodes.rs:474-788) + numRecords-style count
    "q_agg_minmax" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          min(col("l_shipdate")).as("min_ship"),
          max(col("l_shipdate")).as("max_ship"),
          count(lit(1)).as("num_records"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // MaxNonNullBy / MinNonNullBy — arg-max/arg-min over a unique ordering
    // key (reference nodes.rs:474-705; Spark native max_by/min_by)
    "q_max_by" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(col("user_id"))
        .agg(
          max_by(col("event_type"), col("event_id")).as("last_type"),
          min_by(col("value"), col("event_id")).as("first_val"),
          max(col("event_id")).as("last_event_id"))
        .orderBy(col("user_id"))
    }),

    // SemiJoin inverted=false (reference nodes.rs:790-829)
    "q_semi_join" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_totalprice") > 150000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // SemiJoin inverted=true (LEFT ANTI — the log-replay
    // checkpoint-minus-commits arm; reference nodes.rs:790-829)
    "q_anti_join" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // UnionAll (reference nodes.rs:831-865)
    "q_union_all" -> ((s, d) => {
      val a = t(s, d, "orders").filter(col("o_orderstatus") === "P")
        .select(col("o_orderkey").as("key"), lit("pending").as("src"))
      val b = t(s, d, "lineitem").filter(col("l_quantity") >= 49)
        .select(col("l_orderkey").as("key"), lit("bigline").as("src"))
      a.unionAll(b).orderBy(col("key"), col("src"))
    }),

    // Expression language: arithmetic (int division truncates), coalesce,
    // cast, nullif/is-null, IS DISTINCT FROM (reference §2.3)
    "q_expr_ops" -> ((s, d) => {
      t(s, d, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("disc_price"),
          expr("l_orderkey div 7").as("div7"),
          expr("coalesce(nullif(l_returnflag, 'N'), 'none')").as("flag_or_none"),
          expr("cast(floor(l_quantity) as bigint)").as("qty_floor"),
          expr("nullif(l_tax, 0.0d) is null").as("tax_is_zero"),
          expr("l_returnflag is distinct from l_linestatus").as("flag_ne_status"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // ParseJson: permissive from_json — unparseable => NULL, never error
    // (reference expressions/mod.rs:331-359)
    "q_parse_json" -> ((s, d) => {
      t(s, d, "events")
        .select(col("event_id"),
          from_json(col("props"), lit("k INT")).getField("k").as("k"))
        .orderBy(col("event_id"))
    }),

    // In-list + array_contains (reference data-skipping `In` shape,
    // expressions/mod.rs:84-98)
    "q_in_list" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_returnflag").isin("A", "R"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          array_contains(array(lit("F")), col("l_linestatus")).as("status_f"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // The canonical log-replay dedup arm (reference scan_plan.rs:51-133):
    // newest action per key wins (max_by over version), then keep live rows.
    "q_log_replay_dedup" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(col("user_id"))
        .agg(
          max_by(col("event_type"), col("event_id")).as("last_type"),
          max(col("event_id")).as("last_version"))
        .filter(col("last_type") =!= "error")
        .orderBy(col("user_id"))
    }),

    // CDF net-changes shape: earliest pre-image + latest post-image per key
    // (reference table_changes/net_changes.rs)
    "q_net_changes" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(
          min_by(col("value"), col("event_id")).as("first_val"),
          max_by(col("value"), col("event_id")).as("last_val"),
          count(lit(1)).as("n"))
        .orderBy(col("user_id"), col("event_type"))
    }),

    // As-of join (operator Spark lacks; composed union + per-key window,
    // ops/Relational.scala): each click event picks the same user's most
    // recent purchase at ts <= click ts. One shuffle on user_id — never an
    // inequality join. Oracle: DuckDB native ASOF LEFT JOIN.
    "q_asof_join" -> ((s, d) => {
      val e = t(s, d, "events")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      // asofJoin contract: one right row per (key, ts) — pre-dedup to
      // the max event_id so the pick at an equal-ts tie is the SAME
      // deterministic row in both engines, not whatever each engine's
      // ASOF happens to keep
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id").as("p_user"), col("ts").as("p_ts"))
        .agg(max(col("event_id")).as("p_event_id"),
          max_by(col("value"), col("event_id")).as("p_value"))
      graft.ops.Relational.asofJoin(clicks, purchases,
          "user_id", "p_user", "ts", "p_ts", Seq("p_event_id", "p_value"))
        .select(col("event_id"), col("user_id"), col("p_event_id"),
          col("p_value"))
        .orderBy(col("event_id"))
    }),

    // Range (interval) join via bucketed equi-join (ops/Relational.scala):
    // per error event, aggregate the same user's events in the preceding
    // 24 h. Bucket width = window length, so each left row expands to ≤2
    // bucket keys; the join is a hash equi-join on (user, bucket) plus an
    // exact interval filter — no O(n·m) comparisons. Oracle: DuckDB's
    // native inequality (IEJoin) range join.
    "q_range_join" -> ((s, d) => {
      val e = t(s, d, "events")
      val errors = e.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"))
      val all = e.select(col("user_id").as("r_user"), col("ts").as("r_ts"),
        col("event_id").as("r_event_id"), col("value").as("r_value"))
      graft.ops.Relational.rangeJoin(errors, all, "user_id", "r_user",
          "ts", "r_ts", -86400L, 0L, Seq("r_event_id", "r_value"))
        .groupBy(col("event_id"))
        .agg(count(lit(1)).as("n"),
          min(col("r_event_id")).as("min_match_id"),
          max(col("r_value")).as("max_val"))
        .orderBy(col("event_id"))
    }),

    // Gap sessionization (lag + running sum in one per-key window pass,
    // ops/Relational.scala): sessions split on >6 h idle gaps, then
    // per-session stats. One shuffle on user_id.
    "q_sessionize" -> ((s, d) => {
      graft.ops.Relational.sessionize(t(s, d, "events"),
          "user_id", "ts", "event_id", 6L * 3600L)
        .groupBy(col("user_id"), col("session_idx"))
        .agg(count(lit(1)).as("n"),
          min(col("event_id")).as("min_eid"),
          max(col("event_id")).as("max_eid"),
          (unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
            .as("dur_us"))
        .orderBy(col("user_id"), col("session_idx"))
    }),

    // STREAMING gap sessionization against the batch oracle: the same
    // events flow through flatMapGroupsWithState (event-time timeout,
    // state reaped at close) in two time-ordered microbatches plus a
    // far-future sentinel that advances the watermark past every real
    // session's deadline — so the closed-session stream must equal the
    // batch sessionization of the whole table. Upgrades the streaming
    // twin from spec-only to oracle-backed.
    "q_stream_sessionize" -> ((s, d) => {
      import graft.streaming.{SessEvent, SessOut, Sessionization}
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val ev = t(s, d, "events")
        .select(col("user_id"), col("ts").cast("timestamp"), col("event_id"))
        .as[SessEvent].collect()
      val (minUs, maxUs) = (ev.map(_.ts.getTime).min, ev.map(_.ts.getTime).max)
      val cutoff = minUs + (maxUs - minUs) / 2
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[SessEvent]
      val out = scala.collection.mutable.ArrayBuffer.empty[SessOut]
      val ckpt = java.nio.file.Files
        .createTempDirectory("sess-row-ckpt").toString
      def drain(): Unit = {
        val q = Sessionization.sessions(mem.toDS(), 6L * 3600L, "0 seconds")
          .writeStream
          .option("checkpointLocation", ckpt)
          .foreachBatch {
            (df: org.apache.spark.sql.Dataset[SessOut], _: Long) =>
              out.synchronized { out ++= df.collect() }
              ()
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination(180000)
      }
      // fewer state partitions: one state store commits per shuffle
      // partition per microbatch — at this volume 32 stores per batch
      // is fixed cost. Frozen into the checkpoint at first batch; set
      // before the first drain, restore after the last. The same knob
      // scales UP with the corpus — state partitioning is capacity
      // planning, not a constant.
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
      mem.addData(ev.filter(_.ts.getTime < cutoff).toIndexedSeq)
      drain()
      // sentinel user -1: pushes the watermark ten years out; its own
      // session stays open and is never emitted. It rides the SAME
      // restarted run as the second half: the run's trailing no-data
      // batch fires the event-time timeouts once the watermark jumps,
      // so a third multi-second query startup buys nothing. Restart
      // recovery stays exercised — this run resumes from the first
      // drain's checkpoint with every mid-stream session still open.
      mem.addData(ev.filter(_.ts.getTime >= cutoff).toIndexedSeq)
      mem.addData(Seq(SessEvent(-1L,
        new java.sql.Timestamp(maxUs + 10L * 365 * 86400 * 1000L), -1L)))
      drain()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      out.toSeq.toDF()
        .select(col("user_id"), col("start_us"), col("n"),
          col("min_eid"), col("max_eid"), col("dur_us"))
        .orderBy(col("user_id"), col("start_us"))
    }),

    // Skew-safe salted inner join: the fact side (events) salts each
    // key into 8 sub-keys by a deterministic hash of its unique id,
    // the dimension side replicates to all sub-keys — a hot user's
    // rows spread over 8 reducers instead of one straggler. The
    // oracle is the PLAIN inner join: salting must be invisible in
    // the result.
    "q_skew_join" -> ((s, d) => {
      val fact = t(s, d, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
      val dim = t(s, d, "customer")
        .select(col("c_custkey"), col("c_name"))
      graft.ops.Relational.skewSafeJoin(fact, dim,
          "user_id", "c_custkey", "event_id", saltFactor = 8)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("c_name"))
        .orderBy(col("event_id"))
    }),

    // Funnel analysis (ordered-sequence analytics): per user, the
    // earliest signup, the earliest click AFTER that signup, and the
    // earliest purchase AFTER that click; stage = how deep the user
    // got. Three chained conditional-min windows over ONE partitioning
    // — the exchange is reused, no self-joins, no per-user collect.
    "q_funnel" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
      t(s, d, "events")
        .withColumn("t1", min(when(col("event_type") === "signup",
          col("ts"))).over(w))
        .withColumn("t2", min(when(col("event_type") === "click" &&
          col("ts") > col("t1"), col("ts"))).over(w))
        .withColumn("t3", min(when(col("event_type") === "purchase" &&
          col("ts") > col("t2"), col("ts"))).over(w))
        .groupBy(col("user_id"))
        .agg(first(col("t1")).as("t1"), first(col("t2")).as("t2"),
          first(col("t3")).as("t3"))
        .select(col("user_id"),
          when(col("t3").isNotNull, lit(3L))
            .when(col("t2").isNotNull, lit(2L))
            .when(col("t1").isNotNull, lit(1L))
            .otherwise(lit(0L)).as("stage"),
          when(col("t3").isNotNull,
            unix_micros(col("t3")) - unix_micros(col("t1")))
            .as("funnel_us"))
        .orderBy(col("user_id"))
    }),

    // Tumbling-window aggregation (Spark's `window()` — epoch-aligned
    // 1 h buckets; the batch twin of the streaming windowed agg in
    // StreamingSpec). Value sums go through DECIMAL so partial-agg
    // order is invisible. One shuffle on (window, type).
    "q_window_agg" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(expr("cast(value as decimal(10,2))")).cast("double")
            .as("sum_val"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n"), col("sum_val"))
        .orderBy(col("window_start"), col("event_type"))
    }),

    // TPC-H Q1-shaped headline aggregation
    "q1_agg" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <=
          lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum("cast(l_quantity as decimal(8,2))").as("sum_qty"),
          dsum("cast(l_extendedprice as decimal(10,2))").as("sum_base_price"),
          dsum(discPriceDec).as("sum_disc_price"),
          dsum(chargeDec).as("sum_charge"),
          davg("cast(l_quantity as decimal(8,2))").as("avg_qty"),
          davg("cast(l_extendedprice as decimal(10,2))").as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // TPC-H Q3-shaped headline join (broadcast dim, shuffle agg, top-k)
    "q3_top_revenue" -> ((s, d) => {
      val cutoff = java.sql.Timestamp.valueOf("1998-01-01 00:00:00")
      val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, d, "orders").filter(col("o_orderdate") < lit(cutoff))
      val l = t(s, d, "lineitem").filter(col("l_shipdate") >= lit(cutoff))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(dsum(discPriceDec).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5-shaped headline multi-join
    "q5_region_revenue" -> ((s, d) => {
      val r = t(s, d, "region").filter(col("r_name") === "ASIA")
      val n = t(s, d, "nation")
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      val l = t(s, d, "lineitem")
      val sup = t(s, d, "supplier")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(sup, l("l_suppkey") === sup("s_suppkey"))
        .join(c, o("o_custkey") === c("c_custkey") &&
          c("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(dsum(discPriceDec).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_scan_project_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_quantity < 10
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_values" ->
      """SELECT * FROM (VALUES (CAST(1 AS BIGINT), 'add'), (2, 'remove'),
        | (3, 'metaData'), (4, 'protocol')) AS t(id, action) ORDER BY id""".stripMargin,

    "q_filter_3vl" ->
      """SELECT doc_id, nc FROM (
        |  SELECT doc_id, CASE WHEN source = 'src0' THEN NULL ELSE n_chars END AS nc
        |  FROM documents) WHERE nc > 200 ORDER BY doc_id""".stripMargin,

    "q_agg_minmax" ->
      """SELECT l_returnflag, l_linestatus,
        |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        |  min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
        |  count(*) AS num_records
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_max_by" ->
      """SELECT user_id, max_by(event_type, event_id) AS last_type,
        |  min_by("value", event_id) AS first_val,
        |  max(event_id) AS last_event_id
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 150000.0)
        |ORDER BY c_custkey""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_union_all" ->
      """SELECT key, src FROM (
        |  SELECT o_orderkey AS key, 'pending' AS src FROM orders
        |  WHERE o_orderstatus = 'P'
        |  UNION ALL
        |  SELECT l_orderkey AS key, 'bigline' AS src FROM lineitem
        |  WHERE l_quantity >= 49) ORDER BY key, src""".stripMargin,

    "q_expr_ops" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1.0 - l_discount) AS disc_price,
        |  l_orderkey // 7 AS div7,
        |  coalesce(nullif(l_returnflag, 'N'), 'none') AS flag_or_none,
        |  CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
        |  nullif(l_tax, 0.0) IS NULL AS tax_is_zero,
        |  l_returnflag IS DISTINCT FROM l_linestatus AS flag_ne_status
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_parse_json" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "q_in_list" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag,
        |  list_contains(['F'], l_linestatus) AS status_f
        |FROM lineitem WHERE l_returnflag IN ('A', 'R')
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_log_replay_dedup" ->
      """SELECT * FROM (
        |  SELECT user_id, max_by(event_type, event_id) AS last_type,
        |    max(event_id) AS last_version
        |  FROM events GROUP BY user_id)
        |WHERE last_type <> 'error' ORDER BY user_id""".stripMargin,

    "q_net_changes" ->
      """SELECT user_id, event_type,
        |  min_by("value", event_id) AS first_val,
        |  max_by("value", event_id) AS last_val,
        |  count(*) AS n
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,

    "q_asof_join" ->
      """WITH p AS (
        |  SELECT user_id, ts, max(event_id) AS p_event_id,
        |    max_by("value", event_id) AS p_value
        |  FROM events WHERE event_type = 'purchase'
        |  GROUP BY user_id, ts)
        |SELECT e.event_id, e.user_id, p.p_event_id, p.p_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') e
        |ASOF LEFT JOIN p
        |  ON e.user_id = p.user_id AND e.ts >= p.ts
        |ORDER BY e.event_id""".stripMargin,

    "q_range_join" ->
      """SELECT e.event_id, count(*) AS n,
        |  min(r.event_id) AS min_match_id, max(r."value") AS max_val
        |FROM events e JOIN events r ON r.user_id = e.user_id
        |  AND r.ts >= e.ts - INTERVAL 24 HOUR AND r.ts < e.ts
        |WHERE e.event_type = 'error'
        |GROUP BY e.event_id ORDER BY e.event_id""".stripMargin,

    "q_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR ts - lag(ts) OVER w > INTERVAL 6 HOUR
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |y AS (
        |  SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |    AS session_idx
        |  FROM x)
        |SELECT user_id, session_idx, count(*) AS n,
        |  min(event_id) AS min_eid, max(event_id) AS max_eid,
        |  epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
        |FROM y GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,

    "q_skew_join" ->
      """SELECT e.event_id, e.user_id, e.event_type, c.c_name
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |ORDER BY e.event_id""".stripMargin,

    "q_stream_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR ts - lag(ts) OVER w > INTERVAL 6 HOUR
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |y AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sidx
        |  FROM x)
        |SELECT user_id, epoch_us(min(ts)) AS start_us,
        |  count(*) AS n, min(event_id) AS min_eid,
        |  max(event_id) AS max_eid,
        |  epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
        |FROM y GROUP BY user_id, sidx
        |ORDER BY user_id, start_us""".stripMargin,

    "q_funnel" ->
      """WITH a AS (
        |  SELECT user_id, event_type, ts,
        |    min(CASE WHEN event_type = 'signup' THEN ts END)
        |      OVER (PARTITION BY user_id) AS t1
        |  FROM events),
        |b AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1
        |      THEN ts END) OVER (PARTITION BY user_id) AS t2
        |  FROM a),
        |c AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2
        |      THEN ts END) OVER (PARTITION BY user_id) AS t3
        |  FROM b)
        |SELECT user_id,
        |  CAST(CASE WHEN t3 IS NOT NULL THEN 3
        |       WHEN t2 IS NOT NULL THEN 2
        |       WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage,
        |  CASE WHEN t3 IS NOT NULL THEN epoch_us(t3) - epoch_us(t1) END
        |    AS funnel_us
        |FROM (SELECT DISTINCT user_id, t1, t2, t3 FROM c)
        |ORDER BY user_id""".stripMargin,

    "q_window_agg" ->
      """SELECT make_timestamp((epoch_us(ts) // 3600000000)
        |    * 3600000000) AS window_start,
        |  event_type, count(*) AS n,
        |  CAST(SUM(CAST("value" AS DECIMAL(10,2))) AS DOUBLE) AS sum_val
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM($discPriceDec) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM($chargeDec) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_top_revenue" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(SUM($discPriceDec) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q5_region_revenue" ->
      s"""SELECT n_name,
        |  CAST(SUM($discPriceDec) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin
  )
}
