package graft

import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

/** Guards the events-table schema normalization: the driver has shipped
  * events.ts both as parquet TIMESTAMP(NANOS) (int64 under nanosAsLong)
  * and as TIMESTAMP(MICROS, ntz); Tables.load must normalize either to a
  * UTC TimestampType so every events-backed query analyzes. Round 6 lost
  * four correctness rows (q_max_by, q_parse_json, q_log_replay_dedup,
  * q_net_changes) to exactly this drift.
  */
class TablesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("events.ts normalizes to TimestampType regardless of corpus annotation") {
    val df = Tables.load(spark, sf, "events")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.count() > 0)
  }

  test("all events-backed core queries analyze and return rows") {
    for (q <- Seq("q_max_by", "q_parse_json", "q_log_replay_dedup", "q_net_changes")) {
      val df = graft.queries.CoreQueries.queries(q)(spark, sf)
      assert(df.count() > 0, s"$q returned no rows")
    }
  }

  test("every registered table loads") {
    for (n <- Tables.names)
      assert(Tables.load(spark, sf, n).columns.nonEmpty, s"$n failed to load")
  }
}
