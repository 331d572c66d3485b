package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** End-to-end Delta table round trips: each query writes a fresh Delta
  * table (our Transaction/commit path) into a temp dir from the TPC-H-ish
  * corpus, then reads it back through our Snapshot/Scan path. The DuckDB
  * oracle sees only the plain parquet input — so a hash match proves the
  * whole write→log→replay→scan pipeline preserves the data exactly.
  *
  * Filled in as the delta core lands (SURVEY.md §7 M1-M5).
  */
object DeltaQueries {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracleSql: Map[String, String] = Map()
}
