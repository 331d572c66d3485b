package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Engine-portable determinism: the keep/drop decision hashes the
  * ROW KEY with md5 and compares a fixed-width hex prefix against a
  * rate threshold — the same row is kept by every engine, every run,
  * every cluster size (no RNG, no seed plumbing, no partition-order
  * dependence). That makes samples reproducible AND joinable: a 10%
  * sample drawn today aligns with the 10% prefix of a 30% sample
  * drawn next month. Scale: a pure narrow filter — no shuffle, no
  * driver state, fully codegen'd.
  */
object Sampling {

  /** Hex threshold for `rate` over the first 8 md5 hex chars. */
  private[ops] def hexThreshold(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate $rate out of [0,1]")
    val t = math.min((rate * (1L << 32)).toLong, (1L << 32) - 1)
    f"$t%08x"
  }

  /** The md5-prefix of a key column, the unit-interval coordinate the
    * thresholds compare against.
    */
  def hashCoord(key: Column): Column =
    substring(md5(key.cast("string").cast("binary")), 1, 8)

  /** Keep rows whose hashed key falls under the stratum's rate.
    * `rates` maps stratum value → sampling rate; strata not listed use
    * `defaultRate`.
    */
  def stratified(df: DataFrame, key: Column, stratum: Column,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val threshold = rates.foldLeft(lit(hexThreshold(defaultRate))) {
      case (acc, (value, rate)) =>
        when(stratum === value, lit(hexThreshold(rate))).otherwise(acc)
    }
    df.filter(hashCoord(key) < threshold)
  }

  /** Uniform deterministic sample at `rate` keyed by `key`. */
  def uniform(df: DataFrame, key: Column, rate: Double): DataFrame =
    df.filter(hashCoord(key) < lit(hexThreshold(rate)))
}
