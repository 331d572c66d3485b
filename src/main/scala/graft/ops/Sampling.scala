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

  /** Deterministic train/valid/test split assignment: each row's hash
    * coordinate falls into the first cumulative-rate bucket, appended
    * as a `split` column. The same key always lands in the same split
    * (stable across engines, runs, re-shards — the property that stops
    * eval data leaking into training when the corpus is re-processed),
    * and splits drawn from overlapping corpora agree on shared keys.
    * Scale: pure narrow projection, fully codegen'd.
    */
  def splitAssign(df: DataFrame, key: Column,
      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty, "at least one split")
    require(splits.forall(_._2 >= 0), "negative split rate")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9,
      s"split rates must sum to 1, got $total")
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    val coord = hashCoord(key)
    // the last split takes everything remaining — float-sum drift must
    // never leave a row unlabeled
    val label = splits.init.zip(cum.init).foldRight(
        lit(splits.last._1): Column) { case (((name, _), c), acc) =>
      when(coord < lit(hexThreshold(math.min(c, 1.0))), lit(name))
        .otherwise(acc)
    }
    df.withColumn("split", label)
  }

  /** Epoch-replicated weighted mixture — the "data mixing" step of a
    * training pipeline, where weights may EXCEED 1: a group with
    * weight w contributes floor(w) full copies of itself (epochs
    * 0..floor(w)-1) plus a deterministically hash-sampled fraction at
    * the final epoch. w = 2.5 means every row twice and a reproducible
    * half of rows a third time. The keep decision hashes (key, epoch),
    * so fractional epochs are independent samples yet stable across
    * engines, runs and cluster sizes. Scale: an explode over
    * ≤ceil(w) ints plus a narrow filter — no shuffle, no RNG; output
    * cardinality is w × input within hash tolerance.
    */
  def mixture(df: DataFrame, key: Column, group: Column,
      weights: Map[String, Double], defaultWeight: Double): DataFrame = {
    (weights.values.toSeq :+ defaultWeight).foreach(w =>
      require(w >= 0 && w <= 64, s"mixture weight $w out of [0, 64]"))
    def chain(f: Double => Column): Column =
      weights.foldLeft(f(defaultWeight)) { case (acc, (value, w)) =>
        when(group === value, f(w)).otherwise(acc)
      }
    val fullCopies = chain(w => lit(math.floor(w).toInt))
    val numEpochs = chain(w => lit(math.ceil(w).toInt))
    val fracThr = chain(w => lit(hexThreshold(w - math.floor(w))))
    df.filter(numEpochs > 0)
      .withColumn("epoch", explode(sequence(lit(0), numEpochs - 1)))
      .filter(col("epoch") < fullCopies ||
        hashCoord(concat(key.cast("string"), lit(":"),
          col("epoch").cast("string"))) < fracThr)
  }
}
