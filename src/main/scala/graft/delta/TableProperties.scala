package graft.delta

/** Typed accessors for the reference's table-property surface
  * (kernel/src/table_properties/mod.rs:27-64 constants +
  * deserialize.rs parsing). Every getter takes the table [[Metadata]]
  * so property resolution is always snapshot-consistent.
  */
object TableProperties {

  val TARGET_FILE_SIZE = "delta.targetFileSize"
  val RANDOMIZE_FILE_PREFIXES = "delta.randomizeFilePrefixes"
  val RANDOM_PREFIX_LENGTH = "delta.randomPrefixLength"
  val CHECKPOINT_POLICY = "delta.checkpointPolicy"
  val WRITE_STATS_AS_JSON = "delta.checkpoint.writeStatsAsJson"
  val WRITE_STATS_AS_STRUCT = "delta.checkpoint.writeStatsAsStruct"
  val PARQUET_COMPRESSION = "delta.parquet.compression.codec"
  val SET_TRANSACTION_RETENTION = "delta.setTransactionRetentionDuration"
  val ISOLATION_LEVEL = "delta.isolationLevel"

  private def bool(m: Metadata, k: String, default: Boolean): Boolean =
    m.configuration.get(k).map(_.equalsIgnoreCase("true")).getOrElse(default)

  /** Parse a byte-size property: a raw byte count (`134217728`) or a
    * suffixed size (`128mb`, `1g`) — delta-spark accepts both forms.
    */
  private[delta] def parseSize(s: String): Long = {
    val t = s.trim.toLowerCase
    val m = raw"(\d+)\s*([kmgt]?b?)".r
    t match {
      case m(n, suffix) =>
        val mult = suffix.stripSuffix("b") match {
          case ""  => 1L
          case "k" => 1L << 10
          case "m" => 1L << 20
          case "g" => 1L << 30
          case "t" => 1L << 40
        }
        n.toLong * mult
      case _ => throw new IllegalArgumentException(
        s"cannot parse size '$s' (expected bytes or <n>[kmgt]b)")
    }
  }

  /** Parse delta's `interval N (hours|days|weeks|...)` duration form
    * to milliseconds (the log/tombstone/txn retention syntax).
    */
  private[delta] def parseInterval(s: String): Option[Long] =
    raw"(?i)interval\s+(\d+)\s+(\w+)".r.findFirstMatchIn(s).flatMap { mm =>
      val n = mm.group(1).toLong
      mm.group(2).toLowerCase.stripSuffix("s") match {
        case "millisecond"        => Some(n)
        case "second"             => Some(n * 1000L)
        case "minute"             => Some(n * 60000L)
        case "hour"               => Some(n * 3600000L)
        case "day"                => Some(n * 86400000L)
        case "week"               => Some(n * 7L * 86400000L)
        case _                    => None
      }
    }

  /** Bin-size target for OPTIMIZE / auto-compaction; None = engine
    * default (128 MB).
    */
  def targetFileSize(m: Metadata): Option[Long] =
    m.configuration.get(TARGET_FILE_SIZE).map(parseSize)

  /** Object-store key-prefix randomization (S3 hot-prefix sharding at
    * ingest scale): data files land under `<random>/<name>` instead of
    * one shared prefix, spreading request load across the store's
    * partition space.
    */
  def randomizeFilePrefixes(m: Metadata): Boolean =
    bool(m, RANDOMIZE_FILE_PREFIXES, default = false)

  def randomPrefixLength(m: Metadata): Int =
    m.configuration.get(RANDOM_PREFIX_LENGTH)
      .flatMap(s => scala.util.Try(s.trim.toInt).toOption)
      .filter(_ > 0).getOrElse(2)

  /** `classic` (default) or `v2` — which checkpoint format the table's
    * checkpoints use (delta protocol checkpointPolicy; v2 requires the
    * v2Checkpoint feature, auto-enabled on first V2 write).
    */
  def checkpointPolicy(m: Metadata): String =
    m.configuration.get(CHECKPOINT_POLICY).map(_.trim.toLowerCase)
      .getOrElse("classic")

  /** Checkpoint add entries carry the JSON `stats` string (default on)
    * and/or the typed `stats_parsed` struct. Disabling JSON while the
    * struct is also off would strip every stat from the checkpoint, so
    * that combination is rejected at the checkpoint writer.
    */
  def writeStatsAsJson(m: Metadata): Boolean =
    bool(m, WRITE_STATS_AS_JSON, default = true)

  def writeStatsAsStruct(m: Metadata): Boolean =
    bool(m, WRITE_STATS_AS_STRUCT, default = false)

  /** Parquet codec for data-file writes (e.g. `snappy`, `zstd`,
    * `gzip`); None = Spark session default.
    */
  def parquetCompression(m: Metadata): Option[String] =
    m.configuration.get(PARQUET_COMPRESSION).map(_.trim.toLowerCase)

  /** How long `txn` idempotency markers are retained before checkpoint
    * reconciliation drops them (reference SetTransaction::is_expired,
    * actions/mod.rs:1055-1068). None = keep forever.
    */
  def setTransactionRetentionMillis(m: Metadata): Option[Long] =
    m.configuration.get(SET_TRANSACTION_RETENTION).flatMap(parseInterval)

  /** `WriteSerializable` (default) or `Serializable`. Under
    * Serializable, a blind append refuses to rebase past a concurrent
    * commit that REMOVED data: serializing the append before the
    * delete would change which rows the delete saw, so the reordering
    * both levels rely on is no longer sound. WriteSerializable keeps
    * delta's default behavior (blind appends commute with anything).
    */
  def isolationLevel(m: Metadata): String = {
    val lvl = m.configuration.get(ISOLATION_LEVEL)
      .map(_.trim).getOrElse("WriteSerializable")
    require(lvl.equalsIgnoreCase("WriteSerializable") ||
        lvl.equalsIgnoreCase("Serializable"),
      s"unsupported $ISOLATION_LEVEL '$lvl'")
    lvl
  }

  def serializableIsolation(m: Metadata): Boolean =
    isolationLevel(m).equalsIgnoreCase("Serializable")
}
