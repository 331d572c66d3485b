package graft.delta

import org.apache.spark.sql.types._

/** IcebergCompatV3 invariants and materialized partition columns
  * (reference kernel/src/table_features/iceberg_compat/{mod,v3}.rs;
  * table_configuration.rs:510-530 should_materialize_partition_columns
  * and :900-907 requires_stats_num_records).
  *
  * The reference validates V3 whenever a TableConfiguration is built
  * (table_configuration.rs:235), so both reads and writes of a
  * violating table fail fast; we mirror that from Snapshot.gated and
  * DeltaTable.create.
  */
object IcebergCompat {

  val V3_KEY = "delta.enableIcebergCompatV3"
  val V3_FEATURE = "icebergCompatV3"
  val MATERIALIZE_FEATURE = "materializePartitionColumns"

  /** Deprecated nested-ids field-metadata key rejected under V3
    * (reference iceberg_compat/mod.rs:129-148; delta-io/delta#6688).
    */
  val LEGACY_NESTED_IDS_KEY = "parquet.field.nested.ids"
  val NESTED_IDS_KEY = "delta.columnMapping.nestedIds"

  /** Enabled = feature supported in the protocol AND the table property
    * set (reference table_configuration.rs:890-899 is_feature_enabled +
    * ICEBERG_COMPAT_V3_INFO's EnabledIf check).
    */
  def v3Enabled(p: Protocol, m: graft.delta.Metadata): Boolean =
    TableFeatures.supportsWriterFeature(p, V3_FEATURE) &&
      m.configuration.get(V3_KEY).exists(_.equalsIgnoreCase("true"))

  /** Partition values must ALSO be written into the data files when the
    * materializePartitionColumns feature or IcebergCompatV3 is enabled
    * (reference table_configuration.rs:510-523).
    */
  def materializePartitionColumns(p: Protocol, m: graft.delta.Metadata): Boolean =
    TableFeatures.supportsWriterFeature(p, MATERIALIZE_FEATURE) ||
      v3Enabled(p, m)

  /** AddFile stats must carry a non-null numRecords under V3
    * (reference table_configuration.rs:900-907).
    */
  def requiresStatsNumRecords(p: Protocol, m: graft.delta.Metadata): Boolean =
    v3Enabled(p, m)

  /** Validate the V3 invariants; no-op when V3 is not enabled. Throws
    * IllegalArgumentException naming the offending column otherwise.
    */
  def validateV3(p: Protocol, m: graft.delta.Metadata, schema: StructType): Unit = {
    if (!v3Enabled(p, m)) return
    // feature requirements (ICEBERG_COMPAT_V3_INFO:464-473): column
    // mapping and row tracking must be ENABLED, not merely supported
    require(ColumnMapping.mode(m) != "none",
      s"$V3_FEATURE requires column mapping (name or id mode)")
    require(m.configuration.get(RowTracking.ENABLED_KEY)
        .exists(_.equalsIgnoreCase("true")),
      s"$V3_FEATURE requires row tracking " +
        s"(${RowTracking.ENABLED_KEY}=true)")
    offendingType(schema).foreach { o =>
      throw new IllegalArgumentException(
        s"$V3_FEATURE does not support type at column: $o")
    }
    legacyNestedIds(schema).foreach { o =>
      throw new IllegalArgumentException(
        s"field `$o` carries deprecated `$LEGACY_NESTED_IDS_KEY` " +
          s"metadata; use `$NESTED_IDS_KEY` instead")
    }
  }

  /** V3 type allowlist (reference v3.rs:23-44 is_v3_supported_type):
    * the Iceberg-representable primitives plus nested and variant
    * types. Notably EXCLUDES void/null and interval types.
    */
  private def isV3Supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | BooleanType | BinaryType | StringType | DateType |
         TimestampType | TimestampNTZType => true
    case _: DecimalType => true
    case _: ArrayType | _: MapType | _: StructType => true
    case _: VariantType => true
    case _ => false
  }

  /** First unsupported field as `dotted.path (type)` — the walk descends
    * arrays as `element`, maps as `key`/`value` (reference
    * iceberg_compat/mod.rs:53-127 TypeAllowListVisitor).
    */
  private[delta] def offendingType(schema: StructType): Option[String] = {
    def walk(path: Seq[String], dt: DataType): Option[String] =
      if (!isV3Supported(dt))
        Some(s"${path.mkString(".")} (${dt.simpleString})")
      else dt match {
        case st: StructType =>
          st.fields.iterator
            .flatMap(f => walk(path :+ f.name, f.dataType))
            .nextOption()
        case at: ArrayType => walk(path :+ "element", at.elementType)
        case mt: MapType =>
          walk(path :+ "key", mt.keyType)
            .orElse(walk(path :+ "value", mt.valueType))
        case _ => None
      }
    schema.fields.iterator
      .flatMap(f => walk(Seq(f.name), f.dataType))
      .nextOption()
  }

  /** First field (dotted path) carrying the deprecated
    * `parquet.field.nested.ids` metadata key.
    */
  private[delta] def legacyNestedIds(schema: StructType): Option[String] = {
    def walk(path: Seq[String], f: StructField): Option[String] =
      if (f.metadata.contains(LEGACY_NESTED_IDS_KEY))
        Some(path.mkString("."))
      else f.dataType match {
        case st: StructType =>
          st.fields.iterator
            .flatMap(c => walk(path :+ c.name, c))
            .nextOption()
        case _ => None
      }
    schema.fields.iterator
      .flatMap(f => walk(Seq(f.name), f))
      .nextOption()
  }
}
