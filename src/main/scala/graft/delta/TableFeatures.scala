package graft.delta

/** Protocol/table-features helpers (reference:
  * kernel/src/table_features/mod.rs — feature gates and the legacy
  * version → implied-features mapping used on upgrade to the table-
  * features protocol (reader 3 / writer 7)).
  */
object TableFeatures {

  /** Writer features implied by a legacy minWriterVersion. */
  private val legacyWriterFeatures: Seq[(Int, String)] = Seq(
    2 -> "appendOnly", 2 -> "invariants",
    3 -> "checkConstraints",
    4 -> "changeDataFeed", 4 -> "generatedColumns",
    5 -> "columnMapping",
    6 -> "identityColumns")

  /** Reader features implied by a legacy minReaderVersion. */
  private val legacyReaderFeatures: Seq[(Int, String)] = Seq(
    2 -> "columnMapping")

  /** Upgrade `p` to the table-features protocol, preserving existing
    * explicit features AND the legacy features implied by the previous
    * reader/writer versions, then adding `addReader`/`addWriter`.
    */
  def upgraded(p: Protocol, addReader: Seq[String],
      addWriter: Seq[String]): Protocol = {
    val impliedW =
      if (p.writerFeatures.isDefined) Nil
      else legacyWriterFeatures.collect {
        case (v, f) if v <= p.minWriterVersion => f
      }
    val impliedR =
      if (p.readerFeatures.isDefined) Nil
      else legacyReaderFeatures.collect {
        case (v, f) if v <= p.minReaderVersion => f
      }
    Protocol(3, 7,
      Some((p.readerFeatures.getOrElse(Nil) ++ impliedR ++ addReader).distinct),
      Some((p.writerFeatures.getOrElse(Nil) ++ impliedW ++ addWriter).distinct))
  }

  /** Does the protocol support a feature (explicitly or via legacy
    * version implication)?
    */
  def supportsWriterFeature(p: Protocol, feature: String): Boolean =
    p.writerFeatures.map(_.contains(feature)).getOrElse(
      legacyWriterFeatures.exists { case (v, f) =>
        f == feature && v <= p.minWriterVersion
      })

  /** Writer features this engine implements unconditionally —
    * invariants / CHECK constraints / generated columns are ENFORCED at
    * write time (WriteValidation embeds them in the staging
    * projection), so tables using them are writable.
    */
  private val implementedWriterFeatures = Set(
    "appendOnly", "columnMapping", "deletionVectors", "changeDataFeed",
    "rowTracking", "domainMetadata", "v2Checkpoint", "inCommitTimestamp",
    // read-compat alias of timestampNtz carried by some existing
    // tables (reference table_features/mod.rs:148-156); new protocol
    // upgrades always write the canonical name
    "timestampNtz", "timestampWithoutTimezone",
    "variantType", "variantType-preview",
    "variantShredding", "variantShredding-preview",
    "typeWidening", "typeWidening-preview", "vacuumProtocolCheck",
    "invariants", "checkConstraints", "generatedColumns", "clustering",
    "identityColumns", "catalogManaged", "catalogOwned-preview",
    // column defaults are FILLED by the staging projection
    // (WriteValidation.prepare); iceberg V3 invariants are enforced by
    // IcebergCompat.validateV3 + materialized partition columns +
    // required numRecords stats in stageFiles
    // V1/V2 ship the type validation the reference defers
    // (table_features/mod.rs:400-440 TODO #1125): IcebergCompat
    // .validateV1/.validateV2 enforce the cited Delta Spark checks on
    // every configuration build, so declaring tables stay writable
    "allowColumnDefaults", "icebergCompatV1", "icebergCompatV2",
    "icebergCompatV3",
    "materializePartitionColumns", "geospatial")

  /** Reader-writer features: declaring one (e.g. via
    * `delta.feature.<name>=supported`) must land it in BOTH feature
    * lists — a reader that cannot interpret it would read the table
    * wrong (reference table_features/mod.rs ReaderWriterFeature).
    */
  val readerWriterFeatures = Set(
    "columnMapping", "deletionVectors", "timestampNtz",
    // the read-compat alias is reader-writer too: declaring it must
    // land it in BOTH lists or an external reader without NTZ support
    // would open the table unguarded
    "timestampWithoutTimezone",
    "typeWidening", "typeWidening-preview",
    "v2Checkpoint", "vacuumProtocolCheck",
    "variantType", "variantType-preview",
    "variantShredding", "variantShredding-preview",
    "catalogManaged", "catalogOwned-preview", "geospatial")

  /** Writer-side gate (reference table_features write gates): every
    * declared writer feature must be implemented. Returns the features
    * blocking writes.
    */
  def unsupportedWriterFeatures(p: Protocol,
      m: graft.delta.Metadata): Seq[String] = {
    val declared: Seq[String] = p.writerFeatures.getOrElse(
      legacyWriterFeatures.collect {
        case (v, f) if v <= p.minWriterVersion => f
      })
    declared.distinct.filterNot(implementedWriterFeatures.contains)
  }
}
