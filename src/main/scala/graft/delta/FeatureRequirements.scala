package graft.delta

/** Table-feature dependency validation (reference
  * kernel/src/table_features/mod.rs:257-268 `FeatureRequirement` and
  * kernel/src/table_configuration.rs:605-645
  * `validate_feature_requirements`).
  *
  * A feature is SUPPORTED when the protocol declares it (explicitly in
  * its feature lists, or implied by a legacy version); reader-writer
  * features must appear in BOTH lists to count. A feature is ENABLED
  * when it is supported AND its activating table property (if any) is
  * set (reference `EnablementCheck::EnabledIf` vs `AlwaysIfSupported`).
  *
  * The per-feature requirement tables mirror the reference's static
  * `FeatureInfo.feature_requirements` definitions, including the
  * adaptiveMetadata-preview rules from the adaptiveMetadata RFC
  * (delta-io/delta#6978; reference table_features/mod.rs:646-674) and
  * the icebergCompat V1/V2/V3 pairwise exclusions
  * (table_features/mod.rs:410-476).
  */
object FeatureRequirements {

  sealed trait Requirement
  /** Dependency must be declared in the protocol. */
  final case class Supported(feature: String) extends Requirement
  /** Dependency must be declared AND property-activated. */
  final case class Enabled(feature: String) extends Requirement
  /** Dependency must NOT be declared at all. */
  final case class NotSupported(feature: String) extends Requirement
  /** Dependency may be declared but must not be property-activated. */
  final case class NotEnabled(feature: String) extends Requirement
  /** Arbitrary check over (protocol, metadata); throws on violation. */
  final case class Custom(check: (Protocol, Metadata) => Unit)
      extends Requirement

  val ADAPTIVE_METADATA = "adaptiveMetadata-preview"

  /** Requirements per feature (reference table_features/mod.rs static
    * FeatureInfo table). Features absent here have no requirements.
    */
  val requirements: Map[String, Seq[Requirement]] = Map(
    // rowTracking + clustering both persist state in domain metadata
    // (mod.rs:385, :487)
    "rowTracking" -> Seq(Supported("domainMetadata")),
    "clustering" -> Seq(Supported("domainMetadata")),
    // icebergCompat V1/V2/V3 are pairwise mutually exclusive; V1/V2
    // exclude deletion vectors (V1 even their declaration), V3 permits
    // them (mod.rs:410-476)
    "icebergCompatV1" -> Seq(
      Enabled("columnMapping"),
      NotSupported("deletionVectors"),
      NotEnabled("icebergCompatV2"),
      NotEnabled("icebergCompatV3")),
    "icebergCompatV2" -> Seq(
      Enabled("columnMapping"),
      NotEnabled("icebergCompatV1"),
      NotEnabled("deletionVectors"),
      NotEnabled("icebergCompatV3")),
    "icebergCompatV3" -> Seq(
      Enabled("columnMapping"),
      Enabled("rowTracking"),
      NotEnabled("icebergCompatV1"),
      NotEnabled("icebergCompatV2")),
    // catalog-managed commit ordering rides on in-commit timestamps
    // (mod.rs:511, :524)
    "catalogManaged" -> Seq(Enabled("inCommitTimestamp")),
    "catalogOwned-preview" -> Seq(Enabled("inCommitTimestamp")),
    // adaptiveMetadata RFC "Table Feature Enablement" (mod.rs:652-674)
    ADAPTIVE_METADATA -> Seq(
      Enabled("columnMapping"),
      Custom((_, m) => require(ColumnMapping.mode(m) == "id",
        s"Feature '$ADAPTIVE_METADATA' requires column mapping in " +
          "'id' mode")),
      Enabled("rowTracking"),
      Enabled("domainMetadata"),
      Enabled("deletionVectors"),
      Enabled("inCommitTimestamp")))

  /** Reader-writer features must be declared in BOTH protocol lists to
    * count as supported (reference table_configuration.rs — "Reader+
    * writer features must appear in both protocol lists").
    */
  def isSupported(p: Protocol, feature: String): Boolean = {
    val inWriter = TableFeatures.supportsWriterFeature(p, feature)
    if (TableFeatures.readerWriterFeatures.contains(feature) ||
        feature == ADAPTIVE_METADATA)
      inWriter && (p.readerFeatures.map(_.contains(feature)).getOrElse(
        // legacy reader versions imply only columnMapping (reader 2+)
        feature == "columnMapping" && p.minReaderVersion >= 2))
    else inWriter
  }

  private def boolProp(m: Metadata, key: String): Boolean =
    m.configuration.get(key).exists(_.equalsIgnoreCase("true"))

  /** Enabled = supported + activating property set (reference
    * EnablementCheck::EnabledIf tables; features without an activating
    * property are AlwaysIfSupported).
    */
  def isEnabled(p: Protocol, m: Metadata, feature: String): Boolean =
    isSupported(p, feature) && (feature match {
      case "columnMapping"    => ColumnMapping.mode(m) != "none"
      case "deletionVectors"  => boolProp(m, "delta.enableDeletionVectors")
      case "rowTracking" =>
        boolProp(m, RowTracking.ENABLED_KEY) &&
          !boolProp(m, "delta.rowTrackingSuspended")
      case "inCommitTimestamp" =>
        boolProp(m, "delta.enableInCommitTimestamps")
      case "changeDataFeed"  => boolProp(m, "delta.enableChangeDataFeed")
      case "typeWidening" | "typeWidening-preview" =>
        boolProp(m, "delta.enableTypeWidening")
      case "appendOnly"      => boolProp(m, "delta.appendOnly")
      case "icebergCompatV1" => boolProp(m, "delta.enableIcebergCompatV1")
      case "icebergCompatV2" => boolProp(m, "delta.enableIcebergCompatV2")
      case "icebergCompatV3" => boolProp(m, IcebergCompat.V3_KEY)
      case _                 => true // AlwaysIfSupported
    })

  /** Validate one feature's requirements; throws IllegalArgumentException
    * with the reference's message shapes (table_configuration.rs:605-645).
    */
  def validate(p: Protocol, m: Metadata, feature: String): Unit =
    requirements.getOrElse(feature, Nil).foreach {
      case Supported(dep) => require(isSupported(p, dep),
        s"Feature '$feature' requires '$dep' to be supported")
      case Enabled(dep) => require(isEnabled(p, m, dep),
        s"Feature '$feature' requires '$dep' to be enabled")
      case NotSupported(dep) => require(!isSupported(p, dep),
        s"Feature '$feature' requires '$dep' to not be supported")
      case NotEnabled(dep) => require(!isEnabled(p, m, dep),
        s"Feature '$feature' requires '$dep' to not be enabled")
      case Custom(check) => check(p, m)
    }

  /** Validate every ENABLED feature's requirements — runs on every
    * table-configuration build (reference table_configuration.rs:235).
    * Only enabled features are checked: a merely-supported feature with
    * unmet dependencies is inert (the reference's enablement_check
    * gating), and historic tables legitimately carry dormant features.
    */
  def validateEnabled(p: Protocol, m: Metadata): Unit = {
    val declared =
      p.writerFeatures.getOrElse(Nil) ++ p.readerFeatures.getOrElse(Nil)
    declared.distinct
      .filter(f => requirements.contains(f) && isEnabled(p, m, f))
      .foreach(validate(p, m, _))
  }
}
