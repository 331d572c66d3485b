package graft.delta

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Feature-dependency matrix (reference table_configuration.rs
  * test_adaptive_metadata_feature_requirements /
  * test_iceberg_compat_* mutual-exclusion rstest cases) plus the
  * adaptiveMetadata manifest-commit action model
  * (actions/mod.rs test_checkpoint_action_schema / _root_filemeta).
  */
class FeatureRequirementsSpec extends AnyFunSuite {

  private val AM = FeatureRequirements.ADAPTIVE_METADATA

  /** adaptiveMetadata-preview's full dependency closure. */
  private val amDeps = Seq("columnMapping", "deletionVectors",
    "rowTracking", "domainMetadata", "inCommitTimestamp")

  private val amProps = Map(
    "delta.columnMapping.mode" -> "id",
    "delta.enableDeletionVectors" -> "true",
    "delta.enableRowTracking" -> "true",
    "delta.enableInCommitTimestamps" -> "true")

  private val rwFeatures = Set("columnMapping", "deletionVectors", AM)

  private def protocolFor(deps: Seq[String]): Protocol = {
    val writer = AM +: deps
    val reader = (AM +: deps).filter(rwFeatures.contains)
    Protocol(3, 7, Some(reader), Some(writer))
  }

  private def meta(config: Map[String, String]): graft.delta.Metadata =
    graft.delta.Metadata("id0", None, None, Format(),
      """{"type":"struct","fields":[{"name":"a","type":"integer","nullable":true,"metadata":{}}]}""",
      Nil, config, None)

  private def check(deps: Seq[String], config: Map[String, String]): Unit =
    FeatureRequirements.validate(protocolFor(deps), meta(config), AM)

  test("adaptiveMetadata: all dependencies satisfied passes") {
    check(amDeps, amProps)
  }

  test("adaptiveMetadata: column mapping in name mode rejected") {
    val e = intercept[IllegalArgumentException] {
      check(amDeps, amProps + ("delta.columnMapping.mode" -> "name"))
    }
    assert(e.getMessage.contains("column mapping in 'id' mode"))
  }

  test("adaptiveMetadata: columnMapping feature absent fires first") {
    val e = intercept[IllegalArgumentException] {
      check(amDeps.filterNot(_ == "columnMapping"), amProps)
    }
    assert(e.getMessage.contains("requires 'columnMapping' to be enabled"))
  }

  test("adaptiveMetadata: each unset enabling property is rejected") {
    for ((prop, feat) <- Seq(
        "delta.enableRowTracking" -> "rowTracking",
        "delta.enableDeletionVectors" -> "deletionVectors",
        "delta.enableInCommitTimestamps" -> "inCommitTimestamp")) {
      val e = intercept[IllegalArgumentException] {
        check(amDeps, amProps - prop)
      }
      assert(e.getMessage.contains(s"requires '$feat' to be enabled"),
        s"missing $prop: ${e.getMessage}")
    }
  }

  test("adaptiveMetadata: domainMetadata not supported rejected") {
    val e = intercept[IllegalArgumentException] {
      check(amDeps.filterNot(_ == "domainMetadata"), amProps)
    }
    assert(e.getMessage.contains("requires 'domainMetadata' to be enabled"))
  }

  test("adaptiveMetadata: rowTracking suspended counts as not enabled") {
    val e = intercept[IllegalArgumentException] {
      check(amDeps, amProps + ("delta.rowTrackingSuspended" -> "true"))
    }
    assert(e.getMessage.contains("requires 'rowTracking' to be enabled"))
  }

  test("reader-writer feature missing from reader list is not supported") {
    // adaptiveMetadata-preview declared writer-only: not supported, so
    // validateEnabled skips it entirely (the reference counts RW
    // features only when both lists carry them)
    val p = Protocol(3, 7,
      Some(amDeps.filter(rwFeatures.contains)), Some(AM +: amDeps))
    assert(!FeatureRequirements.isSupported(p, AM))
    FeatureRequirements.validateEnabled(p, meta(amProps)) // no throw
  }

  // ---- icebergCompat pairwise exclusion (table_features/mod.rs:410-476)

  private def icebergProtocol(feats: Seq[String]): Protocol =
    Protocol(3, 7,
      Some(feats.filter(Set("columnMapping", "deletionVectors"))),
      Some(feats))

  test("icebergCompatV2 active alongside V3 is rejected") {
    val p = icebergProtocol(
      Seq("icebergCompatV2", "icebergCompatV3", "columnMapping",
        "rowTracking", "domainMetadata"))
    val m = meta(Map(
      "delta.columnMapping.mode" -> "name",
      "delta.enableIcebergCompatV2" -> "true",
      "delta.enableIcebergCompatV3" -> "true",
      "delta.enableRowTracking" -> "true"))
    val e = intercept[IllegalArgumentException] {
      FeatureRequirements.validate(p, m, "icebergCompatV2")
    }
    assert(e.getMessage.contains("'icebergCompatV3' to not be enabled"))
  }

  test("icebergCompatV1 rejects deletionVectors even when dormant") {
    // V1 demands NotSupported(deletionVectors): mere declaration
    // (property unset) already violates
    val p = icebergProtocol(
      Seq("icebergCompatV1", "columnMapping", "deletionVectors"))
    val m = meta(Map(
      "delta.columnMapping.mode" -> "name",
      "delta.enableIcebergCompatV1" -> "true"))
    val e = intercept[IllegalArgumentException] {
      FeatureRequirements.validate(p, m, "icebergCompatV1")
    }
    assert(e.getMessage.contains("'deletionVectors' to not be supported"))
  }

  test("icebergCompatV2 tolerates dormant V1, rejects active DVs") {
    // V2 uses NotEnabled for its siblings: a supported-but-inactive V1
    // is fine; an ACTIVE deletionVectors property is not
    val base = Seq("icebergCompatV2", "icebergCompatV1", "columnMapping",
      "deletionVectors")
    val ok = meta(Map(
      "delta.columnMapping.mode" -> "name",
      "delta.enableIcebergCompatV2" -> "true"))
    FeatureRequirements.validate(icebergProtocol(base), ok, "icebergCompatV2")
    val e = intercept[IllegalArgumentException] {
      FeatureRequirements.validate(icebergProtocol(base),
        meta(ok.configuration + ("delta.enableDeletionVectors" -> "true")),
        "icebergCompatV2")
    }
    assert(e.getMessage.contains("'deletionVectors' to not be enabled"))
  }

  test("rowTracking requires domainMetadata in the protocol") {
    val p = Protocol(3, 7, Some(Nil), Some(Seq("rowTracking")))
    val e = intercept[IllegalArgumentException] {
      FeatureRequirements.validate(p, meta(Map.empty), "rowTracking")
    }
    assert(e.getMessage.contains("'domainMetadata' to be supported"))
  }

  test("catalogManaged requires inCommitTimestamp enabled") {
    val p = Protocol(3, 7, Some(Seq("catalogManaged")),
      Some(Seq("catalogManaged")))
    val e = intercept[IllegalArgumentException] {
      FeatureRequirements.validate(p, meta(Map.empty), "catalogManaged")
    }
    assert(e.getMessage.contains("'inCommitTimestamp' to be enabled"))
  }

  test("CREATE with an enabled feature whose dependency is unmet fails") {
    val spark = TestSpark.spark
    val dir = TestSpark.tmpDir("featreq")
    val schema = new StructType().add("k", LongType)
    // icebergCompatV2 via the explicit-feature convention + property,
    // but no column mapping: must fail BEFORE writing commit 0
    val e = intercept[IllegalArgumentException] {
      DeltaTable.create(spark, dir, schema, configuration = Map(
        "delta.feature.icebergCompatV2" -> "supported",
        "delta.enableIcebergCompatV2" -> "true"))
    }
    assert(e.getMessage.contains("'columnMapping' to be enabled"))
    assert(!new java.io.File(s"$dir/_delta_log/" +
      "00000000000000000000.json").exists)
  }

  test("SET TBLPROPERTIES enabling an unmet feature fails pre-commit") {
    val spark = TestSpark.spark
    val dir = TestSpark.tmpDir("alterreq")
    val schema = new StructType().add("k", LongType)
    DeltaTable.create(spark, dir, schema)
    val t = DeltaTable.forPath(spark, dir)
    val pre = t.snapshot().version
    val e = intercept[IllegalArgumentException] {
      t.setProperties(Map(
        "delta.feature.icebergCompatV2" -> "supported",
        "delta.enableIcebergCompatV2" -> "true"))
    }
    // the explicit-feature convention only applies at CREATE; enabling
    // the property alone must still fail the dependency check, and
    // nothing may have committed — the table stays readable
    assert(e.getMessage.contains("columnMapping") ||
      e.getMessage.contains("icebergCompat"))
    assert(t.snapshot().version == pre)
    assert(t.toDF.count() == 0)
  }

  // ---- adaptiveMetadata manifest-commit action model -----------------

  private def sampleAction: AdaptiveMetadata.CheckpointAction =
    AdaptiveMetadata.CheckpointAction(
      version = 42L,
      contentRoot = AdaptiveMetadata.ContentRoot(
        "metadata/root-42.avro", 1024L, 42L),
      protocol = Protocol(3, 7, Some(Seq(AM)), Some(Seq(AM))),
      metadata = meta(amProps),
      transactions = Seq(SetTransaction("app1", 7L, Some(123L))),
      domainMetadata = Seq(DomainMetadata("d1", """{"k":"v"}""", false)),
      txnSidecars = Seq(Sidecar("sc-txn.parquet", 10L, 0L)),
      domainMetadataSidecars = Seq(Sidecar("sc-dm.parquet", 20L, 0L)))

  test("checkpoint action JSON round-trips through write + parse") {
    val line = AdaptiveMetadata.writeCheckpointAction(sampleAction)
    val parsed = AdaptiveMetadata.parseCheckpointAction(line)
    assert(parsed.contains(sampleAction))
  }

  test("a line without a checkpoint action parses to None") {
    assert(AdaptiveMetadata.parseCheckpointAction(
      """{"commitInfo":{"timestamp":1}}""").isEmpty)
  }

  test("contentRoot.version above checkpointMetadata.version rejected") {
    val bad = AdaptiveMetadata.writeCheckpointAction(sampleAction.copy(
      contentRoot = sampleAction.contentRoot.copy(version = 43L)))
    val e = intercept[IllegalArgumentException] {
      AdaptiveMetadata.parseCheckpointAction(bad)
    }
    assert(e.getMessage.contains("exceeds"))
  }

  test("standalone-checkpoint shape: contentRoot.version strictly less") {
    val standalone = sampleAction.copy(
      contentRoot = sampleAction.contentRoot.copy(version = 40L))
    val line = AdaptiveMetadata.writeCheckpointAction(standalone)
    assert(AdaptiveMetadata.parseCheckpointAction(line)
      .contains(standalone))
  }

  test("unknown sidecar type fails fast") {
    val line = """{"checkpoint":[
      {"checkpointMetadata":{"version":1}},
      {"contentRoot":{"path":"r","sizeInBytes":1,"version":1}},
      {"protocol":{"minReaderVersion":3,"minWriterVersion":7}},
      {"metaData":{"id":"x","format":{"provider":"parquet"},
        "schemaString":"{\"type\":\"struct\",\"fields\":[]}",
        "partitionColumns":[],"configuration":{}}},
      {"sidecar":{"type":"mystery","path":"p","sizeInBytes":1,
        "modificationTime":0}}]}""".replaceAll("\n\\s*", "")
    val e = intercept[IllegalArgumentException] {
      AdaptiveMetadata.parseCheckpointAction(line)
    }
    assert(e.getMessage.contains("unknown checkpoint sidecar type"))
  }

  test("missing mandatory elements fail fast, not read-as-empty") {
    val noRoot = """{"checkpoint":[
      {"checkpointMetadata":{"version":1}},
      {"protocol":{"minReaderVersion":1,"minWriterVersion":2}},
      {"metaData":{"id":"x","format":{"provider":"parquet"},
        "schemaString":"{\"type\":\"struct\",\"fields\":[]}",
        "partitionColumns":[],"configuration":{}}}]}"""
      .replaceAll("\n\\s*", "")
    val e = intercept[IllegalArgumentException] {
      AdaptiveMetadata.parseCheckpointAction(noRoot)
    }
    assert(e.getMessage.contains("missing contentRoot"))
  }

  // ---- ContentRoot path resolution (actions/mod.rs:1151-1219) --------

  test("RFC 3986 scheme detection") {
    import AdaptiveMetadata.hasScheme
    assert(hasScheme("s3://bucket/k"))
    assert(hasScheme("file:/tmp/x"))
    assert(hasScheme("a+b-c.d:rest"))
    assert(!hasScheme("metadata/root.avro")) // no colon before '/'
    assert(!hasScheme("3s://x"))             // scheme must start ALPHA
    assert(!hasScheme(":oops"))              // empty scheme
    assert(!hasScheme("dir with space:x"))   // non-scheme char
    assert(!hasScheme("relative.avro"))      // no colon at all
    assert(!hasScheme("ünicode:x"))          // US-ASCII only
  }

  test("relative contentRoot concatenates onto the table root") {
    val cr = AdaptiveMetadata.ContentRoot("meta/root%20raw.avro", 1L, 1L)
    // NOT percent-decoded (unlike Add/Remove paths)
    assert(cr.resolve("s3://b/table") == "s3://b/table/meta/root%20raw.avro")
    assert(cr.resolve("s3://b/table/") == "s3://b/table/meta/root%20raw.avro")
  }

  test("absolute contentRoot is used as-is") {
    val cr = AdaptiveMetadata.ContentRoot("s3://other/root.avro", 1L, 1L)
    assert(cr.resolve("s3://b/table") == "s3://other/root.avro")
  }
}
