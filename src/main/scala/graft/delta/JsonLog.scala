package graft.delta

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.jdk.CollectionConverters._

/** Hand-rolled, protocol-exact JSON writer + Jackson-tree reader for log
  * actions. Writing is explicit (field order, None omission, escaping) so
  * the commit bytes we produce are stable and spec-shaped; driver-side
  * reads (P&M replay, _last_checkpoint) go through Jackson's tree API.
  * (reference: kernel/src/actions/mod.rs serde derives)
  */
object JsonLog {

  // ---------- writing ----------
  def esc(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '"'  => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.toString
  }

  private def jstr(s: String): String = "\"" + esc(s) + "\""

  private def jmap(m: Map[String, String]): String =
    m.map { case (k, v) =>
      jstr(k) + ":" + (if (v == null) "null" else jstr(v))
    }.mkString("{", ",", "}")

  private def jarr(a: Seq[String]): String =
    a.map(jstr).mkString("[", ",", "]")

  /** Builds an object from (name, Option[renderedValue]) pairs, omitting
    * absent fields.
    */
  private def obj(fields: (String, Option[String])*): String =
    fields.collect { case (k, Some(v)) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")

  def writeDv(dv: DeletionVectorDescriptor): String = obj(
    "storageType" -> Some(jstr(dv.storageType)),
    "pathOrInlineDv" -> Some(jstr(dv.pathOrInlineDv)),
    "offset" -> dv.offset.map(_.toString),
    "sizeInBytes" -> Some(dv.sizeInBytes.toString),
    "cardinality" -> Some(dv.cardinality.toString))

  def writeAdd(a: AddFile): String = obj(
    "path" -> Some(jstr(a.path)),
    "partitionValues" -> Some(jmap(a.partitionValues)),
    "size" -> Some(a.size.toString),
    "modificationTime" -> Some(a.modificationTime.toString),
    "dataChange" -> Some(a.dataChange.toString),
    "stats" -> a.stats.map(jstr),
    "tags" -> a.tags.map(jmap),
    "deletionVector" -> a.deletionVector.map(writeDv),
    "baseRowId" -> a.baseRowId.map(_.toString),
    "defaultRowCommitVersion" -> a.defaultRowCommitVersion.map(_.toString),
    "clusteringProvider" -> a.clusteringProvider.map(jstr))

  def writeRemove(r: RemoveFile): String = obj(
    "path" -> Some(jstr(r.path)),
    "deletionTimestamp" -> r.deletionTimestamp.map(_.toString),
    "dataChange" -> Some(r.dataChange.toString),
    "extendedFileMetadata" -> r.extendedFileMetadata.map(_.toString),
    "partitionValues" -> r.partitionValues.map(jmap),
    "size" -> r.size.map(_.toString),
    "stats" -> r.stats.map(jstr),
    "tags" -> r.tags.map(jmap),
    "deletionVector" -> r.deletionVector.map(writeDv),
    "baseRowId" -> r.baseRowId.map(_.toString),
    "defaultRowCommitVersion" -> r.defaultRowCommitVersion.map(_.toString))

  def writeMetadata(m: Metadata): String = obj(
    "id" -> Some(jstr(m.id)),
    "name" -> m.name.map(jstr),
    "description" -> m.description.map(jstr),
    "format" -> Some(obj(
      "provider" -> Some(jstr(m.format.provider)),
      "options" -> Some(jmap(m.format.options)))),
    "schemaString" -> Some(jstr(m.schemaString)),
    "partitionColumns" -> Some(jarr(m.partitionColumns)),
    "configuration" -> Some(jmap(m.configuration)),
    "createdTime" -> m.createdTime.map(_.toString))

  def writeProtocol(p: Protocol): String = obj(
    "minReaderVersion" -> Some(p.minReaderVersion.toString),
    "minWriterVersion" -> Some(p.minWriterVersion.toString),
    "readerFeatures" -> p.readerFeatures.map(jarr),
    "writerFeatures" -> p.writerFeatures.map(jarr))

  def writeTxn(t: SetTransaction): String = obj(
    "appId" -> Some(jstr(t.appId)),
    "version" -> Some(t.version.toString),
    "lastUpdated" -> t.lastUpdated.map(_.toString))

  def writeCommitInfo(c: CommitInfo): String = obj(
    "timestamp" -> Some(c.timestamp.toString),
    "operation" -> Some(jstr(c.operation)),
    "operationParameters" -> Some(jmap(c.operationParameters)),
    "engineInfo" -> c.engineInfo.map(jstr),
    "inCommitTimestamp" -> c.inCommitTimestamp.map(_.toString),
    "correlationId" -> c.correlationId.map(jstr))

  def writeCdc(c: AddCDCFile): String = obj(
    "path" -> Some(jstr(c.path)),
    "partitionValues" -> Some(jmap(c.partitionValues)),
    "size" -> Some(c.size.toString),
    "dataChange" -> Some(c.dataChange.toString))

  def writeSidecar(sc: Sidecar): String = obj(
    "path" -> Some(jstr(sc.path)),
    "sizeInBytes" -> Some(sc.sizeInBytes.toString),
    "modificationTime" -> Some(sc.modificationTime.toString),
    "tags" -> sc.tags.map(jmap))

  def writeCheckpointMetadata(c: CheckpointMetadata): String = obj(
    "version" -> Some(c.version.toString),
    "tags" -> c.tags.map(jmap))

  def writeDomainMetadata(d: DomainMetadata): String = obj(
    "domain" -> Some(jstr(d.domain)),
    "configuration" -> Some(jstr(d.configuration)),
    "removed" -> Some(d.removed.toString))

  /** One log line for a SingleAction. */
  def writeAction(a: SingleAction): String = {
    val wrapped: Seq[(String, Option[String])] = Seq(
      "txn" -> a.txn.map(writeTxn),
      "add" -> a.add.map(writeAdd),
      "remove" -> a.remove.map(writeRemove),
      "metaData" -> a.metaData.map(writeMetadata),
      "protocol" -> a.protocol.map(writeProtocol),
      "cdc" -> a.cdc.map(writeCdc),
      "commitInfo" -> a.commitInfo.map(writeCommitInfo),
      "domainMetadata" -> a.domainMetadata.map(writeDomainMetadata),
      "sidecar" -> a.sidecar.map(writeSidecar),
      "checkpointMetadata" -> a.checkpointMetadata.map(writeCheckpointMetadata))
    obj(wrapped: _*)
  }

  // ---------- reading (driver-side, Jackson tree) ----------
  val mapper = new ObjectMapper()

  def parseLine(line: String): JsonNode = mapper.readTree(line)

  private def optText(n: JsonNode, f: String): Option[String] =
    Option(n.get(f)).filterNot(_.isNull).map(_.asText)
  private def optLong(n: JsonNode, f: String): Option[Long] =
    Option(n.get(f)).filterNot(_.isNull).map(_.asLong)
  private def strMap(n: JsonNode): Map[String, String] =
    n.properties().asScala.map { e =>
      e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText)
    }.toMap

  def parseProtocol(n: JsonNode): Protocol = Protocol(
    n.get("minReaderVersion").asInt,
    n.get("minWriterVersion").asInt,
    Option(n.get("readerFeatures")).filterNot(_.isNull)
      .map(_.elements.asScala.map(_.asText).toSeq),
    Option(n.get("writerFeatures")).filterNot(_.isNull)
      .map(_.elements.asScala.map(_.asText).toSeq))

  def parseMetadata(n: JsonNode): Metadata = Metadata(
    id = n.get("id").asText,
    name = optText(n, "name"),
    description = optText(n, "description"),
    format = Option(n.get("format")).map(f => Format(
      Option(f.get("provider")).map(_.asText).getOrElse("parquet"),
      Option(f.get("options")).filterNot(_.isNull).map(strMap)
        .getOrElse(Map.empty))).getOrElse(Format()),
    schemaString = n.get("schemaString").asText,
    partitionColumns = Option(n.get("partitionColumns"))
      .map(_.elements.asScala.map(_.asText).toSeq).getOrElse(Nil),
    configuration = Option(n.get("configuration")).filterNot(_.isNull)
      .map(strMap).getOrElse(Map.empty),
    createdTime = optLong(n, "createdTime"))
}
