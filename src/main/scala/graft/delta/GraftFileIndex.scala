package graft.delta

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, BoundReference, Expression}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** A [[FileIndex]] backed by the log-replay file list (the
  * TahoeFileIndex pattern; reference: the declarative metadata scan plan
  * feeding the engine's scan, scan/mod.rs:1086-1107). The planner asks
  * THIS index for files instead of carrying N literal paths in the plan:
  *  - partition values come from the add actions' `partitionValues`,
  *    served as native partition columns — no per-file broadcast join
  *  - Catalyst's partition filters are evaluated here, so partition
  *    pruning composes with the log-level pruning for free
  *  - file sizes/mtimes come from the log, so planning makes ZERO
  *    filesystem calls for the file list
  */
class GraftFileIndex(
    spark: SparkSession,
    tableRoot: Path,
    adds: Seq[AddFile],
    physPartSchema: StructType) extends FileIndex {

  private val absolute: Seq[(AddFile, Path)] = {
    val fs = Storage.fs(tableRoot, spark.sessionState.newHadoopConf())
    val qualifiedRoot = fs.makeQualified(tableRoot)
    adds.map(a => a -> Storage.childPath(qualifiedRoot,
      Storage.decodeUriPath(a.path)))
  }

  override def rootPaths: Seq[Path] = Seq(tableRoot)

  override def partitionSchema: StructType = physPartSchema

  override lazy val sizeInBytes: Long = adds.map(_.size).sum

  override def refresh(): Unit = ()

  override def inputFiles: Array[String] =
    absolute.map(_._2.toString).toArray

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val converters = physPartSchema.fields.map(f =>
      CatalystTypeConverters.createToCatalystConverter(f.dataType))
    val groups = absolute.groupBy(_._1.partitionValues).toSeq.map {
      case (pv, files) =>
        val values = InternalRow.fromSeq(
          physPartSchema.fields.zip(converters).map { case (f, conv) =>
            conv(PartitionValues.parse(pv.getOrElse(f.name, null),
              f.dataType))
          }.toSeq)
        val statuses = files.map { case (a, abs) =>
          new FileStatus(a.size, false, 1, 128L << 20,
            a.modificationTime, abs)
        }.toArray
        PartitionDirectory(values, statuses)
    }
    // evaluate Catalyst's partition filters against the typed values
    // (NULL-extended semantics: a NULL result filters the partition out)
    if (partitionFilters.isEmpty) groups
    else {
      val nameToIdx = physPartSchema.fieldNames.zipWithIndex.toMap
      val bound = partitionFilters.flatMap { f =>
        try Some(f.transform {
          case a: AttributeReference if nameToIdx.contains(a.name) =>
            BoundReference(nameToIdx(a.name), a.dataType, a.nullable)
        }) catch { case _: Exception => None }
      }
      groups.filter(g => bound.forall(_.eval(g.values) == true))
    }
  }
}
