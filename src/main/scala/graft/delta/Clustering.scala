package graft.delta

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Clustered tables (reference kernel/src/clustering.rs +
  * transaction/data_layout.rs): clustering columns live in the
  * `delta.clustering` domain as
  * `{"clusteringColumns": [["col1"], ["user","address","city"]]}` —
  * PHYSICAL column paths on column-mapped tables — gated by the
  * `clustering` writer feature, with clustered adds carrying
  * `clusteringProvider`.
  *
  * The LAYOUT itself is Spark-first: rows range-partition on the
  * clustering key and sort within partitions, so each staged file
  * covers a disjoint key range — min/max stats then make data skipping
  * on the clustering columns near-perfect. (The reference delegates
  * layout to the engine the same way; range-sort is the dominant
  * simple case of liquid-style clustering.)
  */
object Clustering {

  val DOMAIN = "delta.clustering"
  val FEATURE = "clustering"
  val PROVIDER = "liquid"

  def domainFor(physicalCols: Seq[Seq[String]]): DomainMetadata =
    DomainMetadata(DOMAIN,
      s"""{"clusteringColumns":[${physicalCols.map(p =>
        p.map(s => "\"" + JsonLog.esc(s) + "\"").mkString("[", ",", "]"))
        .mkString(",")}]}""",
      removed = false)

  /** Physical clustering column paths from the snapshot's domain. */
  def physicalColumns(snap: Snapshot): Seq[Seq[String]] =
    snap.domainMetadata(DOMAIN).toSeq.flatMap { cfg =>
      import scala.jdk.CollectionConverters._
      JsonLog.parseLine(cfg).path("clusteringColumns").elements().asScala
        .map(_.elements().asScala.map(_.asText).toSeq).toSeq
    }

  /** LOGICAL clustering column names (top-level; physical→logical via
    * column mapping when active).
    */
  def columns(snap: Snapshot): Seq[String] = {
    val p2l = snap.schema.fields
      .map(f => ColumnMapping.physicalName(f) -> f.name).toMap
    physicalColumns(snap).collect {
      case Seq(phys) => p2l.getOrElse(phys, phys)
    }
  }

  /** Range-partition + sort `df` by the clustering columns so each
    * output file covers a disjoint key range. numFiles <= 0 keeps the
    * input parallelism.
    */
  def layout(df: DataFrame, clusterCols: Seq[String],
      numFiles: Int = 0): DataFrame = {
    if (clusterCols.isEmpty) return df
    val keys = clusterCols.map(col)
    val ranged =
      if (numFiles > 0) df.repartitionByRange(numFiles, keys: _*)
      else df.repartitionByRange(keys: _*)
    ranged.sortWithinPartitions(keys: _*)
  }
}
