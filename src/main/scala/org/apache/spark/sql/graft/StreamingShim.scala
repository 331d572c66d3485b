package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SQLContext}

/** `Source.getBatch` must return a DataFrame whose logical plan is
  * flagged `isStreaming` — the only door to that flag from outside
  * Spark is the `private[sql] internalCreateDataFrame`, hence this tiny
  * shim living under `org.apache.spark.sql` (the standard pattern for
  * external v1 streaming connectors).
  */
object StreamingShim {
  def internalCreateStreamingDF(sqlContext: SQLContext,
      rdd: RDD[InternalRow], schema: StructType): DataFrame =
    sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)

  /** Rewrap a microbatch's rows as a BATCH DataFrame (isStreaming off)
    * so a sink can hand them to a transactional batch writer.
    */
  def internalCreateBatchDF(sqlContext: SQLContext,
      rdd: RDD[InternalRow], schema: StructType): DataFrame =
    sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)

  /** Build a DataFrame over a hand-constructed logical plan (the
    * custom-FileIndex relation) — `Dataset.ofRows` is private[sql].
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Wrap a raw Catalyst Expression as a user-facing Column (the
    * `Column(Expression)` constructor is classic-module-private).
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** DSv2 Column[] → StructType (CatalogV2Util is private[sql]) —
    * needed by catalogs overriding the Column[] createTable variant
    * (identity column specs arrive only on that surface).
    */
  def v2ColumnsToStructType(
      cols: Array[org.apache.spark.sql.connector.catalog.Column])
      : StructType =
    org.apache.spark.sql.connector.catalog.CatalogV2Util
      .v2ColumnsToStructType(cols)
}
