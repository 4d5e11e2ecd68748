package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Expression bridge. Spark 4 made the conversion helpers
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`), so —
  * like the reference, which placed its classes inside
  * `org.apache.spark.sql` for the same reason (reference:
  * src/main/scala/org/apache/spark/sql/PropagateJDBCLimit.scala:1) — this
  * one-file shim lives in an `org.apache.spark.sql` subpackage. All graft
  * code goes through these two methods.
  */
object ColumnBridge {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Catalyst predicate -> `sources.Filter`, the same translation the V1
    * planner applies before calling `buildScan` (also `private[sql]`). */
  def translateFilter(predicate: Expression)
      : Option[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.execution.datasources.DataSourceStrategy
      .translateFilter(predicate, supportNestedPredicatePushdown = true)

  /** V2 `Column[]` -> StructType keeping the DEFAULT/comment metadata
    * (`CURRENT_DEFAULT` / `EXISTS_DEFAULT` field-metadata keys) — the
    * same `private[sql]` conversion Spark's deprecated
    * `createTable(schema)` shim applies. */
  def v2ColumnsToStructType(
      cols: Array[org.apache.spark.sql.connector.catalog.Column])
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.connector.catalog.CatalogV2Util
      .v2ColumnsToStructType(cols)
}
