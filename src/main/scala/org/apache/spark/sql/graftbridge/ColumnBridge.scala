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

  /** Split a possibly-`.desc`/`.asc_nulls_last` Column into
    * (child column, ascending?, nulls-first?). Spark 4 Columns carry
    * sort direction as an `internal.SortOrder` ColumnNode (conversion
    * to a Catalyst `SortOrder` is lazy), so direction must be read at
    * the node level. A Column with no explicit direction reports the
    * ORDER BY defaults (ascending, nulls first). */
  def sortOrderOf(c: Column): (Column, Boolean, Boolean) = c.node match {
    case so: org.apache.spark.sql.internal.SortOrder =>
      (new Column(so.child),
        so.sortDirection == org.apache.spark.sql.internal.SortOrder.Ascending,
        so.nullOrdering == org.apache.spark.sql.internal.SortOrder.NullsFirst)
    case _ => (c, true, true)
  }

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
