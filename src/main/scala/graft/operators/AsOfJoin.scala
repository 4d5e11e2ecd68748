package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the most recent right row whose
  * timestamp is <= the left timestamp, per key (SURVEY.md §2d
  * `q_join_asof`; no reference code — the reference inherits joins from
  * Spark, README.md:40,67-96).
  *
  * Implementation is the union + last-value-window formulation, NOT a
  * range join: tag both sides, union them, and carry the latest right
  * payload forward with `last(..., ignoreNulls)` over
  * (key ORDER BY ts, side). This costs exactly ONE shuffle (the window
  * partitioning by key) and never materializes candidate pairs, so it
  * scales linearly at 100 TB where a `l.ts >= r.ts` theta-join would be a
  * per-key cross product. Ties (left.ts == right.ts) match the right row,
  * because right sorts before left at equal ts.
  */
object AsOfJoin {

  /** @param left       left rows (kept 1:1 in the output)
    * @param right      right rows (their latest-at-or-before payload joins on)
    * @param key        equality key column name present on both sides
    * @param leftTs     left timestamp column name
    * @param rightTs    right timestamp column name
    * @param payload    right columns to carry (joined as-of values;
    *                   nulls when no right row precedes the left row)
    */
  def join(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // side: 0 = right (sorts first at equal ts, so <= semantics), 1 = left
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select((col(key) +: col("__ts") +: col("__side") +:
        leftCols.filterNot(_ == key).map(col) ++:
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(s"__r_$p"))): _*)
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select((col(key) +: col("__ts") +: col("__side") +:
        leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++:
        payload.map(p => col(p).as(s"__r_$p"))): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(l.unionByName(r)) { (df, p) =>
      df.withColumn(s"__c_$p", last(col(s"__r_$p"), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        payload.map(p => col(s"__c_$p").as(s"asof_$p"))): _*)
  }
}
