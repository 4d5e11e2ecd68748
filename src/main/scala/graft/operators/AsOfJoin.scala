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
    * @param direction  "backward" (latest right at-or-before, default)
    *                   or "forward" (earliest right at-or-after);
    *                   forward flips the frame to
    *                   (currentRow, unboundedFollowing) + `first` —
    *                   still one shuffle, no pair materialization
    * @param tolerance  optional max distance between the left ts and
    *                   the matched right ts (an interval Column for
    *                   timestamps, a numeric one for numeric ts): the
    *                   nearest match still wins, but payloads NULL out
    *                   when it lies beyond the bound
    */
  def join(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String],
      direction: String = "backward",
      tolerance: Option[Column] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"as-of direction must be backward|forward, got '$direction'")
    val back = direction == "backward"
    val leftCols = left.columns.toSeq
    // side ordering puts the RIGHT row inside the frame at equal ts:
    // right before left for the preceding frame (<= semantics), right
    // after left for the following frame (>= semantics)
    val (lSide, rSide) = if (back) (1, 0) else (0, 1)
    val carryCols = (payload :+ rightTs).distinct
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(lSide))
      .select((col(key) +: col("__ts") +: col("__side") +:
        leftCols.filterNot(_ == key).map(col) ++:
        carryCols.map(p =>
          lit(null).cast(right.schema(p).dataType).as(s"__r_$p"))): _*)
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(rSide))
      .select((col(key) +: col("__ts") +: col("__side") +:
        leftCols.filterNot(_ == key).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++:
        carryCols.map(p => col(p).as(s"__r_$p"))): _*)
    val w0 = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"))
    val w =
      if (back) w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else w0.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    def pick(c: Column): Column =
      if (back) last(c, ignoreNulls = true).over(w)
      else first(c, ignoreNulls = true).over(w)
    val carried = carryCols.foldLeft(l.unionByName(r)) { (df, p) =>
      df.withColumn(s"__c_$p", pick(col(s"__r_$p")))
    }
    val inTol = tolerance.map { tol =>
      if (back) col(s"__c_$rightTs") >= col("__ts") - tol
      else col(s"__c_$rightTs") <= col("__ts") + tol
    }.getOrElse(lit(true))
    carried
      .filter(col("__side") === lSide)
      .select((leftCols.map(col) ++
        payload.map(p =>
          when(inTol, col(s"__c_$p")).as(s"asof_$p"))): _*)
  }
}
