package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT distributed quantiles — the "p95 latency" family without
  * `approxQuantile`'s error bar and without a single-task global sort:
  * the quantile at fraction q of N ordered rows is the row whose
  * global row_number equals ceil(q·N) (the classic "lower value at or
  * above the fraction" / type-1 definition, same as any engine's
  * discrete quantile over a total order), so the answer reduces to
  * RANK SELECTION over [[Salting.twoPhaseRanks]] — order-monotone
  * split buckets, bucket-local row_numbers, broadcast offsets. One
  * pass, no per-row data ever funnels through one task, and ties
  * resolve deterministically through the caller's tiebreak columns.
  */
object Quantiles {

  private def positions(qs: Seq[Double]): Unit =
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantile fractions must be in (0, 1], got $qs")

  /** Global exact quantiles of `valueCol`: one row `(q, value)` per
    * requested fraction. `tiebreakCols` must make
    * `(valueCol, tiebreakCols…)` a total order. */
  def exactQuantiles(df: DataFrame, valueCol: Column,
      tiebreakCols: Seq[Column], qs: Seq[Double]): DataFrame = {
    positions(qs)
    val spark = df.sparkSession
    import spark.implicits._
    val n = df.count()
    val pos = qs.map(q => (q, math.max(1L, math.ceil(q * n).toLong)))
      .toDF("q", "__qx_pos")
    val ranked = Salting.twoPhaseRanks(
      df.select((valueCol.as("value") +: tiebreakCols): _*),
      partCols = Seq.empty,
      orderCols = col("value") +: tiebreakCols,
      rowNumCol = Some("__qx_rn"))
    ranked.join(broadcast(pos),
        col("__qx_rn").cast("long") === col("__qx_pos"))
      .select(col("q"), col("value"))
  }

  /** Per-key exact quantiles: one row `(key, q, value)` per key and
    * fraction — the per-endpoint / per-tenant p50/p95/p99 rollup.
    * Low-cardinality keys ride the same two-phase plan (the window's
    * scale trap is exactly an O(1)-cardinality PARTITION BY). */
  def exactQuantilesByKey(df: DataFrame, keyCol: String,
      valueCol: Column, tiebreakCols: Seq[Column],
      qs: Seq[Double]): DataFrame = {
    positions(qs)
    val spark = df.sparkSession
    import spark.implicits._
    val qDf = qs.toDF("q")
    // the counts side re-derives from df, so its key attribute would
    // share df's expression id — alias it before the join-back
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("__qx_n"))
      .crossJoin(broadcast(qDf))
      .select(col(keyCol).as("__qx_k"), col("q"),
        greatest(lit(1L), ceil(col("q") * col("__qx_n")).cast("long"))
          .as("__qx_pos"))
    val ranked = Salting.twoPhaseRanks(
      df.select((col(keyCol) +: valueCol.as("value") +: tiebreakCols): _*),
      partCols = Seq(keyCol),
      orderCols = col("value") +: tiebreakCols,
      rowNumCol = Some("__qx_rn"))
    ranked.join(broadcast(counts),
        col(keyCol) <=> col("__qx_k") &&
          col("__qx_rn").cast("long") === col("__qx_pos"))
      .select(col(keyCol), col("q"), col("value"))
  }
}
