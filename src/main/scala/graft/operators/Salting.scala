package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: two-phase salted aggregation. A hot grouping key that
  * would funnel into one reducer is spread across `buckets` salted
  * sub-keys for the partial phase; the final phase re-aggregates the tiny
  * per-salt partials. Exact for decomposable aggregates (sum/count/min/
  * max). At 1000-executor scale this is the difference between one
  * straggler task owning a hot key and `buckets` tasks sharing it.
  * (AQE's skew-join split handles the join case; this handles hot
  * aggregation keys, which AQE does not rebalance.)
  */
object Salting {

  /** Salted `groupBy(keys).agg(sum/count)` — exact, deterministic.
    * Salt derives from a hash of the whole row's partition offset, not
    * `rand()`, so re-runs produce identical partials.
    *
    * @param sums value columns to sum (cast to exact decimal by caller
    *             if float determinism matters)
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], sums: Seq[Column],
      buckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(buckets)))
    val partialAggs = sums.zipWithIndex.map { case (c, i) =>
      sum(c).as(s"__ps_$i")
    } :+ count(lit(1)).as("__pc")
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs = sums.indices.map { i =>
      sum(col(s"__ps_$i")).as(s"sum_$i")
    } :+ sum(col("__pc")).as("cnt")
    partial
      .groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }
}
