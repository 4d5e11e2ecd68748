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
    // materialize the narrow (value, tiebreak) projection ONCE: the
    // count below, the rank machinery's split-bound sampling, its
    // local-window pass and its offsets aggregate are four consumers
    // that would otherwise each re-execute df's whole lineage
    // (measured: q_mad planned 30 parquet scans before this)
    val src = df.select((valueCol.as("value") +: tiebreakCols): _*)
      .transform(graft.Materialize.barrier)
    val n = src.count()
    val pos = qs.map(q => (q, math.max(1L, math.ceil(q * n).toLong)))
      .toDF("q", "__qx_pos")
    val ranked = Salting.twoPhaseRanks(src,
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
    // one materialization of the narrow projection feeds the per-key
    // counts, the split-bound sampling, the local-window pass and the
    // offsets aggregate (see exactQuantiles — same four-consumer shape)
    val src = df
      .select((col(keyCol) +: valueCol.as("value") +: tiebreakCols): _*)
      .transform(graft.Materialize.barrier)
    // the counts side re-derives from df, so its key attribute would
    // share df's expression id — alias it before the join-back
    val counts = src.groupBy(col(keyCol)).agg(count(lit(1)).as("__qx_n"))
      .crossJoin(broadcast(qDf))
      .select(col(keyCol).as("__qx_k"), col("q"),
        greatest(lit(1L), ceil(col("q") * col("__qx_n")).cast("long"))
          .as("__qx_pos"))
    val ranked = Salting.twoPhaseRanks(src,
      partCols = Seq(keyCol),
      orderCols = col("value") +: tiebreakCols,
      rowNumCol = Some("__qx_rn"))
    ranked.join(broadcast(counts),
        col(keyCol) <=> col("__qx_k") &&
          col("__qx_rn").cast("long") === col("__qx_pos"))
      .select(col(keyCol), col("q"), col("value"))
  }

  /** Winsorized mean per key: clamp `valueCol` into the key's exact
    * [loQ, hiQ] quantile band (rank selection — no approx error), then
    * aggregate under the fixed-point contract: clamped values quantize
    * to `round(v·scale)` longs, the per-key sum is an exact integer,
    * and the mean is ONE fixed IEEE division tree
    * `round(sum / (n · scale), 6)` any engine replays bit-for-bit.
    * The robust-mean idiom for metrics with fat tails.
    *
    * Scale shape: the quantile bounds ride [[exactQuantilesByKey]]'s
    * two-phase ranks (low-cardinality keys never bottleneck one
    * task); the bounds table is keys×2 rows, broadcast back; the
    * clamp+sum is one map-side-combinable hash aggregate.
    *
    * @return `(key, n, wins_sum_c, wins_mean)` per key
    */
  /** Global quantile discretizer (the feature bucketizer / scalable
    * `ntile`): every row's bucket in [1, `buckets`] from its global
    * rank in (value, tiebreak) order,
    *
    *   `bucket = ⌊(rn − 1)·B / N⌋ + 1`
    *
    * — pure integer arithmetic on the two-phase distributed
    * row_number, so the one-task `Window.orderBy` that a literal
    * `ntile(B) OVER (ORDER BY …)` plans never exists. N rides a
    * broadcast one-row count.
    *
    * @return the tiebreak columns plus `value` and `bucket`
    */
  def quantileBuckets(df: DataFrame, valueCol: Column,
      tiebreakCols: Seq[Column], buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val spark = df.sparkSession
    import spark.implicits._
    // same one-materialization shape as exactQuantiles
    val src = df.select((valueCol.as("value") +: tiebreakCols): _*)
      .transform(graft.Materialize.barrier)
    val nDf = src.count() match { case n => Seq(n).toDF("__qb_n") }
    val ranked = Salting.twoPhaseRanks(src,
      partCols = Seq.empty,
      orderCols = col("value") +: tiebreakCols,
      rowNumCol = Some("__qb_rn"))
    ranked.crossJoin(broadcast(nDf))
      .withColumn("bucket",
        intDiv((col("__qb_rn").cast("long") - 1L) * buckets,
          col("__qb_n")) + 1L)
      .drop("__qb_rn", "__qb_n")
  }

  /** Exact integral division — a long `/` would plan a DOUBLE Divide
    * whose rounding can misplace boundary rows once rank·buckets
    * leaves the 2^53 exact-integer range. */
  private def intDiv(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(new org.apache.spark.sql.catalyst.expressions
      .IntegralDivide(ColumnBridge.expression(a),
        ColumnBridge.expression(b)))
  }

  def winsorizedMeanByKey(df: DataFrame, keyCol: String,
      valueCol: Column, tiebreakCols: Seq[Column], loQ: Double,
      hiQ: Double, scale: Long = 100L): DataFrame = {
    require(loQ > 0.0 && hiQ < 1.0 && loQ < hiQ,
      s"need 0 < loQ < hiQ < 1, got $loQ, $hiQ")
    val bounds = exactQuantilesByKey(df, keyCol, valueCol,
      tiebreakCols, Seq(loQ, hiQ))
      .groupBy(col(keyCol).as("__wz_k"))
      .agg(min(when(col("q") === loQ, col("value"))).as("__wz_lo"),
        min(when(col("q") === hiQ, col("value"))).as("__wz_hi"))
    val clamped = df
      .select(col(keyCol), valueCol.as("__wz_v"))
      .join(broadcast(bounds), col(keyCol) <=> col("__wz_k"))
      .select(col(keyCol),
        round(least(greatest(col("__wz_v"), col("__wz_lo")),
          col("__wz_hi")) * scale).cast("long").as("__wz_c"))
    clamped.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("__wz_c")).as("wins_sum_c"))
      .select(col(keyCol), col("n"), col("wins_sum_c"),
        round(col("wins_sum_c").cast("double") /
          (col("n").cast("double") * scale.toDouble), 6)
          .as("wins_mean"))
  }
}
