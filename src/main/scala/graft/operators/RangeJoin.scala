package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned interval join — the classic bin-bucketing rewrite that turns
  * a point-in-interval theta join into an EQUI-join both engines can
  * hash-partition (reference contract: the partitioned-scan clauses of
  * src/main/scala/org/apache/spark/sql/JDBCRDDWithLimit.scala:53-63 —
  * the source-side range decomposition idea, applied to a join):
  *
  *  - every interval explodes into the fixed-width bins it covers
  *    (cost ∝ interval length / binWidth);
  *  - every point maps to its one bin;
  *  - the join runs on `(keys…, bin)` — a plain hash shuffle — and an
  *    exact residual filter (`lo <= v < hi`) removes bin-edge
  *    near-misses.
  *
  * Each qualifying (point, interval) pair meets in EXACTLY one bin
  * (the point's), so no dedup is needed. At 100 TB this is the
  * difference between a broadcast/nested-loop theta join (dies when
  * the interval side outgrows a broadcast) and two hash-partitioned
  * scans: the shuffle moves each point once and each interval
  * `len/binWidth + 1` times — pick `binWidth` near the median interval
  * length so that factor stays ~2. Intervals with `lo > hi` match
  * nothing (filtered before the explode — Spark's `sequence` would
  * otherwise count DOWN and fabricate bins).
  *
  * `vCol`/`loCol`/`hiCol` are numeric columns (timestamps: derive
  * epoch seconds first — truncation is monotone, so a point's bin
  * always lies inside its interval's bin range). The interval is
  * half-open: `lo <= v < hi`.
  *
  * Non-finite float/double BOUNDS cannot ride the bin path: Spark
  * orders NaN above every double, so `v < hi` is TRUE for any
  * non-NaN v when hi is NaN, yet `floor(NaN/w)` CASTs to bin 0 (not
  * NULL) and `±Infinity` bins to `Long.Max/MinValue` — the explode
  * would silently drop those matches or blow up. Interval rows with
  * a NaN/±Inf bound are therefore routed through a plain theta-join
  * union branch (exact same residual predicate); only finite-bound
  * rows are binned. Integral/date bounds skip the split entirely.
  */
object RangeJoin {

  def binnedIntervalJoin(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], vCol: String, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    def bin(c: org.apache.spark.sql.Column) =
      floor(c.cast("double") / binWidth).cast("long")
    import org.apache.spark.sql.types.{DoubleType, FloatType}
    val fractionalBounds = Seq(loCol, hiCol)
      .exists(c => intervals.schema(c).dataType match {
        case DoubleType | FloatType => true
        case _ => false
      })
    def finite(c: org.apache.spark.sql.Column) = {
      val d = c.cast("double")
      !isnan(d) && d =!= lit(Double.PositiveInfinity) &&
        d =!= lit(Double.NegativeInfinity)
    }
    val binnable =
      if (fractionalBounds)
        intervals.filter(finite(col(loCol)) && finite(col(hiCol)))
      else intervals
    val pb = points.withColumn("_graft_bin", bin(col(vCol)))
    val ib = binnable
      .filter(col(loCol) <= col(hiCol))
      .withColumn("_graft_bin",
        explode(sequence(bin(col(loCol)), bin(col(hiCol)))))
    val binned = pb.join(ib, keys :+ "_graft_bin")
      .filter(col(vCol) >= col(loCol) && col(vCol) < col(hiCol))
      .drop("_graft_bin")
    if (!fractionalBounds) binned
    else {
      // rows with a NaN/±Inf bound: exact theta semantics, off the
      // bin path (they are rare — a union, not a plan-wide fallback).
      // The broadcast hint pins the plan: non-finite bounds are
      // pathological by contract, so this side is small, and a
      // malformed-heavy interval table must degrade to a broadcast
      // nested loop, never a shuffled one
      val nf = broadcast(intervals
        .filter(!(finite(col(loCol)) && finite(col(hiCol)))))
      val theta =
        (if (keys.nonEmpty) points.join(nf, keys)
         else points.crossJoin(nf))
          .filter(col(vCol) >= col(loCol) && col(vCol) < col(hiCol))
      binned.unionByName(theta)
    }
  }
}
