package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics idioms over an events table
  * `(user/entity key, timestamp, event type, value)` — the funnel /
  * resample / cohort-retention family every product-event warehouse
  * runs daily. All three are SHUFFLE-MINIMAL by construction:
  *
  *  - [[funnel]]: events prune to the funnel's step types FIRST, then
  *    ONE hash shuffle groups each entity's (ts, type) pairs and a
  *    map-side sorted-array fold walks the funnel — no per-step
  *    re-join, no window over a low-cardinality key. Greedy-first
  *    semantics (each step takes the EARLIEST qualifying event) make
  *    the fold order-deterministic and SQL-replayable as staged
  *    min-aggregates.
  *  - [[resampleFill]]: per-key daily aggregate, per-key date-grid
  *    explode, then a forward-fill window PARTITIONED BY THE KEY —
  *    partition count grows with the data, each partition stays
  *    days-sized.
  *  - [[retention]]: two key-hash aggregates (first-seen cohort,
  *    distinct active weeks) meeting on the key; cohort × offset
  *    cells aggregate map-side.
  *
  * At 100 TB the one watch-item is [[funnel]]'s per-entity array: it
  * holds only the PRUNED step-type events of one entity. An entity
  * with millions of step events is a bot — cap it upstream with a
  * per-key limit filter if the domain allows them.
  */
object EventOps {

  /** Strict ordered funnel with a time window: step 1 takes an
    * entity's earliest `steps(0)` event at time t1; step k > 1 takes
    * the earliest `steps(k-1)` event strictly after step k-1's time
    * and within `windowMicros` of t1. Returns `(step, users)` — how
    * many entities reached each 1-based step (monotone
    * non-increasing).
    */
  def funnel(events: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, steps: Seq[String],
      windowMicros: Long): DataFrame = {
    require(steps.size >= 2, s"funnel needs >= 2 steps, got $steps")
    require(steps.distinct == steps, s"funnel steps must be distinct")
    val n = steps.size
    val pruned = events
      .filter(col(typeCol).isin(steps: _*))
      .select(col(keyCol).as("k"),
        unix_micros(col(tsCol)).as("t"), col(typeCol).as("ty"))
    val byKey = pruned
      .groupBy(col("k"))
      .agg(sort_array(collect_list(struct(col("t"), col("ty"))))
        .as("evs"))
    // fold the sorted events through the step state: reached(i) holds
    // step i+1's time, or null. Greedy-first: the scan is ascending,
    // so the first qualifying event IS the min qualifying event.
    val zero = struct(
      steps.indices.map(i => lit(null).cast("long").as(s"s$i")): _*)
    val folded = byKey.withColumn("st",
      aggregate(col("evs"), zero, (acc, e) => {
        val t = e.getField("t")
        val ty = e.getField("ty")
        val fields = steps.indices.map { i =>
          val cur = acc.getField(s"s$i")
          val takes =
            if (i == 0) ty === steps(0) && cur.isNull
            else ty === steps(i) && cur.isNull &&
              acc.getField(s"s${i - 1}").isNotNull &&
              t > acc.getField(s"s${i - 1}") &&
              t <= acc.getField("s0") + lit(windowMicros)
          when(takes, t).otherwise(cur).as(s"s$i")
        }
        struct(fields: _*)
      }))
    val counts = folded.agg(
      steps.indices.map(i =>
        count(col("st").getField(s"s$i")).as(s"c$i")).head,
      steps.indices.map(i =>
        count(col("st").getField(s"s$i")).as(s"c$i")).tail: _*)
    val rows = (0 until n).map(i =>
      counts.select(lit(i + 1L).as("step"), col(s"c$i").as("users")))
    rows.reduce(_ unionAll _).orderBy(col("step"))
  }

  /** Daily resample with forward fill: per key, the day-level `max`
    * of `valueCol` on a continuous [first-day, last-day] grid, gaps
    * carrying the last observed value forward. Returns
    * `(key, day, value)`. */
  def resampleFill(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val daily = events
      .select(col(keyCol).as("k"), to_date(col(tsCol)).as("day"),
        col(valueCol).as("v"))
      .groupBy(col("k"), col("day"))
      .agg(max(col("v")).as("dmax"))
    val grid = daily
      .groupBy(col("k"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("k"),
        explode(sequence(col("d0"), col("d1"),
          expr("interval 1 day"))).as("day"))
    val w = Window.partitionBy(col("k")).orderBy(col("day"))
    grid.join(daily, Seq("k", "day"), "left_outer")
      .select(col("k").as(keyCol), col("day"),
        last(col("dmax"), ignoreNulls = true).over(w).as("value"))
  }

  /** Rolling z-score anomaly flags: each event's value against the
    * mean/stddev of its key's previous `window` events (the trailing
    * frame EXCLUDES the current row, so an outlier never masks
    * itself). Only rows with a FULL trailing window are scored —
    * warm-up rows have no stable baseline.
    *
    * Determinism contract (the same one the quality/LM scorers use):
    * values quantize to fixed-point `round(value·10^4)` longs, the
    * frame sums Σx and Σx² are then EXACT integers small enough to be
    * double-representable, and the final z is one fixed tree of IEEE
    * ops (sub/mul/div/sqrt are all correctly rounded) — so any engine
    * that mirrors the expression reproduces z bit-for-bit, and the
    * anomaly flag compares the ROUNDED z so the cut is stable too.
    * The zero-variance guard `n·Σx² − (Σx)² > 0` is integer-exact.
    *
    * Scale shape: one window partitioned BY THE KEY — partition count
    * grows with entities, each frame is `window`-sized; no global
    * state.
    *
    * @return `(key, id, value, zscore, is_anomaly)` ordered rows
    */
  def anomalies(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String, window: Int = 20,
      threshold: Double = 3.0): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    val xc = round(col(valueCol) * 1e4).cast("long")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(-window, -1)
    val base = events
      .withColumn("__an_x", xc)
      .withColumn("__an_s1", sum(col("__an_x")).over(w))
      .withColumn("__an_s2",
        sum(col("__an_x") * col("__an_x")).over(w))
      .withColumn("__an_n", count(lit(1)).over(w))
      .filter(col("__an_n") === window &&
        col("__an_s2") * col("__an_n") -
          col("__an_s1") * col("__an_s1") > 0)
    val nD = col("__an_n").cast("double")
    val s1D = col("__an_s1").cast("double")
    val s2D = col("__an_s2").cast("double")
    val z = (col("__an_x").cast("double") - s1D / nD) /
      sqrt((s2D - s1D * s1D / nD) / (nD - 1.0))
    base
      .withColumn("zscore", round(z, 6))
      .withColumn("is_anomaly", abs(col("zscore")) > threshold)
      .select(col(keyCol), col(idCol), col(valueCol),
        col("zscore"), col("is_anomaly"))
  }

  /** Peak concurrency via the classic ±1 interval sweep: each event
    * occupies `[ts, ts + durationMicros)`, the sweep orders boundary
    * deltas (+1 at start, −1 at end; half-open, so an end at instant t
    * sorts BEFORE a start at t) and the running sum's maximum is the
    * answer — the "max simultaneous sessions / connections / GPU
    * leases" question every capacity planner asks.
    *
    * The running sum is a GLOBAL prefix sum, the textbook one-task
    * window trap — it rides [[Salting.twoPhaseCumSum]] (order-monotone
    * split buckets, bucket-local sums, broadcast offsets), so the
    * sweep scales with the cluster. Returns one row `(max_concurrent)`.
    */
  def maxConcurrency(events: DataFrame, tsCol: String, idCol: String,
      durationMicros: Long): DataFrame = {
    require(durationMicros > 0,
      s"durationMicros must be > 0, got $durationMicros")
    val starts = events.select(
      unix_micros(col(tsCol)).as("t"), lit(1L).as("d"),
      col(idCol).as("i"))
    val ends = events.select(
      (unix_micros(col(tsCol)) + durationMicros).as("t"),
      lit(-1L).as("d"), col(idCol).as("i"))
    val deltas = starts.unionAll(ends)
    Salting.twoPhaseCumSum(deltas,
      Seq(col("t"), col("d"), col("i")), col("d"), "conc")
      .agg(max(col("conc")).as("max_concurrent"))
  }

  /** Weekly cohort retention: an entity's cohort is the ISO week of
    * its first event; a (cohort, offset) cell counts entities with
    * any event `offset` weeks after their cohort week. Returns
    * `(cohort_week, week_offset, users)`. */
  def retention(events: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    val firstSeen = events
      .groupBy(col(keyCol).as("k"))
      .agg(to_date(date_trunc("week", min(col(tsCol)))).as("cw"))
    val active = events
      .select(col(keyCol).as("k"),
        to_date(date_trunc("week", col(tsCol))).as("aw"))
      .distinct()
    firstSeen.join(active, Seq("k"))
      .select(col("cw"),
        (datediff(col("aw"), col("cw")) / 7).cast("long").as("off"),
        col("k"))
      .groupBy(col("cw"), col("off"))
      .agg(count(lit(1)).as("users"))
      .select(col("cw").as("cohort_week"),
        col("off").as("week_offset"), col("users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }
}
