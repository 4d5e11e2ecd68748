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
    val folded = funnelFold(events, keyCol, tsCol, typeCol, steps,
      windowMicros)
    val n = steps.size
    val counts = folded.agg(
      steps.indices.map(i =>
        count(col("st").getField(s"s$i")).as(s"c$i")).head,
      steps.indices.map(i =>
        count(col("st").getField(s"s$i")).as(s"c$i")).tail: _*)
    val rows = (0 until n).map(i =>
      counts.select(lit(i + 1L).as("step"), col(s"c$i").as("users")))
    rows.reduce(_ unionAll _).orderBy(col("step"))
  }

  /** The shared greedy funnel fold: one pruned key shuffle, then a
    * map-side fold over each entity's (ts, type)-sorted step events.
    * Returns one row per entity holding `st = (s0 … s{n−1})` — step
    * i+1's taken time, or null (contiguous by construction: the
    * greedy fold can only take step i after step i−1). */
  private def funnelFold(events: DataFrame, keyCol: String,
      tsCol: String, typeCol: String, steps: Seq[String],
      windowMicros: Long): DataFrame = {
    require(steps.size >= 2, s"funnel needs >= 2 steps, got $steps")
    require(steps.distinct == steps, s"funnel steps must be distinct")
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
    byKey.withColumn("st",
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
  }

  /** Funnel time-to-convert quantiles: per FINAL steps-reached k
    * (k ≥ 2), the exact `qs` quantiles of `t_k − t_1` — how long the
    * entities that stalled at step k took to get there. The fold is
    * [[funnel]]'s own greedy fold (one pruned key shuffle); the
    * quantile selection rides the scale-safe two-phase ranks
    * ([[Quantiles.exactQuantilesByKey]] — the handful of k groups is
    * exactly the low-cardinality PARTITION BY a literal window would
    * single-task). Quantile positions are the `ceil(q·n)`-th rows in
    * `(ttc, entity)` order — exact, deterministic, no interpolation.
    *
    * @return `(steps_reached, q, ttc_us)` ordered by (k, q)
    */
  def funnelTtc(events: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], windowMicros: Long,
      qs: Seq[Double] = Seq(0.5, 0.9)): DataFrame = {
    val folded = funnelFold(events, keyCol, tsCol, typeCol, steps,
      windowMicros)
    val n = steps.size
    val kExpr = coalesce(((n - 1) to 0 by -1).map(i =>
      when(col("st").getField(s"s$i").isNotNull,
        lit((i + 1).toLong))): _*)
    val tkExpr = coalesce(((n - 1) to 0 by -1).map(i =>
      when(col("st").getField(s"s$i").isNotNull,
        col("st").getField(s"s$i"))): _*)
    val perEntity = folded
      .select(col("k"), kExpr.as("steps_reached"),
        (tkExpr - col("st").getField("s0")).as("ttc"))
      .filter(col("steps_reached") >= 2L)
    Quantiles.exactQuantilesByKey(perEntity, "steps_reached",
        col("ttc"), Seq(col("k")), qs)
      .select(col("steps_reached"), col("q"),
        col("value").as("ttc_us"))
      .orderBy(col("steps_reached"), col("q"))
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

  /** OHLC time-bars (the metrics/trading resample): per (key, bucket)
    * the open/high/low/close of `valueCol`, the event count and the
    * fixed-point volume sum. ONE hash aggregate — `min_by`/`max_by`
    * on the (ts, id) ordering struct replace the naive per-bucket
    * sort-window, so the whole bar is map-side combinable and the
    * plan is a single shuffle on (key, bucket) regardless of bucket
    * width. (The struct ordering buffer makes the partial aggregate
    * sort-based — a LOCAL per-partition key sort; only the collapsed
    * group rows ever shuffle, unlike a window which ships every
    * event.) Determinism: (ts, id) is unique, so open/close selection
    * never ties; `volume_c` sums `round(value·scale)` longs — exact
    * integers, no float accumulation order to disagree on.
    *
    * @return `(key, bucket, open, high, low, close, n_events,
    *          volume_c)`
    */
  def ohlcBars(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String, bucket: String = "hour",
      valueScale: Long = 100L): DataFrame = {
    require(valueScale > 0, s"valueScale must be > 0, got $valueScale")
    val ord = struct(col(tsCol), col(idCol))
    events
      .select(col(keyCol).as("k"),
        date_trunc(bucket, col(tsCol)).as("bucket"),
        ord.as("o"), col(valueCol).as("v"),
        round(col(valueCol) * valueScale).cast("long").as("vc"))
      .groupBy(col("k"), col("bucket"))
      .agg(
        min_by(col("v"), col("o")).as("open"),
        max(col("v")).as("high"),
        min(col("v")).as("low"),
        max_by(col("v"), col("o")).as("close"),
        count(lit(1)).as("n_events"),
        sum(col("vc")).as("volume_c"))
      .select(col("k").as(keyCol), col("bucket"), col("open"),
        col("high"), col("low"), col("close"), col("n_events"),
        col("volume_c"))
  }

  /** One-sided CUSUM drift detection per key: the classic recurrence
    * `S_i = max(0, S_{i-1} + (x_i − target))` flags a sustained
    * upward shift when S crosses the threshold. The recurrence looks
    * inherently sequential, but it has a closed form over prefix
    * sums — with `P_i = Σ_{j≤i} (x_j − target)` and `P_0 = 0`,
    *
    *   `S_i = P_i − min(P_0 … P_i) = P_i − least(0, runmin(P))`
    *
    * so the whole detector is TWO plain key-partitioned window
    * functions (running sum + running min), no per-key loop, no
    * collect. Integer contract: values quantize to
    * `round(value·scale)` longs and `target` is given in the same
    * quantized units, so every P/S is an exact integer and the drift
    * flag's comparison is integer-exact — any engine replays it
    * bit-for-bit.
    *
    * Scale shape: windows partition BY THE KEY (partition count grows
    * with entities); a single entity's history stays one partition,
    * the same contract as [[anomalies]].
    *
    * @param targetC  reference level in quantized units
    *                 (e.g. 500 = 5.00 at scale 100)
    * @param threshC  drift threshold in the same units
    * @return `(key, id, value, cusum_c, drift)` per event
    */
  def cusum(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String, targetC: Long, threshC: Long,
      valueScale: Long = 100L): DataFrame = {
    require(threshC > 0, s"threshC must be > 0, got $threshC")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val d = round(col(valueCol) * valueScale).cast("long") -
      lit(targetC)
    events
      .withColumn("__cu_p", sum(d).over(w))
      .withColumn("__cu_s",
        col("__cu_p") - least(lit(0L), min(col("__cu_p")).over(w)))
      .select(col(keyCol), col(idCol), col(valueCol),
        col("__cu_s").as("cusum_c"),
        (col("__cu_s") > threshC).as("drift"))
  }

  /** Per-key interval-union coverage: each event occupies
    * `[ts, ts + durationMicros)`; the answer is the total length of
    * the UNION of those intervals (overlaps counted once) plus the
    * merged-segment count — "how long was the user actually active,
    * across how many visits". The sweep is one key-partitioned
    * window: ordered by (start, id), `prev_max_end = max(end) over
    * rows preceding` decides both the new segment flag
    * (`start > prev_max_end`) and the non-overlapped contribution
    * `max(0, end − max(start, prev_max_end))` — exact micros
    * arithmetic end to end, then one hash aggregate per key.
    *
    * @return `(key, covered_micros, n_segments, n_intervals)`
    */
  def intervalUnion(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, durationMicros: Long): DataFrame = {
    require(durationMicros > 0,
      s"durationMicros must be > 0, got $durationMicros")
    val s = unix_micros(col(tsCol))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("__iu_s"), col("i"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .select(col(keyCol).as("k"), col(idCol).as("i"),
        s.as("__iu_s"), (s + durationMicros).as("__iu_e"))
      .withColumn("__iu_pm", max(col("__iu_e")).over(w))
      .select(col("k"),
        greatest(lit(0L), col("__iu_e") -
          greatest(col("__iu_s"),
            coalesce(col("__iu_pm"), col("__iu_s")))).as("cov"),
        (col("__iu_pm").isNull ||
          col("__iu_s") > col("__iu_pm")).cast("long").as("seg"))
      .groupBy(col("k"))
      .agg(sum(col("cov")).as("covered_micros"),
        sum(col("seg")).as("n_segments"),
        count(lit(1)).as("n_intervals"))
      .select(col("k").as(keyCol), col("covered_micros"),
        col("n_segments"), col("n_intervals"))
  }

  /** Top session journeys: sessionize by inactivity gap (the same
    * lag+cumsum split the batch sessionizer uses), take each
    * session's FIRST `pathLen` event types in (ts, id) order, render
    * them as a `a>b>c` path and count sessions per path. The
    * per-session array is bounded BEFORE it exists: a row_number
    * window keeps only ranks ≤ `pathLen`, so the collect holds at
    * most `pathLen` structs regardless of session length (no
    * bot-session blowup — tighter than [[funnel]]'s contract). All
    * windows partition by the entity key; the path rollup is one hash
    * aggregate; the final cut is a TakeOrderedAndProject.
    *
    * @return top-`topN` rows `(path, n_sessions)` by
    *         (n_sessions desc, path)
    */
  def sessionPaths(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, typeCol: String, gapMicros: Long,
      pathLen: Int = 5, topN: Int = 50): DataFrame = {
    require(gapMicros > 0 && pathLen >= 1 && topN >= 1,
      s"bad sessionPaths args: gap=$gapMicros len=$pathLen top=$topN")
    val wk = Window.partitionBy(col("k"))
      .orderBy(col("tu"), col("i"))
    val sess = events
      .select(col(keyCol).as("k"), col(idCol).as("i"),
        unix_micros(col(tsCol)).as("tu"), col(typeCol).as("ty"))
      .withColumn("new_sess",
        when(lag(col("tu"), 1).over(wk).isNull ||
          col("tu") - lag(col("tu"), 1).over(wk) > gapMicros, 1L)
          .otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(
        wk.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val ws = Window.partitionBy(col("k"), col("sess_id"))
      .orderBy(col("tu"), col("i"))
    sess
      .withColumn("rn", row_number().over(ws))
      .filter(col("rn") <= pathLen)
      .groupBy(col("k"), col("sess_id"))
      .agg(sort_array(collect_list(struct(col("rn"), col("ty"))))
        .as("evs"))
      .select(array_join(transform(col("evs"), e => e("ty")), ">")
        .as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(topN)
  }

  /** First-order Markov transition matrix over event types: for each
    * entity's (ts, id)-ordered stream, count `from → to` adjacent
    * pairs and score each row's probability as integer ppm,
    * `p_ppm = ⌊n·10⁶ / n_from⌋` — exact integral division, engine-
    * replayable. One key-partitioned `lead` window, two hash
    * rollups meeting on the `from` type (broadcast-sized).
    *
    * @return `(from_type, to_type, n, p_ppm)` ordered rows
    */
  def transitions(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, typeCol: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    def intDiv(a: Column, b: Column): Column =
      ColumnBridge.column(new org.apache.spark.sql.catalyst.expressions
        .IntegralDivide(ColumnBridge.expression(a),
          ColumnBridge.expression(b)))
    val w = Window.partitionBy(col("k")).orderBy(col("tu"), col("i"))
    val pairs = events
      .select(col(keyCol).as("k"), col(idCol).as("i"),
        unix_micros(col(tsCol)).as("tu"), col(typeCol).as("ty"))
      .withColumn("nxt", lead(col("ty"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("ty").as("from_type"), col("nxt").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("from_type"))
      .agg(sum(col("n")).as("n_from"))
    pairs.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        intDiv(col("n") * lit(1000000L), col("n_from")).as("p_ppm"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Per-key least-squares trend of the daily event count — the
    * "which metrics are drifting up" detector — under a FULLY INTEGER
    * contract: with x = day index (epoch days) and y = the day's
    * count, the slope numerator `n·Σxy − Σx·Σy` and denominator
    * `n·Σx² − (Σx)²` are exact integer sums, and the reported slope
    * is `⌊numerator·10⁶ / denominator⌋` per day (ppm of a count/day)
    * — no float accumulation anywhere. Keys observed on fewer than 2
    * distinct days have no slope and are dropped.
    *
    * Two hash aggregates: (key, day) count then per-key sums — both
    * map-side combinable; nothing is proportional to anything but the
    * event count.
    *
    * @return `(key, n_days, slope_ppm)` ordered by key
    */
  def countTrend(events: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    def intDiv(a: Column, b: Column): Column =
      ColumnBridge.column(new org.apache.spark.sql.catalyst.expressions
        .IntegralDivide(ColumnBridge.expression(a),
          ColumnBridge.expression(b)))
    // x is days since a fixed recent epoch (slope is shift-invariant;
    // small x keeps the integer sums far from overflow at any scale)
    val daily = events
      .select(col(keyCol).as("k"),
        datediff(to_date(col(tsCol)), lit("2024-01-01").cast("date"))
          .cast("long").as("x"))
      .groupBy(col("k"), col("x"))
      .agg(count(lit(1)).as("y"))
    val num = (col("n") * col("sxy") - col("sx") * col("sy")) *
      lit(1000000L)
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    // sign-explicit truncation, spelled out so the contract is
    // visible: ⌊|num|/den⌋ with the sign reapplied ≡ truncation
    // toward zero — which is ALSO what both engines' native integer
    // division does (Spark div and DuckDB `//` both truncate), so
    // the oracle's bare `//` matches bit-for-bit
    val slope = when(num < 0, -intDiv(-num, den))
      .otherwise(intDiv(num, den))
    daily.groupBy(col("k"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .filter(col("n") >= 2)
      .select(col("k").as(keyCol), col("n").as("n_days"),
        slope.as("slope_ppm"))
      .orderBy(col(keyCol))
  }

  /** Modal event type per key (exact mode, deterministic): two
    * map-side-combinable hash aggregates — (key, type) counts, then
    * ONE `max(struct(cnt, type))` per key, so the tie rule is
    * explicit (largest type string among equal counts) and the whole
    * answer never sorts rows. @return `(key, mode_type, mode_n)` */
  def modeByKey(events: DataFrame, keyCol: String,
      typeCol: String): DataFrame =
    events
      .groupBy(col(keyCol).as("k"), col(typeCol).as("ty"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("k"))
      .agg(max(struct(col("cnt"), col("ty"))).as("m"))
      .select(col("k").as(keyCol), col("m.ty").as("mode_type"),
        col("m.cnt").as("mode_n"))
      .orderBy(col(keyCol))

  /** Last-touch attribution: each conversion event is credited to the
    * entity's most recent NON-conversion event within the lookback
    * window. One key-partitioned window does all the work —
    * `last(touch, ignoreNulls)` over the preceding frame, where
    * `touch` is a (ts, type) struct only on non-conversion rows — and
    * one hash rollup counts conversions per attributed channel
    * (NULL = organic: no touch inside the window). Exact micros
    * arithmetic; no self-join, no per-conversion scan.
    *
    * @return `(channel, conversions)` ordered; channel NULL = organic
    */
  def attribution(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, typeCol: String, conversionType: String,
      lookbackMicros: Long): DataFrame = {
    require(lookbackMicros > 0,
      s"lookbackMicros must be > 0, got $lookbackMicros")
    val w = Window.partitionBy(col("k"))
      .orderBy(col("tu"), col("i"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .select(col(keyCol).as("k"), col(idCol).as("i"),
        unix_micros(col(tsCol)).as("tu"), col(typeCol).as("ty"))
      .withColumn("touch",
        last(when(col("ty") =!= conversionType,
          struct(col("tu"), col("ty"))), ignoreNulls = true).over(w))
      .filter(col("ty") === conversionType)
      .select(when(col("touch").isNotNull &&
          col("tu") - col("touch.tu") <= lookbackMicros,
          col("touch.ty")).as("channel"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("conversions"))
      .orderBy(col("channel"))
  }

  /** Rolling EXACT median: each event's value replaced by the median
    * of its key's trailing `window` values (window odd, full frames
    * only — warm-up rows are dropped rather than interpolated, so
    * the median is pure SELECTION: `sorted[(w+1)/2]`, exact on any
    * numeric type, no cross-engine interpolation rule to disagree
    * on). The robust smoother for spiky metrics. One key-partitioned
    * frame window; the per-row array holds `window` values — a
    * constant.
    *
    * NULL handling is explicit: rows with a NULL `valueCol` are
    * dropped BEFORE the window is built, so the trailing frame is
    * always `window` consecutive NON-NULL values ("median ignoring
    * nulls"). Without the pre-filter, `collect_list`'s null-skipping
    * would silently shrink frames around a NULL and suppress
    * neighbouring rows as if they were warm-up.
    *
    * @return `(key, id, value, rolling_median)` rows with full frames
    */
  def rollingMedian(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String, window: Int = 21): DataFrame = {
    require(window >= 1 && window % 2 == 1,
      s"window must be odd and >= 1, got $window")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(-(window - 1), 0)
    events
      .filter(col(valueCol).isNotNull)
      .withColumn("__rm_arr", collect_list(col(valueCol)).over(w))
      .filter(size(col("__rm_arr")) === window)
      .select(col(keyCol), col(idCol), col(valueCol),
        element_at(array_sort(col("__rm_arr")), (window + 1) / 2)
          .as("rolling_median"))
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

  /** Cohort survival curve: [[retention]] normalized by cohort size —
    * `survival_ppm = users(k)·10⁶ // users(0)` per (cohort, offset),
    * the comparable-across-cohorts readout (retention counts aren't,
    * cohort sizes differ). The retention rollup is checkpointed once
    * (lazy — the house rule for shared subplans) and the offset-0
    * base broadcasts back onto it: everything after the two
    * retention aggregates is bounded rollup metadata.
    *
    * @return `(cohort_week, week_offset, users, cohort_size,
    *         survival_ppm)` ordered by (cohort, offset)
    */
  def survival(events: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val r = retention(events, keyCol, tsCol)
      .transform(graft.Materialize.barrier)
    val base = r.filter(col("week_offset") === 0L)
      .select(col("cohort_week"), col("users").as("cohort_size"))
    r.join(broadcast(base), Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"), col("users"),
        col("cohort_size"),
        intDiv(col("users").cast(dec) * lit(1000000L),
          col("cohort_size").cast(dec)).as("survival_ppm"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** `⌊a / b⌋`-style exact integral division shared by the integer-
    * contract operators below (Spark's `div` truncates toward zero —
    * identical to SQL `//` on the NON-NEGATIVE operands these
    * operators produce; sign-sensitive callers wrap it explicitly
    * like [[countTrend]] does). */
  private def intDiv(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(new org.apache.spark.sql.catalyst.expressions
      .IntegralDivide(ColumnBridge.expression(a),
        ColumnBridge.expression(b)))
  }

  /** `⌊a / b⌋` exact FLOOR division for a possibly-negative numerator
    * over a strictly positive denominator, via the identity
    * `⌊a/b⌋ = −⌈(−a)/b⌉ = −((−a + b − 1) div b)`. BOTH engines'
    * native integer division truncates toward zero (Spark's div AND
    * DuckDB's `//` — verified on DuckDB 1.0.0), so operators that
    * document floor semantics use this on the Spark side and the
    * oracle replays the SAME sign-split as an explicit CASE; a bare
    * `//` in the oracle would silently diverge on negative
    * numerators ([[changepoint]] means, modularity contributions). */
  private def floorDiv(a: Column, b: Column): Column =
    when(a < 0, -intDiv(-a + b - lit(1), b)).otherwise(intDiv(a, b))

  /** Exponentially weighted moving average under the FULLY INTEGER
    * contract: values quantize to `valueScale` longs, the running
    * state is a fixed-point long at `valueScale`·10⁶, and each step
    * is
    * {{{ s_n = (num·v_n·10⁶ + (den−num)·s_{n−1}) // den }}}
    * (s₁ = v₁·10⁶) — exact integer arithmetic end to end, so any
    * engine replays the smoother bit-for-bit (the DuckDB oracle runs
    * the same recurrence as a recursive CTE on HUGEINT). The per-key
    * fold runs map-side over the key's (ts, id)-sorted event array —
    * the funnel pattern: ONE key shuffle, array bounded by
    * `maxEventsPerKey`.
    *
    * '''Hot-entity contract''': each step floors, so the recurrence
    * cannot be segment-composed exactly — the per-key array is the
    * only exact evaluation, and an uncapped hot key (one bot holding
    * 0.1% of a 100 TB event table) would be a multi-GB single row.
    * The smoother therefore replays each key's EARLIEST
    * `maxEventsPerKey` events in `(ts, id)` order and drops the tail
    * (the sessionPaths row-number cut): every emitted row is
    * bit-identical to the uncapped run, and a key past the cap emits
    * a truncated — never an approximated — series. The cut runs as a
    * rank window BEFORE the collect, so the oversized key spills in
    * the sort instead of materializing in the aggregation buffer.
    * The cap ALSO bounds compute, not just memory: the fold
    * accumulates an immutable state array (one copy per step in the
    * HOF), so per-key cost is quadratic in the capped length — the
    * 2¹⁶ default keeps the worst single task under ~a minute and the
    * buffer at ~1 MB (ScaleProbe `ewma_hot_key`: a 50%-of-table bot
    * key costs the same as a 10% one, and emits exactly `cap` rows).
    *
    * @return `(key, id, value_c, ewma_c6)`: the quantized value and
    *         the EWMA at `valueScale`·10⁶ fixed point
    */
  def ewma(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String, alphaNum: Long = 1L,
      alphaDen: Long = 2L, valueScale: Long = 100L,
      maxEventsPerKey: Int = 1 << 16): DataFrame = {
    require(alphaNum > 0 && alphaDen >= alphaNum,
      s"alpha must be in (0, 1]: $alphaNum/$alphaDen")
    require(maxEventsPerKey > 0,
      s"maxEventsPerKey must be positive: $maxEventsPerKey")
    val rnW = Window.partitionBy(col("k"))
      .orderBy(col("e.t"), col("e.i"))
    val byKey = events
      .select(col(keyCol).as("k"),
        struct(unix_micros(col(tsCol)).as("t"), col(idCol).as("i"),
          round(col(valueCol) * valueScale).cast("long").as("vc"))
          .as("e"))
      .withColumn("__ew_rn", row_number().over(rnW))
      .filter(col("__ew_rn") <= maxEventsPerKey)
      .groupBy(col("k"))
      .agg(sort_array(collect_list(col("e"))).as("evs"))
    // the series runs as ONE native O(n) pass
    // ([[graft.functions.IntegerEwmaSeries]]) — the earlier HOF
    // `aggregate` fold array_append-copied its accumulator per step,
    // O(cap²) on a maxed key; semantics (recurrence, truncating
    // division, ANSI overflow) are bit-identical and pinned by the
    // randomized local-fold spec + the recursive-CTE oracle
    val folded = byKey.withColumn("st",
      org.apache.spark.sql.graftbridge.ColumnBridge.column(
        graft.functions.IntegerEwmaSeries(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(
            transform(col("evs"), e => e.getField("vc"))),
          alphaNum, alphaDen)))
    folded
      .select(col("k"), posexplode(arrays_zip(col("evs"), col("st"))))
      .select(col("k").as(keyCol),
        col("col.evs.i").as(idCol),
        col("col.evs.vc").as("value_c"),
        col("col.st").as("ewma_c6"))
  }

  /** Inactivity-gap report: consecutive same-key events further apart
    * than `minGapMicros` — the "sensor went dark" / SLA-breach
    * detector. One key-partitioned `lag` window, pure integers.
    *
    * @return `(key, gap_start_us, gap_end_us, gap_us)` rows
    */
  def eventGaps(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, minGapMicros: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__eg_t"), col(idCol))
    events
      .select(col(keyCol), col(idCol),
        unix_micros(col(tsCol)).as("__eg_t"))
      .withColumn("__eg_prev", lag(col("__eg_t"), 1).over(w))
      .filter(col("__eg_prev").isNotNull &&
        col("__eg_t") - col("__eg_prev") > minGapMicros)
      .select(col(keyCol), col("__eg_prev").as("gap_start_us"),
        col("__eg_t").as("gap_end_us"),
        (col("__eg_t") - col("__eg_prev")).as("gap_us"))
  }

  /** A/B experiment readout: entities hash into `buckets` variants by
    * key, a variant's conversion rate is the share of its entities
    * with at least one `conversionType` event, and each variant's
    * lift is measured against variant 0 (the control) — all integer
    * ppm (`⌊x·10⁶/y⌋`), so the readout is engine-exact. Two hash
    * aggregates plus a 1-row control broadcast.
    *
    * The control scalar is a global aggregate (always exactly one
    * row), so a missing control — no entity hashed to variant 0, or
    * a control with zero conversions making lift undefined — fails
    * the job with a clear message instead of silently emitting an
    * empty or divide-by-zero result.
    *
    * @return `(variant, users, converters, conv_ppm, lift_ppm)` —
    *         `lift_ppm` is the SIGNED relative delta vs control
    */
  def abLift(events: DataFrame, keyCol: String, typeCol: String,
      conversionType: String, buckets: Int = 2): DataFrame = {
    require(buckets >= 2, s"need >= 2 variants, got $buckets")
    val perUser = events
      .select(pmod(col(keyCol), lit(buckets.toLong)).as("variant"),
        col(keyCol).as("k"),
        (col(typeCol) === conversionType).cast("long").as("c"))
      .groupBy(col("variant"), col("k"))
      .agg(max(col("c")).as("converted"))
    val perVariant = perUser.groupBy(col("variant"))
      .agg(count(lit(1)).as("users"),
        sum(col("converted")).as("converters"))
      .withColumn("conv_ppm",
        intDiv(col("converters") * lit(1000000L), col("users")))
    // global aggregate, not a filter: exactly ONE row whatever the
    // data, null when variant 0 is absent — checked at runtime below
    val control = perVariant
      .agg(max(when(col("variant") === 0, col("conv_ppm")))
        .as("__ab_p0"))
    val p0 = when(col("__ab_p0").isNull || col("__ab_p0") === 0,
      raise_error(lit("abLift: control variant 0 is empty or has " +
        "zero conversions — lift is undefined")))
      .otherwise(col("__ab_p0"))
    val num = (col("conv_ppm") - p0) * lit(1000000L)
    perVariant.crossJoin(broadcast(control))
      .select(col("variant"), col("users"), col("converters"),
        col("conv_ppm"),
        when(num < 0, -intDiv(-num, p0))
          .otherwise(intDiv(num, p0)).as("lift_ppm"))
      .orderBy(col("variant"))
  }

  /** Bollinger bands: per event, the trailing-`window` mean ± 2
    * standard deviations. The integer layer (value quantization,
    * rolling Σx and Σx² over a ROWS frame) is exact; the float layer
    * is ONE fixed expression tree per band — a cast, one `sqrt`, one
    * division, one multiply-add, each IEEE-correctly-rounded — so the
    * bands reproduce bit-identically on any engine evaluating the
    * same tree (the anomalies/winsorize precedent; no `pow`/`ln`
    * anywhere). Warm-up rows (partial frames) are dropped.
    *
    * @return `(key, id, value_c, mid, upper, lower)` full-frame rows
    */
  def bollinger(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String, window: Int = 21,
      valueScale: Long = 100L): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__bb_t"), col(idCol))
      .rowsBetween(-(window - 1), 0)
    val den = lit((window * valueScale).toDouble)
    val mid = col("__bb_s").cast("double") / den
    val sd = sqrt((lit(window.toLong) * col("__bb_q") -
      col("__bb_s") * col("__bb_s")).cast("double")) / den
    events
      .select(col(keyCol), col(idCol),
        unix_micros(col(tsCol)).as("__bb_t"),
        round(col(valueCol) * valueScale).cast("long").as("vc"))
      .withColumn("__bb_n", count(lit(1)).over(w))
      .withColumn("__bb_s", sum(col("vc")).over(w))
      .withColumn("__bb_q", sum(col("vc") * col("vc")).over(w))
      .filter(col("__bb_n") === window)
      .select(col(keyCol), col(idCol), col("vc").as("value_c"),
        mid.as("mid"), (mid + lit(2.0) * sd).as("upper"),
        (mid - lit(2.0) * sd).as("lower"))
  }

  /** LINEAR multi-touch attribution ([[attribution]]'s fair-split
    * sibling): every non-conversion touch inside the lookback before
    * a conversion shares the credit equally — each touch receives
    * `⌊10⁶/n⌋` ppm (the remainder is dropped, disclosed), and
    * conversions with no touch credit `organic` in full. The window
    * collects the trailing (ts, type) pairs UNCONDITIONALLY and the
    * lookback/type filter happens in array space — the same rows on
    * any engine, no aggregate null-skipping semantics in play.
    *
    * @return `(channel, credit_ppm)` ordered by channel
    */
  def attributionLinear(events: DataFrame, keyCol: String,
      tsCol: String, idCol: String, typeCol: String,
      conversionType: String, lookbackMicros: Long): DataFrame = {
    val w = Window.partitionBy(col("k"))
      .orderBy(col("tu"), col("i"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val conv = events
      .select(col(keyCol).as("k"), col(idCol).as("i"),
        unix_micros(col(tsCol)).as("tu"), col(typeCol).as("ty"))
      .withColumn("hist",
        collect_list(struct(col("tu"), col("ty"))).over(w))
      .filter(col("ty") === conversionType)
      .withColumn("touches", filter(col("hist"), x =>
        x.getField("ty") =!= conversionType &&
          x.getField("tu") >= col("tu") - lookbackMicros))
      .select(col("touches"), size(col("touches")).as("n"))
    val credited = conv
      .select(when(col("n") === 0,
          array(struct(lit("organic").as("channel"),
            lit(1000000L).as("credit"))))
        .otherwise(transform(col("touches"), x =>
          struct(x.getField("ty").as("channel"),
            intDiv(lit(1000000L), col("n")).as("credit"))))
        .as("cr"))
      .select(explode(col("cr")).as("c"))
    credited.groupBy(col("c.channel").as("channel"))
      .agg(sum(col("c.credit")).as("credit_ppm"))
      .orderBy(col("channel"))
  }

  /** Tukey IQR outlier report per key: Q1/Q3 by the explicit
    * selection contract `q1 = sorted[⌈n/4⌉]`, `q3 = sorted[⌈3n/4⌉]`
    * (1-based), a value is an outlier outside
    * `[q1 − 1.5·IQR, q3 + 1.5·IQR]` — compared as `2v < 2q1 − 3·IQR`
    * so the whole test stays in exact integers (no 1.5 float).
    *
    * Selection rides [[Salting.twoPhaseRanks]] (the exact-quantile
    * machinery): a LOW-cardinality key column with a growing corpus —
    * exactly this operator's shape, a handful of metric types over
    * billions of rows — would make any per-key collect/sort
    * single-partition; two-phase ranks keep every stage parallel.
    * Then one join back tests each value against its key's fences.
    *
    * @return `(key, n, q1_c, q3_c, n_outliers)` ordered by key
    */
  def iqrOutliers(events: DataFrame, keyCol: String,
      valueCol: String, valueScale: Long = 100L): DataFrame = {
    // NOTE (r19 optimization round): the quantized projection has
    // multiple consumers, but its lineage is ONE pruned columnar scan
    // — a materialization barrier here measured SLOWER (fresh-JVM
    // 1.34 s -> 1.81 s at sf0.1: persisting + deserializing the rows
    // costs more than the vectorized re-scans it saves), so the
    // projection stays lazy. Checkpoint only derived inputs (the
    // madByKey / funnel_ttc shape).
    val vals = events.select(col(keyCol).as("k"),
      round(col(valueCol) * valueScale).cast("long").as("vc"))
    val idx = vals.groupBy(col("k")).agg(count(lit(1)).as("n"))
      .select(col("k").as("__iq_k"), col("n"),
        intDiv(col("n") + 3L, lit(4L)).as("__iq_i1"),
        intDiv(col("n") * 3L + 3L, lit(4L)).as("__iq_i3"))
    val ranked = Salting.twoPhaseRanks(vals,
      partCols = Seq("k"), orderCols = Seq(col("vc")),
      rowNumCol = Some("__iq_rn"))
    val qs = ranked.join(idx,
        col("k") <=> col("__iq_k") &&
          (col("__iq_rn").cast("long") === col("__iq_i1") ||
            col("__iq_rn").cast("long") === col("__iq_i3")))
      .groupBy(col("k"), col("n"))
      .agg(
        min(when(col("__iq_rn").cast("long") === col("__iq_i1"),
          col("vc"))).as("q1"),
        min(when(col("__iq_rn").cast("long") === col("__iq_i3"),
          col("vc"))).as("q3"))
    val iqr = col("q3") - col("q1")
    val outliers = vals
      .join(qs.select(col("k"), col("q1"), col("q3")), Seq("k"))
      .filter(col("vc") * 2L < col("q1") * 2L - iqr * 3L ||
        col("vc") * 2L > col("q3") * 2L + iqr * 3L)
      .groupBy(col("k")).agg(count(lit(1)).as("__iq_out"))
    qs.join(outliers, Seq("k"), "left_outer")
      .select(col("k").as(keyCol), col("n"), col("q1").as("q1_c"),
        col("q3").as("q3_c"),
        coalesce(col("__iq_out"), lit(0L)).as("n_outliers"))
      .orderBy(col(keyCol))
  }

  /** Capped running balance (inventory / credit semantics): per key,
    * the running sum of signed quantized deltas CLAMPED below at
    * zero — `b_i = max(0, b_{i−1} + d_i)` — via its CLOSED FORM
    * `b_i = prefix_i − min(0, min_{j≤i} prefix_j)`: two plain
    * windows over one key partition, NO recursion, exact integers —
    * the scale shape a row-by-row stateful fold cannot give.
    *
    * @param deltaCol signed delta expression (caller encodes
    *                 withdrawal sign), quantized by `valueScale`
    * @return `(key, id, delta_c, balance_c)` ordered rows
    */
  def cappedRunningBalance(events: DataFrame, keyCol: String,
      tsCol: String, idCol: String, deltaCol: Column,
      valueScale: Long = 100L): DataFrame = {
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t"), col("i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col(keyCol).as("k"), unix_micros(col(tsCol)).as("t"),
        col(idCol).as("i"),
        round(deltaCol * valueScale).cast("long").as("d"))
      .withColumn("p", sum(col("d")).over(w))
      .withColumn("rm", min(col("p")).over(w))
      .select(col("k").as(keyCol), col("i").as(idCol),
        col("d").as("delta_c"),
        (col("p") - least(lit(0L), col("rm"))).as("balance_c"))
  }

  /** LTTB time-series downsampling (largest-triangle-three-buckets,
    * Steinarsson 2013 — the standard visual downsampler): endpoints
    * always kept, interior points split into fixed-size buckets, and
    * each bucket contributes the point forming the LARGEST triangle
    * with the PREVIOUSLY SELECTED point and the NEXT bucket's
    * average. Entirely integer: times rebase to per-key SECONDS,
    * values quantize to `valueScale` longs, and the triangle compare
    * is the cross product SCALED BY the next bucket's size
    * (`|（a−p)×(Σb − m·p)|` — the division-free form), so selection
    * is exact and engine-replayable; ties break (smaller t, smaller
    * id). Per-key state is the point array (the funnel bound — the
    * SAME bound the previous formulation's per-key fold row already
    * carried); the whole selection (bucketing, successor sums, fold)
    * runs over that one array, so the plan is ONE key-keyed exchange
    * plus the output sort — the r19 optimization round replaced a
    * 3-window/2-join/3-exchange chain computing identical rows
    * (fresh-JVM 2.8 s → see OPTIMIZATION_r19.md).
    *
    * @return `(key, t_s, value_c, id)` selected points, ordered
    */
  def lttb(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String, bucketSize: Int = 20,
      valueScale: Long = 100L): DataFrame = {
    require(bucketSize >= 1, s"bucketSize must be >= 1: $bucketSize")
    val bs = bucketSize
    val ptsType = "array<struct<t:bigint,i:bigint,v:bigint>>"
    // ONE exchange: the per-key series lands as a single sorted array
    // (sort_array's (t0, i, v) struct order == the old window's
    // (t, i) order — ids are unique, and the rebase below is a
    // constant shift); the per-key minimum rides the same aggregate,
    // matching the old `min(t0) over (partition k)` null semantics
    val base = events
      .select(col(keyCol).as("k"),
        intDiv(unix_micros(col(tsCol)), lit(1000000L)).as("t0"),
        col(idCol).as("i"),
        round(col(valueCol) * valueScale).cast("long").as("v"))
      .groupBy(col("k"))
      .agg(sort_array(collect_list(
          struct(col("t0"), col("i"), col("v")))).as("ps0"),
        min(col("t0")).as("tmin"))
      .select(col("k"),
        transform(col("ps0"), p => struct(
          (p.getField("t0") - col("tmin")).as("t"),
          p.getField("i").as("i"),
          p.getField("v").as("v"))).as("ps"))
      // the interior slice lands in its OWN projection column: it is
      // referenced per bucket below, and inlining it would re-copy
      // O(n) elements per bucket (non-cheap multi-referenced aliases
      // are kept by CollapseProject, so both arrays materialize once
      // per row)
      .select(col("k"), col("ps"),
        slice(col("ps"), lit(2),
          greatest(size(col("ps")) - 2, lit(0))).as("inter"))
    val n = size(col("ps"))
    val first = element_at(col("ps"), 1)
    val lastP = element_at(col("ps"), n)
    // interior points (old rn in 2..n-1): bucket j = 0-based slice of
    // `bs` points, exactly the old `(rn - 2) div bs` assignment
    val interior = col("inter")
    val m = size(interior)
    val nb = intDiv((m + lit(bs - 1)).cast("long"), lit(bs.toLong))
    // each bucket carries its successor's (Σt, Σv, count) — the last
    // bucket the final point with weight 1, the old lead+coalesce
    val bks = when(m >= 1,
      transform(sequence(lit(1L), nb), jj => {
        val pts = slice(interior,
          ((jj - 1L) * bs + 1L).cast("int"), lit(bs))
        val next = slice(interior,
          ((jj - 1L) * bs + bs + 1L).cast("int"), lit(bs))
        val isLast = size(next) === 0
        struct((jj - 1L).as("b"), pts.as("pts"),
          when(isLast, lastP.getField("t"))
            .otherwise(aggregate(next, lit(0L),
              (a, p) => a + p.getField("t"))).as("bx"),
          when(isLast, lastP.getField("v"))
            .otherwise(aggregate(next, lit(0L),
              (a, p) => a + p.getField("v"))).as("by"),
          when(isLast, lit(1L))
            .otherwise(size(next).cast("long")).as("bm"))
      }))
      .otherwise(array().cast(s"array<struct<b:bigint," +
        s"pts:$ptsType,bx:bigint,by:bigint,bm:bigint>>"))
    // fold buckets in order: acc = (prev t, prev v, selected so far)
    // — the selection lambda is IDENTICAL to the previous formulation
    val zero = struct(first.getField("t").as("pt"),
      first.getField("v").as("pv"),
      array().cast(ptsType).as("out"))
    val folded = aggregate(bks, zero, (acc, bk) => {
      val px = acc.getField("pt")
      val py = acc.getField("pv")
      // selection key: (-area2m, t, id) ascending == largest
      // triangle first, then earliest, then smallest id
      val keys = transform(bk.getField("pts"), p => {
        val area = abs(
          (p.getField("t") - px) * (bk.getField("by") -
            bk.getField("bm") * py) -
          (bk.getField("bx") - bk.getField("bm") * px) *
            (p.getField("v") - py))
        struct((-area).as("na"), p.getField("t").as("t"),
          p.getField("i").as("i"), p.getField("v").as("v"))
      })
      val best = element_at(array_sort(keys), 1)
      struct(best.getField("t").as("pt"),
        best.getField("v").as("pv"),
        array_append(acc.getField("out"),
          struct(best.getField("t").as("t"),
            best.getField("i").as("i"),
            best.getField("v").as("v"))).as("out"))
    })
    // selected interior points + the endpoints (one row when n == 1,
    // matching the old `rn === 1 || rn === n` filter)
    val outArr = concat(
      folded.getField("out"),
      array(struct(first.getField("t").as("t"),
        first.getField("i").as("i"), first.getField("v").as("v"))),
      when(n > 1,
        array(struct(lastP.getField("t").as("t"),
          lastP.getField("i").as("i"), lastP.getField("v").as("v"))))
        .otherwise(array().cast(ptsType)))
    base.select(col("k"), explode(outArr).as("p"))
      .select(col("k").as(keyCol), col("p.t").as("t_s"),
        col("p.v").as("value_c"), col("p.i").as("id"))
      .orderBy(col(keyCol), col("t_s"), col("id"))
  }

  /** Pearson correlation of two keys' DAILY event counts, for every
    * key pair — "which metrics move together". The integer layer
    * (daily counts, Σx/Σy/Σxy/Σx²/Σy² over the pair's SHARED days)
    * is exact; the float layer is ONE fixed tree —
    * `num / sqrt(a · b)` with `num = n·Σxy − Σx·Σy`,
    * `a = n·Σx² − (Σx)²`, `b = n·Σy² − (Σy)²` all exact longs — so
    * the coefficient reproduces bit-identically (no float
    * accumulation; the only float ops are two casts, one multiply,
    * one sqrt, one division). Pairs with a degenerate side (zero
    * variance or < 2 shared days) drop. Day-count vectors meet on
    * the DAY (one join), pair sums are one hash aggregate.
    *
    * @return `(key_a, key_b, n_days, corr)` ordered rows
    */
  def dailyCorrelation(events: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    val daily = events
      .select(col(keyCol).as("k"), to_date(col(tsCol)).as("d"))
      .groupBy(col("k"), col("d"))
      .agg(count(lit(1)).as("y"))
    val joined = daily.select(col("k").as("ka"), col("d"),
        col("y").as("x"))
      .join(daily.select(col("k").as("kb"), col("d"),
        col("y").as("y")), Seq("d"))
      .filter(col("ka") < col("kb"))
    val sums = joined.groupBy(col("ka"), col("kb"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .filter(col("n") >= 2)
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val a = col("n") * col("sxx") - col("sx") * col("sx")
    val b = col("n") * col("syy") - col("sy") * col("sy")
    sums.filter(a > 0 && b > 0)
      .select(col("ka").as("key_a"), col("kb").as("key_b"),
        col("n").as("n_days"),
        (num.cast("double") /
          sqrt(a.cast("double") * b.cast("double"))).as("corr"))
      .orderBy(col("key_a"), col("key_b"))
  }

  /** Lag-`lag` autocorrelation of the per-key daily event counts —
    * the "is today like yesterday" seasonality probe beside
    * [[dailyCorrelation]] (same bit-exact single-tree Pearson:
    * integer sums, ONE `num / sqrt(a·b)` double expression both
    * engines replay identically; never a summed double). Pairs are
    * (day, day+lag) where BOTH days observed events — calendar gaps
    * pair nothing, disclosed. Keys with < 2 pairs or a constant side
    * drop (undefined r).
    *
    * @return `(key, n_pairs, autocorr)` ordered by key
    */
  def autocorrelation(events: DataFrame, keyCol: String,
      tsCol: String, lag: Int = 1): DataFrame = {
    require(lag >= 1, s"lag must be >= 1: $lag")
    val daily = events
      .select(col(keyCol).as("k"), to_date(col(tsCol)).as("d"))
      .groupBy(col("k"), col("d"))
      .agg(count(lit(1)).as("y"))
    val joined = daily.select(col("k"), col("d"), col("y").as("x"))
      .join(daily.select(col("k"),
        date_sub(col("d"), lag).as("d"), col("y").as("y")),
        Seq("k", "d"))
    val sums = joined.groupBy(col("k"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .filter(col("n") >= 2)
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val a = col("n") * col("sxx") - col("sx") * col("sx")
    val b = col("n") * col("syy") - col("sy") * col("sy")
    sums.filter(a > 0 && b > 0)
      .select(col("k").as(keyCol), col("n").as("n_pairs"),
        (num.cast("double") /
          sqrt(a.cast("double") * b.cast("double"))).as("autocorr"))
      .orderBy(col(keyCol))
  }

  /** Inter-event-time variability per key: the squared coefficient of
    * variation of consecutive gaps as EXACT ppm —
    * {{{ cv²·10⁶ = (n·Σd² − (Σd)²)·10⁶ // (Σd)² }}}
    * (population variance over mean², fractions cleared; the
    * numerator is ≥ 0 so truncation = floor). cv² ≈ 0 is a metronome
    * (scripted bot), ≈ 1 Poisson, ≫ 1 bursty — the behavioral
    * fingerprint next to [[eventGaps]]. One lag window + one hash
    * rollup, DECIMAL(38,0) sums; keys with < 2 gaps or a zero span
    * drop.
    *
    * @return `(key, n_gaps, mean_gap_us, cv2_ppm)` ordered by key
    */
  def interEventCv(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val w = Window.partitionBy(col("k"))
      .orderBy(col("__ie_t"), col(idCol))
    events
      .select(col(keyCol).as("k"), col(idCol),
        unix_micros(col(tsCol)).as("__ie_t"))
      .withColumn("__ie_d",
        col("__ie_t") - lag(col("__ie_t"), 1).over(w))
      .filter(col("__ie_d").isNotNull)
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"),
        sum(col("__ie_d").cast(dec)).as("s1"),
        sum(col("__ie_d").cast(dec) * col("__ie_d").cast(dec))
          .as("s2"))
      .filter(col("n") >= 2 && col("s1") > 0)
      .select(col("k").as(keyCol), col("n").as("n_gaps"),
        intDiv(col("s1"), col("n").cast(dec)).as("mean_gap_us"),
        intDiv((col("n").cast(dec) * col("s2") -
          col("s1") * col("s1")) * lit(1000000L).cast(dec),
          col("s1") * col("s1")).as("cv2_ppm"))
      .orderBy(col(keyCol))
  }

  /** Median absolute deviation per key (the robust scale estimator —
    * the anomaly-threshold companion to the rolling z-scores that a
    * fat-tailed metric doesn't wreck): exact rank-selected median,
    * then the exact median of `|v − median|`, both on the scale-safe
    * two-phase ranks ([[Quantiles.exactQuantilesByKey]] — the
    * handful of type keys is precisely the low-cardinality window
    * trap). Values quantize to `valueScale` cents; medians are the
    * `ceil(n/2)`-th rows in `(value, id)` order — exact, no
    * interpolation.
    *
    * @return `(key, median_c, mad_c)` ordered by key
    */
  def madByKey(events: DataFrame, keyCol: String, valueCol: String,
      idCol: String, valueScale: Long = 100L): DataFrame = {
    val base = events.select(col(keyCol).as("k"),
      round(col(valueCol) * valueScale).cast("long").as("vc"),
      col(idCol))
    // the medians table is consumed twice (deviation join + final
    // join-back) and its lineage is a whole rank-selection pipeline —
    // materialize the handful of per-key rows once
    val med = Quantiles.exactQuantilesByKey(base, "k", col("vc"),
        Seq(col(idCol)), Seq(0.5))
      .select(col("k"), col("value").as("median_c"))
      .transform(graft.Materialize.barrier)
    val dev = base.join(broadcast(med), Seq("k"))
      .select(col("k"), abs(col("vc") - col("median_c")).as("dv"),
        col(idCol))
    val mad = Quantiles.exactQuantilesByKey(dev, "k", col("dv"),
        Seq(col(idCol)), Seq(0.5))
      .select(col("k"), col("value").as("mad_c"))
    med.join(mad, Seq("k"))
      .select(col("k").as(keyCol), col("median_c"), col("mad_c"))
      .orderBy(col(keyCol))
  }

  /** Event-type co-occurrence support (the market-basket pair count):
    * for each unordered type pair, how many entities produced BOTH —
    * distinct (entity, type) pairs self-joined on the entity, support
    * as exact ppm of the entity universe. The canonical association
    * mining first step; at scale the join keys on the entity and a
    * hot entity is bounded by the TYPE cardinality squared, not the
    * row count.
    *
    * @return `(type_a, type_b, n_both, support_ppm)` ordered rows
    */
  def typeCooccurrence(events: DataFrame, keyCol: String,
      typeCol: String): DataFrame = {
    val ut = events.select(col(keyCol).as("u"), col(typeCol).as("t"))
      .distinct()
    val universe = ut.select(col("u")).distinct()
      .agg(count(lit(1)).as("__co_total"))
    ut.select(col("u"), col("t").as("ta"))
      .join(ut.select(col("u"), col("t").as("tb")), Seq("u"))
      .filter(col("ta") < col("tb"))
      .groupBy(col("ta").as("type_a"), col("tb").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
      .crossJoin(broadcast(universe))
      .select(col("type_a"), col("type_b"), col("n_both"),
        intDiv(col("n_both") * lit(1000000L), col("__co_total"))
          .as("support_ppm"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Trailing-7-day EXACT distinct entities per day (the rolling MAU
    * shape, exact not sketched): each (entity, active-day) pair votes
    * into the 7 windows ending on days d..d+6, a second distinct
    * collapses multi-day entities per window, and only days the data
    * actually contains report. Explode factor is the CONSTANT 7 —
    * state never exceeds 7× the distinct (entity, day) pairs, the
    * standard exact formulation that beats a 7-day self-join at any
    * scale.
    *
    * @return `(day, n_distinct)` ordered by day
    */
  def rollingDistinct(events: DataFrame, keyCol: String,
      tsCol: String, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1: $windowDays")
    val ud = events
      .select(col(keyCol).as("u"), to_date(col(tsCol)).as("d"))
      .distinct()
    val days = ud.select(col("d")).distinct()
    ud.select(col("u"),
        explode(sequence(col("d"),
          date_add(col("d"), windowDays - 1))).as("day"))
      .distinct()
      .join(days.select(col("d").as("day")), Seq("day"), "left_semi")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_distinct"))
      .select(col("day").cast("timestamp").as("day"),
        col("n_distinct"))
      .orderBy(col("day"))
  }

  /** Period-over-period change report: per-bucket quantized total and
    * the SIGNED ppm delta vs the previous bucket —
    * `⌊(cur − prev)·10⁶ / prev⌋` with sign-explicit truncation, NULL
    * for the first bucket. Totals ride DECIMAL(38,0); the lag window
    * is over the BUCKET rollup (period-cardinality rows — bounded
    * metadata, not data).
    *
    * @return `(bucket, total_c, change_ppm)` ordered by bucket
    */
  def periodChange(df: DataFrame, bucketCol: Column,
      valueCol: String, valueScale: Long = 100L): DataFrame = {
    val w = Window.orderBy(col("bucket"))
    val totals = df
      .select(bucketCol.as("bucket"),
        round(col(valueCol) * valueScale).cast("long").as("vc"))
      .groupBy(col("bucket"))
      .agg(sum(col("vc").cast("decimal(38,0)")).cast("long")
        .as("total_c"))
    val prev = lag(col("total_c"), 1).over(w)
    val num = (col("total_c") - prev) * lit(1000000L)
    totals
      .withColumn("change_ppm",
        when(prev.isNull || prev === 0, lit(null).cast("long"))
          .otherwise(when(num < 0, -intDiv(-num, prev))
            .otherwise(intDiv(num, prev))))
      .orderBy(col("bucket"))
  }

  /** Volume-weighted average price per bucket: `⌊Σ(p·q) / Σq⌋` on
    * quantized prices — exact integer sums (DECIMAL(38,0), so the
    * contract survives any corpus size) and one integral division.
    * One map-side-combinable hash aggregate.
    *
    * @return `(bucket, volume, vwap_c)` ordered by bucket
    */
  def vwap(df: DataFrame, bucketCol: Column, priceCol: String,
      qtyCol: String, priceScale: Long = 100L): DataFrame =
    df
      .select(bucketCol.as("bucket"),
        round(col(priceCol) * priceScale).cast("long").as("pc"),
        round(col(qtyCol)).cast("long").as("q"))
      .groupBy(col("bucket"))
      .agg(
        sum(col("q")).as("volume"),
        sum((col("pc") * col("q")).cast("decimal(38,0)")).as("pv"))
      .select(col("bucket"), col("volume"),
        intDiv(col("pv"), col("volume").cast("decimal(38,0)"))
          .cast("long").as("vwap_c"))
      .orderBy(col("bucket"))

  /** Maximum drawdown per key: the largest peak-to-trough drop of the
    * key's `(ts, id)`-ordered value series — `max(runmax − v)` over a
    * running-max window. The risk readout for any metric series
    * (queue depth, loss curve, account value). Values quantize to
    * `valueScale` longs; one key-partitioned running-max window plus
    * one hash rollup, both exact integers.
    *
    * @return `(key, n_events, peak_c, max_drawdown_c)` ordered by key
    */
  def maxDrawdown(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String, valueScale: Long = 100L)
      : DataFrame = {
    val w = Window.partitionBy(col("k"))
      .orderBy(col("__dd_t"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col(keyCol).as("k"), col(idCol),
        unix_micros(col(tsCol)).as("__dd_t"),
        round(col(valueCol) * valueScale).cast("long").as("vc"))
      .withColumn("__dd_peak", max(col("vc")).over(w))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_events"),
        max(col("vc")).as("peak_c"),
        max(col("__dd_peak") - col("vc")).as("max_drawdown_c"))
      .select(col("k").as(keyCol), col("n_events"), col("peak_c"),
        col("max_drawdown_c"))
      .orderBy(col(keyCol))
  }

  /** Cohort LTV curve: per (first-seen week, week offset), the
    * cohort's revenue that week and the RUNNING cumulative — the
    * money twin of [[retention]] (same two key-hash aggregates; the
    * cumulative window runs over cohort×offset ROLLUP rows, bounded
    * metadata). Revenue quantizes to `valueScale` longs and sums on
    * DECIMAL(38,0).
    *
    * @return `(cohort_week, week_offset, revenue_c, cum_revenue_c)`
    *         ordered by (cohort_week, week_offset)
    */
  def cohortLtv(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, valueScale: Long = 100L): DataFrame = {
    val firstSeen = events
      .groupBy(col(keyCol).as("k"))
      .agg(to_date(date_trunc("week", min(col(tsCol)))).as("cw"))
    val cells = events
      .select(col(keyCol).as("k"),
        to_date(date_trunc("week", col(tsCol))).as("aw"),
        round(col(valueCol) * valueScale).cast("long").as("vc"))
      .join(firstSeen, Seq("k"))
      .select(col("cw"),
        (datediff(col("aw"), col("cw")) / 7).cast("long").as("off"),
        col("vc"))
      .groupBy(col("cw"), col("off"))
      .agg(sum(col("vc").cast("decimal(38,0)")).cast("long")
        .as("revenue_c"))
    val cum = Window.partitionBy(col("cw")).orderBy(col("off"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("cum_revenue_c",
        sum(col("revenue_c").cast("decimal(38,0)")).over(cum)
          .cast("long"))
      .select(col("cw").as("cohort_week"), col("off").as("week_offset"),
        col("revenue_c"), col("cum_revenue_c"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Hour-of-week activity heatmap: events and distinct actives per
    * (day-of-week, hour) cell — the load-shape profile. DOW is
    * explicit epoch-day arithmetic (`(days + 4) mod 7`, 0 = Sunday)
    * so both engines share the grid with no locale/timezone week
    * rules; hours are session-UTC. Two hash aggregates.
    *
    * @return `(dow, hour, n_events, n_users)` ordered by (dow, hour)
    */
  def hourOfWeekHeatmap(events: DataFrame, keyCol: String,
      tsCol: String): DataFrame =
    events
      .select(
        ((intDiv(unix_micros(col(tsCol)), lit(86400000000L)) + 4L) % 7L)
          .as("dow"),
        hour(col(tsCol)).cast("long").as("hour"),
        col(keyCol).as("__hh_k"))
      .groupBy(col("dow"), col("hour"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("__hh_k")).as("n_users"))
      .orderBy(col("dow"), col("hour"))

  /** New vs returning actives per week: entities first seen that week
    * vs entities active but seen before — the growth-mix readout next
    * to [[retention]]. Weeks are `date_trunc("week")` under the
    * engine's UTC sessions. One first-touch aggregate + one distinct
    * (entity, week) aggregate meeting on the entity key.
    *
    * @return `(week, new_users, returning_users)` ordered by week
    */
  def newVsReturning(events: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    val firstW = events.groupBy(col(keyCol).as("k"))
      .agg(date_trunc("week", min(col(tsCol))).as("fw"))
    val active = events
      .select(col(keyCol).as("k"),
        date_trunc("week", col(tsCol)).as("week"))
      .distinct()
    active.join(firstW, Seq("k"))
      .groupBy(col("week"))
      .agg(sum(when(col("week") === col("fw"), 1L).otherwise(0L))
        .as("new_users"),
        sum(when(col("week") =!= col("fw"), 1L).otherwise(0L))
          .as("returning_users"))
      .orderBy(col("week"))
  }

  /** Audience overlap between event types: for every co-observed type
    * pair, the distinct-entity intersection and exact Jaccard ppm —
    * which behaviors share an audience. One distinct (type, entity)
    * table, one entity-keyed self-join (the handful of types bounds
    * the per-entity pair explode at types²), two hash rollups; pairs
    * with zero shared entities don't report (disclosed).
    *
    * @return `(type_a, type_b, n_a, n_b, n_both, jaccard_ppm)`
    *         ordered, type_a < type_b
    */
  def audienceOverlap(events: DataFrame, keyCol: String,
      typeCol: String): DataFrame = {
    val tu = events.select(col(typeCol).as("ty"), col(keyCol).as("u"))
      .distinct()
    val sizes = tu.groupBy(col("ty")).agg(count(lit(1)).as("n"))
    val both = tu.select(col("ty").as("type_a"), col("u"))
      .join(tu.select(col("ty").as("type_b"), col("u")), Seq("u"))
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_both"))
    both
      .join(broadcast(sizes.select(col("ty").as("type_a"),
        col("n").as("n_a"))), Seq("type_a"))
      .join(broadcast(sizes.select(col("ty").as("type_b"),
        col("n").as("n_b"))), Seq("type_b"))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("n_both"),
        intDiv(col("n_both").cast("decimal(38,0)") * lit(1000000L),
          (col("n_a") + col("n_b") - col("n_both"))
            .cast("decimal(38,0)")).as("jaccard_ppm"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Power-user concentration (the Pareto readout): for each
    * requested top fraction, how much of all activity the top
    * `⌈pct·n⌉` entities generate — exact share ppm. Entity ranks ride
    * the scale-safe two-phase row_number ([[Salting.twoPhaseRanks]],
    * `(count desc, entity)` tiebreak — never a single-partition
    * window); the per-pct cutoffs are a broadcast pcts×1 table, so
    * the inequality join touches each ranked row |pcts| times at
    * most.
    *
    * @return `(pct, top_users, events_top, events_total, share_ppm)`
    *         ordered by pct
    */
  def powerUsers(events: DataFrame, keyCol: String,
      pcts: Seq[Double] = Seq(0.01, 0.1)): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p > 0.0 && p <= 1.0),
      s"pcts must be in (0, 1]: $pcts")
    val spark = events.sparkSession
    import spark.implicits._
    // one materialization of the per-entity rollup: the rank
    // machinery (3 consumers) and the cutoff aggregate would
    // otherwise re-aggregate the event table four times
    val counts = events.groupBy(col(keyCol).as("k"))
      .agg(count(lit(1)).as("cnt"))
      .transform(graft.Materialize.barrier)
    val ranked = Salting.twoPhaseRanks(counts, Seq.empty,
      orderCols = Seq(col("cnt").desc, col("k")),
      rowNumCol = Some("__pu_rn"))
    val cuts = counts
      .agg(count(lit(1)).as("nu"),
        sum(col("cnt")).cast("long").as("te"))
      .crossJoin(pcts.toDF("pct"))
      .select(col("pct"),
        greatest(lit(1L), ceil(col("pct") * col("nu")).cast("long"))
          .as("top_users"),
        col("te").as("events_total"))
    ranked.join(broadcast(cuts),
        col("__pu_rn").cast("long") <= col("top_users"))
      .groupBy(col("pct"), col("top_users"), col("events_total"))
      .agg(sum(col("cnt")).cast("long").as("events_top"))
      .select(col("pct"), col("top_users"), col("events_top"),
        col("events_total"),
        intDiv(col("events_top").cast("decimal(38,0)") *
          lit(1000000L), col("events_total").cast("decimal(38,0)"))
          .as("share_ppm"))
      .orderBy(col("pct"))
  }

  /** Stickiness (WAU/MAU-class engagement ratio): per active week,
    * the distinct weekly actives vs the distinct actives of the
    * TRAILING `windowWeeks` weeks, as exact ppm. The trailing
    * distinct rides the [[rollingDistinct]] vote-explode — each
    * (entity, week) first-touch casts one vote into the
    * `windowWeeks` weeks it counts toward, then ONE distinct + count;
    * never a self-join, never an HLL error bar. Only weeks present in
    * the data report (left-semi against observed weeks).
    *
    * @return `(week, wau, mau, stickiness_ppm)` ordered by week
    */
  def stickiness(events: DataFrame, keyCol: String, tsCol: String,
      windowWeeks: Int = 4): DataFrame = {
    require(windowWeeks >= 1, s"windowWeeks must be >= 1: $windowWeeks")
    val uw = events
      .select(col(keyCol).as("u"),
        to_date(date_trunc("week", col(tsCol))).as("w"))
      .distinct()
      .transform(graft.Materialize.barrier)
    val weeks = uw.select(col("w")).distinct()
    val wau = uw.groupBy(col("w")).agg(count(lit(1)).as("wau"))
    val mau = uw
      .select(col("u"), explode(transform(
        sequence(lit(0), lit(windowWeeks - 1)),
        i => date_add(col("w"), i * 7))).as("w"))
      .distinct()
      .join(weeks, Seq("w"), "left_semi")
      .groupBy(col("w")).agg(count(lit(1)).as("mau"))
    wau.join(mau, Seq("w"))
      .select(col("w").cast("timestamp").as("week"), col("wau"),
        col("mau"),
        intDiv(col("wau") * lit(1000000L), col("mau"))
          .as("stickiness_ppm"))
      .orderBy(col("week"))
  }

  /** Single change-point per key (binary segmentation, step 1): the
    * split index k minimizing the two-segment total SSE of the key's
    * `(ts, id)`-ordered quantized series — equivalently maximizing
    * {{{ g(k) = (S1ₚ²·(n−k) + S1ₛ²·k) // (k·(n−k)) }}}
    * over prefix/suffix sums, all on DECIMAL(38,0) (the argmax is of
    * the FLOORED score — a disclosed quantization both engines replay
    * bit-for-bit; ties take the smallest k). The per-key evaluation
    * is one prefix-sum fold plus one linear transform over the same
    * array the EWMA/LTTB family uses, under the same disclosed
    * earliest-N `maxEventsPerKey` cap (rank-window cut, spill-safe;
    * like EWMA's, the cap also bounds the fold's quadratic
    * array-copy cost — see that operator's hot-entity note).
    * Keys with fewer than 2 events drop (no split exists).
    *
    * @return `(key, n_events, split_idx, left_mean_c, right_mean_c)`
    *         — means are the exact FLOORED segment means in cents
    *         (true floor even for negative segment sums, via the
    *         sign-split [[floorDiv]]; the oracle replays the same
    *         CASE — a bare `//` truncates, it does not floor)
    */
  def changepoint(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String, valueScale: Long = 100L,
      maxEventsPerKey: Int = 1 << 16): DataFrame = {
    require(maxEventsPerKey >= 2,
      s"maxEventsPerKey must be >= 2: $maxEventsPerKey")
    val rnW = Window.partitionBy(col("k"))
      .orderBy(col("e.t"), col("e.i"))
    val byKey = events
      .select(col(keyCol).as("k"),
        struct(unix_micros(col(tsCol)).as("t"), col(idCol).as("i"),
          round(col(valueCol) * valueScale).cast("long").as("vc"))
          .as("e"))
      .withColumn("__cp_rn", row_number().over(rnW))
      .filter(col("__cp_rn") <= maxEventsPerKey)
      .groupBy(col("k"))
      .agg(transform(sort_array(collect_list(col("e"))),
        e => e.getField("vc")).as("vs"))
      .filter(size(col("vs")) >= 2)
    val dec = "decimal(38,0)"
    // the prefix sums run as ONE native O(n) long pass
    // ([[graft.functions.PrefixSumSeries]]) — the earlier HOF fold
    // array_append-copied a decimal accumulator per step, O(cap²) on
    // a maxed key; the per-key prefix values fit longs comfortably
    // (only the SCORE products below need DECIMAL(38,0))
    val withPre = byKey
      .withColumn("pre",
        org.apache.spark.sql.graftbridge.ColumnBridge.column(
          graft.functions.PrefixSumSeries(
            org.apache.spark.sql.graftbridge.ColumnBridge
              .expression(col("vs")))))
      .withColumn("n", size(col("vs")).cast("long"))
      .withColumn("s1", element_at(col("pre"), -1))
    // score each k over the FIRST n-1 prefix sums (k = 1-based slot);
    // min of (-score, k) = max score with smallest-k tie rule
    val scored = withPre.withColumn("best",
      element_at(array_sort(zip_with(
        slice(col("pre"), lit(1), size(col("vs")) - 1),
        sequence(lit(1L), col("n") - 1L),
        (sp, k) => {
          val spD = sp.cast(dec)
          val ss = (col("s1") - sp).cast(dec)
          val nk = (col("n") - k).cast(dec)
          struct(-intDiv(spD * spD * nk + ss * ss * k.cast(dec),
            (k.cast(dec) * nk).cast(dec)).as("negs"),
            k.as("k"), sp.as("sp"))
        })), 1))
    scored
      .select(col("k").as(keyCol), col("n").as("n_events"),
        col("best.k").as("split_idx"),
        floorDiv(col("best.sp"), col("best.k")).as("left_mean_c"),
        floorDiv(col("s1") - col("best.sp"),
          col("n") - col("best.k")).as("right_mean_c"))
      .orderBy(col(keyCol))
  }

  /** Time-weighted average per key (TWAP — the time twin of [[vwap]]):
    * each value holds until the key's next event, so the mean is
    * `⌊Σ(vᵢ·Δtᵢ) / ΣΔtᵢ⌋` with Δtᵢ the micros to the next event.
    * DISCLOSED edges: the last event carries no weight (nothing to
    * hold until) and single-event keys drop; values are assumed
    * non-negative quantized (the sign-uniform case where truncating
    * and flooring division agree). One lead window + one hash rollup,
    * DECIMAL(38,0) products.
    *
    * @return `(key, span_us, twap_c)` ordered by key
    */
  def twap(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String, valueScale: Long = 100L)
      : DataFrame = {
    val w = Window.partitionBy(col("k"))
      .orderBy(col("__tw_t"), col(idCol))
    events
      .select(col(keyCol).as("k"), col(idCol),
        unix_micros(col(tsCol)).as("__tw_t"),
        round(col(valueCol) * valueScale).cast("long").as("vc"))
      .withColumn("__tw_nt", lead(col("__tw_t"), 1).over(w))
      .filter(col("__tw_nt").isNotNull)
      .groupBy(col("k"))
      .agg(sum((col("__tw_nt") - col("__tw_t")).cast("decimal(38,0)") *
          col("vc")).as("wv"),
        sum((col("__tw_nt") - col("__tw_t")).cast("decimal(38,0)"))
          .as("wt"))
      .select(col("k").as(keyCol), col("wt").cast("long").as("span_us"),
        intDiv(col("wv"), col("wt")).as("twap_c"))
      .orderBy(col(keyCol))
  }

  /** Gini coefficient of per-entity event counts, per event type —
    * the engagement-inequality readout (0 = uniform, → 1 = one bot
    * holds everything; the skew early-warning for the hot-key guards
    * elsewhere in the engine). Exact rational:
    * `G·10⁶ = (2·Σ(i·xᵢ) − (n+1)·Σx)·10⁶ // (n·Σx)` over counts
    * sorted ascending with rank i — ranks come from the scale-safe
    * two-phase row_number ([[Salting.twoPhaseRanks]]), NEVER a
    * single-partition window over the handful of fixed type keys
    * (the IQR lesson). Products ride DECIMAL(38,0).
    *
    * @return `(type, n_entities, total_events, gini_ppm)` ordered
    */
  def gini(events: DataFrame, keyCol: String,
      typeCol: String): DataFrame = {
    // one materialization of the per-entity rollup for the rank
    // machinery's three consumers (split sample, window, offsets)
    val perUser = events
      .groupBy(col(typeCol).as("ty"), col(keyCol).as("u"))
      .agg(count(lit(1)).as("x"))
      .transform(graft.Materialize.barrier)
    val ranked = Salting.twoPhaseRanks(perUser, Seq("ty"),
      Seq(col("x"), col("u")), rowNumCol = Some("__g_i"))
    ranked
      .groupBy(col("ty"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum((col("__g_i").cast("decimal(38,0)") * col("x")))
          .as("six"))
      .select(col("ty").as(typeCol),
        col("n").as("n_entities"),
        col("sx").cast("long").as("total_events"),
        intDiv((col("six") * 2 - (col("n") + 1) * col("sx")) *
          lit(1000000L), col("n") * col("sx")).as("gini_ppm"))
      .orderBy(col(typeCol))
  }

  /** RFM segmentation: per entity, recency (days from its last event
    * day to the corpus max day), frequency (event count), monetary
    * (quantized value total), each quartile-bucketed 1–4 by the
    * EXPLICIT rank rule `⌊(rank−1)·4/n⌋ + 1` over the scale-safe
    * two-phase row_number (ties broken by entity id, disclosed;
    * recency ranks DESCENDING so bucket 4 = most recent — bucket 4 is
    * "best" on every axis). No ntile, no boundary floats: the bucket
    * is a pure function of the distributed rank, replayable by any
    * engine.
    *
    * @return `(key, recency_days, frequency, monetary_c, r_bucket,
    *         f_bucket, m_bucket, segment)` — `segment` = r·100+f·10+m
    */
  def rfm(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, valueScale: Long = 100L): DataFrame = {
    val perUser = events
      .groupBy(col(keyCol).as("u"))
      .agg(max(to_date(col(tsCol))).as("lastd"),
        count(lit(1)).as("freq"),
        sum(round(col(valueCol) * valueScale).cast("long")
          .cast("decimal(38,0)")).cast("long").as("mon"))
    val gmax = perUser.agg(max(col("lastd")).as("gmax"))
    val base = perUser.crossJoin(broadcast(gmax))
      .select(col("u"),
        datediff(col("gmax"), col("lastd")).cast("long").as("rec"),
        col("freq"), col("mon"))
      .transform(graft.Materialize.barrier)
    // each rank level's machinery consumes its input three times
    // (split-bound sample, local window, offsets aggregate) — without
    // a materialization barrier between levels the innermost plan
    // re-executed 3^depth times (measured: 18 checkpoint re-reads and
    // 172 Window operators in the final plan before this)
    val r1 = Salting.twoPhaseRanks(base, Seq(),
        Seq(col("rec").desc, col("u")), rowNumCol = Some("__r_rn"))
      .transform(graft.Materialize.barrier)
    val r2 = Salting.twoPhaseRanks(r1,
        Seq(), Seq(col("freq"), col("u")), rowNumCol = Some("__f_rn"))
      .transform(graft.Materialize.barrier)
    val ranked = Salting.twoPhaseRanks(r2,
      Seq(), Seq(col("mon"), col("u")), rowNumCol = Some("__m_rn"))
    val n = base.agg(count(lit(1)).as("__rfm_n"))
    def bucket(rn: Column): Column =
      intDiv((rn - 1) * 4, col("__rfm_n")) + 1
    ranked.crossJoin(broadcast(n))
      .select(col("u").as(keyCol), col("rec").as("recency_days"),
        col("freq").as("frequency"), col("mon").as("monetary_c"),
        bucket(col("__r_rn")).as("r_bucket"),
        bucket(col("__f_rn")).as("f_bucket"),
        bucket(col("__m_rn")).as("m_bucket"))
      .withColumn("segment",
        col("r_bucket") * 100 + col("f_bucket") * 10 + col("m_bucket"))
      .orderBy(col(keyCol))
  }

  /** Discrete churn-hazard table: per cohort age k (weeks since an
    * entity's first week), the entities whose LAST observed week is
    * exactly k weeks in (`churned`), the entities still observed at
    * age ≥ k (`at_risk`), and the hazard `⌊churned·10⁶/at_risk⌋`.
    * Right-censoring is disclosed-ignored: the last observed week IS
    * the churn week (the standard closed-window readout). Two hash
    * aggregates plus one reverse cumulative window over AGE rollup
    * rows (bounded metadata, not data).
    *
    * @return `(age_weeks, churned, at_risk, hazard_ppm)` ordered
    */
  def churnHazard(events: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    val span = events
      .select(col(keyCol).as("k"),
        to_date(date_trunc("week", col(tsCol))).as("w"))
      .groupBy(col("k"))
      .agg(min(col("w")).as("cw"), max(col("w")).as("lw"))
      .select((datediff(col("lw"), col("cw")) / 7).cast("long")
        .as("age"))
      .groupBy(col("age"))
      .agg(count(lit(1)).as("churned"))
    val atRisk = Window.orderBy(col("age").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    span
      .withColumn("at_risk", sum(col("churned")).over(atRisk))
      .select(col("age").as("age_weeks"), col("churned"),
        col("at_risk"),
        intDiv(col("churned") * lit(1000000L), col("at_risk"))
          .as("hazard_ppm"))
      .orderBy(col("age_weeks"))
  }

  /** Longest consecutive-active-day streak per entity — the habit
    * readout beside [[newVsReturning]]'s growth mix: distinct active
    * epoch days, then the classic gaps-and-islands grouping
    * (`day − row_number` is constant exactly over a consecutive run).
    * All integer; the per-entity window ranges over DISTINCT DAYS
    * (calendar-bounded, never event history), keyed on the entity —
    * the scale-safe shape.
    *
    * @return `(entity, active_days, max_streak)` ordered by entity
    */
  def streaks(events: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    val w = Window.partitionBy(col("k")).orderBy(col("d"))
    events
      .select(col(keyCol).as("k"),
        datediff(to_date(col(tsCol)),
          lit("1970-01-01").cast("date")).cast("long").as("d"))
      .distinct()
      .withColumn("__g", col("d") - row_number().over(w))
      .groupBy(col("k"), col("__g"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("k"))
      .agg(sum(col("len")).cast("long").as("active_days"),
        max(col("len")).as("max_streak"))
      .select(col("k").as(keyCol), col("active_days"),
        col("max_streak"))
      .orderBy(col(keyCol))
  }

  /** Seasonal-naive forecast error per key: predict each day's count
    * with the count `periodDays` earlier and report the exact
    * absolute-error mass — the cheapest possible seasonality /
    * volatility readout for curation telemetry (a spiking WMAPE says
    * the weekly rhythm broke). Only days where BOTH sides exist
    * compare (disclosed). Two hash aggregates + one self-join on
    * (key, day); WMAPE as exact ppm of the compared actual mass.
    *
    * @return `(key, n_days, total_abs_err, wmape_ppm)` ordered
    */
  def seasonalError(events: DataFrame, keyCol: String, tsCol: String,
      periodDays: Int = 7): DataFrame = {
    require(periodDays >= 1, s"periodDays must be >= 1: $periodDays")
    val daily = events
      .select(col(keyCol).as("k"), to_date(col(tsCol)).as("d"))
      .groupBy(col("k"), col("d"))
      .agg(count(lit(1)).as("y"))
    daily.select(col("k"), col("d"), col("y").as("actual"))
      .join(daily.select(col("k"),
        date_add(col("d"), periodDays).as("d"), col("y").as("pred")),
        Seq("k", "d"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_days"),
        sum(abs(col("actual") - col("pred"))).cast("long")
          .as("total_abs_err"),
        sum(col("actual")).cast("long").as("total_actual"))
      .select(col("k").as(keyCol), col("n_days"),
        col("total_abs_err"),
        intDiv(col("total_abs_err") * lit(1000000L),
          col("total_actual")).as("wmape_ppm"))
      .orderBy(col(keyCol))
  }

  /** Local-peak days per key: days whose count strictly exceeds BOTH
    * observed neighbors (rank-adjacent over the days that exist —
    * calendar gaps are not zero-filled, disclosed; compose with
    * [[resampleFill]] first when they should be). First/last days
    * never peak (no two-sided evidence). Integer exact; per-key
    * windows over daily rollup rows only.
    *
    * @return `(key, day, n_events)` ordered by (key, day)
    */
  def peakDays(events: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    val w = Window.partitionBy(col("k")).orderBy(col("d"))
    events
      .select(col(keyCol).as("k"), to_date(col(tsCol)).as("d"))
      .groupBy(col("k"), col("d"))
      .agg(count(lit(1)).as("y"))
      .withColumn("__p", lag(col("y"), 1).over(w))
      .withColumn("__n", lead(col("y"), 1).over(w))
      .filter(col("__p").isNotNull && col("__n").isNotNull &&
        col("y") > col("__p") && col("y") > col("__n"))
      .select(col("k").as(keyCol), col("d").cast("timestamp")
        .as("day"), col("y").as("n_events"))
      .orderBy(col(keyCol), col("day"))
  }

  /** Bounce rate per entity: the share of gap-split sessions holding
    * exactly ONE event — the engagement-quality readout over the same
    * session split as `q_sessionize` (same gap, same `(t, id)` order,
    * so the two reconcile row for row). Exact ppm; one key shuffle +
    * two rollups.
    *
    * @return `(entity, n_sessions, bounces, bounce_ppm)` ordered
    */
  def bounceRate(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, gapMicros: Long = 30L * 60 * 1000000L)
      : DataFrame = {
    require(gapMicros > 0, s"gapMicros must be > 0: $gapMicros")
    val w = Window.partitionBy(col("k"))
      .orderBy(col("__br_t"), col(idCol))
    val cum = Window.partitionBy(col("k"))
      .orderBy(col("__br_t"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col(keyCol).as("k"), col(idCol),
        unix_micros(col(tsCol)).as("__br_t"))
      .withColumn("__br_new",
        when(lag(col("__br_t"), 1).over(w).isNull ||
          col("__br_t") - lag(col("__br_t"), 1).over(w) > gapMicros,
          1L).otherwise(0L))
      .withColumn("__br_sess", sum(col("__br_new")).over(cum))
      .groupBy(col("k"), col("__br_sess"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n") === 1L, 1L).otherwise(0L)).cast("long")
          .as("bounces"))
      .select(col("k").as(keyCol), col("n_sessions"), col("bounces"),
        intDiv(col("bounces") * lit(1000000L), col("n_sessions"))
          .as("bounce_ppm"))
      .orderBy(col(keyCol))
  }

  /** Weekend-vs-weekday lift per key, exact ppm: mean events per
    * OBSERVED weekend day over mean events per observed weekday
    * (`(we_sum·wd_days·10⁶) // (wd_sum·we_days)` — fractions
    * cleared, DECIMAL(38,0) products). Day-of-week comes from the
    * explicit epoch-day grid (`(days + 4) mod 7`, 0 = Sunday — no
    * locale/timezone week rules), weekend = {0, 6}; keys missing a
    * class (or with zero weekday events) drop, disclosed. The
    * one-number seasonality contrast beside the full
    * [[hourOfWeekHeatmap]] grid.
    *
    * @return `(key, weekday_days, weekend_days, weekday_events,
    *         weekend_events, lift_ppm)` ordered
    */
  def weekendLift(events: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val daily = events
      .select(col(keyCol).as("k"),
        datediff(to_date(col(tsCol)),
          lit("1970-01-01").cast("date")).cast("long").as("d"))
      .groupBy(col("k"), col("d"))
      .agg(count(lit(1)).as("y"))
      .withColumn("we",
        pmod(col("d") + 4, lit(7)).isin(0L, 6L))
    daily.groupBy(col("k"))
      .agg(sum(when(!col("we"), 1L).otherwise(0L)).cast("long")
          .as("weekday_days"),
        sum(when(col("we"), 1L).otherwise(0L)).cast("long")
          .as("weekend_days"),
        sum(when(!col("we"), col("y")).otherwise(0L)).cast("long")
          .as("weekday_events"),
        sum(when(col("we"), col("y")).otherwise(0L)).cast("long")
          .as("weekend_events"))
      .filter(col("weekday_days") > 0 && col("weekend_days") > 0 &&
        col("weekday_events") > 0)
      .select(col("k").as(keyCol), col("weekday_days"),
        col("weekend_days"), col("weekday_events"),
        col("weekend_events"),
        intDiv(col("weekend_events").cast(dec) *
          col("weekday_days").cast(dec) * lit(1000000L).cast(dec),
          col("weekday_events").cast(dec) *
            col("weekend_days").cast(dec)).cast("long")
          .as("lift_ppm"))
      .orderBy(col(keyCol))
  }

  /** Weekday→weekend TYPE-MIX DRIFT: per-type contributions to
    * `KL(P‖Q)` in exact micro-nats, with P the weekday type mix and
    * Q the weekend mix — the distribution-shift detector beside
    * [[weekendLift]]'s volume contrast (lift says HOW MUCH more
    * traffic; drift says whether it is DIFFERENT traffic):
    * {{{ contrib·10⁶ = cw_t·(⌊ln cw_t⌉ − ⌊ln CW⌉ − ⌊ln ce_t⌉ +
    *     ⌊ln CE⌉) div CW }}}
    * — every `ln` quantizes AT ITS INTEGER ARGUMENT (the
    * [[typeEntropy]] contract: a ratio's log becomes a ± of integer
    * logs, so no float ratio ever forms), then pure integer
    * arithmetic; the division truncates toward zero (both engines'
    * native rule, disclosed — contributions are legitimately
    * negative). Only types observed in BOTH classes compare, and the
    * totals renormalize over that co-observed set (disclosed —
    * one-sided types would make KL infinite). Two hash rollups + a
    * broadcast one-row cross.
    *
    * @return `(type, weekday_n, weekend_n, contrib_unat)` ordered;
    *         `sum(contrib_unat)` is the corpus KL·10⁶
    */
  def typeDrift(events: DataFrame, typeCol: String,
      tsCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    def lnq(c: Column): Column =
      round(log(c.cast("double")) * lit(1000000.0)).cast("long")
    val cls = events.select(col(typeCol).as("ty"),
      pmod(datediff(to_date(col(tsCol)),
        lit("1970-01-01").cast("date")).cast("long") + 4, lit(7))
        .isin(0L, 6L).as("we"))
    val byType = cls.groupBy(col("ty"))
      .agg(sum(when(!col("we"), 1L).otherwise(0L)).cast("long")
          .as("wd"),
        sum(when(col("we"), 1L).otherwise(0L)).cast("long").as("wk"))
      .filter(col("wd") > 0 && col("wk") > 0)
      .transform(graft.Materialize.barrier)
    val tot = byType.agg(sum(col("wd")).cast("long").as("cw"),
      sum(col("wk")).cast("long").as("ce"))
    byType.crossJoin(broadcast(tot))
      .select(col("ty").as(typeCol), col("wd").as("weekday_n"),
        col("wk").as("weekend_n"),
        intDiv(col("wd").cast(dec) *
          (lnq(col("wd")) - lnq(col("cw")) - lnq(col("wk")) +
            lnq(col("ce"))).cast(dec),
          col("cw").cast(dec)).cast("long").as("contrib_unat"))
      .orderBy(col(typeCol))
  }

  /** Session-DEPTH distribution: how many gap-split sessions hold
    * exactly `n` events — the engagement histogram whose first bar is
    * [[bounceRate]]'s numerator (same split, so the two reconcile).
    * One key shuffle + two rollups, all integer.
    *
    * @return `(session_events, n_sessions)` ordered
    */
  def sessionDepths(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, gapMicros: Long = 30L * 60 * 1000000L)
      : DataFrame = {
    require(gapMicros > 0, s"gapMicros must be > 0: $gapMicros")
    val w = Window.partitionBy(col("k"))
      .orderBy(col("__sd_t"), col(idCol))
    val cum = Window.partitionBy(col("k"))
      .orderBy(col("__sd_t"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col(keyCol).as("k"), col(idCol),
        unix_micros(col(tsCol)).as("__sd_t"))
      .withColumn("__sd_new",
        when(lag(col("__sd_t"), 1).over(w).isNull ||
          col("__sd_t") - lag(col("__sd_t"), 1).over(w) > gapMicros,
          1L).otherwise(0L))
      .withColumn("__sd_sess", sum(col("__sd_new")).over(cum))
      .groupBy(col("k"), col("__sd_sess"))
      .agg(count(lit(1)).as("session_events"))
      .groupBy(col("session_events"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("session_events"))
  }

  /** Shannon entropy of each entity's event-type mix in exact
    * MICRO-NATS — the behavioral-diversity fingerprint beside
    * [[interEventCv]]'s timing fingerprint (a bot hammering one type
    * scores 0; a uniform k-type mix scores ln k): with per-type
    * counts `c_i` and total `n`,
    * {{{ H·10⁶ = ln(n)·10⁶ − (Σ c_i·⌊ln(c_i)·10⁶⌉) // n }}}
    * — every `ln` quantizes to micro-nats at the INTEGER count it is
    * taken of (the tfidf/bm25 6-dp contract), after which the
    * arithmetic is exact integer end to end; all terms non-negative,
    * so `div` ≡ `//`. Two hash aggregates, products on
    * DECIMAL(38,0).
    *
    * @return `(entity, n_events, n_types, entropy_unat)` ordered
    */
  def typeEntropy(events: DataFrame, keyCol: String,
      typeCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    def lnq(c: Column): Column =
      round(log(c.cast("double")) * lit(1000000.0)).cast("long")
    events
      .groupBy(col(keyCol).as("k"), col(typeCol).as("ty"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("k"))
      .agg(sum(col("c")).cast("long").as("n"),
        count(lit(1)).as("n_types"),
        sum(col("c").cast(dec) * lnq(col("c")).cast(dec)).cast(dec)
          .as("sclnc"))
      .select(col("k").as(keyCol), col("n").as("n_events"),
        col("n_types"),
        (lnq(col("n")) - intDiv(col("sclnc"), col("n").cast(dec))
          .cast("long")).as("entropy_unat"))
      .orderBy(col(keyCol))
  }
}
