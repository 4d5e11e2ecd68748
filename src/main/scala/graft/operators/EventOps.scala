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
