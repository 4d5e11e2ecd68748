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

  /** Self-tuning entry point for scale-safe ranking over
    * low-cardinality partition keys: one approx-distinct pass decides
    * whether the (key, sort-tuple) group table is broadcastable — if
    * so, `rank`/`dense_rank` ride [[tieGroupRanks]] (no row sort at
    * all); otherwise, or whenever `row_number` is requested (its
    * ordering is near-unique by definition), [[twoPhaseRanks]] takes
    * over. `maxGroups` bounds what "broadcastable" means — the group
    * table is one row per distinct sort value per key. */
  def scalableRanks(df: DataFrame, partCols: Seq[String],
      orderCols: Seq[Column], rowNumCol: Option[String] = None,
      rankCol: Option[String] = None,
      denseRankCol: Option[String] = None,
      maxGroups: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val tieOnly = rowNumCol.isEmpty &&
      rankCol.orElse(denseRankCol).nonEmpty
    lazy val groupsApprox = {
      val children = orderCols.map(c => ColumnBridge.sortOrderOf(c)._1)
      df.agg(approx_count_distinct(
        struct((partCols.map(col) ++ children): _*)).as("g"))
        .head().getLong(0)
    }
    // approx_count_distinct typically under-counts by a few percent
    // near the boundary; a 10% safety margin keeps the broadcast group
    // table from silently exceeding maxGroups (perf/driver-memory
    // guard only — either path is exact)
    if (tieOnly && groupsApprox * 11L <= maxGroups * 10L) {
      tieGroupRanks(df, partCols, orderCols, rankCol, denseRankCol)
    } else {
      twoPhaseRanks(df, partCols, orderCols, rowNumCol, rankCol,
        denseRankCol)
    }
  }

  /** `rank`/`dense_rank` via TIE-GROUP aggregation: both depend only
    * on the (partition key, sort tuple) group — never on row
    * identity — so they compute on the aggregated group table (one
    * row per distinct sort value per key: tiny whenever ranking ties
    * are the point) and broadcast back:
    *   rank       = 1 + rows in strictly-earlier groups of the key
    *   dense_rank = the group's ordinal
    * ONE data shuffle (the groupBy), a window over the group table,
    * and a map-side broadcast join — no per-row sort of the data at
    * all, so an O(1)-cardinality partition key costs nothing. Use
    * [[twoPhaseRanks]] instead when the sort key is near-unique (the
    * group table would approach the data) or for `row_number`.
    *
    * Join-back equality is null-safe (`<=>`), matching SQL window
    * semantics where NULL and NaN sort keys form ordinary groups. */
  def tieGroupRanks(df: DataFrame, partCols: Seq[String],
      orderCols: Seq[Column], rankCol: Option[String] = None,
      denseRankCol: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    require(rankCol.orElse(denseRankCol).nonEmpty,
      "tieGroupRanks: request at least one rank column")
    val orders = orderCols.map(ColumnBridge.sortOrderOf)
    val keyNames = orders.indices.map(i => s"__tgr_k$i")
    val keyed = df.select((partCols.map(col) ++
      orders.zipWithIndex.map { case ((c, _, _), i) =>
        c.as(keyNames(i)) }): _*)
    val groups = keyed
      .groupBy((partCols ++ keyNames).map(col): _*)
      .agg(count(lit(1)).as("__tgr_cnt"))
    val sortCols = orders.zipWithIndex.map {
      case ((_, asc, nullsFirst), i) => (asc, nullsFirst) match {
        case (true, true) => col(keyNames(i)).asc
        case (true, false) => col(keyNames(i)).asc_nulls_last
        case (false, false) => col(keyNames(i)).desc
        case (false, true) => col(keyNames(i)).desc_nulls_first
      }
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partCols.map(col): _*).orderBy(sortCols: _*)
    val wPrev = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val ranked = groups.select((partCols.map(col) ++
      keyNames.map(col) :+
      (coalesce(sum(col("__tgr_cnt")).over(wPrev), lit(0L)) + 1L)
        .cast("int").as("__tgr_rk") :+
      row_number().over(w).as("__tgr_dr")): _*)
    // the group table derives from df, so its key attributes share
    // df's expression ids — alias both sides before joining. Partition
    // keys use null-safe equality: a window function ranks rows whose
    // PARTITION BY value is NULL (they form an ordinary partition), so
    // the join-back must not drop them.
    val cond = (partCols.map(n =>
      col(s"__tgr_l.$n") <=> col(s"__tgr_r.$n")) ++
      orders.zipWithIndex.map { case ((c, _, _), i) =>
        c <=> col(s"__tgr_r.${keyNames(i)}") }).reduce(_ && _)
    val out = Seq(
      rankCol.map(nm => col("__tgr_r.__tgr_rk").as(nm)),
      denseRankCol.map(nm => col("__tgr_r.__tgr_dr").as(nm))).flatten
    df.alias("__tgr_l")
      .join(broadcast(ranked.alias("__tgr_r")), cond)
      .select(df.columns.map(n => col(s"__tgr_l.$n")) ++ out: _*)
  }

  /** Two-phase distributed ranking for windows whose PARTITION key has
    * O(1) distinct values (the `PARTITION BY l_returnflag` shape: 3
    * keys means one-third of the table per window task at any scale —
    * the plan-level scale-killer a naive window carries).
    *
    * The row's bucket is a PURE EXPRESSION of its sort key — the count
    * of driver-sampled split tuples that sort strictly before it — so
    * (a) equal sort keys always share a bucket (ties never straddle a
    * boundary) and (b) every recomputation of the lineage assigns the
    * same bucket (a `spark_partition_id()` after `repartitionByRange`
    * does NOT have this property: Catalyst plans the offsets branch as
    * a separate, column-pruned subtree whose range exchange samples its
    * own bounds, and the two sides silently disagree). The result is
    * bit-identical to the single-window form for ANY split choice; the
    * sample only shapes load balance, never the answer.
    *
    * Phase 1 ranks locally inside each (key, bucket) slice — the
    * window's own hash exchange spreads `keys × buckets` groups over
    * the cluster, each `~rows/buckets` large. Phase 2 aggregates one
    * row per (key, bucket) — `count(*)` for the row offset and
    * `count(distinct struct(orderKeys))` for the dense offset (a
    * struct, so all-null sort keys still count as a tie group, matching
    * dense_rank) — cumulates with a window over that tiny table, and
    * broadcast-joins the offsets back:
    *   row_number = rows in earlier buckets of the key + local row_number
    *   rank       = same row offset + local rank (ties are bucket-local)
    *   dense_rank = distinct sort-tuples in earlier buckets + local dense
    *
    * Sort keys must be scalar (orderable, `lit`-able) types; asc/desc
    * with the DEFAULT null ordering (asc→nulls first, desc→nulls last)
    * and Spark's NaN-greatest semantics are honored end-to-end.
    *
    * @param orderCols  window ORDER BY (Columns with optional .desc)
    * @param boundsFrom sample source for the split tuples — pass the
    *                   underlying base table when `df` is itself a
    *                   derived plan, so the sampling scan stays a
    *                   pruned file scan instead of re-running the
    *                   upstream pipeline
    */
  /** Cap on partitions feeding the split-tuple reservoir: ~4 per
    * target bucket, floor 64 so tiny bucket counts still sample
    * broadly. */
  private[graft] def maxSamplePartitions(buckets: Int): Int =
    math.max(4 * buckets, 64)

  /** Deterministic pseudo-random subset of partition ids to sample
    * (all of them when the table is small). */
  private[graft] def samplePartitionIds(numPartitions: Int,
      maxParts: Int): Set[Int] =
    if (numPartitions <= maxParts) (0 until numPartitions).toSet
    else {
      val rng = new scala.util.Random(0x9e3779b97f4a7c15L)
      rng.shuffle((0 until numPartitions).toVector)
        .take(maxParts).toSet
    }

  /** Split tuples for an order-monotone bucketing of `df` under
    * `orders` — the shared phase-1 machinery of [[twoPhaseRanks]] and
    * [[twoPhaseCumSum]]. See [[twoPhaseRanks]] for the determinism
    * argument (the bucket must be a pure expression of the sort key,
    * never of physical partitioning). */
  private def splitBounds(df: DataFrame,
      orders: Seq[(Column, Boolean, Boolean)], n: Int,
      boundsFrom: Option[DataFrame]): Seq[Seq[Any]] = {
    val childCols = orders.map(_._1)

    // --- split tuples. FAST PATH: when the leading sort key is
    // numeric, its approx quantiles are the splits — one aggregate
    // pass, no row deserialization; ties on the full tuple still
    // co-locate because the bucket is a function of the leading VALUE
    // (prefix bounds only coarsen load balance, never correctness).
    // GENERAL PATH: deterministic per-partition reservoir sample of
    // the full tuple, sorted on the driver, n-1 quantile positions.
    val sampleSrc = boundsFrom.getOrElse(df)
    val leadingNumeric = {
      val dt = sampleSrc.select(childCols.head.as("__tpr_k0"))
        .schema.head.dataType
      dt.isInstanceOf[org.apache.spark.sql.types.NumericType]
    }
    if (leadingNumeric) {
        val probs = (1 until n).map(_.toDouble / n).toArray
        val leadAsc = orders.head._2
        val qs =
          if (probs.isEmpty) Seq.empty[Double]
          else sampleSrc.select(childCols.head.as("__tpr_k0"))
            .na.drop("any").stat
            .approxQuantile("__tpr_k0", probs, 0.01)
            .toSeq.distinct
        // quantiles come back ascending; a DESC leading key wants
        // descending splits so bucket 0 is the order-earliest band
        (if (leadAsc) qs else qs.reverse).map(v => Seq[Any](v))
      } else {
        val keyed = sampleSrc.select(childCols.zipWithIndex.map {
          case (c, i) => c.as(s"__tpr_k$i") }: _*)
        val perPart = 32
        // driver memory is O(sampledPartitions × perPart): at 100 TB a
        // table has 10^5–10^6 tasks, so cap how many partitions feed
        // the reservoir — ~4 per target bucket is plenty for load
        // balance (splits shape balance, never correctness)
        val rdd0 = keyed.rdd
        val pruned = {
          val ids = samplePartitionIds(rdd0.getNumPartitions,
            maxSamplePartitions(n))
          if (ids.size == rdd0.getNumPartitions) rdd0
          else org.apache.spark.rdd.PartitionPruningRDD.create(
            rdd0, ids.contains)
        }
        val sampled: Array[org.apache.spark.sql.Row] =
          pruned.mapPartitionsWithIndex { (idx, it) =>
            val rng = new scala.util.Random(0x9e3779b97f4a7c15L ^ idx)
            val buf = new Array[org.apache.spark.sql.Row](perPart)
            var seen = 0L
            it.foreach { r =>
              if (seen < perPart) buf(seen.toInt) = r
              else {
                val j = rng.nextLong() % (seen + 1)
                val k = if (j < 0) j + seen + 1 else j
                if (k < perPart) buf(k.toInt) = r
              }
              seen += 1
            }
            buf.iterator.take(math.min(seen, perPart.toLong).toInt)
          }.collect()
        // driver-side comparator mirroring the window's SortOrder
        // exactly (null position per nullOrdering; java compareTo
        // sorts NaN greatest, same as Spark)
        def cmpRow(a: org.apache.spark.sql.Row,
            b: org.apache.spark.sql.Row): Int = {
          var i = 0
          while (i < orders.size) {
            val (_, asc, nullsFirst) = orders(i)
            val (x, y) = (a.get(i), b.get(i))
            val c =
              if (x == null && y == null) 0
              else if (x == null) { if (nullsFirst) -1 else 1 }
              else if (y == null) { if (nullsFirst) 1 else -1 }
              else {
                val v = x.asInstanceOf[Comparable[Any]].compareTo(y)
                if (asc) v else -v
              }
            if (c != 0) return c
            i += 1
          }
          0
        }
        val sorted = sampled.sortWith((a, b) => cmpRow(a, b) < 0)
        val raw = (1 until n).flatMap { i =>
          val pos = (i.toLong * sorted.length / n).toInt
          if (pos < sorted.length) Some(sorted(pos)) else None
        }
        raw.foldLeft(Vector.empty[org.apache.spark.sql.Row]) {
          (acc, r) =>
            if (acc.nonEmpty && cmpRow(acc.last, r) == 0) acc
            else acc :+ r
        }.map(r => orders.indices.map(r.get))
      }
  }

  /** bucket(row) = number of split tuples sorting strictly before the
    * row — a deterministic, order-monotone, tie-preserving expression.
    * A bound may be a PREFIX of the sort tuple (the quantile fast
    * path): comparison simply stops at the prefix, which keeps full
    * tuple ties together a fortiori. */
  private def bucketExpr(orders: Seq[(Column, Boolean, Boolean)],
      bounds: Seq[Seq[Any]]): Column = {
    def strictlyAfter(bound: Seq[Any]): Column = {
      val terms = orders.take(bound.size).zipWithIndex.map {
        case ((c, asc, nullsFirst), i) =>
          val v = bound(i)
          val after =
            if (v == null) { if (nullsFirst) c.isNotNull else lit(false) }
            else {
              val strict = if (asc) c > lit(v) else c < lit(v)
              if (nullsFirst) c.isNotNull && strict
              else c.isNull || strict
            }
          val eq = if (v == null) c.isNull else c <=> lit(v)
          (after, eq)
      }
      terms.foldRight(lit(false)) { case ((after, eq), rest) =>
        after || (eq && rest)
      }
    }
    if (bounds.isEmpty) lit(0)
    else bounds.map(b => when(strictlyAfter(b), 1).otherwise(0))
      .reduce(_ + _)
  }

  def twoPhaseRanks(df: DataFrame, partCols: Seq[String],
      orderCols: Seq[Column], rowNumCol: Option[String] = None,
      rankCol: Option[String] = None, denseRankCol: Option[String] = None,
      buckets: Int = 0, boundsFrom: Option[DataFrame] = None,
      percentRankCol: Option[String] = None,
      cumeDistCol: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    require(rowNumCol.orElse(rankCol).orElse(denseRankCol)
      .orElse(percentRankCol).orElse(cumeDistCol).nonEmpty,
      "twoPhaseRanks: request at least one rank column")
    val n = if (buckets > 0) buckets
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // (child column, ascending?, nulls-first?) per ORDER BY item
    val orders: Seq[(Column, Boolean, Boolean)] =
      orderCols.map(ColumnBridge.sortOrderOf)
    val childCols = orders.map(_._1)
    val bounds = splitBounds(df, orders, n, boundsFrom)
    val bucket = "__tpr_bucket"
    val withBucket = df.withColumn(bucket, bucketExpr(orders, bounds))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy((partCols.map(col) :+ col(bucket)): _*)
      .orderBy(orderCols: _*)
    // only the REQUESTED rank kinds are computed — an unused
    // dense_rank would drag a countDistinct expand through the
    // offsets aggregate below
    val needRank = rankCol.isDefined || percentRankCol.isDefined
    // rows ≤ current (peers included): the RANGE frame counts through
    // ties — cume_dist's numerator, bucket-locally
    val wLe = w.rangeBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    val localCols = Seq(
      rowNumCol.map(_ => row_number().over(w).as("__tpr_rn")),
      if (needRank) Some(rank().over(w).as("__tpr_rk")) else None,
      denseRankCol.map(_ => dense_rank().over(w).as("__tpr_dr")),
      cumeDistCol.map(_ => count(lit(1)).over(wLe).as("__tpr_le"))
    ).flatten
    val local = withBucket.select(
      (withBucket.columns.map(col) ++ localCols): _*)
    // one row per (key, bucket): the only cross-bucket state. Derived
    // from withBucket (scan + agg), NOT from the windowed plan — the
    // offsets branch never re-runs a window.
    val wOff = org.apache.spark.sql.expressions.Window
      .partitionBy(partCols.map(col): _*)
      .orderBy(col(bucket))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offAggs = count(lit(1)).as("__tpr_cnt") +:
      denseRankCol.map(_ =>
        countDistinct(struct(childCols: _*)).as("__tpr_dcnt")).toSeq
    val needTotal = percentRankCol.isDefined || cumeDistCol.isDefined
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(partCols.map(col): _*)
    val offCols = Seq(
      Some(coalesce(sum(col("__tpr_cnt")).over(wOff), lit(0L))
        .as("__tpr_rowOff")),
      denseRankCol.map(_ =>
        coalesce(sum(col("__tpr_dcnt")).over(wOff), lit(0L))
          .as("__tpr_denseOff")),
      if (needTotal)
        Some(sum(col("__tpr_cnt")).over(wAll).as("__tpr_total"))
      else None
    ).flatten
    val offsets = withBucket
      .groupBy((partCols.map(col) :+ col(bucket)): _*)
      .agg(offAggs.head, offAggs.tail: _*)
      .select((partCols.map(col) :+ col(bucket)) ++ offCols: _*)
    // explicit null-safe (<=>) partition-key condition instead of a
    // using-column join: USING drops rows whose partition key is NULL,
    // but a window ranks them (NULL keys form an ordinary partition).
    // Bucket is never null, plain equality suffices there.
    val joined = local.alias("__tpr_l").join(
      broadcast(offsets.alias("__tpr_r")),
      (partCols.map(nm =>
        col(s"__tpr_l.$nm") <=> col(s"__tpr_r.$nm")) :+
        (col(s"__tpr_l.$bucket") === col(s"__tpr_r.$bucket")))
        .reduce(_ && _))
    val out = Seq(
      rowNumCol.map(nm => (col("__tpr_rowOff") + col("__tpr_rn")).cast("int").as(nm)),
      rankCol.map(nm => (col("__tpr_rowOff") + col("__tpr_rk")).cast("int").as(nm)),
      denseRankCol.map(nm => (col("__tpr_denseOff") + col("__tpr_dr")).cast("int").as(nm)),
      // SQL definitions verbatim: (rank-1)/(N-1) with the single-row
      // partition pinned to 0; (rows ≤ current)/N — the long/long
      // double divisions reproduce any engine's own evaluation
      percentRankCol.map(nm =>
        when(col("__tpr_total") === 1L, lit(0.0))
          .otherwise((col("__tpr_rowOff") + col("__tpr_rk") - 1L)
            .cast("double") / (col("__tpr_total") - 1L))
          .as(nm)),
      cumeDistCol.map(nm =>
        ((col("__tpr_rowOff") + col("__tpr_le")).cast("double") /
          col("__tpr_total")).as(nm))
    ).flatten
    joined.select(
      (df.columns.map(n => col(s"__tpr_l.$n")).toSeq ++ out): _*)
  }

  /** Distributed prefix sum: `outCol` = running sum of `valueCol` over
    * the GLOBAL order given by `orderCols` — the building block for
    * systematic/PPS sampling, quota assignment, and offset stamping.
    * A naive `Window.orderBy(...)` with no PARTITION BY funnels the
    * whole table through ONE task; here the row's bucket is the same
    * order-monotone split-tuple expression [[twoPhaseRanks]] uses, the
    * running sum is bucket-local (the window's hash exchange spreads
    * `buckets` groups over the cluster), and one tiny per-bucket total
    * table cumulates into broadcast offsets.
    *
    * `orderCols` must be a TOTAL order (include a unique tiebreaker):
    * a running sum through ties is not well-defined row-wise, and the
    * bucket boundary could otherwise split a tie group
    * non-deterministically. The sum type follows `valueCol` (pass a
    * decimal for exactness past long range). */
  def twoPhaseCumSum(df: DataFrame, orderCols: Seq[Column],
      valueCol: Column, outCol: String, buckets: Int = 0,
      boundsFrom: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val n = if (buckets > 0) buckets
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val orders: Seq[(Column, Boolean, Boolean)] =
      orderCols.map(ColumnBridge.sortOrderOf)
    val bounds = splitBounds(df, orders, n, boundsFrom)
    val bucket = "__tcs_bucket"
    val withBucket = df.withColumn(bucket, bucketExpr(orders, bounds))
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy(col(bucket)).orderBy(orderCols: _*)
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val local = withBucket.withColumn("__tcs_local",
      sum(valueCol).over(wLocal))
    val wOff = org.apache.spark.sql.expressions.Window
      .orderBy(col(bucket))
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    // one row per bucket — the only global-order state; the
    // unpartitioned window over it is buckets-sized by construction
    val offsets = withBucket
      .groupBy(col(bucket)).agg(sum(valueCol).as("__tcs_sum"))
      .select(col(bucket),
        coalesce(sum(col("__tcs_sum")).over(wOff), lit(0))
          .as("__tcs_off"))
    local.join(broadcast(offsets), Seq(bucket))
      .withColumn(outCol, col("__tcs_off") + col("__tcs_local"))
      .drop(bucket, "__tcs_local", "__tcs_off")
  }
}
