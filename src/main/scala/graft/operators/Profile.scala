package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass table profiler — the "what's actually in this table"
  * report every ingestion/curation pipeline runs before trusting a
  * new drop: per column the row count, null count, EXACT distinct
  * count, and min/max rendered canonically.
  *
  * Plan shape: TWO aggregate subtrees meeting in a 1×1 cross join,
  * deliberately — mixing string min/max (immutable aggregation
  * buffers) into the same Aggregate as the multi-distinct set forces
  * Catalyst to SORT the ×(k+1) Expand stream into a SortAggregate
  * (measured 2× slower than this shape on the same data). Split:
  *
  *  - distinct counts alone: Expand ×k → HashAggregate keyed on
  *    (gid, value) with EMPTY buffers (pure dedup, map-side
  *    combined) → count FILTER gid — hash end to end;
  *  - rows/nulls/min/max: one grand aggregate with no grouping keys
  *    — a straight fold, no sort regardless of buffer type.
  *
  * The two one-row results cross-join and unpivot to long format
  * with a literal struct array.
  *
  * 100 TB note: the profile pays two column-pruned scans; the
  * distinct side's Expand carries only (gid, value) — narrow rows,
  * never the full width. Where estimates suffice, swap
  * `count_distinct` for `approx_count_distinct` and fold everything
  * into the min/max pass — one scan, no Expand.
  */
object Profile {

  /** Profile `cols` (default: every column) of `df`. Min/max render
    * through a plain string cast — selection, not arithmetic, so the
    * values are exact and any engine agrees on the representation for
    * the integer/date/string/short-decimal-double columns a profile
    * targets.
    *
    * @return `(column_name, n_rows, n_nulls, n_distinct, min_repr,
    *          max_repr)`, one row per profiled column
    */
  def profile(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.columns.toSeq
    require(names.nonEmpty, "profile: no columns to profile")
    val missing = names.filterNot(df.columns.contains)
    require(missing.isEmpty, s"profile: no such columns $missing " +
      s"in ${df.schema.catalogString}")
    val folds = names.flatMap { n =>
      Seq(count(col(n)).as(s"__pr_cnt_$n"),
        min(col(n)).cast("string").as(s"__pr_mn_$n"),
        max(col(n)).cast("string").as(s"__pr_mx_$n"))
    }
    val minmax = df.agg(count(lit(1)).as("__pr_rows"), folds: _*)
    val nd = df.agg(
      count_distinct(col(names.head)).as(s"__pr_nd_${names.head}"),
      names.tail.map(n =>
        count_distinct(col(n)).as(s"__pr_nd_$n")): _*)
    val one = minmax.crossJoin(nd)
    one
      .select(explode(array(names.map { n =>
        struct(
          lit(n).as("column_name"),
          col("__pr_rows").as("n_rows"),
          (col("__pr_rows") - col(s"__pr_cnt_$n")).as("n_nulls"),
          col(s"__pr_nd_$n").as("n_distinct"),
          col(s"__pr_mn_$n").as("min_repr"),
          col(s"__pr_mx_$n").as("max_repr"))
      }: _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("column_name"))
  }

  private def intDiv(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(new org.apache.spark.sql.catalyst.expressions
      .IntegralDivide(ColumnBridge.expression(a),
        ColumnBridge.expression(b)))
  }

  /** Equi-width histogram under the fixed-point INTEGER contract:
    * values quantize to `round(v·scale)` longs, [lo, hi] pins to the
    * exact quantized min/max (one tiny aggregate, broadcast back),
    * and the bin index is pure integer arithmetic,
    *
    *   `bin = ⌊(xc − lo)·bins / (hi − lo + 1)⌋`
    *
    * — always in [0, bins), no float boundary for engines to disagree
    * on. One scan + one bins-sized hash rollup; empty bins are
    * materialized from a `sequence` so the output is always exactly
    * `bins` rows (the shape a plotting layer wants).
    *
    * @return `(bin, lo_c, hi_c, n)` — lo_c/hi_c are the global
    *         quantized bounds on every row
    */
  def histogram(df: DataFrame, valueCol: org.apache.spark.sql.Column,
      bins: Int, scale: Long = 100L): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val xc = round(valueCol * scale).cast("long")
    val vals = df.select(xc.as("__hg_x")).filter(col("__hg_x").isNotNull)
    val bounds = vals.agg(min(col("__hg_x")).as("__hg_lo"),
      max(col("__hg_x")).as("__hg_hi"))
    val grid = bounds.select(
      explode(sequence(lit(0L), lit(bins - 1L))).as("bin"),
      col("__hg_lo"), col("__hg_hi"))
    val counts = vals.crossJoin(broadcast(bounds))
      .select(intDiv((col("__hg_x") - col("__hg_lo")) * bins,
        col("__hg_hi") - col("__hg_lo") + 1).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
    grid.join(counts, Seq("bin"), "left_outer")
      .select(col("bin"), col("__hg_lo").as("lo_c"),
        col("__hg_hi").as("hi_c"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy(col("bin"))
  }

  /** ZERO-SCAN profile of a graft-v2 table from its manifest skip
    * stats — the 100 TB answer to "what's in this table": per stats
    * column the exact row count, null count and min/max folded from
    * the per-file `fstat=` entries, in O(files) DRIVER work with no
    * executor job at all. Numeric/timestamp bounds are EXACT
    * (`exact = true`); string bounds are the manifest's truncated
    * UTF-8 prefix floor/ceil — correct BOUNDS, flagged
    * `exact = false`. Declines when deletion vectors are present
    * (masked rows would overcount — `materialize_dvs` first) and
    * skips columns not covered on every file or with mixed stat
    * kinds (a widened column's old files).
    *
    * @return `(column_name, n_rows, n_nulls, min_repr, max_repr,
    *         exact)` — a metadata-only sibling of [[profile]]
    */
  def profileFromStats(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    import graft.sources.v2.{GraftManifest, SkipStats}
    import org.apache.hadoop.fs.Path
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val snap = GraftManifest.current(fs, p).getOrElse(
      throw new IllegalArgumentException(
        s"profileFromStats: no graft-v2 manifest at $dir"))
    require(snap.dvs.isEmpty, "profileFromStats: table carries " +
      "deletion vectors — footer rows/nulls would overcount; run " +
      "materialize_dvs first")
    require(snap.fstats.nonEmpty,
      s"profileFromStats: no manifest skip stats at $dir")
    val rows = SkipStats.profileRows(snap)
      .map { case (c, nRows, nNulls, mn, mx, exact) =>
        (c, nRows, nNulls, mn.orNull, mx.orNull, exact)
      }
    require(rows.nonEmpty,
      s"profileFromStats: no column covered on every file at $dir")
    import spark.implicits._
    rows.toDF("column_name", "n_rows", "n_nulls", "min_repr",
      "max_repr", "exact").orderBy(col("column_name"))
  }

  /** Data-quality expectations (the Deequ/Great-Expectations check
    * suite shape): each rule is a named boolean predicate that every
    * row must satisfy; the report counts violations per rule in ONE
    * map-side-combinable aggregate over one scan — `sum(rule ? 0 : 1)`
    * per rule, however many rules ride along (NULL predicate results
    * count as violations: an unexpectedly-null field must not pass
    * the contract it cannot prove). The post-load gate a warehouse
    * runs before publishing a drop.
    *
    * @return `(rule, n_rows, n_violations, passed)`, one row per rule
    *         in the given order, `passed = (n_violations == 0)`
    */
  def expectations(df: DataFrame,
      rules: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(rules.nonEmpty, "expectations: no rules given")
    require(rules.map(_._1).distinct.size == rules.size,
      s"expectations: duplicate rule names in ${rules.map(_._1)}")
    val measures = rules.map { case (n, c) =>
      sum(when(coalesce(c, lit(false)), 0L).otherwise(1L))
        .as(s"__dq_$n")
    }
    val one = df.agg(count(lit(1)).as("__dq_rows"), measures: _*)
    one.select(explode(array(rules.map { case (n, _) =>
        struct(lit(n).as("rule"), col("__dq_rows").as("n_rows"),
          coalesce(col(s"__dq_$n"), lit(0L)).as("n_violations"),
          (coalesce(col(s"__dq_$n"), lit(0L)) === 0L).as("passed"))
      }: _*)).as("r"))
      .select(col("r.*"))
  }

  /** Referential-integrity check: for each named (child, childKey) →
    * (parent, parentKey) relationship, the child row count and the
    * orphan count (child keys with no parent — LEFT ANTI join, so
    * Catalyst picks broadcast/shuffle per side stats; NULL keys count
    * as orphans, matching the "every row must resolve" contract).
    * The data-quality gate a warehouse runs after every load.
    *
    * @return `(relationship, n_child, n_orphans)`, one row per entry
    */
  def riCheck(rels: Seq[(String, DataFrame, String, DataFrame,
      String)]): DataFrame = {
    require(rels.nonEmpty, "riCheck: no relationships given")
    rels.map { case (name, child, childKey, parent, parentKey) =>
      val orphans = child.select(col(childKey).as("__ri_k"))
        .join(parent.select(col(parentKey).as("__ri_k")),
          Seq("__ri_k"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      child.agg(count(lit(1)).as("n_child"))
        .crossJoin(orphans)
        .select(lit(name).as("relationship"), col("n_child"),
          col("n_orphans"))
    }.reduce(_ unionByName _)
  }

  /** EQUI-DEPTH histogram (the optimizer-statistics bucket shape):
    * `buckets − 1` boundaries from the EXACT quantile selection
    * (`⌈k·n/buckets⌉`-th smallest via [[Quantiles.exactQuantiles]]'
    * two-phase-rank machinery — parallel at any skew, never a
    * driver-side sort), then each value's bucket is the count of
    * boundaries STRICTLY below it (an explicit tie rule both engines
    * replay). Heavy ties can legitimately leave buckets empty —
    * absent rows, not zero rows. Values quantize to `valueScale`
    * longs so selection and comparison are exact integers.
    *
    * @return `(bucket, n)` ordered by bucket (0-based)
    */
  def histogramEquiDepth(df: DataFrame,
      valueCol: org.apache.spark.sql.Column, buckets: Int = 8,
      valueScale: Long = 100L): DataFrame = {
    require(buckets >= 2 && buckets <= 256,
      s"buckets must be 2..256, got $buckets")
    val vals = df.select(
      round(valueCol * valueScale).cast("long").as("vc"))
    val qs = (1 until buckets).map(_.toDouble / buckets)
    val bounds = Quantiles.exactQuantiles(vals, col("vc"), Seq.empty,
        qs)
      .agg(sort_array(collect_list(col("value"))).as("__hd_b"))
    vals.crossJoin(broadcast(bounds))
      .select(size(filter(col("__hd_b"), b => b < col("vc")))
        .cast("long").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("bucket"))
  }

  /** Benford's-law first-digit audit (the classic fabricated-numbers
    * screen): the distribution of leading significant digits of a
    * positive amount column vs Benford's expectation. The digit comes
    * from the DECIMAL STRING of the cent-quantized amount (scaling by
    * 100 never changes the leading digit), observed shares are exact
    * integer ppm, and the expected shares `log₁₀(1+1/d)` are COMPILED
    * IN as ppm literals — no runtime transcendental on either engine.
    * One map-side-combinable aggregate over one scan.
    *
    * @return `(digit, n, observed_ppm, expected_ppm)`, digits 1-9
    */
  def benford(df: DataFrame, amountCol: String): DataFrame = {
    val expected = Map(1 -> 301030L, 2 -> 176091L, 3 -> 124939L,
      4 -> 96910L, 5 -> 79181L, 6 -> 66947L, 7 -> 57992L,
      8 -> 51153L, 9 -> 45757L)
    val digit = substring(
      round(col(amountCol) * 100).cast("long").cast("string"), 1, 1)
      .cast("long")
    val counts = df
      .filter(col(amountCol) > 0)
      .select(digit.as("digit"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("__bf_total"))
    val exp = expected.foldLeft(lit(null).cast("long")) {
      case (acc, (d, p)) => when(col("digit") === d, p).otherwise(acc)
    }
    counts.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        intDiv(col("n") * lit(1000000L), col("__bf_total"))
          .as("observed_ppm"),
        exp.as("expected_ppm"))
      .orderBy(col("digit"))
  }

  /** Chi-square contingency cells for two categorical columns: each
    * (row, col) cell's observed count, its independence expectation
    * `⌊rm·cm·10⁶/total⌋` (ppm of a count, exact), and its lift
    * `⌊o·total·10⁶/(rm·cm)⌋` — the independence-test artifact with
    * NO float aggregate anywhere (a double Σ((o−e)²/e) would hash
    * differently per addition order; the per-cell integer table
    * carries the same evidence). Three hash aggregates over one
    * cached pass shape: cells, row marginals, column marginals, all
    * meeting on broadcast joins; products ride DECIMAL(38,0) so the
    * contract survives any corpus size.
    *
    * @return `(a, b, n, expected_ppm, lift_ppm)` ordered by (a, b)
    */
  def chiCells(df: DataFrame, aCol: String, bCol: String)
      : DataFrame = {
    val cells = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("n"))
    val rowM = cells.groupBy(col("a")).agg(sum(col("n")).as("rm"))
    val colM = cells.groupBy(col("b")).agg(sum(col("n")).as("cm"))
    val total = cells.agg(sum(col("n")).as("t"))
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    cells
      .join(broadcast(rowM), Seq("a"))
      .join(broadcast(colM), Seq("b"))
      .crossJoin(broadcast(total))
      .select(col("a"), col("b"), col("n"),
        intDiv(dec(col("rm")) * dec(col("cm")) * lit(1000000L),
          dec(col("t"))).cast("long").as("expected_ppm"),
        intDiv(dec(col("n")) * dec(col("t")) * lit(1000000L),
          dec(col("rm")) * dec(col("cm"))).cast("long")
          .as("lift_ppm"))
      .orderBy(col("a"), col("b"))
  }

  /** The COMBINED data-quality suite (the full Deequ shape): row
    * expectations and referential (foreign-key) rules in ONE report
    * with the [[expectations]] schema — a foreign-key rule's
    * violations are its orphan count ([[riCheck]] semantics: LEFT
    * ANTI join, NULL child keys count as orphans) and its `n_rows`
    * is the child row count. Row rules still collapse into one
    * map-side-combinable aggregate over one scan; each foreign-key
    * rule is one anti-join whose strategy Catalyst picks per side
    * stats. This is what `CALL graft.system.dq_check` runs when a
    * rule uses the `foreign_key(child_col, parent, parent_col)` form.
    *
    * @param fkRules `(rule, childKeyCol, parent, parentKeyCol)`
    * @return `(rule, n_rows, n_violations, passed)` — row rules
    *         first (given order), then foreign-key rules
    */
  def dqSuite(df: DataFrame,
      rowRules: Seq[(String, org.apache.spark.sql.Column)],
      fkRules: Seq[(String, String, DataFrame, String)] = Nil)
      : DataFrame = {
    require(rowRules.nonEmpty || fkRules.nonEmpty,
      "dqSuite: no rules given")
    val names = rowRules.map(_._1) ++ fkRules.map(_._1)
    require(names.distinct.size == names.size,
      s"dqSuite: duplicate rule names in $names")
    val rowPart =
      if (rowRules.isEmpty) None else Some(expectations(df, rowRules))
    val fkPart = if (fkRules.isEmpty) None else Some(
      riCheck(fkRules.map { case (n, ck, p, pk) => (n, df, ck, p, pk) })
        .select(col("relationship").as("rule"),
          col("n_child").as("n_rows"),
          col("n_orphans").as("n_violations"),
          (col("n_orphans") === 0L).as("passed")))
    (rowPart.toSeq ++ fkPart.toSeq).reduce(_ unionByName _)
  }
}
