package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[BinnedRangeJoinRewrite]]: the opt-in theta→equi bin rewrite must
  * change the PHYSICAL join strategy (no nested-loop over two large
  * sides) without changing one row of output. */
class BinnedRangeJoinSpec extends SparkTestBase {

  private lazy val ext: SparkSession = {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions())
      .getOrCreate()
    SparkSession.setDefaultSession(base)
    SparkSession.setActiveSession(base)
    assert(s ne base)
    s
  }

  private def inSession[T](f: => T): T = {
    SparkSession.setActiveSession(ext)
    try f
    finally SparkSession.setActiveSession(spark)
  }

  private def joinFrames(s: SparkSession) = {
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val points = (1 to 4000).map(i =>
      (i.toLong, rnd.nextInt(10000).toDouble)).toDF("pid", "v")
    val intervals = (1 to 3000).map { i =>
      val lo = rnd.nextInt(9500).toDouble
      (10000L + i, lo, lo + rnd.nextInt(200))
    }.toDF("iid", "lo", "hi")
    (points, intervals)
  }

  test("rewrite fires under the width conf: no nested-loop join in " +
      "the physical plan, results identical to the theta join, " +
      "fixed-point safe") { inSession {
    val (points, intervals) = joinFrames(ext)
    def q = points.join(intervals,
      col("v") >= col("lo") && col("v") < col("hi"))
    // broadcast off: the unrewritten theta join over two large sides
    // must fall back to a nested loop — the plan the rule exists to
    // prevent
    ext.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val want = q.select(col("pid"), col("iid"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(q.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin") ||
        q.queryExecution.executedPlan.toString
          .contains("CartesianProduct"),
        "precondition: theta join plans a nested loop")

      ext.conf.set(BinnedRangeJoinRewrite.WidthConf, "100")
      val rewritten = q
      val phys = rewritten.queryExecution.executedPlan.toString
      assert(!phys.contains("BroadcastNestedLoopJoin") &&
        !phys.contains("CartesianProduct"),
        s"nested loop survived the rewrite:\n$phys")
      assert(phys.contains("SortMergeJoin") ||
        phys.contains("ShuffledHashJoin"), phys)
      // one Generate in the optimized plan: the fixed-point batch did
      // not re-bin its own output
      val gens = rewritten.queryExecution.optimizedPlan.collect {
        case g: org.apache.spark.sql.catalyst.plans.logical.Generate =>
          g
      }
      assert(gens.length === 1, s"expected one explode, got $gens")
      val got = rewritten.select(col("pid"), col("iid"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got === want,
        s"rewrite changed results: ${got.size} vs ${want.size}")
      // extra conjuncts (an equi key) ride along unchanged
      val pk = points.withColumn("k", col("pid") % 7)
      val ik = intervals.withColumn("k", col("iid") % 7)
      def qk = pk.join(ik, pk("k") === ik("k") &&
        col("v") >= col("lo") && col("v") < col("hi"))
      val wantK = {
        ext.conf.set(BinnedRangeJoinRewrite.WidthConf, "0")
        try qk.select(col("pid"), col("iid")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        finally ext.conf.set(BinnedRangeJoinRewrite.WidthConf, "100")
      }
      val gotK = qk.select(col("pid"), col("iid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(gotK === wantK)
    } finally {
      ext.conf.unset(BinnedRangeJoinRewrite.WidthConf)
      ext.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }}

  test("NaN/±Inf interval bounds survive the rewrite: non-finite " +
      "rows ride the theta union branch (hi=NaN matches every " +
      "point >= lo under Spark's NaN ordering — the bin path alone " +
      "would drop them), and the guard keeps the rule fixed-point " +
      "safe over its own union output") { inSession {
    import ext.implicits._
    val points = (0 until 200).map(i =>
      (i.toLong, i.toDouble)).toDF("pid", "v")
    val intervals = Seq(
      (1L, 150.0, Double.NaN),               // v >= 150, all of them
      (2L, 180.0, Double.PositiveInfinity),  // v >= 180
      (3L, Double.NegativeInfinity, 5.0),    // v < 5
      (4L, Double.NaN, Double.NaN),          // nothing
      (5L, 40.0, 44.0)                       // finite control
    ).toDF("iid", "lo", "hi")
    def q = points.join(intervals,
      col("v") >= col("lo") && col("v") < col("hi"))
    val want = q.select(col("pid"), col("iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(want.count(_._2 == 1L) == 50 &&
      want.count(_._2 == 2L) == 20 && want.count(_._2 == 3L) == 5,
      s"theta oracle shape unexpected: ${want.groupBy(_._2).view
        .mapValues(_.size).toMap}")
    ext.conf.set(BinnedRangeJoinRewrite.WidthConf, "10")
    try {
      val rewritten = q
      // the rewrite DID fire (a Generate exists) and built exactly
      // one union theta branch (fixed-point: no runaway duplication)
      val opt = rewritten.queryExecution.optimizedPlan
      assert(opt.collect {
        case g: org.apache.spark.sql.catalyst.plans.logical.Generate =>
          g
      }.length === 1, s"expected one explode:\n$opt")
      // exactly one binned + one theta join: the guard kept the rule
      // from re-matching its own union output (over LocalRelation
      // inputs the late "LocalRelation" batch may fold the guard
      // filter AFTER our fixed-point batch settles — that is fine,
      // the rule never runs again; over file sources it persists)
      val joins = opt.collect {
        case jn: org.apache.spark.sql.catalyst.plans.logical.Join => jn
      }
      assert(joins.length === 2,
        s"expected binned + theta union branches, got:\n$opt")
      val got = rewritten.select(col("pid"), col("iid"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got === want,
        s"rewrite changed results: ${got.size} vs ${want.size}")
    } finally ext.conf.unset(BinnedRangeJoinRewrite.WidthConf)
  }}

  test("stats-derived width: with NO width conf, histogram column " +
      "stats of the interval side supply the bin width — the rewrite " +
      "replaces the nested loop and matches the theta oracle") {
    inSession {
      val (points, intervals) = joinFrames(ext)
      ext.sql("DROP TABLE IF EXISTS brj_intervals")
      intervals.write.mode("overwrite").saveAsTable("brj_intervals")
      ext.conf.set("spark.sql.statistics.histogram.enabled", "true")
      ext.conf.set("spark.sql.cbo.enabled", "true")
      ext.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        ext.sql("ANALYZE TABLE brj_intervals COMPUTE STATISTICS " +
          "FOR COLUMNS lo, hi")
        val iv = ext.table("brj_intervals")
        def q = points.join(iv,
          col("v") >= col("lo") && col("v") < col("hi"))
        // oracle under autoWidth=false: the rule is provably inert
        val want = {
          ext.conf.set(BinnedRangeJoinRewrite.AutoWidthConf, "false")
          try {
            assert(q.queryExecution.optimizedPlan.collect {
              case g: org.apache.spark.sql.catalyst.plans.logical
                .Generate => g
            }.isEmpty, "autoWidth=false must disable the stats path")
            q.select(col("pid"), col("iid")).collect()
              .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
          } finally ext.conf
            .unset(BinnedRangeJoinRewrite.AutoWidthConf)
        }
        val rewritten = q
        assert(rewritten.queryExecution.optimizedPlan.collect {
          case g: org.apache.spark.sql.catalyst.plans.logical
            .Generate => g
        }.length === 1,
          "histogram stats did not supply a width:\n" +
            rewritten.queryExecution.optimizedPlan)
        val phys = rewritten.queryExecution.executedPlan.toString
        // the non-finite theta union branch is a broadcast-PINNED
        // BNLJ by design (double bounds force the split even when no
        // NaN rows exist) — what must NOT survive is a cartesian or
        // a nested loop carrying the BULK of the join
        assert(!phys.contains("CartesianProduct"),
          s"cartesian survived the stats-width rewrite:\n$phys")
        assert(phys.contains("SortMergeJoin") ||
          phys.contains("ShuffledHashJoin"),
          s"bulk branch is not an equi join:\n$phys")
        val got = rewritten.select(col("pid"), col("iid")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        assert(got === want,
          s"stats-width rewrite changed results: ${got.size} vs " +
            s"${want.size}")
      } finally {
        ext.conf.unset("spark.sql.statistics.histogram.enabled")
        ext.conf.unset("spark.sql.cbo.enabled")
        ext.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        ext.sql("DROP TABLE IF EXISTS brj_intervals")
      }
    }
  }

  test("guard scope: a SECOND range join stacked above a rewritten " +
      "union output is binned too (the guard veto is scoped to each " +
      "join's own condition/fringe, not the whole subtree)") {
    inSession {
      import ext.implicits._
      val points = (0 until 300).map(i =>
        (i.toLong, i.toDouble)).toDF("pid", "v")
      // one non-finite bound forces the union theta branch on join 1
      val iv1 = Seq(
        (1L, 150.0, Double.NaN),
        (2L, 40.0, 60.0),
        (3L, 100.0, 120.0)
      ).toDF("iid", "lo", "hi")
      val iv2 = (0 until 30).map { i =>
        (100L + i, i * 10.0, i * 10.0 + 15.0)
      }.toDF("iid2", "lo2", "hi2")
      ext.conf.set(BinnedRangeJoinRewrite.WidthConf, "10")
      try {
        val q1 = points.join(iv1,
          col("v") >= col("lo") && col("v") < col("hi"))
        val q2 = q1.join(iv2,
          col("v") >= col("lo2") && col("v") < col("hi2"))
        val gens = q2.queryExecution.optimizedPlan.collect {
          case g: org.apache.spark.sql.catalyst.plans.logical
            .Generate => g
        }
        assert(gens.length === 2,
          s"expected BOTH range joins binned (2 explodes), got " +
            s"${gens.length}:\n${q2.queryExecution.optimizedPlan}")
        val got = q2.select(col("pid"), col("iid"), col("iid2"))
          .collect().map(r =>
            (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
        val want = {
          ext.conf.set(BinnedRangeJoinRewrite.WidthConf, "0")
          try q2.select(col("pid"), col("iid"), col("iid2"))
            .collect().map(r =>
              (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
          finally ext.conf.set(BinnedRangeJoinRewrite.WidthConf, "10")
        }
        assert(got === want,
          s"stacked rewrite changed results: ${got.size} vs " +
            s"${want.size}")
      } finally ext.conf.unset(BinnedRangeJoinRewrite.WidthConf)
    }
  }

  test("rule is inert without the conf and on non-matching shapes") {
    inSession {
      val (points, intervals) = joinFrames(ext)
      // width unset: the theta plan is untouched
      val q = points.join(intervals,
        col("v") >= col("lo") && col("v") < col("hi"))
      assert(q.queryExecution.optimizedPlan.collect {
        case g: org.apache.spark.sql.catalyst.plans.logical.Generate =>
          g
      }.isEmpty)
      ext.conf.set(BinnedRangeJoinRewrite.WidthConf, "100")
      try {
        // a one-bound shape (no upper) must not match
        val half = points.join(intervals, col("v") >= col("lo"))
        assert(half.queryExecution.optimizedPlan.collect {
          case g: org.apache.spark.sql.catalyst.plans.logical
            .Generate => g
        }.isEmpty, "half-open pattern was rewritten")
        // malformed intervals (lo > hi) match nothing after rewrite
        import ext.implicits._
        val bad = Seq((1L, 50.0, 10.0)).toDF("iid", "lo", "hi")
        assert(points.join(bad,
          col("v") >= col("lo") && col("v") < col("hi")).isEmpty)
      } finally ext.conf.unset(BinnedRangeJoinRewrite.WidthConf)
    }
  }
}
