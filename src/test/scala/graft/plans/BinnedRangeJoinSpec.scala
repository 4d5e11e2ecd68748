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
