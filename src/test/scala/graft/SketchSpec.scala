package graft

import org.apache.spark.sql.functions._

import graft.operators.{CorpusOps, Sketch}

/** Count-Min sketch heavy hitters: the one-sided error contract
  * (estimate >= exact, equality without collisions), genuine
  * overestimation under forced collisions, bucket-expression
  * fidelity to the reference hash chain, and determinism. */
class SketchSpec extends SparkTestBase {
  import spark.implicits._

  private def exactCounts(docs: org.apache.spark.sql.DataFrame) =
    docs.select(explode(CorpusOps.tokens($"text")).as("term"))
      .groupBy($"term").agg(count(lit(1)).as("n"))

  test("cms_buckets matches the reference FNV+splitmix chain and " +
      "rejects a non-power-of-two width") {
    import graft.functions.TextHashing
    val got = Seq("alpha", "beta")
      .toDF("t")
      .select($"t", graft.functions.GraftFunctions
        .cms_buckets($"t", 4, 512).as("bs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    Seq("alpha", "beta").foreach { s =>
      val h0 = TextHashing.hash64(s)
      val want = (0 until 4).map(i =>
        (TextHashing.mix(h0, i + 1L) & 511L).toInt)
      assert(got(s) === want, s"term $s")
    }
    intercept[IllegalArgumentException] {
      graft.functions.GraftFunctions.cms_buckets($"t", 4, 100)
    }
  }

  test("estimate is one-sided (>= exact) and exact when w clears the " +
      "vocabulary; top-k then equals the exact top-k") {
    val docs = Tables.t(spark, sf001, "documents")
    val exact = exactCounts(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // w = 65536 >> vocabulary: collisions vanish w.h.p. across all 4
    // rows, so the min-estimate equals the exact count per term
    val wide = Sketch.cmsTopTerms(docs, d = 4, w = 65536, k = 25)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    wide.foreach { case (t, est) =>
      assert(est === exact(t), s"term $t: est $est vs exact ${exact(t)}")
    }
    val exactTop = exact.toSeq.sortBy { case (t, n) => (-n, t) }.take(25)
    assert(wide.toSeq === exactTop)
    // the production-shaped small sketch keeps the one-sided bound
    val tight = Sketch.cmsTopTerms(docs, d = 4, w = 512, k = 25)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    tight.foreach { case (t, est) =>
      assert(est >= exact(t), s"CMS under-counted $t: $est < ${exact(t)}")
    }
  }

  test("forced collisions genuinely overestimate (the sketch path is " +
      "real, not a disguised exact count)") {
    // 40 distinct terms into w=8 buckets: pigeonhole guarantees
    // collisions in every row, so SOME term's min-estimate exceeds
    // its exact count
    val docs = Seq((1 to 40).map(i => s"term$i").mkString(" "))
      .toDF("text")
    val est = Sketch.cmsTopTerms(docs, d = 2, w = 8, k = 40)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(est.forall(_._2 >= 1L))
    assert(est.exists(_._2 > 1L),
      "w=8 over 40 terms must collide somewhere")
  }

  test("topTermsExact equals the full exact top-k on both the " +
      "guaranteed and the fallback path") {
    val docs = Tables.t(spark, sf001, "documents")
    val exact = exactCounts(docs).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
      .sortBy { case (t, n) => (-n, t) }.take(25)
    // plenty of counters: the MG candidates provably cover the top-25
    val pruned = Sketch.topTermsExact(docs, k = 25, counters = 1024)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(pruned === exact)
    // starved counters (m=2): the admission bound cannot clear, the
    // operator must fall back to the full aggregation — same answer
    val starved = Sketch.topTermsExact(docs, k = 25, counters = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(starved === exact)
  }

  test("cmsTopTerms is deterministic, ties break on term, k bounds " +
      "the output") {
    val docs = Tables.t(spark, sf001, "documents")
    val a = Sketch.cmsTopTerms(docs, k = 10).collect().toSeq
    val b = Sketch.cmsTopTerms(docs, k = 10).collect().toSeq
    assert(a === b)
    assert(a.size === 10)
  }
}
