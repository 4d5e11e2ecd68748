package graft

import org.apache.spark.sql.functions._

import graft.operators.LangModel

/** Bigram stupid-backoff LM scoring: hand-computed probabilities,
  * backoff-path behavior, self-scoring sanity, determinism. */
class LangModelSpec extends SparkTestBase {
  import spark.implicits._

  test("hand-computed probabilities on a tiny LM") {
    // train tokens: a b a b a c -> U: a=3 b=2 c=1, N=6;
    // B: (a,b)=2 (b,a)=2 (a,c)=1
    val train = Seq((0L, "a b a b a c")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b"), // seen bigram: P = 2/3
      (3L, "a z"), // unseen bigram, unseen unigram: P = 0.4/6
      (5L, "b c")  // unseen bigram, seen unigram c: P = 0.4*1/6
    ).toDF("doc_id", "text")
    val got = LangModel.scoreDocs(docs, train)
      .orderBy($"doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    def lp(p: Double): Double =
      BigDecimal(math.floor(math.log10(p) * 1e6 + 0.5) / 1e6)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0) === ((1L, 1L, 0L, lp(2.0 / 3))))
    assert(got(1) === ((3L, 1L, 1L, lp(0.4 / 6))))
    assert(got(2) === ((5L, 1L, 1L, lp(0.4 * 1 / 6.0))))
  }

  test("self-scoring never backs off; cross-scoring can") {
    val docs = Tables.t(spark, sf001, "documents")
    val self = LangModel.scoreDocs(docs, docs)
      .agg(sum($"n_backoff")).collect()(0).getLong(0)
    assert(self === 0L,
      "every bigram of the training corpus is in the LM")
    val cross = LangModel.scoreDocs(
      docs.filter($"doc_id" % 2 === 1),
      docs.filter($"doc_id" % 2 === 0))
    val agg = cross.agg(
      sum($"n_backoff").as("bo"), sum($"n_bigrams").as("nb"),
      max($"sum_logp").as("mx")).collect()(0)
    assert(agg.getLong(0) >= 0 && agg.getLong(0) <= agg.getLong(1))
    assert(agg.getDouble(2) < 0.0, "log10 scores are negative")
  }

  test("short documents are absent, not zero-scored") {
    val train = Seq((0L, "a b c")).toDF("doc_id", "text")
    val docs = Seq((1L, "a"), (2L, ""), (3L, "a b"))
      .toDF("doc_id", "text")
    val ids = LangModel.scoreDocs(docs, train)
      .select($"doc_id").as[Long].collect().sorted
    assert(ids === Array(3L))
  }

  test("scoring is deterministic across runs") {
    val docs = Tables.t(spark, sf001, "documents")
    val q = () => LangModel.scoreDocs(
      docs.filter($"doc_id" % 2 === 1),
      docs.filter($"doc_id" % 2 === 0)).orderBy($"doc_id").collect()
    assert(q().toSeq === q().toSeq)
  }
}
