package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.text_hash64

/** Model-based quality filtering (the fastText-style classifier stage
  * of a training-data pipeline, after the heuristic
  * [[TextStats.qualityScore]] tier): a logistic regression over
  * hashing-trick bag-of-words features, trained IN the engine by
  * full-batch gradient descent and applied as a pure codegen'd
  * expression.
  *
  * Features: every token (lower-cased whitespace split, the shared
  * [[CorpusOps.tokens]]) hashes to one of `dim` buckets via the
  * deterministic 64-bit FNV-1a [[graft.functions.TextHash64]]; a
  * document's feature vector is its bucket-count vector divided by its
  * token count (mean pooling, as fastText does). The model is `dim`
  * weights + a bias; `score = sigmoid(bias + w · x)`.
  *
  * 100 TB shape:
  *
  *  - TRAINING (train-once): each GD iteration is one map-side pass
  *    (margins from the broadcast weight vector — a literal in the
  *    plan, no join) plus ONE feature-keyed hash aggregate whose
  *    result is the `dim`-sized gradient — the only driver traffic is
  *    `dim` doubles per iteration (metadata, like IVF centroids). The
  *    tokenized feature table is computed once and reused across
  *    iterations. You train on a [[CorpusOps.sampleByRate]] slice, not
  *    the full corpus — the model has `dim+1` parameters.
  *  - SCORING (apply-many): a single whole-stage-codegen'd expression
  *    per row — hash, weight lookup from the inlined array, mean,
  *    sigmoid. No shuffle, no join, no state. Filtering a 100 TB
  *    corpus is a pure scan.
  */
object QualityModel {

  /** A trained hashed-feature logistic model. Weights are inlined into
    * plans (and rendered into DuckDB oracles), so keep `dim` at
    * literal-friendly sizes (64-4096). */
  final case class HashedLinearModel(dim: Int, bias: Double,
      weights: Array[Double])

  /** Feature index of a token: `pmod(fnv1a64(token), dim)`. */
  def featureIndex(token: Column, dim: Int): Column =
    pmod(text_hash64(token), lit(dim.toLong))

  /** The raw margin `bias + w·x` over a MATERIALIZED token-array
    * column — mean-pooled, computed in token order (deterministic
    * fold, mirrored exactly by the oracle's per-token sum). Tokenless
    * documents score the bare bias. `ts` must be a bound column, not
    * the tokenizer expression: it is referenced three times here and
    * generators/lambdas get no subexpression elimination. */
  private def margin(ts: Column, model: HashedLinearModel): Column = {
    val w = typedLit(model.weights.toSeq)
    val sum = aggregate(ts, lit(0.0), (acc, t) =>
      acc + element_at(w, (featureIndex(t, model.dim) + 1).cast("int")))
    lit(model.bias) +
      when(size(ts) > 0, sum / size(ts)).otherwise(lit(0.0))
  }

  /** Score every document: `(id, score, keep)` where `score` is the
    * sigmoid of the margin rounded to 4 and `keep = score >= threshold`
    * (decided on the ROUNDED score, so engines agree at the boundary).
    * Pure map-side; staged projections so the tokenizer and the scoring
    * fold each run exactly once per row. */
  def score(docs: DataFrame, model: HashedLinearModel,
      threshold: Double = 0.5, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val s = round(lit(1.0) /
      (lit(1.0) + exp(-margin(col("_ts"), model))), 4)
    docs.select(col(idCol), CorpusOps.tokens(col(textCol)).as("_ts"))
      .select(col(idCol), s.as("score"))
      .select(col(idCol), col("score"),
        (col("score") >= threshold).as("keep"))
  }

  /** Train by full-batch gradient descent on `docs(labelCol)` (boolean
    * or 0/1). Documents with no tokens are skipped (their features are
    * undefined). `dim` doubles cross the driver per iteration — the
    * same metadata-scale traffic as IVF centroid training. */
  def train(docs: DataFrame, labelCol: String, dim: Int = 64,
      iters: Int = 40, lr: Double = 4.0, idCol: String = "doc_id",
      textCol: String = "text"): HashedLinearModel = {
    require(dim > 0 && iters >= 1)
    val feats = docs
      .select(col(labelCol).cast("double").as("y"),
        transform(CorpusOps.tokens(col(textCol)),
          t => (featureIndex(t, dim) + 1).cast("int")).as("fs"))
      .filter(size(col("fs")) > 0)
      .select(col("y"), col("fs"), size(col("fs")).cast("double").as("dl"))
      .cache()
    try {
      val n = feats.count().toDouble
      require(n > 0, "quality training set has no tokenized documents")
      var w = new Array[Double](dim)
      var b = 0.0
      for (_ <- 0 until iters) {
        val wl = typedLit(w.toSeq)
        val z = lit(b) + aggregate(col("fs"), lit(0.0),
          (acc, f) => acc + element_at(wl, f)) / col("dl")
        val resid = feats.select(col("fs"), col("dl"),
          (lit(1.0) / (lit(1.0) + exp(-z)) - col("y")).as("r"))
        // one feature-keyed rollup -> the dim-sized gradient
        val rows = resid
          .select(explode(col("fs")).as("f"), (col("r") / col("dl")).as("g"))
          .groupBy(col("f")).agg(sum(col("g")).as("g"))
          .collect()
        val bias = resid.agg(sum(col("r"))).head.getDouble(0)
        val w2 = w.clone()
        rows.foreach(r => w2(r.getInt(0) - 1) -= lr * r.getDouble(1) / n)
        b -= lr * bias / n
        w = w2
      }
      HashedLinearModel(dim, b, w)
    } finally feats.unpersist()
  }

  private val cache = new ConcurrentHashMap[String, HashedLinearModel]()

  /** Train-once memoization (the [[Ann.trainIvfCached]] contract): the
    * benched/verified queries apply a steady-state model; the one-time
    * fit happens outside timed paths. */
  def trainCached(key: String, docs: => DataFrame, labelCol: String,
      dim: Int = 64, iters: Int = 40, lr: Double = 4.0): HashedLinearModel =
    cache.computeIfAbsent(key, _ => train(docs, labelCol, dim, iters, lr))

  /** Drop a memoized fit so the next [[trainCached]] call trains for
    * real — bench hook for honest train-query timings. */
  def evictCached(key: String): Unit = { cache.remove(key); () }
}
