package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.text_hash64

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): score every raw-corpus document by how much more
  * likely its hashed n-gram features are under a TARGET distribution
  * (the domain you want more of) than under the RAW distribution (the
  * crawl you are filtering), then keep the highest-weight documents.
  * This is the standard "make CommonCrawl look like Wikipedia" data
  * selection stage of an LLM training pipeline.
  *
  * Features are the hashing trick over word unigrams AND bigrams (the
  * paper's featurization), with multiplicity: every occurrence hashes
  * to one of `dim` buckets via the deterministic 64-bit FNV-1a
  * [[graft.functions.TextHash64]] — the same oracle-renderable
  * primitive [[QualityModel]] uses. Both corpus distributions are
  * bag-of-buckets models with add-1 smoothing; a document's log
  * importance weight is
  *
  *   log w(x) = Σ_g  log10 p̂_target[b(g)] − log10 p̂_raw[b(g)]
  *
  * over its feature stream g. Per-bucket log-ratios are rounded to 6
  * decimals and the per-document sum runs in exact DECIMAL, so the
  * score is reproducible bit-for-bit regardless of partition order and
  * hash-checkable against an independent engine (the same
  * accumulation discipline as [[LangModel.scoreDocs]]).
  *
  * 100 TB shape:
  *
  *  - TRAINING is two partial+final hash aggregates (one per corpus),
  *    each producing at most `dim` rows — the only driver traffic is
  *    the `dim`-sized count vectors (metadata, like IVF centroids).
  *    In practice the target corpus is small and the raw side is
  *    estimated on a [[CorpusOps.sampleByRate]] slice — the model has
  *    `dim` parameters, it does not need the full crawl.
  *  - SCORING is a single whole-stage-codegen'd map-side pass: gram
  *    expansion, FNV bucket, log-ratio lookup from the inlined array,
  *    DECIMAL fold. No shuffle, no join, no state — filtering a
  *    100 TB corpus is a pure scan, exactly like
  *    [[QualityModel.score]].
  */
object Dsir {

  /** A trained hashed-n-gram importance model: `logRatio(b)` is the
    * rounded-to-6 log10 target/raw probability ratio of bucket `b`.
    * Inlined into plans (and rendered into oracles), so keep `dim` at
    * literal-friendly sizes (64-4096). */
  final case class NgramRatioModel(dim: Int, logRatio: Array[Double])

  /** The feature stream of a MATERIALIZED token-array column:
    * unigrams ++ space-joined bigrams, multiplicity preserved (DSIR
    * models occurrence counts, not distinct grams). `ts` must be a
    * bound column — see [[CorpusOps.wordNgrams]] for why lambdas must
    * not inline the tokenizer. */
  def featureGrams(ts: Column): Column =
    concat(
      when(size(ts) >= 1, ts).otherwise(array().cast("array<string>")),
      when(size(ts) >= 2,
        transform(sequence(lit(1), size(ts) - 1),
          j => concat_ws(" ", slice(ts, j, lit(2)))))
        .otherwise(array().cast("array<string>")))

  /** Feature bucket of one gram: `pmod(fnv1a64(gram), dim)`. */
  def bucketOf(gram: Column, dim: Int): Column =
    pmod(text_hash64(gram), lit(dim.toLong))

  /** Per-bucket feature counts of a corpus — one map-side gram
    * expansion plus one partial+final hash aggregate collapsing to at
    * most `dim` rows. */
  private def bucketCounts(docs: DataFrame, dim: Int, idCol: String,
      textCol: String): Array[Long] = {
    val rows = docs
      .select(CorpusOps.tokens(col(textCol)).as("_ts"))
      .select(explode_outer(featureGrams(col("_ts"))).as("g"))
      .filter(col("g").isNotNull)
      .select(bucketOf(col("g"), dim).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("c"))
      .collect()
    val out = new Array[Long](dim)
    rows.foreach(r => out(r.getLong(0).toInt) = r.getLong(1))
    out
  }

  /** Fit the importance model: hashed feature counts of `target` and
    * `raw`, add-1 smoothed over the `dim` buckets, log10 ratio per
    * bucket rounded to 6 (the rounding that makes downstream DECIMAL
    * sums engine-independent). */
  def train(target: DataFrame, raw: DataFrame, dim: Int = 256,
      idCol: String = "doc_id", textCol: String = "text")
      : NgramRatioModel = {
    require(dim > 0, s"dim must be positive, got $dim")
    val p = bucketCounts(target, dim, idCol, textCol)
    val q = bucketCounts(raw, dim, idCol, textCol)
    val tp = p.sum.toDouble + dim
    val tq = q.sum.toDouble + dim
    require(p.sum > 0, "DSIR target corpus has no tokens")
    require(q.sum > 0, "DSIR raw corpus has no tokens")
    val lr = Array.tabulate(dim) { b =>
      val v = math.log10((p(b) + 1) / tp) - math.log10((q(b) + 1) / tq)
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    NgramRatioModel(dim, lr)
  }

  /** Score every document under the model:
    * `(id, n_feats, log_w, keep)` — feature count, the exact-DECIMAL
    * summed log10 importance weight (rounded to 4), and the threshold
    * decision on the ROUNDED weight (so engines agree at the
    * boundary). Documents with no tokens score 0. Pure map-side. */
  def score(docs: DataFrame, model: NgramRatioModel, tau: Double = 0.0,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // r20: the DECIMAL HOF fold (interpreted `aggregate`, one decimal
    // add + two casts per gram) is now ONE native codegen'd long pass
    // ([[graft.functions.DsirScoreSum]]). Each addend the fold summed
    // was `logRatio(b).cast(decimal(18,6))` — an EXACT scale-6 value
    // because train() rounds ratios to 6 decimals — so the per-bucket
    // unscaled longs below replicate the cast bit-for-bit
    // (`Decimal(double)` + `changePrecision(18,6)` is the same code
    // path Spark's Cast runs) and the decimal sum is an exact long sum.
    val ratiosMicro: Array[Long] = model.logRatio.map { v =>
      val d = org.apache.spark.sql.types.Decimal(v)
      require(d.changePrecision(18, 6), s"ratio $v overflows dec(18,6)")
      d.toUnscaledLong
    }
    val sumLr = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.DsirScoreSum(
        org.apache.spark.sql.graftbridge.ColumnBridge
          .expression(col("_gs")),
        model.dim, ratiosMicro))
    docs
      .select(col(idCol), CorpusOps.tokens(col(textCol)).as("_ts"))
      .select(col(idCol), featureGrams(col("_ts")).as("_gs"))
      .select(col(idCol), size(col("_gs")).as("n_feats"),
        round(sumLr, 4).cast("double").as("log_w"))
      .withColumn("keep", col("log_w") >= tau)
  }

  private val cache = new ConcurrentHashMap[String, NgramRatioModel]()

  /** Train-once memoization (the [[Ann.trainIvfCached]] contract). */
  def trainCached(key: String, target: => DataFrame, raw: => DataFrame,
      dim: Int = 256): NgramRatioModel =
    cache.computeIfAbsent(key, _ => train(target, raw, dim))
}
