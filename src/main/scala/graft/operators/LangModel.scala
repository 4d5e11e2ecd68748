package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model quality scoring (the CCNet/KenLM-style
  * perplexity filter, with a count LM instead of a pretrained model):
  * train bigram + unigram counts on a reference corpus, then score
  * every candidate document by its summed log10 probability under
  * stupid backoff (Brants et al. 2007 — score, not a normalized
  * distribution):
  *
  *   P(r | l) = B(l,r) / U(l)           if the bigram was seen
  *            = alpha * U(r) / N        else if the unigram was seen
  *            = alpha / N               else (unseen word floor)
  *
  * Scale shape: training is two partial+final hash aggregates over the
  * reference corpus (unigrams, bigrams); scoring explodes candidate
  * docs to bigram positions map-side and joins the count tables on
  * their keys — broadcast when the LM is small, shuffled equi-join on
  * the bigram key when it is corpus-sized (AQE decides). The score is
  * accumulated in exact DECIMAL over per-position `round(logp, 6)`, so
  * the result is reproducible bit-for-bit regardless of partition
  * order and is hash-checkable against the DuckDB oracle.
  */
object LangModel {

  /** Per-position (overlapping) adjacent-token pairs of a materialized
    * token array — multiplicity preserved (an LM counts occurrences,
    * not distinct pairs). */
  private def bigramPairs(ts: Column): Column =
    when(size(ts) >= 2,
      transform(sequence(lit(1), size(ts) - 1),
        j => struct(element_at(ts, j).as("l"),
          element_at(ts, j + 1).as("r"))))

  private def tokenized(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol), CorpusOps.tokens(col(textCol)).as("ts"))

  /** `(w, cnt)` unigram counts — one partial+final aggregate. */
  def unigramCounts(train: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    tokenized(train, idCol, textCol)
      .select(explode_outer(col("ts")).as("w"))
      .filter(col("w").isNotNull)
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** `(l, r, cnt)` bigram counts — map-side pair expansion plus one
    * partial+final aggregate. */
  def bigramCounts(train: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    tokenized(train, idCol, textCol)
      .select(explode_outer(bigramPairs(col("ts"))).as("p"))
      .filter(col("p").isNotNull)
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(count(lit(1)).as("cnt"))

  /** Score `docs` under a bigram LM trained on `train`:
    * `(id, n_bigrams, n_backoff, sum_logp)` — bigram position count,
    * how many positions fell to backoff, and the exact-decimal summed
    * log10 score. Documents with fewer than two tokens score nothing
    * and are absent. */
  def scoreDocs(docs: DataFrame, train: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      alpha: Double = 0.4): DataFrame = {
    val uni = unigramCounts(train, idCol, textCol)
    val bi = bigramCounts(train, idCol, textCol)
    // Total training token count: one number off the (already small)
    // unigram table — metadata-sized driver state, like the IVF
    // centroid pull.
    val n = uni.agg(sum("cnt")).collect()(0).getLong(0).toDouble
    require(n > 0, "LM training corpus has no tokens")

    val pos = tokenized(docs, idCol, textCol)
      .select(col(idCol), explode_outer(bigramPairs(col("ts"))).as("p"))
      .filter(col("p").isNotNull)
      .select(col(idCol), col("p.l").as("l"), col("p.r").as("r"))

    val joined = pos
      .join(bi.withColumnRenamed("cnt", "bcnt"), Seq("l", "r"), "left")
      .join(uni.select(col("w").as("l"), col("cnt").as("ulcnt")),
        Seq("l"), "left")
      .join(uni.select(col("w").as("r"), col("cnt").as("urcnt")),
        Seq("r"), "left")

    val prob =
      when(col("bcnt").isNotNull,
        col("bcnt").cast("double") / col("ulcnt").cast("double"))
        .when(col("urcnt").isNotNull,
          lit(alpha) * col("urcnt").cast("double") / lit(n))
        .otherwise(lit(alpha) / lit(n))

    joined
      .select(col(idCol),
        round(log10(prob), 6).cast("decimal(18,6)").as("lp"),
        col("bcnt").isNull.cast("int").as("bo"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("bo")).cast("long").as("n_backoff"),
        round(sum(col("lp")), 4).cast("double").as("sum_logp"))
  }
}
