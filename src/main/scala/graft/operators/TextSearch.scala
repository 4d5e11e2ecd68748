package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ranked keyword retrieval over a document corpus (north-star
  * extension beside SURVEY.md §2k text analysis): BM25 scoring for a
  * term query and per-document TF-IDF keyword extraction — the
  * retrieval/characterization half of a training-data curation loop
  * (find the documents about X; label every document with the terms
  * that distinguish it).
  *
  * Tokenization is [[CorpusOps.tokens]] (lower-cased whitespace split,
  * empties dropped), mirrored verbatim by the DuckDB oracles.
  *
  * 100 TB shape:
  *
  *  - [[bm25]] filters the exploded token stream to the QUERY terms
  *    before anything shuffles — the corpus-sized stream collapses to
  *    |query-term occurrences| at the scan. Corpus constants (N,
  *    avgdl) and the per-term document frequencies are three-row
  *    aggregates broadcast back into the plan; the final top-k is a
  *    `TakeOrderedAndProject` (per-partition heads, never a global
  *    sort).
  *  - [[tfIdfKeywords]] genuinely touches every (doc, term) pair —
  *    two hash rollups (term frequency, document frequency) and one
  *    per-doc window for the top-m cut. At 100 TB you'd fingerprint
  *    terms to a 64-bit digest first so the term-keyed exchanges move
  *    fixed-width keys (exact-dedup style), and re-join the surviving
  *    top-m rows for the term text.
  */
object TextSearch {

  /** BM25 top-k retrieval (Robertson–Spärck Jones, the Okapi BM25
    * formula in its standard `ln(1 + (N-df+0.5)/(df+0.5))` smoothing):
    * the `k` highest-scoring documents for a whitespace query, ties on
    * the (rounded) score broken by id. Returns `(id, score)` sorted
    * best-first. Documents containing none of the query terms never
    * leave the scan. */
  def bm25(docs: DataFrame, query: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val qTerms = queryTerms(query)

    // materialize the token array ONCE per row before fanning out to
    // size/explode — the split expression re-evaluates per reference
    // otherwise (no subexpression elimination across generators)
    val toks = docs.select(col(idCol),
      CorpusOps.tokens(col(textCol)).as("_ts"))
    val lens = toks.select(col(idCol), size(col("_ts")).as("dl"))
    // corpus constants: one tiny all-reduce, broadcast back
    val stats = lens.agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl"))

    // explode_outer + null-filter: the inner explode's inferred
    // size-filter would push a re-tokenization into the scan (see
    // CorpusOps.wordNgrams); the term filter drops the null rows
    val tf = toks
      .select(col(idCol), size(col("_ts")).as("dl"),
        explode_outer(col("_ts")).as("term"))
      .filter(col("term").isin(qTerms: _*))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    scoreBm25(tf, stats, k, k1, b, idCol)
  }

  private def queryTerms(query: String): Seq[String] = {
    val qTerms = query.toLowerCase.split("\\s+").filter(_.nonEmpty)
      .distinct.toSeq
    require(qTerms.nonEmpty, "bm25 query must contain at least one term")
    qTerms
  }

  /** The shared Okapi scoring tail: `tf` carries one row per
    * (doc, query term) with the doc length, `stats` the (n, avgdl)
    * scalars. Doc frequency falls out of `tf` itself (count of rows
    * per term), so corpus and index retrieval score IDENTICALLY. */
  private def scoreBm25(tf: DataFrame, stats: DataFrame, k: Int,
      k1: Double, b: Double, idCol: String): DataFrame = {
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1) +
      (col("n") - col("df") + 0.5) / (col("df") + 0.5))
    val norm = col("tf") +
      lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))
    tf.join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .groupBy(col(idCol))
      .agg(round(sum(idf * (col("tf") * (k1 + 1)) / norm), 4).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** PERSISTED INVERTED INDEX — the postings-list layout every search
    * engine builds once and serves from, here as a graft-v2 table:
    *
    *  - `<path>/postings`: one row per (term, doc) — `(term, doc_id,
    *    dl, tf)` — BUCKETED BY TERM (and bucket-sorted by (term, id)),
    *    so a query's `term IN (...)` scan opens only the ≤ |terms|
    *    buckets that can hold its postings (graft's bucket pruning);
    *    the 100 TB corpus is tokenized ONCE at build, never at query.
    *  - `<path>/stats`: append-only `(n_docs, total_dl)` rows; the
    *    query-time (N, avgdl) fold is an exact integer sum, so the
    *    derived avgdl equals the corpus-scan `avg(dl)` bit-for-bit.
    *
    * [[extendPostings]] appends NEW documents' postings into the same
    * bucket layout plus one stats row — index maintenance is
    * incremental in the delta's size (the contract is append-only
    * corpora: re-adding an indexed doc would double-count it; dedup
    * upstream). [[bm25FromIndex]] then serves the exact [[bm25]]
    * scores with zero corpus access. */
  def buildPostings(docs: DataFrame, path: String, numBuckets: Int = 16,
      idCol: String = "doc_id", textCol: String = "text"): Unit =
    writePostings(docs, path, numBuckets,
      org.apache.spark.sql.SaveMode.Overwrite, idCol, textCol)

  /** Incrementally index NEW documents (append-only contract — see
    * [[buildPostings]]): their postings land in the existing bucket
    * layout, their (count, total length) in one appended stats row. */
  def extendPostings(newDocs: DataFrame, path: String,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val spark = newDocs.sparkSession
    val dir = new org.apache.hadoop.fs.Path(s"$path/postings")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val layout = graft.sources.BucketLayout.read(fs, dir).getOrElse(
      throw new IllegalArgumentException(
        s"graft extendPostings: no postings index at $path — " +
        "buildPostings first"))
    writePostings(newDocs, path, layout.numBuckets,
      org.apache.spark.sql.SaveMode.Append, idCol, textCol)
  }

  private def writePostings(docs: DataFrame, path: String,
      numBuckets: Int, mode: org.apache.spark.sql.SaveMode,
      idCol: String, textCol: String): Unit = {
    val toks = docs.select(col(idCol),
      CorpusOps.tokens(col(textCol)).as("_ts"))
    val tf = toks
      .select(col(idCol), size(col("_ts")).as("dl"),
        explode_outer(col("_ts")).as("term"))
      .filter(col("term").isNotNull)
      .groupBy(col("term"), col(idCol), col("dl"))
      .agg(count(lit(1)).as("tf"))
    graft.sources.GraftSink.saveBucketedFiles(tf, s"$path/postings",
      numBuckets, Seq("term"), sortCols = Seq("term", idCol),
      mode = mode)
    toks.select(size(col("_ts")).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))
      .coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Append)
      .parquet(s"$path/stats")
  }

  /** Build the postings index FROM A graft-v2 CORPUS TABLE and
    * subscribe to its change data feed: the index records (via a
    * registered feed consumer) the corpus version it reflects, so
    * [[extendPostingsFromFeed]] can later apply exactly the appends
    * committed since — and the consumer mark holds the corpus's
    * vacuum window open for this subscription. */
  def buildPostingsFromTable(spark: org.apache.spark.sql.SparkSession,
      corpusPath: String, indexPath: String, consumerId: String,
      numBuckets: Int = 16, idCol: String = "doc_id",
      textCol: String = "text"): Unit = {
    import graft.sources.v2.{GraftCdf, GraftManifest}
    val t = new org.apache.hadoop.fs.Path(corpusPath)
    val fs = t.getFileSystem(spark.sessionState.newHadoopConf())
    // pin BEFORE reading: a commit landing between the read and the
    // mark would otherwise be skipped forever; landing between mark
    // and read it is indexed AND replayed — refused below, never lost
    val ver = GraftManifest.pinForMutation(fs, t).version
    val docs = spark.read.format("graft-v2")
      .option("versionAsOf", ver.toString).load(corpusPath)
    buildPostings(docs, indexPath, numBuckets, idCol, textCol)
    GraftCdf.advanceConsumer(fs, t, consumerId, ver)
  }

  /** Apply every corpus commit since this consumer's mark to the
    * index: INSERT rows extend the postings (cost ∝ the delta), the
    * mark advances, and the call is idempotent when nothing new
    * committed. Row-level deletes/updates are REFUSED loudly — the
    * postings layout is append-only (rebuild, or filter dead doc ids
    * at query time, for mutable corpora). Returns the number of
    * versions applied. */
  def extendPostingsFromFeed(spark: org.apache.spark.sql.SparkSession,
      corpusPath: String, indexPath: String, consumerId: String,
      idCol: String = "doc_id", textCol: String = "text"): Long = {
    import graft.sources.v2.{GraftCdf, GraftManifest}
    val t = new org.apache.hadoop.fs.Path(corpusPath)
    val fs = t.getFileSystem(spark.sessionState.newHadoopConf())
    val mark = GraftCdf.consumerMarks(fs, t).getOrElse(consumerId,
      throw new IllegalArgumentException(
        s"graft extendPostingsFromFeed: consumer '$consumerId' is not " +
        s"registered on $corpusPath — buildPostingsFromTable first"))
    val cur = GraftManifest.current(fs, t).map(_.version).getOrElse(0L)
    if (cur <= mark) return 0L
    val feed = GraftCdf.tableChanges(spark, corpusPath, mark + 1, cur)
    val nonInsert = feed
      .filter(col(GraftCdf.ChangeType) =!= "insert").limit(1).count()
    require(nonInsert == 0L,
      s"graft extendPostingsFromFeed: $corpusPath committed row " +
      "deletes/updates in the feed window — the postings layout is " +
      "append-only; rebuild the index or filter dead ids at query time")
    extendPostings(feed.select(col(idCol), col(textCol)), indexPath,
      idCol, textCol)
    GraftCdf.advanceConsumer(fs, t, consumerId, cur)
    cur - mark
  }

  /** BM25 served ENTIRELY from the index: the postings scan is
    * bucket-pruned to the query terms, (N, avgdl) folds from the
    * stats rows, and the scoring tail is [[bm25]]'s own — identical
    * scores, zero corpus access. */
  def bm25FromIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, query: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id"): DataFrame = {
    val qTerms = queryTerms(query)
    val tf = spark.read.format("graft-v2")
      .option("path", s"$path/postings").load()
      .filter(col("term").isin(qTerms: _*))
    // exact integer fold -> ONE double division, the same value (and
    // bits) as avg(dl) over the corpus
    val stats = spark.read.parquet(s"$path/stats")
      .agg(sum(col("n_docs")).as("n"),
        (sum(col("total_dl")).cast("double") /
          sum(col("n_docs")).cast("double")).as("avgdl"))
    scoreBm25(tf, stats, k, k1, b, idCol)
  }

  /** Per-document TF-IDF keywords: the `m` terms of each document with
    * the highest `(tf/dl) * ln((N+1)/(df+1))`, rounded to 6 with ties
    * broken by term — `(id, term, tfidf, rk)`. The smooth-idf variant
    * keeps corpus-universal terms finite instead of dividing by zero
    * information. */
  def tfIdfKeywords(docs: DataFrame, m: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = docs
      .select(col(idCol), CorpusOps.tokens(col(textCol)).as("_ts"))
      .select(col(idCol), size(col("_ts")).as("dl"),
        explode_outer(col("_ts")).as("term"))
      .filter(col("term").isNotNull)
    val tf = toks.groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("n"))

    val scored = tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col(idCol), col("term"),
        round(col("tf") / col("dl").cast("double") *
          log((col("n") + 1.0) / (col("df") + 1.0)), 6).as("tfidf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= m)
  }
}
