package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text analysis over document corpora (north-star, SURVEY.md §2k): token
  * counting, quality scoring, language stats. Everything here is pure
  * `functions._` — fully codegen'd, map-side only until the final
  * aggregation, so it runs at corpus scale with a single shuffle (or none
  * for the per-document variants).
  */
object TextStats {

  /** Whitespace tokens per document (regexp_count of non-space runs) and
    * a BPE-ish token estimate: runs of letters, runs of digits, or single
    * non-alphanumeric glyphs — the classic pre-tokenizer split. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      regexp_count(col("text"), lit("\\S+")).as("ws_tokens"),
      regexp_count(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"))
        .as("bpe_tokens"),
      length(col("text")).as("n_chars"))

  /** Heuristic quality score in [0,1] from length/punctuation/caps/digit
    * ratios — the standard cheap pre-filter for LLM training corpora. */
  def qualityScore(docs: DataFrame): DataFrame = {
    val len = length(col("text")).cast("double")
    val punct = regexp_count(col("text"), lit("[.,!?;:]")).cast("double")
    val caps = regexp_count(col("text"), lit("[A-Z]")).cast("double")
    val digits = regexp_count(col("text"), lit("[0-9]")).cast("double")
    val ws = regexp_count(col("text"), lit(" ")).cast("double")
    docs.select(
      col("doc_id"),
      round(punct / greatest(len, lit(1.0)), 6).as("punct_ratio"),
      round(caps / greatest(len, lit(1.0)), 6).as("caps_ratio"),
      round(digits / greatest(len, lit(1.0)), 6).as("digit_ratio"),
      round(ws / greatest(len, lit(1.0)), 6).as("space_ratio"),
      // length score: 1 for docs in [100, 10000] chars, linear falloff
      round(least(len / lit(100.0), lit(1.0)) *
        least(lit(10000.0) / greatest(len, lit(1.0)), lit(1.0)), 6)
        .as("len_score"))
  }

  /** Repetition metrics (the Gopher-style "repetitious document"
    * quality filters): per document,
    *
    *  - `n_lines` — non-empty newline-separated lines;
    *  - `dup_line_frac` — fraction of lines that are copies of another
    *    line (`(lines - distinct) / lines`);
    *  - `dup_line_char_frac` — fraction of LINE CHARACTERS living in
    *    duplicated lines (every occurrence counts, so a page of one
    *    repeated line scores ~1.0);
    *  - `dup_word_frac` — same dedup ratio over whitespace tokens.
    *
    * Pure map-side array/HOF expressions — zero shuffles, codegen'd;
    * the inner duplicate probe is O(lines²) per doc, bounded by
    * document size, never by corpus size. */
  def repetitionStats(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val lines = filter(split(col(textCol), "\n"), l => length(l) > 0)
    val nLines = size(lines)
    val nDistinct = size(array_distinct(lines))
    def charSum(arr: org.apache.spark.sql.Column) =
      aggregate(arr, lit(0L), (a, x) => a + length(x).cast("long"))
    val totChars = charSum(lines)
    val dupChars = charSum(filter(lines,
      x => size(filter(lines, y => y === x)) > 1))
    val ts = filter(split(lower(col(textCol)), "\\s+"), t => t =!= "")
    val nTok = size(ts)
    val nTokDistinct = size(array_distinct(ts))
    def frac(num: org.apache.spark.sql.Column,
        den: org.apache.spark.sql.Column) =
      round(num.cast("double") /
        greatest(den.cast("double"), lit(1.0)), 6)
    docs.select(col(idCol), nLines.as("n_lines"),
      frac(nLines - nDistinct, nLines).as("dup_line_frac"),
      frac(dupChars, totChars).as("dup_line_char_frac"),
      frac(nTok - nTokDistinct, nTok).as("dup_word_frac"))
  }

  /** The Gopher stop-word presence list (Rae et al. 2021, Appendix A:
    * "contains at least 2 of ..."), extended with the bare articles
    * so the rule discriminates on terse corpora. */
  val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with", "a", "in")

  /** Gopher quality rules (Rae et al. 2021, arXiv:2112.11446,
    * Appendix A — the published rule-based document filter, the tier
    * between the cheap [[qualityScore]] heuristics and the
    * model-based [[QualityModel]]): per document,
    *
    *  - `n_words` — whitespace tokens; rule: 50 ≤ n ≤ 100,000;
    *  - `mean_word_len` — mean token length; rule: 3 ≤ mean ≤ 10;
    *  - `alpha_frac` — fraction of tokens containing a letter;
    *    rule: ≥ 0.80;
    *  - `n_stop` — distinct [[GopherStops]] present; rule: ≥ 2;
    *  - `keep` — all rules hold (decided on the ROUNDED fractions so
    *    engines agree at the boundaries).
    *
    * Pure map-side array/HOF expressions over one materialized token
    * array — zero shuffles, codegen'd; filtering a 100 TB corpus is a
    * single scan, like every rule-based tier should be. */
  def gopherRules(docs: DataFrame, minWords: Int = 50,
      maxWords: Int = 100000, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val ts = col("_ts")
    val nWords = size(ts)
    val meanLen = round(
      aggregate(ts, lit(0L), (a, t) => a + length(t)).cast("double") /
        greatest(nWords.cast("double"), lit(1.0)), 4)
    val alphaFrac = round(
      size(filter(ts, t => t.rlike("[a-z]"))).cast("double") /
        greatest(nWords.cast("double"), lit(1.0)), 4)
    val nStop = size(array_intersect(array_distinct(ts),
      typedLit(GopherStops)))
    docs
      .select(col(idCol), graft.operators.CorpusOps.tokens(col(textCol))
        .as("_ts"))
      .select(col(idCol), nWords.as("n_words"),
        meanLen.as("mean_word_len"), alphaFrac.as("alpha_frac"),
        nStop.as("n_stop"))
      .withColumn("keep",
        col("n_words") >= minWords && col("n_words") <= maxWords &&
        col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
        col("alpha_frac") >= 0.8 && col("n_stop") >= 2)
  }

  /** Corpus stats per language label: doc count, char volume, token sum. */
  def perLanguage(docs: DataFrame): DataFrame =
    docs.groupBy(col("lang")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_chars")).as("total_chars"),
      sum(regexp_count(col("text"), lit("\\S+"))).as("total_ws_tokens"))

  /** Flesch-style readability under the FULLY INTEGER contract: words
    * are the whitespace tokens, sentences the `[.!?]+` runs (floored
    * at 1), syllables the per-word `[aeiouy]+` vowel-group count
    * (floored at 1/word — the standard cheap proxy), and the score is
    * {{{ fre_milli = 206835 − (1015·W) // S − (84600·Syl) // W }}}
    * — the classic 206.835/1.015/84.6 constants at milli scale with
    * DISCLOSED floors, so any engine replays it exactly (no float
    * ratios to diverge on). Pure map-side scan; the training-data
    * quality axis that complements gopherRules' structural checks.
    * Zero-word docs drop (score undefined).
    *
    * @return `(id, n_words, n_sentences, n_syllables, fre_milli)`
    */
  def readability(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    def intDiv(a: org.apache.spark.sql.Column,
        b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      ColumnBridge.column(new org.apache.spark.sql.catalyst.expressions
        .IntegralDivide(ColumnBridge.expression(a),
          ColumnBridge.expression(b)))
    val words = filter(split(lower(col(textCol)), "\\s+"),
      w => w =!= "")
    val syllables = aggregate(
      transform(words, w => greatest(lit(1L),
        size(regexp_extract_all(w, lit("[aeiouy]+"), lit(0)))
          .cast("long"))),
      lit(0L), (a, x) => a + x)
    docs
      .select(col(idCol), size(words).cast("long").as("n_words"),
        greatest(lit(1L),
          size(regexp_extract_all(col(textCol), lit("[.!?]+"),
            lit(0))).cast("long")).as("n_sentences"),
        syllables.as("n_syllables"))
      .filter(col("n_words") >= 1)
      .select(col(idCol), col("n_words"), col("n_sentences"),
        col("n_syllables"),
        (lit(206835L) -
          intDiv(lit(1015L) * col("n_words"), col("n_sentences")) -
          intDiv(lit(84600L) * col("n_syllables"), col("n_words")))
          .as("fre_milli"))
      .orderBy(col(idCol))
  }

  /** Type-token ratio (lexical diversity): distinct whitespace tokens
    * over total, as exact ppm — near-zero TTR on a long document is
    * the boilerplate/spam signature the repetition checks approach
    * from the other side. Case-sensitive `\S+` tokens (disclosed —
    * the [[readability]]/token-count whitespace contract). Pure
    * map-side scan; zero-token docs drop.
    *
    * @return `(id, n_tokens, n_distinct, ttr_ppm)` ordered by id
    */
  def typeTokenRatio(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    def intDiv(a: org.apache.spark.sql.Column,
        b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      ColumnBridge.column(new org.apache.spark.sql.catalyst.expressions
        .IntegralDivide(ColumnBridge.expression(a),
          ColumnBridge.expression(b)))
    val ts = regexp_extract_all(col(textCol), lit("\\S+"), lit(0))
    docs
      .select(col(idCol), size(ts).cast("long").as("n_tokens"),
        size(array_distinct(ts)).cast("long").as("n_distinct"))
      .filter(col("n_tokens") > 0L)
      .select(col(idCol), col("n_tokens"), col("n_distinct"),
        intDiv(col("n_distinct") * lit(1000000L), col("n_tokens"))
          .as("ttr_ppm"))
      .orderBy(col(idCol))
  }

  /** Vocabulary growth across corpus prefixes (the Heaps-law
    * readout): docs bucket into `buckets` deciles by id position
    * (`min(b−1, id·b div (max_id+1))` — no sort, one broadcast
    * max), every term charges its FIRST decile, and the cumulative
    * new-term curve against cumulative tokens is the sub-linearity
    * check (vocab ∝ tokens^β, β < 1, for natural text; a
    * deduplicated-to-death or template corpus bends the curve).
    * All integer: one term explode + two hash rollups; the
    * cumulative windows run over `buckets` ROLLUP ROWS only.
    *
    * @return `(decile, bucket_tokens, new_terms, cum_tokens,
    *         cum_vocab)` ordered by decile
    */
  def vocabGrowth(docs: DataFrame, buckets: Int = 10,
      idCol: String = "doc_id", textCol: String = "text")
      : DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2: $buckets")
    import org.apache.spark.sql.graftbridge.ColumnBridge
    def intDiv(a: org.apache.spark.sql.Column,
        b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      ColumnBridge.column(new org.apache.spark.sql.catalyst.expressions
        .IntegralDivide(ColumnBridge.expression(a),
          ColumnBridge.expression(b)))
    val mx = docs.agg(max(col(idCol)).as("__vg_mx"))
    val toks = docs.crossJoin(broadcast(mx))
      .select(least(lit(buckets - 1),
        intDiv(col(idCol) * buckets, col("__vg_mx") + 1))
        .cast("long").as("decile"),
        explode(regexp_extract_all(col(textCol), lit("\\S+"),
          lit(0))).as("term"))
    val bucketTok = toks.groupBy(col("decile"))
      .agg(count(lit(1)).as("bucket_tokens"))
    val firstSeen = toks.groupBy(col("term"))
      .agg(min(col("decile")).as("decile"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("new_terms"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("decile"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, org.apache.spark.sql.expressions.Window
        .currentRow)
    bucketTok.join(firstSeen, Seq("decile"), "full_outer")
      .na.fill(0L, Seq("bucket_tokens", "new_terms"))
      .withColumn("cum_tokens", sum(col("bucket_tokens")).over(w))
      .withColumn("cum_vocab", sum(col("new_terms")).over(w))
      .select(col("decile"), col("bucket_tokens"), col("new_terms"),
        col("cum_tokens"), col("cum_vocab"))
      .orderBy(col("decile"))
  }

  /** Zipf rank-frequency slope of the corpus term distribution — the
    * one-number corpus-health check (natural text sits near −1·10⁶
    * ppm; a template-stamped or deduplication-damaged corpus drifts):
    * OLS slope of `ln(freq)` on `ln(rank)` over the top-`k` terms,
    * under the FULLY INTEGER contract — both logs quantize to
    * micro-nats at their integer argument (the tfidf 6-dp rule), the
    * normal-equation sums ride DECIMAL(38,0), and the final
    * {{{ slope_ppm = (n·Σxy − Σx·Σy)·10⁶ ⌊/⌋ (n·Σx² − (Σx)²) }}}
    * uses TRUE floor division (the numerator is legitimately
    * negative; both engines' native integer division truncates
    * toward zero, so the sign-split floor identity is applied HERE
    * and replayed verbatim in the oracle's CASE).
    *
    * Scale shape: one term-count shuffle, then a top-`k`
    * TakeOrderedAndProject with the deterministic `(freq desc, term)`
    * tiebreak; ranks are a row_number over the `k` surviving rows
    * only (bounded, disclosed — never the full term table).
    *
    * @return one row `(n_terms, slope_ppm)`
    */
  def zipfSlope(docs: DataFrame, k: Int = 500,
      textCol: String = "text"): DataFrame = {
    require(k >= 3, s"k must be >= 3: $k")
    import org.apache.spark.sql.graftbridge.ColumnBridge
    def intDiv(a: org.apache.spark.sql.Column,
        b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      ColumnBridge.column(new org.apache.spark.sql.catalyst.expressions
        .IntegralDivide(ColumnBridge.expression(a),
          ColumnBridge.expression(b)))
    def floorDiv(a: org.apache.spark.sql.Column,
        b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(a < 0, -intDiv(-a + b - lit(1), b)).otherwise(intDiv(a, b))
    def lnq(c: org.apache.spark.sql.Column)
        : org.apache.spark.sql.Column =
      round(log(c.cast("double")) * lit(1000000.0)).cast("long")
    val dec = "decimal(38,0)"
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("f").desc, col("term"))
    docs
      .select(explode(regexp_extract_all(col(textCol), lit("\\S+"),
        lit(0))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("term")).limit(k)
      .withColumn("r", row_number().over(w))
      .select(lnq(col("r")).cast(dec).as("x"),
        lnq(col("f")).cast(dec).as("y"))
      .agg(count(lit(1)).cast(dec).as("n"),
        sum(col("x")).cast(dec).as("sx"),
        sum(col("y")).cast(dec).as("sy"),
        sum(col("x") * col("y")).cast(dec).as("sxy"),
        sum(col("x") * col("x")).cast(dec).as("sxx"))
      .select(col("n").cast("long").as("n_terms"),
        floorDiv((col("n") * col("sxy") - col("sx") * col("sy")) *
          lit(1000000L).cast(dec),
          col("n") * col("sxx") - col("sx") * col("sx"))
          .cast("long").as("slope_ppm"))
  }
}
