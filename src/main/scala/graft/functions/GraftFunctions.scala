package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Column-API + SQL registration surface for graft's native Catalyst
  * expressions. The reference exposes no scalar functions of its own
  * (SURVEY.md §2j) — these implement the north-star LLM-pipeline
  * extensions (SURVEY.md §2k) as codegen-adjacent native expressions
  * rather than Scala UDFs, so they stay inside Catalyst's type checking
  * and null handling.
  */
object GraftFunctions {

  private def c(e: Expression): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(e)
  private def x(col: Column): Expression =
    org.apache.spark.sql.graftbridge.ColumnBridge.expression(col)

  /** Cosine similarity between two numeric arrays (double). */
  def cosine_sim(a: Column, b: Column): Column = c(CosineSimilarity(x(a), x(b)))

  /** MinHash signature: `k` 64-bit min-hashes over word `n`-gram shingles. */
  def minhash(text: Column, k: Int, shingle: Int): Column =
    c(MinHashSignature(x(text), k, shingle))

  /** 64-bit SimHash over word unigrams. */
  def simhash(text: Column): Column = c(SimHash64(x(text)))

  /** Winnowing document fingerprint: min rolling (Rabin-Karp) hash over
    * character windows of size `w`. */
  def fingerprint(text: Column, w: Int): Column = c(RollingFingerprint(x(text), w))

  /** Character n-gram set Jaccard similarity between two strings. */
  def ngram_jaccard(a: Column, b: Column, n: Int): Column =
    c(NgramJaccard(x(a), x(b), n))

  /** Heuristic language ID (script ranges + stopword n-gram hits). */
  def lang_guess(text: Column): Column = c(LangGuess(x(text)))

  /** Plain 64-bit FNV-1a string hash (the feature-hashing primitive). */
  def text_hash64(text: Column): Column = c(TextHash64(x(text)))

  /** The d Count-Min bucket indices of a term (w a power of two). */
  def cms_buckets(text: Column, d: Int, w: Int): Column =
    c(CmsBuckets(x(text), d, w))

  /** Hilbert index of an array of `[0, 2^bits)` lane values. */
  def hilbert_index(lanes: Column, bits: Int): Column =
    c(HilbertIndex(x(lanes), bits))

  /** SQL registration for `cosine_sim`, used by [[graft.GraftExtensions]]. */
  def cosineSimilarityDescriptor: (FunctionIdentifier, ExpressionInfo,
      FunctionRegistry.FunctionBuilder) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (children: Seq[Expression]) => CosineSimilarity(children(0), children(1)))

  private def litInt(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects an integer literal, got $other")
  }

  /** The full SQL-surface registry (`spark.sql("SELECT lang_guess(...)")`
    * etc.) injected by [[graft.GraftExtensions]] — every native text /
    * similarity expression is reachable from pure SQL, not only the
    * Column API. */
  def sqlFunctionDescriptors: Seq[(FunctionIdentifier, ExpressionInfo,
      FunctionRegistry.FunctionBuilder)] = Seq(
    cosineSimilarityDescriptor,
    (FunctionIdentifier("lang_guess"),
      new ExpressionInfo(classOf[LangGuess].getName, "lang_guess"),
      (ch: Seq[Expression]) => LangGuess(ch.head)),
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (ch: Seq[Expression]) => SimHash64(ch.head)),
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_sig"),
      (ch: Seq[Expression]) => MinHashSignature(ch.head,
        litInt(ch(1), "minhash_sig"), litInt(ch(2), "minhash_sig"))),
    (FunctionIdentifier("ngram_jaccard"),
      new ExpressionInfo(classOf[NgramJaccard].getName, "ngram_jaccard"),
      (ch: Seq[Expression]) => NgramJaccard(ch(0), ch(1),
        litInt(ch(2), "ngram_jaccard"))),
    (FunctionIdentifier("text_hash64"),
      new ExpressionInfo(classOf[TextHash64].getName, "text_hash64"),
      (ch: Seq[Expression]) => TextHash64(ch.head)),
    (FunctionIdentifier("doc_fingerprint"),
      new ExpressionInfo(classOf[RollingFingerprint].getName,
        "doc_fingerprint"),
      (ch: Seq[Expression]) => RollingFingerprint(ch.head,
        litInt(ch(1), "doc_fingerprint"))))
}
