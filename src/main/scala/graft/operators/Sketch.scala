package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches over token streams — the Count-Min
  * sketch (Cormode & Muthukrishnan 2005, "An improved data stream
  * summary: the count-min sketch and its applications" — public
  * algorithm) with the one-sided error guarantee
  * `count(t) <= est(t) <= count(t) + eps*N` (w.h.p.), specialized to
  * the heavy-hitters question a corpus pipeline actually asks: which
  * terms dominate the token stream.
  *
  * 100 TB shape: the sketch is the AGGREGATE STATE, not the data —
  * each task's partial aggregation collapses its token stream to at
  * most `d*w` (row, bucket) count cells map-side, so the only
  * corpus-wide shuffle carries `tasks * d*w` tiny rows and the merged
  * sketch (`d*w` longs, a few KB) collects to the driver like a
  * centroid set. Candidate scoring then probes the sketch as an
  * inlined literal lookup table — pure map-side codegen over the
  * DISTINCT terms (vocabulary-sized, not corpus-sized), finished by
  * one TakeOrdered top-k. Nothing anywhere is proportional to corpus
  * bytes except the initial tokenizing scan.
  *
  * Hashes are the engine's FNV-1a + splitmix family
  * ([[graft.functions.CmsBuckets]]), and `w` is a power of two so
  * JVM-signed and HUGEINT-unsigned bucket arithmetic coincide — the
  * whole sketch (collisions included) re-derives bit-for-bit in a
  * DuckDB oracle.
  */
object Sketch {

  /** The merged Count-Min sketch of the corpus token stream: a dense
    * `d*w` count array (row-major), built by one map-side-combined
    * rollup. Exposed for reuse/tests; bounded driver state. */
  def cmsCounts(docs: DataFrame, d: Int, w: Int,
      textCol: String = "text"): Array[Long] = {
    val occ = docs.select(
      explode(CorpusOps.tokens(col(textCol))).as("term"))
    val cells = occ
      .select(posexplode(graft.functions.GraftFunctions
        .cms_buckets(col("term"), d, w)).as(Seq("i", "b")))
      .groupBy(col("i"), col("b")).agg(count(lit(1)).as("cnt"))
      .collect()
    val sketch = Array.fill(d * w)(0L)
    cells.foreach(r => sketch(r.getInt(0) * w + r.getInt(1)) =
      r.getLong(2))
    sketch
  }

  /** Top-`k` terms by Count-Min estimate: `est(term) = min over rows i
    * of sketch[i][bucket_i(term)]`, ordered (estimate DESC, term ASC —
    * deterministic through ties, including at the k boundary).
    * Returns `(term, cms_count)`. With `w` well below the vocabulary
    * size the estimates genuinely overestimate collided terms — the
    * sketch's documented trade; heavy hitters stay heavy because the
    * error is one-sided and bounded by `N/w` per row. */
  def cmsTopTerms(docs: DataFrame, d: Int = 4, w: Int = 512,
      k: Int = 25, textCol: String = "text"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val sketch = cmsCounts(docs, d, w, textCol)
    val lut = typedLit(sketch.toSeq)
    val bs = graft.functions.GraftFunctions
      .cms_buckets(col("term"), d, w)
    val est = (0 until d).map(i =>
        element_at(lut, element_at(bs, i + 1) + lit(i * w) + 1))
      .reduce(least(_, _))
    docs.select(explode(CorpusOps.tokens(col(textCol))).as("term"))
      .distinct()
      .select(col("term"), est.as("cms_count"))
      .orderBy(col("cms_count").desc, col("term").asc)
      .limit(k)
  }
}
