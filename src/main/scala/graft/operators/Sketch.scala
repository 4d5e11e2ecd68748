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

  /** Misra–Gries summary of a term stream: at most `m` counters whose
    * survivors provably include every term with frequency >
    * N/(m+1) (Misra & Gries 1982 — the SpaceSaving family's
    * guarantee). The buffer also carries the stream length so the
    * guarantee is checkable at finish time. Kryo-encoded opaque
    * buffer, mergeable in any order — the summary itself is
    * merge-order-dependent WITHIN its error bound, which is why
    * [[topTermsExact]] uses it only to prune candidates and then
    * counts those exactly. */
  private final class MisraGries(m: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        String, (Long, scala.collection.mutable.HashMap[String, Long]),
        (Long, Map[String, Long])] {
    type Buf = (Long, scala.collection.mutable.HashMap[String, Long])
    override def zero: Buf =
      (0L, scala.collection.mutable.HashMap.empty[String, Long])
    override def reduce(b: Buf, term: String): Buf = {
      val (n, cnt) = b
      if (cnt.contains(term)) cnt(term) += 1
      else if (cnt.size < m) cnt(term) = 1L
      else {
        // decrement-all: the classic m-counter eviction step
        val dead = scala.collection.mutable.ArrayBuffer.empty[String]
        cnt.keysIterator.foreach { t =>
          val v = cnt(t) - 1
          if (v == 0L) dead += t else cnt(t) = v
        }
        dead.foreach(cnt.remove)
      }
      (n + 1, cnt)
    }
    override def merge(a: Buf, b: Buf): Buf = {
      val (na, ca) = a
      val (nb, cb) = b
      cb.foreach { case (t, v) => ca(t) = ca.getOrElse(t, 0L) + v }
      if (ca.size > m) {
        // subtract the (m+1)-th largest count from everyone — the
        // standard MG merge reduction (Agarwal et al. 2012)
        val cut = ca.values.toArray.sorted(Ordering[Long].reverse)(m)
        val dead = scala.collection.mutable.ArrayBuffer.empty[String]
        ca.keysIterator.foreach { t =>
          val v = ca(t) - cut
          if (v <= 0L) dead += t else ca(t) = v
        }
        dead.foreach(ca.remove)
      }
      (na + nb, ca)
    }
    override def finish(b: Buf): (Long, Map[String, Long]) =
      (b._1, b._2.toMap)
    override def bufferEncoder =
      org.apache.spark.sql.Encoders.kryo[Buf]
    override def outputEncoder =
      org.apache.spark.sql.Encoders.kryo[(Long, Map[String, Long])]
  }

  /** EXACT top-`k` terms in two passes: a Misra–Gries summary prunes
    * the vocabulary to ≤ `counters` candidates, then ONLY those terms
    * are counted exactly (broadcast-join filter → candidate-sized
    * rollup instead of a vocabulary-sized one). When the k-th
    * candidate's exact count clears the summary's N/(counters+1)
    * admission bound, no pruned term can outrank it — the result is
    * PROVABLY the exact top-k and hash-matches a plain
    * count/order/limit oracle; otherwise the operator falls back to
    * the full exact aggregation (correctness never depends on the
    * sketch). Returns `(term, n)` best-first, ties on term. */
  def topTermsExact(docs: DataFrame, k: Int = 25, counters: Int = 4096,
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val terms = docs.select(
      explode(CorpusOps.tokens(col(textCol))).as("term"))
    val (total, cand) = terms.as[String]
      .select(new MisraGries(counters).toColumn).head()
    val exactTopK = (src: DataFrame) => src
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term"))
      .limit(k)
    if (cand.isEmpty) return exactTopK(terms)
    val candidates = exactTopK(
      terms.join(broadcast(cand.keys.toSeq.toDF("term")), Seq("term")))
    val got = candidates.collect()
    val guaranteed = got.length >= k &&
      got.last.getLong(1) > total / (counters + 1L)
    if (guaranteed) candidates else exactTopK(terms)
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

  /** HLL sketch rollup (Apache DataSketches HLL via Spark's
    * `hll_sketch_agg` family): one mergeable sketch per day of the
    * `idCol` stream, plus the cumulative distinct-to-date from
    * UNIONING the daily sketches — the "sketch rollup table" pattern:
    * persist the day-sized sketch column once and ANY date range's
    * distinct count is a merge over its sketches, never a rescan of
    * the raw 100 TB. Daily sketches build in one map-side-combined
    * aggregate; the cumulative union joins the days-sized sketch
    * table to itself (days², trivially small) so everything stays in
    * the plan — no driver fold.
    *
    * The exact daily/cumulative distincts ride along and the output
    * carries `daily_ok` / `cum_ok` (estimate within `tolPct`), the
    * same accuracy-gate shape as `q_ann_recall` — an engine cannot
    * fake them without a correct sketch implementation; at gated
    * cardinalities DataSketches HLL is still in sparse mode, i.e.
    * exact.
    *
    * @return `(day, n_exact, daily_ok, n_cum_exact, cum_ok)` per day
    */
  def distinctRollup(events: DataFrame, tsCol: String, idCol: String,
      lgK: Int = 12, tolPct: Double = 5.0): DataFrame = {
    val daily = events
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(hll_sketch_agg(col(idCol), lgK).as("sk"),
        count_distinct(col(idCol)).as("n_exact"))
    val cumSk = daily.select(col("day").as("d1"), col("sk"))
      .join(daily.select(col("day").as("d2")), col("d1") <= col("d2"))
      .groupBy(col("d2").as("day"))
      .agg(hll_union_agg(col("sk")).as("csk"))
    // exact cumulative: users whose FIRST day is <= d
    val firstDay = events
      .groupBy(col(idCol).as("id"))
      .agg(to_date(min(col(tsCol))).as("fd"))
    val cumExact = daily.select(col("day"))
      .join(firstDay, col("fd") <= col("day"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_cum_exact"))
    def ok(est: org.apache.spark.sql.Column,
        exact: org.apache.spark.sql.Column) =
      abs(est.cast("double") - exact.cast("double")) <=
        exact.cast("double") * (tolPct / 100.0)
    daily
      .join(cumSk, Seq("day"))
      .join(cumExact, Seq("day"))
      .select(col("day"), col("n_exact"),
        ok(hll_sketch_estimate(col("sk")), col("n_exact"))
          .as("daily_ok"),
        col("n_cum_exact"),
        ok(hll_sketch_estimate(col("csk")), col("n_cum_exact"))
          .as("cum_ok"))
      .orderBy(col("day"))
  }
}
