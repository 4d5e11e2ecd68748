package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Group-wise top-k with O(k) aggregation state per group.
  *
  * The naive formulations both fail at 100 TB: a window
  * `row_number() <= k` sorts EVERY group's full row set (the hot-key
  * straggler problem ranking rewrites exist to avoid), and
  * `slice(array_sort(collect_list(...)), 1, k)` buffers whole groups
  * in the aggregation state (OOM on a hot key). This operator is the
  * textbook scale shape instead: a mergeable bounded buffer — the
  * partial aggregation keeps at most k entries per group per task, so
  * map-side combine ships O(tasks · k) rows per group through the
  * shuffle no matter how hot the key, and top-k of a union is exactly
  * the top-k of per-partial top-k's.
  *
  * Determinism contract: entries order by (ord, id) — ord descending
  * (or ascending when `asc`), ties by ascending id — so the result is
  * a pure function of the data, never of partitioning. NaN sorts
  * greatest, matching Spark's SQL ordering of doubles.
  */
object TopK {

  /** Bounded top-k accumulator: buffer = the k best (ord, id) pairs,
    * kept sorted best-first. Insertion is O(k) (k is small by
    * contract); merge folds one buffer into the other. */
  final case class TopKAgg(k: Int, asc: Boolean = false)
      extends Aggregator[(java.lang.Double, java.lang.Long),
        Seq[(Double, Long)], Seq[(Double, Long)]] {
    require(k >= 1, s"topK: k must be >= 1, got $k")

    // java.lang.Double.compare sorts NaN greatest — identical to
    // Spark's SQL double ordering, so the oracle's window ORDER BY
    // agrees on any input
    private def beats(a: (Double, Long), b: (Double, Long)): Boolean = {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) { if (asc) c < 0 else c > 0 } else a._2 < b._2
    }

    private def insert(buf: Seq[(Double, Long)],
        v: (Double, Long)): Seq[(Double, Long)] =
      if (buf.size >= k && !beats(v, buf.last)) buf
      else {
        val i = buf.indexWhere(e => beats(v, e))
        val pos = if (i < 0) buf.size else i
        val w = (buf.take(pos) :+ v) ++ buf.drop(pos)
        if (w.size > k) w.take(k) else w
      }

    override def zero: Seq[(Double, Long)] = Vector.empty
    override def reduce(buf: Seq[(Double, Long)],
        v: (java.lang.Double, java.lang.Long)): Seq[(Double, Long)] =
      // SQL aggregate semantics: rows with a NULL ordering value (or a
      // NULL id) contribute nothing
      if (v == null || v._1 == null || v._2 == null) buf
      else insert(buf, (v._1.doubleValue(), v._2.longValue()))
    override def merge(a: Seq[(Double, Long)],
        b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      b.foldLeft(a)(insert)
    override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r
    override def bufferEncoder =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Seq[(Double, Long)]]()
    override def outputEncoder =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** Top-k rows per key: `(keys…, rn, id, ord)` with `rn` 1-based in
    * (ord desc|asc, id asc) order — the exact rows
    * `row_number() OVER (PARTITION BY keys ORDER BY ord, id) <= k`
    * selects, computed with one bounded-state hash aggregation
    * instead of a per-group sort.
    *
    * @param ordCol ordering value (numeric; cast to double)
    * @param idCol  row identity and tie-break (long)
    */
  def topKPerKey(df: DataFrame, keys: Seq[String], ordCol: Column,
      idCol: Column, k: Int, asc: Boolean = false): DataFrame = {
    val agg = udaf(TopKAgg(k, asc))
    df.groupBy(keys.map(col): _*)
      .agg(agg(ordCol.cast("double"), idCol.cast("long")).as("__top"))
      .select((keys.map(col) :+
        posexplode(col("__top")).as(Seq("__pos", "__e"))): _*)
      .select((keys.map(col) :+
        (col("__pos") + 1).cast("int").as("rn") :+
        col("__e._2").as("id") :+
        col("__e._1").as("ord")): _*)
  }
}
