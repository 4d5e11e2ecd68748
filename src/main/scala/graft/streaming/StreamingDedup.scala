package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.GraftFunctions.minhash

/** Streaming near-duplicate detection: the incremental face of
  * [[graft.operators.Dedup.minHashLsh]] (north star §2k). Each incoming
  * document's MinHash signature is banded; band buckets are the state
  * keys, so a new document only ever compares against the (bounded)
  * recent members of its own buckets — never the corpus. State is bounded
  * on BOTH axes: per bucket, entries are capped at `bucketCap` signatures
  * (FIFO eviction); across buckets, idle bucket keys are evicted after
  * `idleTimeoutMs` of processing-time inactivity, so bucket-key
  * cardinality tracks the *active* working set rather than growing with
  * all distinct content ever seen. At 100 TB/day ingest the state is
  * `activeBuckets x bucketCap x k` longs, independent of stream length.
  */
object StreamingDedup {

  /** Default idle TTL for bucket state (30 min): unbounded streams must
    * not accumulate state forever out of the box. Override per call
    * (`idleTimeoutMs`) or per session
    * (`graft.streaming.dedup.idleTimeoutMs`); `0` disables eviction. */
  val DefaultIdleTimeoutMs: Long = 30L * 60 * 1000

  private def resolveIdleTimeout(
      spark: org.apache.spark.sql.SparkSession, requested: Long): Long =
    if (requested >= 0) requested
    else spark.conf.get("graft.streaming.dedup.idleTimeoutMs",
      DefaultIdleTimeoutMs.toString).toLong

  case class DocIn(doc_id: Long, text: String)
  case class Banded(bucket: Long, doc_id: Long, sig: Seq[Long])
  case class DupPair(id_a: Long, id_b: Long, est_jaccard: Double)
  case class BucketState(entries: List[(Long, Seq[Long])])

  /** Wire a streaming (or batch) doc source into banded signatures. */
  def banded(docs: DataFrame, numHashes: Int = 64, bands: Int = 16,
      shingle: Int = 3): Dataset[Banded] = {
    import docs.sparkSession.implicits._
    require(numHashes % bands == 0)
    val rows = numHashes / bands
    docs
      .select(col("doc_id"), minhash(col("text"), numHashes, shingle)
        .as("sig"))
      .select(col("doc_id"), col("sig"),
        posexplode(sequence(lit(0), lit(bands - 1))).as(Seq("pos", "band")))
      .select(
        hash(col("band"), slice(col("sig"), col("band") * rows + 1,
          lit(rows))).cast("long").as("bucket"),
        col("doc_id"),
        col("sig"))
      .as[Banded]
  }

  /** Stateful bucket matcher. Emits a pair the moment the second
    * near-duplicate document arrives — possibly micro-batches after the
    * first.
    *
    * Pair semantics are AT-LEAST-ONCE across buckets: a document pair
    * whose signatures agree in several LSH bands is emitted once per
    * matching bucket (always within the same micro-batch, since both
    * bands see the second document's arrival together). The batch path
    * applies a global `distinct()`; here cross-bucket coordination would
    * itself need a shuffle + state, so dedup is left to the consumer —
    * use [[nearDupPairsDistinct]] for exactly-once pairs.
    *
    * `idleTimeoutMs > 0` evicts a bucket's state after that much
    * processing-time inactivity — REQUIRED for unbounded production
    * streams, where NoTimeout state grows with every distinct bucket
    * ever touched (a slow OOM at corpus scale). A duplicate arriving
    * after its partner's bucket expired is (by design) missed, exactly
    * as a watermark bounds lateness.
    *
    * The DEFAULT (`idleTimeoutMs < 0`) is safe-by-default: a
    * [[DefaultIdleTimeoutMs 30-minute]] idle TTL, overridable per
    * session via `graft.streaming.dedup.idleTimeoutMs`. Pass `0` to
    * opt out (NoTimeout) — needed because ProcessingTimeTimeout makes
    * the engine re-run batches whenever the clock advances
    * (`shouldRunAnotherBatch` is always true), which
    * `processAllAvailable`-style synchronous drivers — and
    * zero-interval triggers — turn into a busy loop; pair the TTL
    * with a real trigger interval (or `Trigger.AvailableNow`, where
    * timeouts fire on each restart), and opt out only for bounded
    * inputs.
    */
  def nearDupPairs(in: Dataset[Banded], minJaccard: Double = 0.5,
      bucketCap: Int = 32,
      idleTimeoutMs: Long = -1L): Dataset[DupPair] = {
    import in.sparkSession.implicits._
    val ttlMs = resolveIdleTimeout(in.sparkSession, idleTimeoutMs)
    val timeoutConf =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    in.groupByKey(_.bucket)
      .flatMapGroupsWithState[BucketState, DupPair](
        OutputMode.Append, timeoutConf) {
        (_, rows: Iterator[Banded], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove() // idle bucket: drop its signatures
            Iterator.empty
          } else {
            var entries = state.getOption.map(_.entries).getOrElse(Nil)
            val out = scala.collection.mutable.ArrayBuffer[DupPair]()
            rows.foreach { b =>
              entries.foreach { case (oldId, oldSig) =>
                if (oldId != b.doc_id) {
                  val eq = oldSig.iterator.zip(b.sig.iterator)
                    .count { case (x, y) => x == y }
                  val est = eq.toDouble / math.max(oldSig.length, 1)
                  if (est >= minJaccard) {
                    out += DupPair(math.min(oldId, b.doc_id),
                      math.max(oldId, b.doc_id),
                      math.rint(est * 10000) / 10000)
                  }
                }
              }
              entries = ((b.doc_id, b.sig) :: entries).take(bucketCap)
            }
            state.update(BucketState(entries))
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            out.distinct.iterator
          }
      }
  }

  /** State entry for the [[NearDupProcessor]] list state (top-level so
    * the product encoder resolves). */
  case class SigEntry(doc_id: Long, sig: Array[Long])

  /** `transformWithState` near-dup matcher — the Spark-4-native stateful
    * API expression of [[nearDupPairs]]. State TTL is DECLARATIVE here
    * (`TTLConfig` on the list state, enforced by the RocksDB store on
    * read + maintenance) instead of timeout callbacks — expiry is exact
    * per entry, not driven by when a timer batch happens to run.
    * Requires the RocksDB state store provider, and like every
    * processing-time stateful operator the engine re-runs batches as
    * the clock advances (drive tests by polling the sink, not
    * `processAllAvailable`). */
  class NearDupProcessor(minJaccard: Double, bucketCap: Int, ttlMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Banded, DupPair] {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{ListState, OutputMode, TimeMode, TTLConfig}

    @transient private var entries: ListState[SigEntry] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val ttl =
        if (ttlMs > 0) TTLConfig(java.time.Duration.ofMillis(ttlMs))
        else TTLConfig.NONE
      entries = getHandle.getListState("entries",
        Encoders.product[SigEntry], ttl)
    }

    override def handleInputRows(key: Long, rows: Iterator[Banded],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[DupPair] = {
      var cur: List[SigEntry] =
        if (entries.exists()) entries.get().toList else Nil
      val out = scala.collection.mutable.ArrayBuffer[DupPair]()
      rows.foreach { b =>
        cur.foreach { e =>
          if (e.doc_id != b.doc_id) {
            val eq = e.sig.iterator.zip(b.sig.iterator)
              .count { case (x, y) => x == y }
            val est = eq.toDouble / math.max(e.sig.length, 1)
            if (est >= minJaccard) {
              out += DupPair(math.min(e.doc_id, b.doc_id),
                math.max(e.doc_id, b.doc_id),
                math.rint(est * 10000) / 10000)
            }
          }
        }
        cur = SigEntry(b.doc_id, b.sig.toArray) :: cur
      }
      entries.put(cur.take(bucketCap).toArray)
      out.distinct.iterator
    }
  }

  /** [[nearDupPairs]] through `transformWithState`: same pair semantics,
    * declarative per-bucket state TTL. `ttlMs <= 0` keeps state forever
    * (NOT recommended for unbounded streams). */
  def nearDupPairsTws(in: Dataset[Banded], minJaccard: Double = 0.5,
      bucketCap: Int = 32,
      ttlMs: Long = 3600L * 1000): Dataset[DupPair] = {
    import in.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    in.groupByKey(_.bucket)
      .transformWithState(
        new NearDupProcessor(minJaccard, bucketCap, ttlMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }

  /** [[nearDupPairs]] with exactly-once pair emission: a downstream
    * stateful `dropDuplicates` on (id_a, id_b) collapses the per-bucket
    * copies (they land in one micro-batch, but `dropDuplicates` state
    * also guards re-emission across batches). CAVEAT: the dedup state is
    * one small key per distinct pair ever emitted — far smaller than
    * corpus state (true-duplicate volume only) but still unbounded over
    * an infinite stream, since `dropDuplicates` without a watermark
    * never evicts. For long-running production streams prefer the raw
    * at-least-once [[nearDupPairs]] with a downstream idempotent sink,
    * or bound the pair state with a periodic query restart. */
  def nearDupPairsDistinct(in: Dataset[Banded], minJaccard: Double = 0.5,
      bucketCap: Int = 32,
      idleTimeoutMs: Long = -1L): Dataset[DupPair] = {
    import in.sparkSession.implicits._
    nearDupPairs(in, minJaccard, bucketCap, idleTimeoutMs)
      .dropDuplicates("id_a", "id_b").as[DupPair]
  }
}
