package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.GraftFunctions.minhash

/** Streaming near-duplicate detection: the incremental face of
  * [[graft.operators.Dedup.minHashLsh]] (north star §2k). Each incoming
  * document's MinHash signature is banded; band buckets are the state
  * keys, so a new document only ever compares against the (bounded)
  * recent members of its own buckets — never the corpus. State per
  * bucket is capped at `bucketCap` signatures (FIFO eviction), which
  * bounds memory exactly like a watermark would bound time: at 100 TB/day
  * ingest the state is `buckets x bucketCap x k` longs, independent of
  * stream length.
  */
object StreamingDedup {

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
    * first. */
  def nearDupPairs(in: Dataset[Banded], minJaccard: Double = 0.5,
      bucketCap: Int = 32): Dataset[DupPair] = {
    import in.sparkSession.implicits._
    in.groupByKey(_.bucket)
      .flatMapGroupsWithState[BucketState, DupPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, rows: Iterator[Banded], state: GroupState[BucketState]) =>
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
          out.distinct.iterator
      }
  }
}
