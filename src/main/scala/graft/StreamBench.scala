package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingDedup

/** Measures the state cost of exactly-once streaming near-dup pairs
  * (`nearDupPairsDistinct` = at-least-once pairs + stateful
  * `dropDuplicates`) against the raw at-least-once variant, on a
  * duplicate-heavy corpus (every document has an exact twin, arriving
  * in a later micro-batch than the original). Prints one JSON line per
  * variant: wall seconds, emitted pairs, and the state-store footprint
  * (rows + bytes, summed over stateful operators) from the query's
  * final progress — the number that grows with every emitted pair in
  * the distinct variant and is the price of exactly-once.
  *
  * NEXT.md backlog item (round 2 #8); results recorded in BASELINE.md.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val n = docs.length
    // originals first, then a twin of every doc (ids offset) — each
    // twin lands in a later batch than its original, so every pair
    // crosses the stateful bucket store
    val chunks = (docs.map { case (id, t) => StreamingDedup.DocIn(id, t) } ++
      docs.map { case (id, t) => StreamingDedup.DocIn(id + 1000000L, t) })
      .grouped(math.max(1, n / 2)).toSeq

    def run(name: String,
        mk: org.apache.spark.sql.Dataset[StreamingDedup.Banded] =>
          org.apache.spark.sql.Dataset[StreamingDedup.DupPair]): Unit = {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[StreamingDedup.DocIn]
      val emitted = new java.util.concurrent.atomic.AtomicLong(0)
      val q = mk(StreamingDedup.banded(input.toDF()))
        .writeStream.outputMode("append")
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[StreamingDedup.DupPair],
              _: Long) => emitted.addAndGet(batch.count()); ()
        }.start()
      val t0 = System.nanoTime()
      try {
        chunks.foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
      } finally {
        val sec = (System.nanoTime() - t0) / 1e9
        val state = Option(q.lastProgress).toSeq
          .flatMap(_.stateOperators.toSeq)
        val stateRows = state.map(_.numRowsTotal).sum
        val stateBytes = state.map(_.memoryUsedBytes).sum
        q.stop()
        println(f"""{"variant":"$name%s","docs":${n * 2}%d,""" +
          f""""pairs":${emitted.get()}%d,"sec":$sec%.2f,""" +
          f""""stateRows":$stateRows%d,"stateBytes":$stateBytes%d}""")
      }
    }

    // idleTimeoutMs = 0: synchronous drive (processAllAvailable) never
    // quiesces under ProcessingTimeTimeout — see nearDupPairs scaladoc
    run("at_least_once",
      in => StreamingDedup.nearDupPairs(in, minJaccard = 0.5,
        idleTimeoutMs = 0))
    run("exactly_once",
      in => StreamingDedup.nearDupPairsDistinct(in, minJaccard = 0.5,
        idleTimeoutMs = 0))
    spark.stop()
  }
}
