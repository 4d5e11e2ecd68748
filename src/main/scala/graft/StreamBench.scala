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

    // Monitoring-face state probe: drive ewmaFeed (the representative
    // watermark-finalize face) over a hot-entity stream at two sizes.
    // The claim under test is STRUCTURAL: state rows track ENTITIES
    // (one O(1) tuple each — a bot holding 50% of the stream costs
    // one row like everyone else), never history length, so the row
    // count must be flat as events quadruple.
    def monitorProbe(nEvents: Int, entities: Int): Unit = {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[MonRow]
      val q = graft.streaming.StreamOps.ewmaFeed(input.toDF(),
          "user_id", "ts", "event_id", "value")
        .writeStream.outputMode("append").format("noop").start()
      val rows = (0 until nEvents).map { i =>
        val u = if (i % 2 == 0) 0L else 1L + (i % entities)
        MonRow(u, new java.sql.Timestamp(1700000000000L + i * 100L),
          i.toLong, (i % 997) / 10.0)
      }
      val t0 = System.nanoTime()
      try {
        rows.grouped(math.max(1, nEvents / 4)).foreach { c =>
          input.addData(c); q.processAllAvailable()
        }
        // flush: the watermark passes every event, pending drains
        input.addData(MonRow(-1L, new java.sql.Timestamp(
          1700000000000L + nEvents * 100L + 3600L * 1000L), -1L, 0.0))
        q.processAllAvailable()
        val sec = (System.nanoTime() - t0) / 1e9
        val st = Option(q.lastProgress).toSeq
          .flatMap(_.stateOperators.toSeq)
        println(f"""{"variant":"ewma_feed_state","events":$nEvents%d,""" +
          f""""entities":$entities%d,""" +
          f""""stateRows":${st.map(_.numRowsTotal).sum}%d,""" +
          f""""stateBytes":${st.map(_.memoryUsedBytes).sum}%d,""" +
          f""""sec":$sec%.2f}""")
      } finally q.stop()
    }
    monitorProbe(50000, 1000)
    monitorProbe(200000, 1000)

    // Session-face state probe: state per entity is the COMPRESSED
    // (start, last, n) run list — one run per OPEN session, not one
    // row per event. The stream keeps every entity inside ONE open
    // session (all events within the gap), so state rows must stay
    // flat at 1×/4× events even though no session ever closes.
    def sessionProbe(nEvents: Int, entities: Int): Unit = {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[MonRow]
      val q = graft.streaming.StreamOps.sessionFeed(input.toDF(),
          "user_id", "ts", gapMicros = 3600L * 1000000L)
        .writeStream.outputMode("append").format("noop").start()
      val rows = (0 until nEvents).map { i =>
        val u = if (i % 2 == 0) 0L else 1L + (i % entities)
        MonRow(u, new java.sql.Timestamp(1700000000000L + i * 2L),
          i.toLong, 0.0)
      }
      val t0 = System.nanoTime()
      try {
        rows.grouped(math.max(1, nEvents / 4)).foreach { c =>
          input.addData(c); q.processAllAvailable()
        }
        val sec = (System.nanoTime() - t0) / 1e9
        val st = Option(q.lastProgress).toSeq
          .flatMap(_.stateOperators.toSeq)
        println(f"""{"variant":"session_feed_state",""" +
          f""""events":$nEvents%d,"entities":$entities%d,""" +
          f""""stateRows":${st.map(_.numRowsTotal).sum}%d,""" +
          f""""stateBytes":${st.map(_.memoryUsedBytes).sum}%d,""" +
          f""""sec":$sec%.2f}""")
      } finally q.stop()
    }
    sessionProbe(50000, 1000)
    sessionProbe(200000, 1000)

    // Funnel-face state probe: the buffer prunes to at most one
    // PENDING timestamp per reached step (greedy fold) plus the
    // above-watermark tail; a stream that repeats step-1 events
    // forever (never advancing the funnel) must not grow state with
    // history — the claim that makes the face safe under bot traffic.
    def funnelProbe(nEvents: Int, entities: Int): Unit = {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[MonRow]
      val typed = input.toDF()
        .withColumn("step", org.apache.spark.sql.functions
          .concat(org.apache.spark.sql.functions.lit("s"),
            org.apache.spark.sql.functions.pmod(
              org.apache.spark.sql.functions.col("event_id"),
              org.apache.spark.sql.functions.lit(2L))))
      val q = graft.streaming.StreamOps.funnelFeed(typed,
          "user_id", "ts", "step", Seq("s0", "s1", "s9"),
          windowMicros = 365L * 24 * 3600 * 1000000L)
        .writeStream.outputMode("append").format("noop").start()
      val rows = (0 until nEvents).map { i =>
        val u = if (i % 2 == 0) 0L else 1L + (i % entities)
        // event_id parity drives the step label: half s0, half s1 —
        // funnels stall at step 2 of 3, nothing ever completes;
        // 100 ms spacing lets the watermark pass almost all events,
        // so the probe measures the PRUNED steady state (ripened
        // events fold into the one-timestamp-per-step buf and leave
        // the buffer), not the above-watermark pending backlog
        MonRow(u, new java.sql.Timestamp(1700000000000L + i * 100L),
          i.toLong, 0.0)
      }
      val t0 = System.nanoTime()
      try {
        // CONSTANT batch size: the state to measure is the per-entity
        // fold array; the above-watermark tail is per-BATCH transit,
        // so it must not scale with nEvents or it masks the claim
        rows.grouped(12500).foreach { c =>
          input.addData(c); q.processAllAvailable()
        }
        val sec = (System.nanoTime() - t0) / 1e9
        val st = Option(q.lastProgress).toSeq
          .flatMap(_.stateOperators.toSeq)
        println(f"""{"variant":"funnel_feed_state",""" +
          f""""events":$nEvents%d,"entities":$entities%d,""" +
          f""""stateRows":${st.map(_.numRowsTotal).sum}%d,""" +
          f""""stateBytes":${st.map(_.memoryUsedBytes).sum}%d,""" +
          f""""sec":$sec%.2f}""")
      } finally q.stop()
    }
    funnelProbe(50000, 1000)
    funnelProbe(200000, 1000)
    spark.stop()
  }

  /** Input row shape for the monitoring-face state probe. */
  case class MonRow(user_id: Long, ts: java.sql.Timestamp,
    event_id: Long, value: Double)
}
