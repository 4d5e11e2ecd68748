package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materialization barriers with a RELEASE lifecycle.
  *
  * Round 19 planted ~57 `localCheckpoint(eager = false)` barriers across
  * the operator library (Catalyst re-executes a derived frame's lineage
  * once per consumer, and AQE's small-side broadcasts defeat exchange
  * reuse — q_mad planned 30 parquet scans without them). They were a
  * measured win, but `localCheckpoint` persists its RDD for the JVM's
  * lifetime: nothing in the library ever unpersisted, so every operator
  * invocation pinned storage until the session died. The bench swept up
  * after each query, `Verify` and library users did not, and the shared
  * test session demonstrably accumulated leaks (`graft.UnigramSpec`'s
  * global no-leak assertion went order-dependent and failed the round-19
  * driver run).
  *
  * This object is the generalization of the `Bpe.trackedCheckpoint` /
  * `unpersistIds` pattern (Bpe.scala): every barrier records the RDD ids
  * its checkpoint registered (the Dataset API exposes no handle to the
  * checkpointed RDD, so the registry is a before/after diff of
  * `sc.getPersistentRDDs` — `RDD.localCheckpoint` marks its storage
  * level, and therefore registers, at CALL time even for lazy
  * checkpoints), and [[release]] unpersists everything recorded. Harness
  * contract: `Bench` and `Verify` call [[release]] after each query's
  * action; library users embedding operators in a long-lived session
  * should do the same once the query's results are materialized.
  *
  * [[barrier]] is also the one place the streaming guard lives: a
  * streaming DataFrame cannot be checkpointed this way, so it passes
  * through unchanged (previously only `Dedup.cappedBucketJoin` guarded —
  * every other site would have thrown `AnalysisException` if driven from
  * a stream).
  *
  * Release is NOT safe while a query whose plan references the
  * checkpointed blocks is still executing (a localCheckpoint truncates
  * lineage — lost blocks cannot be recomputed); call it between queries,
  * as the harnesses do. The engine's own use is single-query-at-a-time,
  * and the test suite runs suites sequentially in one forked JVM.
  */
object Materialize {

  /** RDD ids registered by barriers and not yet released. Ids are
    * meaningful per SparkContext; [[release]] resolves them against the
    * caller's live registry, so stale ids from a stopped context are
    * skipped harmlessly. */
  private val tracked = new ConcurrentLinkedQueue[Integer]()

  /** Lazy materialization barrier: cut the plan here so every
    * downstream consumer re-reads the checkpointed blocks instead of
    * re-executing the lineage. No-op on streaming frames. */
  def barrier(df: DataFrame): DataFrame =
    if (df.isStreaming) df else tracking(df, _.localCheckpoint(eager = false))

  /** Eager variant for iterative fixpoints (connected components, BPE
    * merge generations): materializes now, so the caller may discard —
    * or [[release]] — the previous generation immediately. */
  def barrierEager(df: DataFrame): DataFrame =
    if (df.isStreaming) df else tracking(df, _.localCheckpoint(eager = true))

  private def tracking(df: DataFrame,
      ckpt: DataFrame => DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = ckpt(df)
    (sc.getPersistentRDDs.keySet -- before).foreach(id => tracked.add(id))
    out
  }

  /** Unpersist every barrier-registered RDD still live in `spark`'s
    * context and clear the registry. Returns how many were released.
    * Non-blocking: the blocks are dead weight, not correctness state. */
  def release(spark: SparkSession): Int = {
    val live = spark.sparkContext.getPersistentRDDs
    var n = 0
    var id = tracked.poll()
    while (id != null) {
      live.get(id.intValue()).foreach { rdd =>
        rdd.unpersist(blocking = false); n += 1
      }
      id = tracked.poll()
    }
    n
  }
}
