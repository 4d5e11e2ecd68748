package graft

import org.apache.spark.sql.functions._

/** The barrier/release lifecycle (round-20 gate item): every
  * `Materialize.barrier` site pins storage only until the harness's
  * per-query `Materialize.release` — nothing survives the release, and
  * the barrier is a streaming no-op. */
class MaterializeSpec extends SparkTestBase {
  import spark.implicits._

  test("barrier registers pinned storage and release reclaims it") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val df = (1 to 100).toDF("x")
      .groupBy(($"x" % 7).as("k")).agg(sum($"x").as("s"))
      .transform(Materialize.barrier)
    // lazy checkpoint registers its RDD at call time
    val created = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(created.nonEmpty, "barrier registered no persistent RDD")
    // two consumers both see the data (and the checkpoint computes)
    assert(df.count() === 7)
    assert(df.agg(sum($"s")).as[Long].head() === 5050L)
    assert(Materialize.release(spark) >= created.size)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"release left rdd ids $leaked pinned")
  }

  test("an operator's barriers are fully reclaimed by release " +
      "(exactQuantiles: the 4-consumer materialization)") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val d = Tables.t(spark, sf001, "events")
    val out = operators.Quantiles.exactQuantiles(d, col("value"),
      Seq(col("event_id")), Seq(0.5, 0.95))
    out.write.format("noop").mode("overwrite").save()
    Materialize.release(spark)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"quantiles leaked rdd ids $leaked")
  }

  test("connected-components generations release inside the query; " +
      "release reclaims the rest") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L), (6L, 6L))
      .toDF("id_a", "id_b")
    val cl = operators.Dedup.clusters(pairs)
    assert(cl.count() === 6)
    Materialize.release(spark)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"clusters leaked rdd ids $leaked")
  }

  test("barrier is a no-op on streaming frames") {
    val s = spark.readStream.format("rate")
      .option("rowsPerSecond", "1").load()
    val out = Materialize.barrier(s)
    assert(out.isStreaming)
    assert(out eq s, "streaming frame must pass through unchanged")
  }
}
