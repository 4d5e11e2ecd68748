package graft

import org.apache.spark.sql.functions._

/** End-to-end integration: the driver's entry smoke, and a real
  * file-source streaming run over the events table proving the batch
  * window formulations are stream-identical (SURVEY.md §2i).
  */
class IntegrationSpec extends SparkTestBase {

  test("driver entry smoke: flagship query returns rows") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.toSeq ==
      Seq("l_returnflag", "l_linestatus", "sum_qty", "count_order"))
  }

  test("every registered query has either oracle SQL or a unit test home") {
    val qs = SparkEntry.queries.keySet
    val oracled = SparkEntry.oracleSql.keySet
    assert(oracled.subsetOf(qs), s"orphan oracle: ${oracled -- qs}")
    // non-oracled queries are the documented †-set
    val expected = Set("q_agg_approx_distinct", "q_udaf_custom",
      "q_dedup_near", "q_dedup_simhash", "q_dedup_embedding", "q_ann_lsh",
      "q_ann_ivf", "q_lang_id", "q_fingerprint", "q_multimodal_decode")
    assert((qs -- oracled) == expected, s"unexpected: ${(qs -- oracled) -- expected}")
  }

  test("file-source stream over events matches the batch tumbling agg") {
    // copy the events parquet into a stream-source dir
    val dir = java.nio.file.Files.createTempDirectory("graft-stream")
    val src = java.nio.file.Paths.get(s"$sf001/events.parquet")
    java.nio.file.Files.copy(src, dir.resolve("events.parquet"))

    val batchEvents = Tables.t(spark, sf001, "events")
    val schema = spark.read.parquet(dir.toString).schema
    val streamEvents = spark.readStream.schema(schema)
      .parquet(dir.toString)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val q = graft.streaming.StreamOps.tumbling(streamEvents)
      .writeStream.outputMode("complete").format("memory")
      .queryName("events_stream").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("events_stream")
    val batch = graft.streaming.StreamOps.tumbling(batchEvents)
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty,
      "stream and batch window results differ")
  }
}
