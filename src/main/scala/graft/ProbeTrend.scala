package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (round-19 optimization): phase timings for the
  * q_trending_exact lifecycle — corpus write, streaming tail
  * (per-micro-batch durations from the query's own progress events),
  * read-back — so the lifecycle tier's cost has a measured breakdown
  * instead of a guess. Usage: `runMain graft.ProbeTrend`.
  */
object ProbeTrend {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    (1 to 2).foreach { round =>
      val base = java.nio.file.Files
        .createTempDirectory("graft-trendprobe")
      try {
      val corpus = base.resolve("corpus").toString
      val out = base.resolve("out").toString
      val ckpt = base.resolve("ckpt").toString
      time(s"r$round corpus_write") {
        Tables.t(spark, dir, "documents")
          .select((to_timestamp(lit("2024-01-01 00:00:00")) +
            col("doc_id").cast("int") * expr("INTERVAL 1 MINUTE"))
            .as("ts"), col("text"))
          .write.format("graft-v2").option("path", corpus)
          .mode("append").save()
      }
      val q = time(s"r$round stream_start") {
        graft.streaming.StreamOps.tailTrendingExact(
          spark, corpus, out, ckpt, k = 5, counters = 16,
          every = "5 minutes", watermark = "1 minute")
      }
      time(s"r$round stream_drain") {
        q.processAllAvailable(); q.stop()
      }
      q.recentProgress.foreach { p =>
        println(s"BATCH ${p.batchId} rows=${p.numInputRows} " +
          s"durations=${p.durationMs}")
      }
      time(s"r$round read_back") {
        spark.read.format("graft-v2").load(out)
          .select(col("wstart"), col("term"), col("n"),
            col("rk").cast("long").as("rk"))
          .orderBy(col("wstart"), col("rk"))
          .write.format("noop").mode("overwrite").save()
      }
      } finally { // ADVICE r19: don't accumulate probe temp trees
        import java.nio.file.{Files, Path}
        import java.util.Comparator
        Files.walk(base).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
      }
    }
    spark.stop()
  }
}
