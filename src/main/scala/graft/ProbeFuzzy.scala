package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r20): piecewise cost of the FastSS fuzzy self-join —
  * variant generation, candidate join, verify filter, pair-distinct —
  * so the 4-5 s of q_fuzzy_join has a measured breakdown. */
object ProbeFuzzy {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIMED $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    (1 to 2).foreach { round =>
      val df = Tables.t(spark, dir, "customer")
      val vocab = df.select(col("c_name").as("t")).na.drop()
        .filter(length(col("t")) > 0).distinct()
      time(s"r$round vocab_count")(println("vocab=" + vocab.count()))
      val variantsRaw = vocab.select(col("t"),
        explode(operators.FuzzyJoin.deletionVariants(col("t"), 1))
          .as("v"))
      time(s"r$round variants_count")(
        println("variants=" + variantsRaw.count()))
      val variants = time(s"r$round variants_ckpt")(
        variantsRaw.localCheckpoint(eager = true))
      val cand = variants.alias("a")
        .join(variants.alias("b"), col("a.v") === col("b.v"))
        .filter(col("a.t") < col("b.t"))
        .select(col("a.t").as("a"), col("b.t").as("b"))
      time(s"r$round cand_count")(println("cand=" + cand.count()))
      val verified = cand.withColumn("dist",
          levenshtein(col("a"), col("b"), 1).cast("long"))
        .filter(col("dist") >= 0 && col("dist") <= 1)
      time(s"r$round verified_count")(
        println("verified=" + verified.count()))
      time(s"r$round distinct_count")(
        println("pairs=" + verified.distinct().count()))
      time(s"r$round full_noop")(
        operators.FuzzyJoin.selfJoin(df, "c_name", 1)
          .write.format("noop").mode("overwrite").save())
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      Materialize.release(spark)
    }
    spark.stop()
  }
}
