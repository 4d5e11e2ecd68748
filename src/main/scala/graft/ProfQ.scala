package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    spark.read.parquet(s"$dir/nation.parquet").count()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"TIMED $label ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    val part = spark.read.parquet(s"$dir/part.parquet")
    if (!sys.env.contains("SPARK_GRAFT_PROFQ_NOWARM")) {
    time("part_scan_noop") { part.write.format("noop").mode("overwrite").save() }
    time("part_fns_noorder") {
      part.select(col("p_partkey"), upper(col("p_brand")).as("u"),
        length(col("p_name")).as("l"), substring(col("p_type"),1,6).as("s"),
        concat(col("p_brand"), lit("-"), col("p_type")).as("c"),
        col("p_name").like("%a%").as("h"))
        .write.format("noop").mode("overwrite").save() }
    time("part_fns_order") {
      SparkEntry.queries("q_string_fns")(spark, dir)
        .write.format("noop").mode("overwrite").save() }
    time("part_fns_order2") {
      SparkEntry.queries("q_string_fns")(spark, dir)
        .write.format("noop").mode("overwrite").save() }
    }
    for (name <- args) {
      val df = SparkEntry.queries(name)(spark, dir)
      // SPARK_GRAFT_PROFQ_EXPLAIN=1 dumps the formatted plan before
      // timing (the .explain the scale audits read)
      if (sys.env.get("SPARK_GRAFT_PROFQ_EXPLAIN").exists(_ == "1")) {
        println(s"== PLAN $name ==")
        df.explain("formatted")
      }
      time(s"$name cold") { df.write.format("noop").mode("overwrite").save() }
      time(s"$name warm") { df.write.format("noop").mode("overwrite").save() }
      time(s"$name ctor+write") {
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save() }
      time(s"$name ctor+write2") {
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save() }
      // bench-equivalent hygiene so a multi-query invocation doesn't
      // carry one query's barrier storage into the next timing
      spark.catalog.clearCache()
      Materialize.release(spark)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
