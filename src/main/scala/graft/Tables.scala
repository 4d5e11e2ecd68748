package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access helpers for the driver-generated testdata star schema
  * (see /root/repo/TESTDATA.md). All queries in [[SparkEntry]] load
  * inputs through here so the scale-factor directory is a parameter.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** Plain vectorized parquet read (Catalyst handles pushdown/pruning).
    *
    * `events.ts` is parquet TIMESTAMP(NANOS), which Spark has no native
    * type for — it is read via the nanos-as-long conf and floor-converted
    * to a microsecond timestamp (`timestamp_micros(ns div 1000)`), the
    * same truncation DuckDB's `CAST(ts AS TIMESTAMP)` applies, so oracle
    * comparisons line up.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(path(dir, name))
        .withColumn("ts", org.apache.spark.sql.functions
          .expr("timestamp_micros(ts div 1000)"))
    } else {
      spark.read.parquet(path(dir, name))
    }

  /** Read through the graft V1 relation (PrunedFilteredScan + limit
    * pushdown via [[graft.plans.PropagateLimitToGraft]]).
    */
  def graftScan(spark: SparkSession, dir: String, name: String,
      numPartitions: Int = 1,
      partitionColumn: Option[String] = None): DataFrame = {
    graft.plans.PropagateLimitToGraft.install(spark)
    val reader = spark.read
      .format("graft")
      .option("path", path(dir, name))
      .option("numPartitions", numPartitions.toString)
    partitionColumn.foreach(pc => reader.option("partitionColumn", pc))
    reader.load()
  }
}
