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

  /** Plain vectorized parquet read (Catalyst handles pushdown/pruning). */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(path(dir, name))

  /** Read through the graft V1 relation (PrunedFilteredScan + limit
    * pushdown via [[graft.plans.PropagateLimitToGraft]]).
    */
  def graftScan(spark: SparkSession, dir: String, name: String,
      numPartitions: Int = 1): DataFrame = {
    graft.plans.PropagateLimitToGraft.install(spark)
    spark.read
      .format("graft")
      .option("path", path(dir, name))
      .option("numPartitions", numPartitions.toString)
      .load()
  }
}
