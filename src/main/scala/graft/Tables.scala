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
    * `events.ts` has shipped as two physical encodings across testdata
    * generations — TIMESTAMP(NANOS) (no native Spark type: read via the
    * nanos-as-long conf, floor-converted by [[normalizeEventsTs]]) and
    * TIMESTAMP(MICROS, NTZ) — so the normalization dispatches on the
    * type the scan actually resolved. Both land on session-zone
    * `TIMESTAMP`, the same value DuckDB's `CAST(ts AS TIMESTAMP)`
    * yields under a UTC session, so oracle comparisons line up.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeEventsTs(spark.read.parquet(path(dir, name)))
    } else {
      spark.read.parquet(path(dir, name))
    }

  /** Normalize whatever physical type `ts` resolved to into a plain
    * microsecond `TIMESTAMP`: nanos-as-LONG floor-divides (the DuckDB
    * truncation), TIMESTAMP_NTZ casts (identity on the stored micros
    * under a UTC session zone), native TIMESTAMP passes through. */
  def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
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
