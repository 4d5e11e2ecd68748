package graft

import org.apache.spark.sql.SparkSession

/** Dev utility (round-19 optimization evidence): dumps
  * `.explain("formatted")` of the NAMED queries to
  * `plans/r19/<name>_<suffix>.txt` — the before/after plan trail the
  * optimization rounds commit next to OPTIMIZATION_r19.md.
  *
  * Usage: `runMain graft.DumpSome <suffix> <q_name> [q_name ...]`
  * (data dir from `$SPARK_GRAFT_SF_DIR`, default sf0.01).
  */
object DumpSome {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: DumpSome <suffix> <q> [<q> ...]")
    val suffix = args.head
    val names = args.tail.toSeq
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val outDir = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "plans/r20"))
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        outDir.resolve(s"${name}_$suffix.txt"), plan)
      println(s"dumped $name")
    }
    spark.stop()
  }
}
