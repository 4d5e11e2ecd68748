package graft
import org.apache.spark.sql.SparkSession
object VerifyDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // user flow: read through the graft source, limit, show
    val df = spark.read.format("graft")
      .option("path", "/root/testdata/sf0.001/lineitem.parquet").load()
      .limit(5)
    println("== optimizedPlan ==")
    println(df.queryExecution.optimizedPlan)
    df.select("l_orderkey", "l_linenumber", "l_quantity").show()
    // user flow: SQL function registered by extensions
    println("SQL cosine_sim -> " + spark.sql(
      "SELECT cosine_sim(array(1.0d,2.0d), array(1.0d,2.0d))").head.getDouble(0))
    println("SQL lang_guess -> " + spark.sql(
      "SELECT lang_guess('the cat and the dog went into the house')")
      .head.getString(0))
    println("SQL ngram_jaccard -> " + spark.sql(
      "SELECT ngram_jaccard('abcdef', 'abcdef', 3)").head.getDouble(0))
    // probe 1: missing path option
    try { spark.read.format("graft").load() }
    catch { case e: Exception => println("PROBE missing-path -> " + e.getMessage) }
    // probe 2: nonexistent file
    try { spark.read.format("graft").option("path", "/tmp/nope.parquet").load() }
    catch { case e: Exception =>
      println("PROBE bad-path -> " + e.getClass.getSimpleName + ": " +
        e.getMessage.linesIterator.next()) }
    // probe 3: write then ErrorIfExists double-write
    val out = java.nio.file.Files.createTempDirectory("drive").resolve("t").toString
    df.write.format("graft").option("path", out).save()
    println("wrote " + spark.read.parquet(out).count() + " rows via graft sink")
    try { df.write.format("graft").option("path", out).save() }
    catch { case e: Exception =>
      println("PROBE double-write -> " + e.getMessage.linesIterator.next()) }
    spark.stop()
  }
}
