package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._
object CodegenCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = docs.select(
      simhash(col("text")).as("sh"),
      fingerprint(col("text"), 16).as("fp"),
      minhash(col("text"), 16, 3).as("mh"),
      lang_guess(col("text")).as("lg"),
      ngram_jaccard(col("text"), col("text"), 3).as("nj"))
    println("docs exprs OK, rows=" + out.count() + ", nj_all_1=" +
      (out.filter(col("nj") =!= 1.0).count() == 0))
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val hp = graft.operators.Ann.hyperplanes(6, 64, 42L)
    val b = emb.select(graft.operators.Ann.signBucket(col("embedding"), hp).as("b"),
      cosine_sim(col("embedding"), col("embedding")).as("c"))
    println("emb exprs OK, buckets=" + b.select(countDistinct(col("b"))).head.getLong(0) +
      ", cos_self_1=" + (b.filter(abs(col("c") - 1.0) > 1e-9).count() == 0))
    val model = graft.operators.Ann.trainIvf(emb, nlist = 8)
    val cells = emb.select(
      graft.operators.Ann.nearestCells(col("embedding"), model, 2).as("pc"))
    println("nearest_cells OK, distinct_first_cells=" +
      cells.select(countDistinct(element_at(col("pc"), 1))).head.getLong(0))
    spark.stop()
  }
}
