package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Deduplication suite for document corpora (north-star LLM-pipeline ops,
  * SURVEY.md §2k). Every variant is expressed as a declarative plan —
  * partial aggregation, banded LSH self-joins on small bucket keys, no
  * driver-side collection — so each scales to the 100 TB corpus case:
  *
  *  - exact:      one hash-shuffle on a 16-byte digest key.
  *  - minHashLsh: map-side signature, explode to (band, bandHash) keys,
  *                self-join only within buckets (candidate pairs ≪ n²),
  *                exact-Jaccard rerank on the candidates.
  *  - simHash:    map-side 64-bit sketch, 4×16-bit band buckets, Hamming
  *                rerank. Cheapest near-dup pass.
  *  - ngramJaccard: exact char-n-gram Jaccard on candidate pairs
  *                (bounded input — rerank stage, not first pass).
  *  - embedding:  cosine near-dup via LSH over random hyperplane signs.
  */
object Dedup {

  /** Exact dedup: md5 of the text; keeps the lowest id per group.
    * A single hash aggregation — no window, no second shuffle. */
  def exact(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Exact dedup after normalization (casefold + whitespace collapse +
    * trim) — catches trivially-reformatted duplicates. */
  def exactNormalized(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .groupBy(md5(trim(regexp_replace(lower(col(textCol)), "\\s+", " ")))
        .as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** MinHash + LSH banding: returns candidate near-dup pairs
    * (id_a < id_b) with their exact n-gram Jaccard for rerank.
    *
    * @param numHashes signature length k
    * @param bands     LSH bands (rows per band = k / bands); a pair
    *                  becomes a candidate if ANY band hash matches.
    */
  def minHashLsh(docs: DataFrame, numHashes: Int = 64, bands: Int = 16,
      shingleSize: Int = 3, minJaccard: Double = 0.5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(numHashes % bands == 0)
    val rows = numHashes / bands
    // Candidate generation shuffles ONLY (id, band, band_hash) — texts
    // stay out of the LSH join so the shuffled bytes are O(ids), not
    // O(corpus). Texts are joined back just for the surviving pairs.
    val sig = docs.select(col(idCol).as("id"),
      minhash(col(textCol), numHashes, shingleSize).as("sig"))
    // band j = hash of signature slice [j*rows, (j+1)*rows)
    val banded = sig.select(col("id"), col("sig"),
      posexplode(sequence(lit(0), lit(bands - 1))).as(Seq("pos", "band")))
      .withColumn("band_hash",
        hash(col("band"), slice(col("sig"), col("band") * rows + 1, lit(rows))))
      .select(col("id"), col("band"), col("band_hash"))
    val a = banded.as("a")
    val b = banded.as("b")
    val candidates = a.join(b,
        col("a.band") === col("b.band") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val txt = docs.select(col(idCol).as("tid"), col(textCol).as("txt"))
    candidates
      .join(txt, col("id_a") === col("tid")).withColumnRenamed("txt", "txt_a")
      .drop("tid")
      .join(txt, col("id_b") === col("tid")).withColumnRenamed("txt", "txt_b")
      .drop("tid")
      .withColumn("jaccard", ngram_jaccard(col("txt_a"), col("txt_b"), shingleSize))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** SimHash near-dup: 64-bit sketch, banded into 4×16-bit buckets;
    * candidates within `maxHamming` bits survive. */
  def simHashDups(docs: DataFrame, maxHamming: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sig = docs.select(col(idCol).as("id"),
      simhash(col(textCol)).as("sh"))
    val banded = sig.select(col("id"), col("sh"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("sh"), b * 16).bitwiseAND(lit(0xFFFFL)).as("bh"))): _*))
        .as("bb"))
      .select(col("id"), col("sh"), col("bb.band"), col("bb.bh"))
    val a = banded.as("a"); val b = banded.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding cosine near-dup: random-hyperplane LSH buckets, exact
    * cosine rerank within buckets. `planes` sign bits per vector; vectors
    * agreeing on all bits land in one bucket. Deterministic hyperplanes
    * derived from a seeded Gaussian. */
  def embeddingDups(emb: DataFrame, dim: Int, planes: Int = 8,
      minCosine: Double = 0.95, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val hp = Ann.hyperplanes(planes, dim, seed = 42L)
    val bucketed = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      Ann.signBucket(col(vecCol), hp).as("bucket"))
    val a = bucketed.as("a"); val b = bucketed.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        graft.functions.GraftFunctions.cosine_sim(col("a.v"), col("b.v")).as("cos"))
      .filter(col("cos") >= minCosine)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
  }

  /** Exact n-gram Jaccard over an explicit candidate-pair set. */
  def ngramJaccardPairs(pairs: DataFrame, n: Int = 3,
      aCol: String = "txt_a", bCol: String = "txt_b"): DataFrame =
    pairs.withColumn("jaccard", ngram_jaccard(col(aCol), col(bCol), n))

  /** Duplicate clusters: transitive closure over near-dup pairs via
    * GraphX connected components (pair (a,b) + (b,c) => cluster {a,b,c}),
    * labeled by the minimum member id. Pregel-style CC is the
    * scale-correct closure: iterations are O(cluster diameter), state is
    * one label per doc, no driver-side graph. Output: (doc_id, cluster). */
  def clusters(pairs: DataFrame, idACol: String = "id_a",
      idBCol: String = "id_b"): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val edges = pairs.select(col(idACol).cast("long"),
      col(idBCol).cast("long")).as[(Long, Long)].rdd
    val graph = org.apache.spark.graphx.Graph.fromEdgeTuples(edges, 0)
    val cc = org.apache.spark.graphx.lib.ConnectedComponents.run(graph)
    cc.vertices.toDF("doc_id", "cluster")
  }

  /** Keep one representative (lowest id) per duplicate cluster; docs in
    * no cluster pass through. Returns the deduplicated corpus. */
  def keepRepresentatives(docs: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val cl = clusters(pairs).withColumnRenamed("doc_id", "__cid")
    val losers = cl.filter(col("__cid") =!= col("cluster"))
      .select(col("__cid"))
    docs.join(losers, docs(idCol) === losers("__cid"), "left_anti")
  }
}
