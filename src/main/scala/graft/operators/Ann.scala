package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.cosine_sim

/** Approximate-nearest-neighbor search over an embedding column
  * (north-star, SURVEY.md §2k "similarity search").
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small) query
  *    set against the corpus, rank per query. The corpus side is streamed,
  *    never collected; cost is |Q|·|corpus| dot products with NO shuffle
  *    of the corpus (broadcast join + per-query top-k via window on the
  *    pair table, whose size is |Q|·k after the rank filter).
  *  - [[lshTopK]]: random-hyperplane LSH — corpus and queries are
  *    sign-bucketed; only same-bucket pairs are scored. At 100 TB this is
  *    the scale path: bucket keys co-partition the join and the per-bucket
  *    candidate count is ~n / 2^planes. Multi-probe (probe = flip one
  *    bit) keeps recall up without widening buckets.
  */
object Ann {

  /** Deterministic Gaussian hyperplanes, seeded — no runtime randomness. */
  def hyperplanes(planes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(planes, dim)(rnd.nextGaussian())
  }

  /** Sign-bit bucket id of a vector against the hyperplanes, as an int
    * column (bit j = sign of dot(v, hp(j))) — backed by the native
    * [[graft.functions.HyperplaneBucket]] expression (one tight loop per
    * row instead of a planes x dim Catalyst tree). */
  def signBucket(vec: Column, hp: Array[Array[Double]]): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.HyperplaneBucket(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(vec), hp))

  /** IVF (inverted-file) ANN: a seeded k-means coarse quantizer assigns
    * every corpus vector to one of `nlist` cells; a query probes its
    * `nprobe` nearest cells and reranks those candidates exactly. The
    * 100 TB shape: the cell id co-partitions the candidate join, the
    * centroid table is tiny and broadcast, and the fraction of corpus
    * touched is ~nprobe/nlist. Training samples the corpus; the model is
    * only `nlist * dim` doubles on the driver.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feats = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"),
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    // train the coarse quantizer on a bounded sample — centroid quality
    // saturates long before the corpus does, and training must not scale
    // with corpus size (at 100 TB you sample, period)
    val trainSample = feats.select(col("features"))
      .limit(math.max(nlist * 256, 4096))
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(5)
      .fit(trainSample)
    val assigned = model.transform(feats)
      .select(col("neighbor_id"), col("cv"), col("prediction").as("cell"))
    val centers: Array[Array[Double]] = model.clusterCenters.map(_.toArray)
    val probeCells = udf { (v: Seq[Float]) =>
      centers.zipWithIndex.map { case (c, i) =>
        var d = 0.0; var j = 0
        while (j < c.length && j < v.length) {
          val diff = v(j) - c(j); d += diff * diff; j += 1
        }
        (d, i)
      }.sortBy(_._1).take(nprobe).map(_._2)
    }
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        explode(probeCells(col(vecCol))).as("cell"))
    val scored = assigned.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine_sim(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .select(col("query_id"), col("neighbor_id"), col("cos")).distinct()
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos"), 4).as("cos"), col("rnk"))
  }

  /** Exact top-k neighbors for each query vector (excluding self). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine_sim(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos"), 4).as("cos"), col("rnk"))
  }

  /** LSH-bucketed approximate top-k: same output shape as brute force.
    * Queries are multi-probed: the exact bucket plus every bucket within
    * Hamming distance `probeBits` of it (for random high-dim data the
    * neighbor's bucket often differs in 1-2 sign bits, so 2-bit probing
    * is what keeps recall usable without widening buckets). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      planes: Int = 6, seed: Long = 42L, probeBits: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val hp = hyperplanes(planes, dim, seed)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      signBucket(col(vecCol), hp).as("bucket"))
    val masks = (0 until (1 << planes))
      .filter(m => java.lang.Integer.bitCount(m) <= probeBits)
    // compute the sign bucket ONCE per query row; probes are cheap XORs
    // of the materialized bucket column (not repeated projections)
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        signBucket(col(vecCol), hp).as("qbucket"))
      .select(col("query_id"), col("qv"),
        explode(array(masks.map(m =>
          col("qbucket").bitwiseXOR(lit(m))): _*)).as("bucket"))
    val scored = c.join(broadcast(q),
        Seq("bucket")).filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine_sim(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .select(col("query_id"), col("neighbor_id"), col("cos")).distinct()
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos"), 4).as("cos"), col("rnk"))
  }
}
