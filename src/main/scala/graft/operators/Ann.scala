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

  /** Trained IVF coarse quantizer — `nlist * dim` doubles, driver-side,
    * serializable, reusable across any number of [[ivfTopK]] queries
    * (train once / apply many, like a persisted FAISS index). */
  final case class IvfModel(centers: Array[Array[Double]]) {
    def nlist: Int = centers.length
  }

  /** Train the IVF quantizer on a SEEDED PSEUDO-RANDOM sample of the
    * corpus. The sample is `orderBy(xxhash64(id))` + limit — a
    * `TakeOrderedAndProject` (no full sort), content-independent and
    * deterministic, unlike a bare `limit(n)` whose file-order prefix is
    * whatever the writer happened to cluster first. Centroid quality
    * saturates long before the corpus does; training must not scale with
    * corpus size (at 100 TB you sample, period).
    */
  def trainIvf(corpus: DataFrame, nlist: Int = 16, seed: Long = 42L,
      sampleSize: Int = 0, idCol: String = "vec_id",
      vecCol: String = "embedding"): IvfModel = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val n = if (sampleSize > 0) sampleSize else math.max(nlist * 256, 4096)
    val sample = corpus
      .select(array_to_vector(col(vecCol).cast("array<double>"))
        .as("features"), xxhash64(col(idCol)).as("h"))
      .orderBy(col("h")).limit(n).select(col("features"))
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(5)
      .fit(sample)
    IvfModel(model.clusterCenters.map(_.toArray))
  }

  /** Persist a trained quantizer (tiny parquet of centroids) so
    * train-once survives across sessions — the analog of writing a
    * FAISS index next to the corpus. */
  def saveIvf(spark: org.apache.spark.sql.SparkSession, model: IvfModel,
      path: String): Unit = {
    import spark.implicits._
    model.centers.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "center")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a quantizer written by [[saveIvf]]. */
  def loadIvf(spark: org.apache.spark.sql.SparkSession,
      path: String): IvfModel = {
    import spark.implicits._
    IvfModel(spark.read.parquet(path)
      .orderBy(col("cell"))
      .select(col("center")).as[Seq[Double]]
      .collect().map(_.toArray))
  }

  private val ivfCache =
    new java.util.concurrent.ConcurrentHashMap[String, IvfModel]()

  /** [[trainIvf]] memoized on a caller-chosen key (e.g. corpus path +
    * params) so repeated queries against the same corpus reuse the
    * quantizer instead of re-fitting it per invocation. */
  def trainIvfCached(key: String, corpus: => DataFrame, nlist: Int = 16,
      seed: Long = 42L, idCol: String = "vec_id",
      vecCol: String = "embedding"): IvfModel =
    ivfCache.computeIfAbsent(key,
      _ => trainIvf(corpus, nlist, seed, idCol = idCol, vecCol = vecCol))

  /** The `nprobe` nearest quantizer cells for a vector, nearest first —
    * native codegen'd expression (no per-row Scala UDF). */
  def nearestCells(vec: Column, model: IvfModel, nprobe: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.NearestCells(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(vec),
        model.centers, nprobe))

  /** IVF (inverted-file) ANN: the pre-trained coarse quantizer assigns
    * every corpus vector to its nearest cell; a query probes its
    * `nprobe` nearest cells and reranks those candidates exactly. The
    * 100 TB shape: the cell id co-partitions the candidate join, the
    * centroid table is tiny (inlined into codegen), and the fraction of
    * corpus touched is ~nprobe/nlist. Cell assignment and probing are
    * the same native expression at `nprobe=1` / `nprobe=n`.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      model: IvfModel, nprobe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val assigned = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"),
      element_at(nearestCells(col(vecCol), model, 1), 1).as("cell"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      explode(nearestCells(col(vecCol), model, nprobe)).as("cell"))
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

  /** Trained product-quantization codebooks: `m` subspaces × `k`
    * centroids × `dsub` dims. Driver-side, serializable, tiny
    * (m·k·dsub doubles) — the analog of a FAISS PQ index header. */
  final case class PqModel(codebooks: Array[Array[Array[Double]]]) {
    def m: Int = codebooks.length
    def k: Int = codebooks.head.length
    def dsub: Int = codebooks.head.head.length
    def dim: Int = m * dsub
  }

  /** Train PQ codebooks on the same seeded deterministic sample shape
    * as [[trainIvf]] (orderBy(xxhash64)+limit — a TakeOrdered, not a
    * sort). K-means runs DRIVER-SIDE on the collected sample — the
    * sample is bounded (default max(k·64, 2048) vectors), so training
    * cost never scales with the corpus; only encode does, and encode
    * is map-side. Deterministic: seeded centroid init, fixed Lloyd
    * iteration count, stable tie-breaks. */
  def trainPq(corpus: DataFrame, m: Int = 8, k: Int = 16,
      seed: Long = 42L, sampleSize: Int = 0, iters: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding"): PqModel = {
    require(m >= 1 && k >= 1, s"need m >= 1, k >= 1; got m=$m k=$k")
    val n = if (sampleSize > 0) sampleSize else math.max(k * 64, 2048)
    val rows = corpus
      .select(col(vecCol).cast("array<double>").as("v"),
        xxhash64(col(idCol)).as("h"))
      .orderBy(col("h")).limit(n).select(col("v"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(rows.nonEmpty, "trainPq: empty corpus")
    val dim = rows.head.length
    require(dim % m == 0,
      s"trainPq: dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    val rnd = new scala.util.Random(seed)
    val codebooks = Array.tabulate(m) { s =>
      val off = s * dsub
      val pts = rows.map(r => java.util.Arrays.copyOfRange(r, off, off + dsub))
      val kk = math.min(k, pts.length)
      // seeded init on distinct sample indices; plain Lloyd after
      val centers = rnd.shuffle(pts.indices.toVector).take(kk)
        .map(i => pts(i).clone()).toArray
      var it = 0
      while (it < iters) {
        val sums = Array.fill(kk)(new Array[Double](dsub))
        val counts = new Array[Int](kk)
        pts.foreach { p =>
          var best = 0; var bestD = Double.MaxValue; var j = 0
          while (j < kk) {
            var d = 0.0; var i = 0
            while (i < dsub) {
              val diff = p(i) - centers(j)(i); d += diff * diff; i += 1
            }
            if (d < bestD) { bestD = d; best = j }
            j += 1
          }
          var i = 0
          while (i < dsub) { sums(best)(i) += p(i); i += 1 }
          counts(best) += 1
        }
        var j = 0
        while (j < kk) {
          if (counts(j) > 0) {
            var i = 0
            while (i < dsub) {
              centers(j)(i) = sums(j)(i) / counts(j); i += 1
            }
          } // empty cluster keeps its center (deterministic)
          j += 1
        }
        it += 1
      }
      centers
    }
    PqModel(codebooks)
  }

  private val pqCache =
    new java.util.concurrent.ConcurrentHashMap[String, PqModel]()

  /** [[trainPq]] memoized on a caller-chosen key — train once / encode
    * and query forever, like [[trainIvfCached]]. */
  def trainPqCached(key: String, corpus: => DataFrame, m: Int = 8,
      k: Int = 16, seed: Long = 42L, idCol: String = "vec_id",
      vecCol: String = "embedding"): PqModel =
    pqCache.computeIfAbsent(key,
      _ => trainPq(corpus, m, k, seed, idCol = idCol, vecCol = vecCol))

  /** PQ code column (array of m small ints) — native codegen'd
    * expression, map-side. */
  def pqEncode(vec: Column, model: PqModel): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.PqEncode(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(vec),
        model.codebooks))

  /** Approximate cosine between a raw query vector and a PQ code
    * (asymmetric distance) — native codegen'd expression. */
  def pqAdcCos(queryVec: Column, codes: Column, model: PqModel): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.PqAdcCosine(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(queryVec),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(codes),
        model.codebooks))

  /** Trained scalar quantizer (SQ8): per-dimension `[min, max]` over
    * the corpus — the FAISS `ScalarQuantizer(QT_8bit)` model. Unlike
    * the sampled IVF/PQ fits, the ranges are EXACT one-pass corpus
    * aggregates (dim-bounded result, order-independent min/max), so a
    * SQL oracle re-derives the whole model independently — no
    * rendered-model oracle needed. */
  final case class SqModel(mins: Array[Double], maxs: Array[Double]) {
    def dim: Int = mins.length
  }

  /** One corpus pass: per-dimension min/max (partial-agg combined;
    * the result is `2*dim` doubles on the driver). */
  def trainSq(corpus: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): SqModel = {
    val dim = corpus.select(size(col(vecCol))).head.getInt(0)
    val aggs = (0 until dim).flatMap(i => Seq(
      min(element_at(col(vecCol), i + 1).cast("double")),
      max(element_at(col(vecCol), i + 1).cast("double"))))
    val r = corpus.agg(aggs.head, aggs.tail: _*).head()
    SqModel(
      Array.tabulate(dim)(i => r.getDouble(2 * i)),
      Array.tabulate(dim)(i => r.getDouble(2 * i + 1)))
  }

  private val sqCache =
    new java.util.concurrent.ConcurrentHashMap[String, SqModel]()

  /** [[trainSq]] memoized on a caller-chosen key. */
  def trainSqCached(key: String, corpus: => DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): SqModel =
    sqCache.computeIfAbsent(key,
      _ => trainSq(corpus, idCol = idCol, vecCol = vecCol))

  /** 8-bit code of a vector: per dim,
    * `clamp(floor(((x-mn)/span)*255 + 0.5), 0, 255)` (degenerate span
    * → 0). Pure codegen'd HOF — map-side; 4× fewer scan bytes than
    * float32 when persisted. The formula is pinned EXACTLY (operation
    * order included) so the SQL oracle reproduces every code
    * bit-for-bit in IEEE double math. */
  def sqEncode(vec: Column, model: SqModel): Column = {
    val mns = typedLit(model.mins.toSeq)
    val mxs = typedLit(model.maxs.toSeq)
    transform(vec.cast("array<double>"), (x, i) => {
      val mn = element_at(mns, i + 1)
      val span = element_at(mxs, i + 1) - mn
      when(span <= 0, lit(0L)).otherwise(
        least(lit(255.0),
          greatest(lit(0.0), floor((x - mn) / span * 255 + 0.5))))
        .cast("int")
    })
  }

  /** Dequantize an SQ8 code back to the cell midpoint representation:
    * `mn + (code/255.0)*span`. */
  def sqDecode(codes: Column, model: SqModel): Column = {
    val mns = typedLit(model.mins.toSeq)
    val mxs = typedLit(model.maxs.toSeq)
    transform(codes, (c, i) => {
      val mn = element_at(mns, i + 1)
      val span = element_at(mxs, i + 1) - mn
      when(span <= 0, mn)
        .otherwise(mn + c.cast("double") / 255.0 * span)
    })
  }

  /** SQ8 ANN: score queries against the DEQUANTIZED codes (the
    * codes-only scan a deployment runs — 1/4 the bytes of float32),
    * shortlist `rerank*k` per query, exact cosine rerank to top-k.
    * Same asymmetric-shortlist-then-rerank shape as [[pqTopK]]; the
    * scale story is scan bytes, not candidate pruning (compose with
    * IVF cells for that). */
  def sqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      model: SqModel, rerank: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cand = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"),
      sqDecode(sqEncode(col(vecCol), model), model).as("recon"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv"))
    val scored = cand.join(broadcast(q),
        col("query_id") =!= col("neighbor_id"))
      .withColumn("acos", cosine_sim(col("qv"), col("recon")))
    val wa = Window.partitionBy(col("query_id"))
      .orderBy(col("acos").desc, col("neighbor_id"))
    val wr = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("arnk", row_number().over(wa))
      .filter(col("arnk") <= rerank * k)
      .withColumn("cos", cosine_sim(col("qv"), col("cv")))
      .withColumn("rnk", row_number().over(wr))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos"), 4).as("cos"), col("rnk"))
  }

  /** The persistable IVF-PQ CODES TABLE: `(id, cell, code)` — what a
    * deployment writes once and scans thereafter. Per vector it is one
    * int cell + m ints of code instead of `dim` floats: the scan-side
    * bytes that make ANN over 100 TB of embeddings feasible. */
  def pqCodes(corpus: DataFrame, ivf: IvfModel, pq: PqModel,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    corpus.select(col(idCol).as("neighbor_id"),
      element_at(nearestCells(col(vecCol), ivf, 1), 1).as("cell"),
      pqEncode(col(vecCol), pq).as("code"))

  /** IVF-PQ top-k — the full 100 TB ANN shape:
    *
    *  1. the coarse quantizer routes each query to its `nprobe`
    *     nearest cells (equi-join on cell id, candidates only);
    *  2. candidates rank by APPROXIMATE ADC cosine computed from the
    *     m-int code — the scan side never touches raw vectors;
    *  3. only the top `rerank·k` per query fetch their true vectors
    *     (an equi-join back to the corpus by id) for exact cosine.
    *
    * Pass a persisted [[pqCodes]] frame via `codes` to skip re-encoding
    * (train once / encode once / query forever). Output shape matches
    * [[bruteForceTopK]]. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      ivf: IvfModel, pq: PqModel, nprobe: Int = 4, rerank: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      codes: Option[DataFrame] = None): DataFrame = {
    val codeTbl = codes.getOrElse(pqCodes(corpus, ivf, pq, idCol, vecCol))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv"),
      explode(nearestCells(col(vecCol), ivf, nprobe)).as("cell"))
    val cand = codeTbl.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("acos", pqAdcCos(col("qv"), col("code"), pq))
    val wA = Window.partitionBy(col("query_id"))
      .orderBy(col("acos").desc, col("neighbor_id"))
    // a neighbor's single cell matches at most one of a query's nprobe
    // probe rows, so (query, neighbor) pairs are already unique
    val short = cand
      .select(col("query_id"), col("qv"), col("neighbor_id"), col("acos"))
      .withColumn("arnk", row_number().over(wA))
      .filter(col("arnk") <= k.toLong * rerank)
    // exact rerank: ONLY the shortlist fetches raw vectors
    val vecs = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"))
    val wE = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    short.join(vecs, Seq("neighbor_id"))
      .withColumn("cos", cosine_sim(col("qv"), col("cv")))
      .withColumn("rnk", row_number().over(wE))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos"), 4).as("cos"), col("rnk"))
  }

  /** IVF-PQ radius — the MEMORY-BOUND threshold sweep: candidates
    * from the query's `nprobe` cells, kept where the APPROXIMATE ADC
    * cosine (computed from the m-int code; the scan never touches
    * raw vectors) clears `minCos`. Disclosed code-level semantics:
    * the returned score is the ADC cosine (= exact cosine against
    * the code's reconstruction), so recall tracks the quantizer like
    * [[ivfPqTopK]]'s shortlist — the shape for sweeping a corpus
    * whose raw vectors are cold storage. Query side rides the
    * [[lshRadius]] broadcast guard.
    *
    * @return `(query_id, neighbor_id, acos)` ordered, acos ≥ minCos
    */
  def ivfPqRadius(corpus: DataFrame, queries: DataFrame,
      minCos: Double, ivf: IvfModel, pq: PqModel, nprobe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      codes: Option[DataFrame] = None,
      maxBroadcastQueries: Long = 1L << 20): DataFrame = {
    val codeTbl = codes.getOrElse(pqCodes(corpus, ivf, pq, idCol, vecCol))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv"),
      explode(nearestCells(col(vecCol), ivf, nprobe)).as("cell"))
    codeTbl.join(guardedQuerySide(q, queries, nprobe,
        maxBroadcastQueries), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("acos", pqAdcCos(col("qv"), col("code"), pq))
      .filter(col("acos") >= minCos)
      .select(col("query_id"), col("neighbor_id"),
        round(col("acos"), 4).as("acos"))
      .orderBy(col("query_id"), col("neighbor_id"))
  }

  /** Persist PQ codebooks (tiny parquet) beside a corpus. */
  def savePq(spark: org.apache.spark.sql.SparkSession, model: PqModel,
      path: String): Unit = {
    import spark.implicits._
    model.codebooks.zipWithIndex.flatMap { case (cb, s) =>
      cb.zipWithIndex.map { case (ctr, j) => (s, j, ctr.toSeq) }
    }.toSeq.toDF("subspace", "centroid", "center")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load codebooks written by [[savePq]]. */
  def loadPq(spark: org.apache.spark.sql.SparkSession,
      path: String): PqModel = {
    import spark.implicits._
    val rows = spark.read.parquet(path)
      .orderBy(col("subspace"), col("centroid"))
      .select(col("subspace"), col("center"))
      .as[(Int, Seq[Double])].collect()
    PqModel(rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.map(_._2.toArray).toArray).toArray)
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

  /** All bit patterns over `planes` bits with at most `probeBits` set —
    * generated combinatorially (O(|masks|) work), not by scanning all
    * 2^planes candidates, so corpus-sized plane counts (20+ bits) stay
    * trivial on the driver. */
  private[graft] def probeMasks(planes: Int, probeBits: Int): Seq[Int] =
    (0 to math.min(probeBits, planes)).flatMap(b =>
      (0 until planes).combinations(b)
        .map(_.foldLeft(0)((m, i) => m | (1 << i))).toSeq)

  /** LSH-bucketed approximate top-k: same output shape as brute force.
    * Queries are multi-probed: the exact bucket plus every bucket within
    * Hamming distance `probeBits` of it (for random high-dim data the
    * neighbor's bucket often differs in 1-2 sign bits, so 2-bit probing
    * is what keeps recall usable without widening buckets).
    *
    * `planes <= 0` sizes the bucket count to the corpus via
    * [[Dedup.autoPlanes]] (one count job): a fixed plane count stops
    * partitioning the work at scale — 6 planes is 64 buckets, and
    * 2-bit multi-probe then touches ~1/3 of the corpus per query
    * regardless of corpus size. Auto-sizing keeps the scored fraction
    * ~|masks| · targetBucket / n.
    *
    * '''Query-side contract''': the probe-expanded query set
    * (|queries| × |masks| rows) is broadcast ONLY while it is
    * genuinely broadcast-small — one cheap count on the query table
    * guards it, and past `maxBroadcastQueries` expanded rows the
    * bucket join falls back to a plain shuffled hash join. A caller
    * passing a corpus-sized query set (a full-corpus dedup sweep)
    * degrades to a shuffle instead of a driver/broadcast blow-up. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      planes: Int = 6, seed: Long = 42L, probeBits: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxBroadcastQueries: Long = 1L << 20): DataFrame = {
    val np = if (planes > 0) planes
      else Dedup.autoPlanes(corpus.count(),
        targetBucket = math.max(256L, 16L * k))
    val hp = hyperplanes(np, dim, seed)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      signBucket(col(vecCol), hp).as("bucket"))
    val masks = probeMasks(np, probeBits)
    // compute the sign bucket ONCE per query row; probes are cheap XORs
    // of the materialized bucket column (not repeated projections)
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        signBucket(col(vecCol), hp).as("qbucket"))
      .select(col("query_id"), col("qv"),
        explode(array(masks.map(m =>
          col("qbucket").bitwiseXOR(lit(m))): _*)).as("bucket"))
    val scored = c.join(guardedQuerySide(q, queries, masks.size,
        maxBroadcastQueries),
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

  /** The query side of a bucket/cell candidate join, broadcast only
    * while genuinely broadcast-small: one cheap count on the
    * (pre-expansion) query table decides, and past
    * `maxBroadcastQueries` EXPANDED rows the join runs as a plain
    * shuffled hash join — a corpus-sized query set degrades to a
    * shuffle, never a driver/broadcast blow-up. The count job is
    * O(query table), negligible against the join it guards. */
  private def guardedQuerySide(expanded: DataFrame, queries: DataFrame,
      expandFactor: Int, maxBroadcastQueries: Long): DataFrame =
    if (queries.count() * expandFactor <= maxBroadcastQueries)
      broadcast(expanded)
    else expanded

  /** Radius (threshold) retrieval: every corpus vector within cosine
    * ≥ `minCos` of each query, through the SAME multi-probe LSH
    * bucket join as [[lshTopK]] — the "everything similar enough"
    * face (dedup sweeps, contamination checks) where k is unknown a
    * priori. Candidate volume is bucket-bounded exactly as in the
    * top-k path; no all-pairs anywhere. Recall is probe-geometry-
    * bounded like lshTopK's (same buckets, same masks). Same
    * query-side contract as lshTopK: the probe-expanded query set
    * broadcasts only under `maxBroadcastQueries` expanded rows
    * (guarded by one count), and falls back to a shuffled bucket
    * join past it.
    *
    * @return `(query_id, neighbor_id, cos)` ordered, cos ≥ minCos
    */
  def lshRadius(corpus: DataFrame, queries: DataFrame, minCos: Double,
      dim: Int, planes: Int = 6, seed: Long = 42L, probeBits: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxBroadcastQueries: Long = 1L << 20)
      : DataFrame = {
    val hp = hyperplanes(planes, dim, seed)
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"), signBucket(col(vecCol), hp).as("bucket"))
    val masks = probeMasks(planes, probeBits)
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        signBucket(col(vecCol), hp).as("qbucket"))
      .select(col("query_id"), col("qv"),
        explode(array(masks.map(m =>
          col("qbucket").bitwiseXOR(lit(m))): _*)).as("bucket"))
    c.join(guardedQuerySide(q, queries, masks.size,
        maxBroadcastQueries), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine_sim(col("qv"), col("cv")))
      .filter(col("cos") >= minCos)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos"), 4).as("cos"))
      .distinct()
      .orderBy(col("query_id"), col("neighbor_id"))
  }

  /** Radius (threshold) retrieval over the IVF cells — [[lshRadius]]'s
    * threshold face for the normalized-corpus case: candidates are
    * the members of each query's `nprobe` nearest quantizer cells
    * (cell-pruned scan, ~nprobe/nlist of the corpus), reranked
    * exactly and kept at cos ≥ `minCos`. Every corpus vector sits in
    * exactly ONE cell and a query's probed cells are distinct, so
    * each (query, neighbor) pair meets at most once — no dedup stage
    * needed. Query side rides the same broadcast guard as
    * [[lshRadius]].
    *
    * @return `(query_id, neighbor_id, cos)` ordered, cos ≥ minCos
    */
  def ivfRadius(corpus: DataFrame, queries: DataFrame, minCos: Double,
      model: IvfModel, nprobe: Int = 4, idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxBroadcastQueries: Long = 1L << 20): DataFrame = {
    val assigned = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"),
      element_at(nearestCells(col(vecCol), model, 1), 1).as("cell"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv"),
      explode(nearestCells(col(vecCol), model, nprobe)).as("cell"))
    assigned.join(guardedQuerySide(q, queries, nprobe,
        maxBroadcastQueries), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine_sim(col("qv"), col("cv")))
      .filter(col("cos") >= minCos)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos"), 4).as("cos"))
      .orderBy(col("query_id"), col("neighbor_id"))
  }

  /** Embedding-table health histogram: per-vector L2 norms (the
    * sequential fold over the array — one fixed IEEE expression
    * order, so the doubles are engine-exact), quantized to 1e4 and
    * binned 0.1-wide — the "are these vectors normalized / did a
    * batch go degenerate" QA an ANN deployment runs before indexing.
    * Map-only scan + one hash rollup.
    *
    * @return `(bin, n_vecs, min_norm_e4, max_norm_e4)` ordered by bin
    */
  def normHealth(corpus: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    def intDiv(a: Column, b: Column): Column =
      ColumnBridge.column(new org.apache.spark.sql.catalyst.expressions
        .IntegralDivide(ColumnBridge.expression(a),
          ColumnBridge.expression(b)))
    val ssq = aggregate(col(vecCol), lit(0.0),
      (a, x) => a + x.cast("double") * x.cast("double"))
    corpus
      .select(col(idCol),
        round(sqrt(ssq) * 10000).cast("long").as("norm_e4"))
      .groupBy(intDiv(col("norm_e4"), lit(1000L)).as("bin"))
      .agg(count(lit(1)).as("n_vecs"),
        min(col("norm_e4")).as("min_norm_e4"),
        max(col("norm_e4")).as("max_norm_e4"))
      .orderBy(col("bin"))
  }

  /** ANN quality evaluation: recall of an approximate top-k result
    * against the exact one. Both inputs carry
    * `(query_id, neighbor_id, ...)` rows (the shape every retriever
    * here emits); per query, `recall = |approx ∩ exact| / |exact|`.
    * One equi-join on `(query_id, neighbor_id)` plus one rollup —
    * both result sets are k-bounded per query, so this is cheap at
    * any corpus size; integers throughout, one rounded division.
    * Both key projections are deduplicated first: a retriever that
    * emits the same `(query_id, neighbor_id)` twice (a multi-probe
    * variant without its own distinct) must not fan the join out and
    * inflate either count. */
  def recallAtK(approx: DataFrame, exact: DataFrame): DataFrame =
    exact
      .select(col("query_id"), col("neighbor_id")).distinct()
      .join(
        approx.select(col("query_id"), col("neighbor_id")).distinct()
          .withColumn("_hit", lit(1)),
        Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("_hit"), lit(0))).cast("long").as("n_hit"))
      .withColumn("recall",
        round(col("n_hit").cast("double") / col("n_exact"), 4))
}
