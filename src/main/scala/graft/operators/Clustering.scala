package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.cosine_sim

/** Semantic corpus clustering over an embedding column (north-star
  * extension beside SURVEY.md §2k similarity search): assign every
  * vector to its nearest k-means centroid, summarize cluster shape, and
  * draw cluster-balanced samples — the "cluster then sample per
  * cluster" curation step of a training-data pipeline (diversity-aware
  * subsetting, per-topic quota filling).
  *
  * The quantizer IS [[Ann.IvfModel]] — k-means centroids trained once
  * on a seeded pseudo-random sample ([[Ann.trainIvf]]) and applied
  * many times; clustering and IVF search share the train-once model.
  *
  * 100 TB shape: assignment is a single codegen'd map-side expression
  * (the centroid table is nlist x dim doubles inlined into the plan —
  * no join, no shuffle); the summary is one partial+final hash
  * aggregate on the cluster id; balanced sampling reuses the
  * deterministic xxhash64 window of
  * [[CorpusOps.sampleTopKPerStratum]] — one shuffle on the cluster
  * key. Nothing here moves the corpus more than once.
  */
object Clustering {

  /** Nearest-centroid assignment: `(id, cluster, cos)` where `cluster`
    * is the argmin-L2 centroid (ties to the lowest cell, exactly like
    * IVF cell assignment) and `cos` the cosine similarity between the
    * vector and its centroid (rounded to 4 — the cluster-coherence
    * signal). Pure map-side: one native expression per row. */
  def assign(corpus: DataFrame, model: Ann.IvfModel,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val centers = typedLit(model.centers.map(_.toSeq).toSeq)
    val cluster =
      element_at(Ann.nearestCells(col(vecCol), model, 1), 1).cast("int")
    corpus
      .select(col(idCol), col(vecCol).as("_v"), cluster.as("cluster"))
      .select(col(idCol), col("cluster"),
        round(cosine_sim(col("_v"),
          element_at(centers, col("cluster") + 1)), 4).as("cos"))
  }

  /** Per-cluster shape: `(cluster, n, avg_cos)` — size and mean
    * centroid-cosine (coherence). One hash aggregate over
    * [[assign]]'s map-side output; `avg_cos` is rounded to 3 so the
    * double summation's order noise can't leak into a hash compare. */
  def summary(corpus: DataFrame, model: Ann.IvfModel,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    assign(corpus, model, idCol, vecCol)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"), round(avg(col("cos")), 3).as("avg_cos"))

  /** Cluster-balanced sample: the first `k` vectors of every cluster in
    * deterministic pseudo-random order (`xxhash64(id)`, ties by id) —
    * `(id, cluster, rn)`. The diversity-preserving subset: every
    * semantic region contributes equally regardless of its corpus
    * share. One window sort keyed on the cluster id. */
  def balancedSample(corpus: DataFrame, model: Ann.IvfModel, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    CorpusOps.sampleTopKPerStratum(
      assign(corpus, model, idCol, vecCol).select(col(idCol), col("cluster")),
      "cluster", k, idCol)
}
