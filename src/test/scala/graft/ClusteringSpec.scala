package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ann, Clustering}

/** Clustering (k-means assignment / summary / balanced sampling over
  * the shared IVF quantizer): hand-built centroids so assignments are
  * decidable by inspection, plus determinism and quota invariants.
  */
class ClusteringSpec extends SparkTestBase {
  import spark.implicits._

  // two orthogonal unit centroids: cluster 0 = x-axis, 1 = y-axis
  private val model = Ann.IvfModel(
    Array(Array(1.0, 0.0), Array(0.0, 1.0)))

  private def vecs(rows: (Long, Array[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("assign: argmin-L2 centroid, cosine against own centroid") {
    val d = vecs(
      1L -> Array(2f, 0f),     // cluster 0, cos 1.0
      2L -> Array(0f, 5f),     // cluster 1, cos 1.0
      3L -> Array(3f, 1f),     // cluster 0, cos 3/sqrt(10)
      4L -> Array(1f, 4f))     // cluster 1, cos 4/sqrt(17)
    val got = Clustering.assign(d, model)
      .as[(Long, Int, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((0, 1.0)))
    assert(got(2L) === ((1, 1.0)))
    assert(got(3L) === ((0, math.rint(3 / math.sqrt(10) * 1e4) / 1e4)))
    assert(got(4L) === ((1, math.rint(4 / math.sqrt(17) * 1e4) / 1e4)))
  }

  test("assign ties break to the lowest cell, like IVF assignment") {
    // equidistant from both centroids
    val got = Clustering.assign(vecs(9L -> Array(1f, 1f)), model)
      .as[(Long, Int, Double)].collect()
    assert(got.head._2 === 0)
  }

  test("summary: per-cluster size and mean coherence") {
    val d = vecs(
      1L -> Array(2f, 0f), 2L -> Array(4f, 0f), 3L -> Array(3f, 1f),
      4L -> Array(0f, 7f))
    val got = Clustering.summary(d, model)
      .as[(Int, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    val c0cos = (1.0 + 1.0 + 3 / math.sqrt(10)) / 3
    assert(got(0) === ((3L, math.rint(c0cos * 1e3) / 1e3)))
    assert(got(1) === ((1L, 1.0)))
  }

  test("balancedSample: exactly k per cluster, deterministic, rn dense") {
    val d = (0L until 400L).map { i =>
      // even ids x-ish, odd ids y-ish
      if (i % 2 == 0) (i, Array(1f + (i % 7) * 0.01f, 0.1f))
      else (i, Array(0.1f, 1f + (i % 5) * 0.01f))
    }.toDF("vec_id", "embedding")
    val got = Clustering.balancedSample(d, model, k = 6)
      .as[(Long, Int, Int)].collect()
    assert(got.count(_._2 == 0) === 6)
    assert(got.count(_._2 == 1) === 6)
    assert(got.filter(_._2 == 0).map(_._3).sorted.toSeq === (1 to 6))
    // members really come from the right cluster
    assert(got.filter(_._2 == 0).forall(_._1 % 2 == 0))
    assert(got.filter(_._2 == 1).forall(_._1 % 2 == 1))
    val again = Clustering.balancedSample(d, model, k = 6)
      .as[(Long, Int, Int)].collect()
    assert(got.sortBy(r => (r._2, r._3)).toSeq ===
      again.sortBy(r => (r._2, r._3)).toSeq)
  }
}
