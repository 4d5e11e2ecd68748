package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityModel
import graft.operators.QualityModel.HashedLinearModel

/** QualityModel (hashed-feature logistic quality filter): gradient
  * descent really separates a separable corpus, scoring arithmetic
  * matches the closed form under hand-built weights, determinism, and
  * degenerate-document behavior.
  */
class QualityModelSpec extends SparkTestBase {
  import spark.implicits._

  private def sigmoid(z: Double) = 1.0 / (1.0 + math.exp(-z))
  private def r4(x: Double) = math.rint(x * 1e4) / 1e4

  test("score: closed-form sigmoid under hand-built weights; empty " +
      "doc scores the bare bias; keep thresholds on the rounded score") {
    // weights: bucket of token "good" -> +8, bucket of "bad" -> -8
    // (dim 64: the two tokens collide mod 32 — buckets 24 vs 56)
    val dim = 64
    val gi = math.floorMod(
      graft.functions.TextHashing.hash64("good"), dim).toInt
    val bi = math.floorMod(
      graft.functions.TextHashing.hash64("bad"), dim).toInt
    assume(gi != bi, "hash collision in test fixture")
    val w = new Array[Double](dim)
    w(gi) = 8.0; w(bi) = -8.0
    val m = HashedLinearModel(dim, 0.5, w)

    val d = Seq(
      (1L, "good good bad"),  // z = 0.5 + (8+8-8)/3
      (2L, "bad"),            // z = 0.5 - 8
      (3L, ""),               // z = bias
      (4L, "unknown words"))  // z = 0.5 + (w_u1+w_u2)/2, both 0
    .toDF("doc_id", "text")
    val got = QualityModel.score(d, m)
      .as[(Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((r4(sigmoid(0.5 + 8.0 / 3)), true)))
    assert(got(2L) === ((r4(sigmoid(-7.5)), false)))
    assert(got(3L) === ((r4(sigmoid(0.5)), true)))
    assert(got(4L) === ((r4(sigmoid(0.5)), true)))
  }

  test("train: GD separates a separable corpus and the fit is usable") {
    // 200 docs: label = contains 'excellent'; filler tokens shared
    val d = (0L until 200L).map { i =>
      val filler = Seq("the", "data", "row", s"tok${i % 11}")
      val body = if (i % 2 == 0) "excellent" +: filler else "awful" +: filler
      (i, body.mkString(" "), i % 2 == 0)
    }.toDF("doc_id", "text", "label")

    val m = QualityModel.train(d, "label", dim = 64, iters = 30, lr = 8.0)
    val scored = QualityModel.score(d, m)
      .join(d.select($"doc_id", $"label"), "doc_id")
    val acc = scored.filter($"keep" === $"label").count() / 200.0
    assert(acc >= 0.95, s"classifier failed to separate: acc=$acc")
    // positive docs really score higher
    val avg = scored.groupBy($"label").agg(org.apache.spark.sql
      .functions.avg($"score")).as[(Boolean, Double)].collect().toMap
    assert(avg(true) > 0.7 && avg(false) < 0.3, avg.toString)
  }

  test("train is reproducible for a fixed input (to summation-order " +
      "noise; bit-stability across a run comes from trainCached)") {
    val d = (0L until 50L).map(i =>
      (i, s"tok${i % 5} filler words here", i % 5 == 0))
      .toDF("doc_id", "text", "label")
    val m1 = QualityModel.train(d, "label", dim = 16, iters = 5, lr = 1.0)
    val m2 = QualityModel.train(d, "label", dim = 16, iters = 5, lr = 1.0)
    assert(math.abs(m1.bias - m2.bias) < 1e-9)
    m1.weights.zip(m2.weights).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9)
    }
  }

  test("featureIndex stays in [0, dim) including negative hashes") {
    val d = (0L until 300L).map(i => Tuple1(s"token$i")).toDF("t")
    val idx = d.select(QualityModel.featureIndex($"t", 64).as("i"))
      .as[Long].collect()
    assert(idx.forall(i => i >= 0 && i < 64))
    assert(idx.distinct.length > 30, "hashing should spread buckets")
  }
}
