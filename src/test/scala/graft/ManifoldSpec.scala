package graft

import org.apache.spark.sql.functions._
import graft.ml.Manifold

/** Sampled t-SNE + landmark extension semantics (manifold.py:287). */
class ManifoldSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated Gaussian-ish blobs in 8-D
  private def blobs = {
    val a = (1 to 30).map(i => (i.toLong,
      Array.tabulate(8)(j => math.sin(i * (j + 3) * 0.37) * 0.1)))
    val b = (31 to 60).map(i => (i.toLong,
      Array.tabulate(8)(j => 5.0 + math.cos(i * (j + 1) * 0.53) * 0.1)))
    (a ++ b).toDF("id", "vec")
  }

  test("t-SNE separates two blobs in the embedding plane") {
    val out = Manifold.tsneSampled(blobs, "id", "vec", 60, 10.0, 250)
      .as[(Long, Double, Double)].collect()
    val (ga, gb) = out.partition(_._1 <= 30)
    def centroid(g: Array[(Long, Double, Double)]) =
      (g.map(_._2).sum / g.length, g.map(_._3).sum / g.length)
    def spread(g: Array[(Long, Double, Double)], c: (Double, Double)) =
      g.map(p => math.hypot(p._2 - c._1, p._3 - c._2)).max
    val (ca, cb) = (centroid(ga), centroid(gb))
    val gap = math.hypot(ca._1 - cb._1, ca._2 - cb._2)
    assert(gap > math.max(spread(ga, ca), spread(gb, cb)),
      s"gap $gap vs spreads ${spread(ga, ca)} / ${spread(gb, cb)}")
  }

  test("out-of-sample rows land near their blob's landmarks") {
    // fit on ids 1..40 (covers both blobs partially), extend the rest
    val out = Manifold.tsneSampled(blobs, "id", "vec", 40, 10.0, 250)
      .as[(Long, Double, Double)].collect().toSeq
    assert(out.size == 60)
    val byId = out.map(r => r._1 -> (r._2, r._3)).toMap
    // unseen B-blob points (41..60) sit nearer B landmarks (31..40)
    // than A landmarks
    val aLm = (1L to 30L).filter(byId.contains).map(byId)
    val bLm = (31L to 40L).map(byId)
    def c(g: Seq[(Double, Double)]) =
      (g.map(_._1).sum / g.size, g.map(_._2).sum / g.size)
    val (cA, cB) = (c(aLm), c(bLm))
    (41L to 60L).foreach { i =>
      val p = byId(i)
      val dA = math.hypot(p._1 - cA._1, p._2 - cA._2)
      val dB = math.hypot(p._1 - cB._1, p._2 - cB._2)
      assert(dB < dA, s"point $i placed nearer the wrong blob")
    }
  }

  test("isomap refuses a disconnected kNN graph, separates blobs once bridged") {
    // at k=5 each blob's kNN stays inside the blob → no geodesic exists
    // between components and the operator must refuse loudly
    val ex = intercept[IllegalArgumentException] {
      Manifold.isomapSampledExact(blobs, "id", "vec", dims = 8, n = 60,
        kNei = 5, hops = 6, iters = 30).collect()
    }
    assert(ex.getMessage.contains("disconnected"))
    // k=31 forces ≥1 cross-blob edge → connected; geodesic MDS then
    // separates the blobs in the leading plane
    val out = Manifold.isomapSampledExact(blobs, "id", "vec", dims = 8,
        n = 60, kNei = 31, hops = 6, iters = 30)
      .as[(Long, Double, Double)].collect()
    assert(out.length == 60)
    val (ga, gb) = out.partition(_._1 <= 30)
    def centroid(g: Array[(Long, Double, Double)]) =
      (g.map(_._2).sum / g.length, g.map(_._3).sum / g.length)
    def spread(g: Array[(Long, Double, Double)], c: (Double, Double)) =
      g.map(p => math.hypot(p._2 - c._1, p._3 - c._2)).max
    val (ca, cb) = (centroid(ga), centroid(gb))
    val gap = math.hypot(ca._1 - cb._1, ca._2 - cb._2)
    assert(gap > math.max(spread(ga, ca), spread(gb, cb)),
      s"gap $gap vs spreads ${spread(ga, ca)} / ${spread(gb, cb)}")
  }

  test("spectral embedding's leading coordinate sign-splits disconnected blobs") {
    // two components ⇒ the λ=1 eigenspace of D^{-1/2}WD^{-1/2} is
    // 2-dimensional; deflating the global √d direction leaves the
    // blockwise ± vector, so spec1 must separate the blobs by sign
    val out = Manifold.spectralSampledExact(blobs, "id", "vec", dims = 8,
        n = 60, kNei = 5, iters = 40)
      .as[(Long, Double, Double)].collect()
    assert(out.length == 60)
    val a = out.filter(_._1 <= 30).map(_._2)
    val b = out.filter(_._1 > 30).map(_._2)
    assert(a.forall(_ > 0) != b.forall(_ > 0) ||
           a.forall(_ < 0) != b.forall(_ < 0))
    assert(a.forall(v => b.forall(w => math.signum(v) != math.signum(w))),
      "spec1 does not sign-split the two components")
  }

  test("LLE embedding is near-null for M, centered, and partition-stable") {
    // the power iteration on σI − M (constant deflated) returns
    // near-null directions of M = (I−W)ᵀ(I−W): unit-norm coordinates,
    // ≈orthogonal to the constant, deterministic under repartitioning.
    // (A hard block-sign split is NOT guaranteed at finite iterations —
    // M's spectrum near zero is almost degenerate between the block
    // indicator and within-block smooth modes.)
    def run(df: org.apache.spark.sql.DataFrame) =
      Manifold.lleSampledExact(df, "id", "vec", dims = 8, n = 60,
          kNei = 5, reg = 0.001, wIters = 32, iters = 40)
        .orderBy("id").as[(Long, Double, Double)].collect().toSeq
    val out = run(blobs)
    assert(out.length == 60)
    val c1 = out.map(_._2); val c2 = out.map(_._3)
    // unit-ish norm (power iteration normalizes), not collapsed
    assert(math.abs(math.sqrt(c1.map(v => v * v).sum) - 1.0) < 1e-3)
    assert(c1.distinct.length > 10 && c2.distinct.length > 10)
    // ≈orthogonal to the deflated constant direction
    assert(math.abs(c1.sum) < 0.15, s"lle1 mean ${c1.sum / 60}")
    assert(run(blobs.repartition(7)) == out)
  }

  test("LTSA embedding is unit-norm, non-collapsed, and partition-stable") {
    // same contract as the standard-LLE test: the null-space tail
    // returns unit-norm near-null directions of the alignment matrix,
    // ≈⊥ constant (ones is grid-null: Gᵢ's first column reproduces it),
    // deterministic under repartitioning.
    def run(df: org.apache.spark.sql.DataFrame) =
      Manifold.ltsaSampledExact(df, "id", "vec", dims = 8, n = 60,
          kNei = 5, locIters = 20, iters = 40)
        .orderBy("id").as[(Long, Double, Double)].collect().toSeq
    val out = run(blobs)
    assert(out.length == 60)
    val c1 = out.map(_._2); val c2 = out.map(_._3)
    assert(math.abs(math.sqrt(c1.map(v => v * v).sum) - 1.0) < 1e-3)
    assert(c1.distinct.length > 10 && c2.distinct.length > 10)
    assert(math.abs(c1.sum) < 0.15, s"ltsa1 mean ${c1.sum / 60}")
    assert(run(blobs.repartition(7)) == out)
  }

  test("Hessian-LLE estimator columns are ⊥ ones and the embedding is stable") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Manifold.hessianSampledExact(df, "id", "vec", dims = 8, n = 60,
          kNei = 8, locIters = 20, iters = 40)
        .orderBy("id").as[(Long, Double, Double)].collect().toSeq
    val out = run(blobs)
    assert(out.length == 60)
    val c1 = out.map(_._2); val c2 = out.map(_._3)
    assert(math.abs(math.sqrt(c1.map(v => v * v).sum) - 1.0) < 1e-3)
    assert(c1.distinct.length > 10 && c2.distinct.length > 10)
    // M = Σ wwᵀ with every w-column orthogonal to ones per neighborhood
    // (QR against the leading 1-column) ⇒ the constant deflation is
    // exact and the returned coordinates stay ≈centered
    assert(math.abs(c1.sum) < 0.15, s"hes1 mean ${c1.sum / 60}")
    assert(run(blobs.repartition(7)) == out)
  }

  test("modified-LLE embedding is unit-norm, centered, and partition-stable") {
    // MLLE's W columns each sum to 1 by the Householder identity
    // (Wᵀ1 = α·1 + (1−α)·1), so M stays ones-null and the analytic
    // constant deflation is exact — same observable contract as the
    // other variants: unit-norm, non-collapsed, ≈⊥ constant,
    // deterministic under repartitioning.
    def run(df: org.apache.spark.sql.DataFrame) =
      Manifold.mlleSampledExact(df, "id", "vec", dims = 8, n = 60,
          kNei = 5, locIters = 16, iters = 40)
        .orderBy("id").as[(Long, Double, Double)].collect().toSeq
    val out = run(blobs)
    assert(out.length == 60)
    val c1 = out.map(_._2); val c2 = out.map(_._3)
    assert(math.abs(math.sqrt(c1.map(v => v * v).sum) - 1.0) < 1e-3)
    assert(c1.distinct.length > 10 && c2.distinct.length > 10)
    assert(math.abs(c1.sum) < 0.15, s"mlle1 mean ${c1.sum / 60}")
    assert(run(blobs.repartition(7)) == out)
    // k > dims would enter sklearn's full_matrices SVD branch whose
    // null-space basis is implementation-defined — refuse loudly
    val ex = intercept[IllegalArgumentException] {
      Manifold.mlleSampledExact(blobs, "id", "vec", dims = 4, n = 60,
        kNei = 5, locIters = 16, iters = 40)
    }
    assert(ex.getMessage.contains("k <= dims"))
  }

  test("deterministic across partitionings") {
    val a = Manifold.tsneSampled(blobs, "id", "vec", 40, 10.0, 100)
      .orderBy("id").as[(Long, Double, Double)].collect().toSeq
    val b = Manifold.tsneSampled(blobs.repartition(7), "id", "vec", 40, 10.0, 100)
      .orderBy("id").as[(Long, Double, Double)].collect().toSeq
    assert(a == b)
  }
}
