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

  test("deterministic across partitionings") {
    val a = Manifold.tsneSampled(blobs, "id", "vec", 40, 10.0, 100)
      .orderBy("id").as[(Long, Double, Double)].collect().toSeq
    val b = Manifold.tsneSampled(blobs.repartition(7), "id", "vec", 40, 10.0, 100)
      .orderBy("id").as[(Long, Double, Double)].collect().toSeq
    assert(a == b)
  }
}
