package graft

import org.apache.spark.sql.functions._
import graft.ml.FreeViz

/** FreeViz force-optimized projection (freeviz.py:241-383). */
class FreeVizSpec extends SparkSpec {
  import spark.implicits._

  // two classes, separable along a latent direction mixed into 3 features
  private def data = (1 to 120).map { i =>
    val c = if (i % 2 == 0) "a" else "b"
    val latent = if (c == "a") 1.0 else -1.0
    (i.toLong, c,
      latent * 2.0 + math.sin(i * 0.7) * 0.3,
      -latent * 1.5 + math.cos(i * 1.1) * 0.3,
      math.sin(i * 1.9) * 0.5) // noise feature
  }.toDF("id", "cls", "f1", "f2", "f3")

  test("classes separate in the projected plane; anchors inside unit disc") {
    val (anchors, proj) = FreeViz.fitProject(
      data, "id", Seq("f1", "f2", "f3"), "cls", sampleN = 120)
    assert(anchors.size == 3)
    // anchors are unit-disc scaled, then rounded to the 1e-6 grid
    assert(anchors.forall { case (_, a1, a2) => math.hypot(a1, a2) <= 1.0 + 1e-5 })
    val pts = proj.select("cls", "fv1", "fv2")
      .as[(String, Double, Double)].collect()
    val (pa, pb) = pts.partition(_._1 == "a")
    def c(g: Array[(String, Double, Double)]) =
      (g.map(_._2).sum / g.length, g.map(_._3).sum / g.length)
    def spread(g: Array[(String, Double, Double)], ctr: (Double, Double)) =
      g.map(q => math.hypot(q._2 - ctr._1, q._3 - ctr._2)).sum / g.length
    val (ca, cb) = (c(pa), c(pb))
    val gap = math.hypot(ca._1 - cb._1, ca._2 - cb._2)
    assert(gap > 2 * math.max(spread(pa, ca), spread(pb, cb)),
      s"gap $gap spreads ${spread(pa, ca)} ${spread(pb, cb)}")
    // the informative features should out-weigh the noise anchor
    val r = anchors.map { case (f, a1, a2) => f -> math.hypot(a1, a2) }.toMap
    assert(r("f3") < math.max(r("f1"), r("f2")))
  }

  test("deterministic across partitionings") {
    val a = FreeViz.fitProject(data, "id", Seq("f1", "f2", "f3"), "cls")._2
      .orderBy("id").select("fv1", "fv2").as[(Double, Double)].collect().toSeq
    val b = FreeViz.fitProject(data.repartition(7), "id",
        Seq("f1", "f2", "f3"), "cls")._2
      .orderBy("id").select("fv1", "fv2").as[(Double, Double)].collect().toSeq
    assert(a == b)
  }
}
