package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Tables._

/** FreeViz projection (reference Orange/projection/freeviz.py:241-383;
  * Demšar/Leban/Zupan, IDAMAP 2005): anchors A (one per feature) are
  * optimized so same-class points attract (force −d) and different-class
  * points repel (force 1/d) in the projected plane; the gradient
  * transfers pairwise forces to anchors via G = Xᵀ·F, steps are scaled
  * so the largest anchor moves α·radius, anchors re-centered and
  * re-scaled to the unit disc each step (freeviz.py:340-366).
  *
  * Spark decomposition: center/scale statistics come from ONE
  * distributed aggregation over the full table; the O(N²) force loop
  * fits on a deterministic ≤`sampleN` sample (the same sampled-matrix
  * contract as MDS/t-SNE/hierarchical); the final projection X·A is a
  * narrow codegen'd expression per row — fully distributed, like the
  * Radviz scorer. Deterministic: radial init (freeviz.py:385), fixed
  * iteration schedule, no RNG. */
object FreeViz {

  /** Fit anchors and append (fv1, fv2) projection columns.
    * @return (per-feature anchors (feature, a1, a2), projected frame) */
  def fitProject(df: DataFrame, idCol: String, feats: Seq[String],
                 classCol: String, sampleN: Int = 300, maxiter: Int = 200,
                 alpha: Double = 0.1): (Seq[(String, Double, Double)], DataFrame) = {
    val p = feats.size
    require(p >= 2, "FreeViz needs at least 2 features")
    // center/scale from the full table (Scale.Span analogue uses std —
    // freeviz.py:322 scales by per-column std)
    val aggExprs = feats.map(f => exactMean(col(f)).as(s"mu_$f")) ++
      feats.map(f => exactStdSamp(col(f)).as(s"sd_$f"))
    val stats = df.agg(aggExprs.head, aggExprs.tail: _*).head()
    val mu = feats.indices.map(i => stats.getDouble(i)).toArray
    val sd = feats.indices.map(i =>
      math.max(stats.getDouble(p + i), 1e-12)).toArray

    // deterministic sample for the O(N²) force fit (smallest ids)
    val rows = df.orderBy(col(idCol))
      .select(col(classCol).cast("string") +:
        feats.map(f => col(f).cast("double")): _*)
      .limit(sampleN).collect()
    val n = rows.length
    val y = rows.map(_.getString(0))
    val x = rows.map(r => Array.tabulate(p)(i =>
      (r.getDouble(i + 1) - mu(i)) / sd(i)))

    // radial anchor init (freeviz.py:385): unit circle, deterministic
    var a = Array.tabulate(p)(j => Array(
      math.cos(2 * math.Pi * j / p), math.sin(2 * math.Pi * j / p)))
    var it = 0
    var done = false
    while (it < maxiter && !done) {
      val e = x.map(xi => Array(
        (0 until p).map(j => xi(j) * a(j)(0)).sum,
        (0 until p).map(j => xi(j) * a(j)(1)).sum))
      // pairwise forces → per-point force vectors
      val fv = Array.ofDim[Double](n, 2)
      for (i <- 0 until n; j <- 0 until n if i != j) {
        val d0 = e(i)(0) - e(j)(0); val d1 = e(i)(1) - e(j)(1)
        val dist = math.sqrt(d0 * d0 + d1 * d1)
        if (dist > 1e-12) {
          // reference convention (freeviz.py:130-185): the force summed
          // onto a particle uses the unit vector FROM it TOWARD the
          // other point, so attraction (f<0) pushes apart-moving pairs
          // back together under the A − step·G descent step
          val f = if (y(i) == y(j)) -dist else 1.0 / dist
          fv(i)(0) -= d0 / dist * f; fv(i)(1) -= d1 / dist * f
        }
      }
      // G = Xᵀ·F
      val g = Array.tabulate(p)(j => Array(
        (0 until n).map(i => x(i)(j) * fv(i)(0)).sum,
        (0 until n).map(i => x(i)(j) * fv(i)(1)).sum))
      // step = α · min(|a_j| / |g_j|)
      val ratios = (0 until p).flatMap { j =>
        val gn = math.hypot(g(j)(0), g(j)(1))
        if (gn > 0) Some(math.hypot(a(j)(0), a(j)(1)) / gn) else None }
      if (ratios.isEmpty) done = true
      else {
        val step = alpha * ratios.min
        var next = a.zip(g).map { case (aj, gj) =>
          Array(aj(0) - step * gj(0), aj(1) - step * gj(1)) }
        val m0 = next.map(_(0)).sum / p; val m1 = next.map(_(1)).sum / p
        next = next.map(v => Array(v(0) - m0, v(1) - m1))
        val maxr = next.map(v => math.hypot(v(0), v(1))).max
        if (maxr >= 0.001) next = next.map(v => Array(v(0) / maxr, v(1) / maxr))
        val change = a.zip(next)
          .map { case (u, v) => math.hypot(u(0) - v(0), u(1) - v(1)) }.max
        a = next
        if (change < 1e-5) done = true
      }
      it += 1
    }
    val anchors = feats.indices.map(j => (feats(j),
      math.rint(a(j)(0) * 1e6) / 1e6, math.rint(a(j)(1) * 1e6) / 1e6))
    // distributed projection with the fitted anchors as literals
    def proj(c: Int): Column = feats.zipWithIndex.map { case (f, j) =>
      val av = if (c == 0) anchors(j)._2 else anchors(j)._3
      (col(f).cast("double") - mu(j)) / sd(j) * av }.reduce(_ + _)
    (anchors, df
      .withColumn("fv1", round(proj(0), 6))
      .withColumn("fv2", round(proj(1), 6)))
  }
}
