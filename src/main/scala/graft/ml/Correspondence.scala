package graft.ml

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Correspondence analysis of a two-way contingency table
  * (widgets/unsupervised/owcorrespondence.py:381-421 `correspondence`):
  * generalized SVD of the centered correspondence matrix P − r·cᵀ with
  * row/column-mass weights, giving principal row/column coordinates
  * F = Dᵣ⁻¹·U·Δ and G = D꜀⁻¹·Vᵀ·Δ; per-axis inertia is Δ² and total
  * inertia equals χ²/N.
  *
  * Scale shape: the ONLY distributed stage is the contingency groupBy —
  * its k×c result is driver-bounded by the categorical cardinalities, so
  * the SVD runs on a tiny dense matrix (same staging as the LDA and
  * N-D Mahalanobis closed forms). The SVD itself is a deterministic
  * one-sided Jacobi (no RNG, no library), with each singular vector's
  * sign pinned by its largest-magnitude component — reference signs are
  * LAPACK-arbitrary anyway. */
object Correspondence {

  /** One-sided Jacobi SVD of a small dense m×n matrix (m >= 1, n small).
    * Returns (U m×r, sv r, V n×r) with r = n, singular values
    * descending; zero singular values keep zero vectors. */
  private[graft] def jacobiSvd(a0: Array[Array[Double]])
      : (Array[Array[Double]], Array[Double], Array[Array[Double]]) = {
    val m = a0.length
    val n = a0(0).length
    // work on columns of A; V accumulates rotations
    val a = Array.tabulate(m, n)((i, j) => a0(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var rotated = true
    var sweep = 0
    while (rotated && sweep < 60) {
      rotated = false
      sweep += 1
      for (p <- 0 until n - 1; q <- p + 1 until n) {
        var app = 0.0; var aqq = 0.0; var apq = 0.0
        var i = 0
        while (i < m) {
          app += a(i)(p) * a(i)(p); aqq += a(i)(q) * a(i)(q)
          apq += a(i)(p) * a(i)(q); i += 1
        }
        if (math.abs(apq) > 1e-15 * math.sqrt(app * aqq) &&
            math.abs(apq) > 1e-300) {
          rotated = true
          val tau = (aqq - app) / (2.0 * apq)
          // tau == 0 (equal column norms) needs the full 45° rotation
          val t =
            if (tau == 0.0) 1.0
            else math.signum(tau) / (math.abs(tau) + math.sqrt(1 + tau * tau))
          val c = 1.0 / math.sqrt(1 + t * t)
          val s = c * t
          i = 0
          while (i < m) {
            val ap = a(i)(p); val aq = a(i)(q)
            a(i)(p) = c * ap - s * aq; a(i)(q) = s * ap + c * aq; i += 1
          }
          i = 0
          while (i < n) {
            val vp = v(i)(p); val vq = v(i)(q)
            v(i)(p) = c * vp - s * vq; v(i)(q) = s * vp + c * vq; i += 1
          }
        }
      }
    }
    // singular values = column norms; sort descending, pin signs
    val sv = Array.tabulate(n) { j =>
      math.sqrt((0 until m).map(i => a(i)(j) * a(i)(j)).sum)
    }
    val order = (0 until n).sortBy(j => -sv(j))
    val u = Array.ofDim[Double](m, n)
    val vOut = Array.ofDim[Double](n, n)
    val svOut = Array.ofDim[Double](n)
    order.zipWithIndex.foreach { case (j, k) =>
      svOut(k) = sv(j)
      // sign pin: largest-|component| of the right vector is positive
      val pivot = (0 until n).maxBy(i => (math.abs(v(i)(j)), -i))
      val sgn = if (v(pivot)(j) < 0) -1.0 else 1.0
      (0 until n).foreach(i => vOut(i)(k) = sgn * v(i)(j))
      if (sv(j) > 1e-300)
        (0 until m).foreach(i => u(i)(k) = sgn * a(i)(j) / sv(j))
    }
    (u, svOut, vOut)
  }

  /** Row principal coordinates + per-axis inertia. Output: one row per
    * (row_category, axis) with the coordinate, the axis inertia and the
    * axis' share of total inertia (what the widget displays on its axes).
    */
  def rowCoordinates(df: DataFrame, rowVar: Column, colVar: Column,
                     axes: Int = 2): DataFrame = {
    val spark = df.sparkSession
    val cells = df.where(rowVar.isNotNull && colVar.isNotNull)
      .groupBy(rowVar.as("r"), colVar.as("c"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.get(0).toString, r.get(1).toString, r.getLong(2)))
    val rows = cells.map(_._1).distinct.sorted
    val cols = cells.map(_._2).distinct.sorted
    val ri = rows.zipWithIndex.toMap
    val cj = cols.zipWithIndex.toMap
    val total = cells.map(_._3).sum.toDouble
    val p = Array.ofDim[Double](rows.length, cols.length)
    cells.foreach { case (r, c, n) => p(ri(r))(cj(c)) = n / total }
    val rMass = p.map(_.sum)
    val cMass = cols.indices.map(j => rows.indices.map(i => p(i)(j)).sum).toArray
    // B = Dr^{-1/2} (P − r cᵀ) Dc^{-1/2}  (gsvd with wu=1/r, wv=1/c)
    val b = Array.tabulate(rows.length, cols.length) { (i, j) =>
      if (rMass(i) <= 0 || cMass(j) <= 0) 0.0
      else (p(i)(j) - rMass(i) * cMass(j)) /
        math.sqrt(rMass(i)) / math.sqrt(cMass(j))
    }
    val (u, sv, _) = jacobiSvd(b)
    val k = math.min(axes, cols.length)
    val totalInertia = sv.map(d => d * d).sum
    val out = for {
      i <- rows.indices
      ax <- 0 until k
    } yield {
      // F = Dr^{-1} U Δ, with U here already Dr^{-1/2}-weighted via B
      val f = if (rMass(i) > 0) u(i)(ax) * sv(ax) / math.sqrt(rMass(i)) else 0.0
      Row(rows(i), ax, r6(f), r6(sv(ax) * sv(ax)),
        if (totalInertia > 0) r6(sv(ax) * sv(ax) / totalInertia) else 0.0)
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(out).asJava),
      StructType(Seq(
        StructField("category", StringType),
        StructField("axis", IntegerType, nullable = false),
        StructField("coord", DoubleType, nullable = false),
        StructField("inertia", DoubleType, nullable = false),
        StructField("inertia_share", DoubleType, nullable = false))))
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
