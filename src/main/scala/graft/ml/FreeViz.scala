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

  // ---- oracle-exact variant ------------------------------------------

  private def rAway(v: Double, pow: Double): Double = {
    val p = v * pow
    (if (p >= 0) math.floor(p + 0.5) else math.ceil(p - 0.5)) / pow
  }
  private def r12(v: Double): Double = rAway(v, 1e12)
  private def r6(v: Double): Double = rAway(v, 1e6)

  /** Order-independent exact sum of 1e-6-grid doubles at DECIMAL(38,8)
    * — wide enough that force terms up to ~1e7 stay on the unambiguous
    * side of the double→decimal boundary (ulp ≪ half-grid). */
  private def dec8Sum(ts: IterableOnce[Double]): Double = {
    var acc = java.math.BigDecimal.ZERO
    ts.iterator.foreach { t =>
      acc = acc.add(java.math.BigDecimal.valueOf(t)
        .setScale(8, java.math.RoundingMode.HALF_UP))
    }
    acc.doubleValue()
  }

  /** [[fitProject]] with a fully reproducible trajectory — the
    * oracle-exact twin: fixed iteration count (no early stop), radial
    * init inlined as literals on both engines, repulsion clamped at
    * dist ≥ 0.01 (bounds every decimal-summed force term), per-point
    * force and anchor-gradient reductions through 1e-6-grid terms and
    * DECIMAL(38,8) sums, anchors re-rounded to the 1e-12 grid per step.
    * Center/scale statistics use the exactMean/exactStdSamp device (the
    * same DECIMAL forms as the SQL twin). Distributed contract
    * unchanged: one stats scan, O(sample²) force fit, codegen'd X·A
    * projection over all rows. */
  def fitProjectExact(df: DataFrame, idCol: String, feats: Seq[String],
                      classCol: String, sampleN: Int, iters: Int,
                      alpha: Double = 0.1)
      : (Seq[(String, Double, Double)], DataFrame) = {
    val p = feats.size
    require(p >= 2, "FreeViz needs at least 2 features")
    // stats through the FINE-grid detSum device (round-12 →
    // DECIMAL(38,14)), not exactMean's DECIMAL(38,6): float-promoted
    // inputs often have a shortest decimal repr ending exactly at the
    // 1e-6 half boundary, where Spark's shortest-repr cast and
    // DuckDB's exact-binary cast disagree — at scale 14 the boundary
    // is unreachable (ulp ≪ half-grid).
    def dMean(c: Column): Column = detSum(c) / count(c)
    def dStd(c: Column): Column = {
      val s = detSum(c); val ss = detSum(c * c); val n = count(c)
      sqrt((ss - s * s / n) / (n - lit(1)))
    }
    val aggExprs = feats.map(f => dMean(col(f)).as(s"mu_$f")) ++
      feats.map(f => dStd(col(f)).as(s"sd_$f"))
    val stats = df.agg(aggExprs.head, aggExprs.tail: _*).head()
    val mu = feats.indices.map(i => stats.getDouble(i)).toArray
    val sd = feats.indices.map(i =>
      math.max(stats.getDouble(p + i), 1e-12)).toArray
    val rows = df.orderBy(col(idCol))
      .select(col(classCol).cast("string") +:
        feats.map(f => col(f).cast("double")): _*)
      .limit(sampleN).collect()
    val n = rows.length
    val y = rows.map(_.getString(0))
    val x = rows.map(r => Array.tabulate(p)(i =>
      (r.getDouble(i + 1) - mu(i)) / sd(i)))
    var a = initAnchors(p)
    for (_ <- 1 to iters) {
      val e = x.map(xi => Array(
        (0 until p).map(j => xi(j) * a(j)(0)).reduceLeft(_ + _),
        (0 until p).map(j => xi(j) * a(j)(1)).reduceLeft(_ + _)))
      val fv = Array.tabulate(n) { i =>
        def terms(c: Int) = (0 until n).iterator.filter(_ != i).flatMap { j =>
          val d0 = e(i)(0) - e(j)(0); val d1 = e(i)(1) - e(j)(1)
          val dist = math.sqrt(d0 * d0 + d1 * d1)
          if (dist > 1e-12) {
            val f = if (y(i) == y(j)) -dist else 1.0 / math.max(dist, 0.01)
            Some(r6(-(if (c == 0) d0 else d1) / dist * f))
          } else None
        }
        Array(dec8Sum(terms(0)), dec8Sum(terms(1)))
      }
      val g = Array.tabulate(p)(j => Array(
        dec8Sum((0 until n).iterator.map(i => r6(x(i)(j) * fv(i)(0)))),
        dec8Sum((0 until n).iterator.map(i => r6(x(i)(j) * fv(i)(1))))))
      val ratios = (0 until p).flatMap { j =>
        val gn = math.sqrt(g(j)(0) * g(j)(0) + g(j)(1) * g(j)(1))
        if (gn > 0)
          Some(math.sqrt(a(j)(0) * a(j)(0) + a(j)(1) * a(j)(1)) / gn)
        else None
      }
      if (ratios.nonEmpty) {
        val step = alpha * ratios.min
        var next = a.zip(g).map { case (aj, gj) =>
          Array(aj(0) - step * gj(0), aj(1) - step * gj(1)) }
        val m0 = next.map(_(0)).reduceLeft(_ + _) / p
        val m1 = next.map(_(1)).reduceLeft(_ + _) / p
        next = next.map(v => Array(v(0) - m0, v(1) - m1))
        val maxr = next
          .map(v => math.sqrt(v(0) * v(0) + v(1) * v(1))).max
        if (maxr >= 0.001)
          next = next.map(v => Array(v(0) / maxr, v(1) / maxr))
        a = next.map(v => Array(r12(v(0)), r12(v(1))))
      }
    }
    val anchors = feats.indices.map(j =>
      (feats(j), r6(a(j)(0)), r6(a(j)(1))))
    def proj(c: Int): Column = feats.zipWithIndex.map { case (f, j) =>
      val av = if (c == 0) anchors(j)._2 else anchors(j)._3
      (col(f).cast("double") - mu(j)) / sd(j) * av }.reduce(_ + _)
    // RAW projections: downstream reductions go through the DECIMAL
    // devices; per-row 6-decimal rounding would re-introduce the
    // Spark-vs-DuckDB boundary-tie ambiguity on every row.
    (anchors, df
      .withColumn("fv1", proj(0))
      .withColumn("fv2", proj(1)))
  }

  /** Deterministic radial anchor init (freeviz.py:385) — computed once
    * on the driver and inlined as LITERALS into the SQL twin, so no
    * libm cos/sin crosses the engine boundary. */
  private def initAnchors(p: Int): Array[Array[Double]] =
    Array.tabulate(p)(j => Array(
      math.cos(2 * math.Pi * j / p), math.sin(2 * math.Pi * j / p)))

  /** DuckDB twin of [[fitProjectExact]]: iterations unroll as
    * (embed → pair forces → anchor gradient → step → anchors) CTE
    * blocks; the final CTE `proj(cls, fv1, fv2)` projects every row of
    * `table` — the caller appends its SELECT. */
  def fitProjectExactSql(table: String, idSql: String,
                         featsSql: Seq[(String, String)], clsSql: String,
                         sampleN: Int, iters: Int,
                         alpha: Double = 0.1): String = {
    val p = featsSql.size
    val names = featsSql.map(_._1)
    def dl(v: Double): String = if (v < 0) s"($v)" else v.toString
    val a0 = initAnchors(p)
    def det8(t: String) =
      s"CAST(SUM(CAST(ROUND(($t), 6) AS DECIMAL(38,8))) AS DOUBLE) "
    val an0 =
      s"""an0 AS (SELECT ${(0 until p).flatMap(j => Seq(
           s"CAST(${dl(a0(j)(0))} AS DOUBLE) AS a_${j}_0",
           s"CAST(${dl(a0(j)(1))} AS DOUBLE) AS a_${j}_1")).mkString(", ")})"""
    val iterCtes = (1 to iters).flatMap { t =>
      val an = s"an${t - 1}"
      val e0 = (0 until p).map(j => s"x_${names(j)} * a_${j}_0")
        .mkString(" + ")
      val e1 = (0 until p).map(j => s"x_${names(j)} * a_${j}_1")
        .mkString(" + ")
      val gCols = (0 until p).flatMap(j => Seq(
        det8(s"s.x_${names(j)} * COALESCE(f.f0, 0.0)") + s"AS g_${j}_0",
        det8(s"s.x_${names(j)} * COALESCE(f.f1, 0.0)") + s"AS g_${j}_1"))
      val ratios = (0 until p).map { j =>
        s"CASE WHEN SQRT(g_${j}_0 * g_${j}_0 + g_${j}_1 * g_${j}_1) > 0 " +
          s"THEN SQRT(a_${j}_0 * a_${j}_0 + a_${j}_1 * a_${j}_1) / " +
          s"SQRT(g_${j}_0 * g_${j}_0 + g_${j}_1 * g_${j}_1) END"
      }
      val nextCols = (0 until p).flatMap(j => Seq(
        s"a_${j}_0 - stp * g_${j}_0 AS n_${j}_0",
        s"a_${j}_1 - stp * g_${j}_1 AS n_${j}_1"))
      val m0 = (0 until p).map(j => s"n_${j}_0").mkString(" + ")
      val m1 = (0 until p).map(j => s"n_${j}_1").mkString(" + ")
      val maxr = s"GREATEST(${(0 until p).map(j =>
        s"SQRT((n_${j}_0 - m0) * (n_${j}_0 - m0) + " +
          s"(n_${j}_1 - m1) * (n_${j}_1 - m1))").mkString(", ")})"
      val finalCols = (0 until p).flatMap(j => Seq(0, 1).map { c =>
        s"CASE WHEN stp IS NULL THEN a_${j}_$c ELSE " +
          s"ROUND(CASE WHEN maxr >= 0.001 THEN (n_${j}_$c - m$c) / maxr " +
          s"ELSE n_${j}_$c - m$c END, 12) END AS a_${j}_$c"
      })
      Seq(
        s"""em$t AS MATERIALIZED (
           |  SELECT id, cls, ${names.map(n => s"x_$n").mkString(", ")},
           |    ($e0) AS e0, ($e1) AS e1
           |  FROM samp CROSS JOIN $an)""".stripMargin,
        s"""fv$t AS MATERIALIZED (
           |  SELECT a.id,
           |    ${det8("-((a.e0 - b.e0) / SQRT((a.e0 - b.e0) * (a.e0 - b.e0)" +
               " + (a.e1 - b.e1) * (a.e1 - b.e1))) * (CASE WHEN a.cls = b.cls" +
               " THEN -SQRT((a.e0 - b.e0) * (a.e0 - b.e0) + (a.e1 - b.e1) *" +
               " (a.e1 - b.e1)) ELSE 1.0 / GREATEST(SQRT((a.e0 - b.e0) *" +
               " (a.e0 - b.e0) + (a.e1 - b.e1) * (a.e1 - b.e1)), 0.01) END)")}AS f0,
           |    ${det8("-((a.e1 - b.e1) / SQRT((a.e0 - b.e0) * (a.e0 - b.e0)" +
               " + (a.e1 - b.e1) * (a.e1 - b.e1))) * (CASE WHEN a.cls = b.cls" +
               " THEN -SQRT((a.e0 - b.e0) * (a.e0 - b.e0) + (a.e1 - b.e1) *" +
               " (a.e1 - b.e1)) ELSE 1.0 / GREATEST(SQRT((a.e0 - b.e0) *" +
               " (a.e0 - b.e0) + (a.e1 - b.e1) * (a.e1 - b.e1)), 0.01) END)")}AS f1
           |  FROM em$t a JOIN em$t b ON a.id <> b.id
           |  WHERE SQRT((a.e0 - b.e0) * (a.e0 - b.e0) +
           |        (a.e1 - b.e1) * (a.e1 - b.e1)) > 1e-12
           |  GROUP BY a.id)""".stripMargin,
        s"""gr$t AS MATERIALIZED (
           |  SELECT ${gCols.mkString(",\n    ")}
           |  FROM samp s LEFT JOIN fv$t f ON f.id = s.id)""".stripMargin,
        s"""st$t AS (SELECT $alpha * LEAST(${ratios.mkString(",\n    ")})
           |  AS stp FROM gr$t CROSS JOIN $an)""".stripMargin,
        s"""an$t AS MATERIALIZED (
           |  SELECT ${finalCols.mkString(",\n    ")}
           |  FROM (SELECT *, ($m0) / $p AS m0, ($m1) / $p AS m1,
           |      $maxr AS maxr
           |    FROM (SELECT ${nextCols.mkString(", ")}, stp,
           |        ${(0 until p).flatMap(j =>
               Seq(s"a_${j}_0", s"a_${j}_1")).mkString(", ")}
           |      FROM $an CROSS JOIN gr$t CROSS JOIN st$t) t1
           |  ) t2)""".stripMargin)
    }
    val projCols = (0 until 2).map { c =>
      (0 until p).map(j =>
        s"(CAST(${featsSql(j)._2} AS DOUBLE) - mu_${names(j)}) / " +
          s"sd_${names(j)} * ROUND(a_${j}_$c, 6)").mkString(" + ")
    }
    def sqlDMean(x: String) =
      s"${graft.queries.SqlGen.sqlDetSum(x)} / COUNT($x)"
    def sqlDStd(x: String) = {
      val s = graft.queries.SqlGen.sqlDetSum(x)
      val ss = graft.queries.SqlGen.sqlDetSum(s"($x)*($x)")
      s"SQRT(($ss - $s * $s / COUNT($x)) / (COUNT($x) - 1))"
    }
    s"""WITH stats AS MATERIALIZED (
       |  SELECT ${names.zip(featsSql.map(_._2)).map { case (n, ex) =>
           s"${sqlDMean(ex)} AS mu_$n, " +
             s"GREATEST(${sqlDStd(ex)}, 1e-12) AS sd_$n"
         }.mkString(",\n    ")}
       |  FROM $table),
       |samp AS MATERIALIZED (
       |  SELECT id, cls, ${names.map(n => s"x_$n").mkString(", ")}
       |  FROM (SELECT $idSql AS id, CAST(($clsSql) AS VARCHAR) AS cls,
       |    ${featsSql.map { case (n, ex) =>
           s"(CAST($ex AS DOUBLE) - mu_$n) / sd_$n AS x_$n" }
           .mkString(",\n    ")}
       |  FROM $table CROSS JOIN stats ORDER BY 1 LIMIT $sampleN) t),
       |$an0,
       |${iterCtes.mkString(",\n")},
       |proj AS (
       |  SELECT CAST(($clsSql) AS VARCHAR) AS cls,
       |    (${projCols(0)}) AS fv1,
       |    (${projCols(1)}) AS fv2
       |  FROM $table CROSS JOIN stats CROSS JOIN an$iters)
       |""".stripMargin
  }

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
