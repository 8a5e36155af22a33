package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Tables._

/** PLS1 regression (reference Orange/regression/pls.py, which wraps
  * sklearn PLSRegression — NIPALS). Spark-native NIPALS for a single
  * response:
  *
  * per component (A total):
  *   w = X'y / ‖X'y‖        — ONE aggregation (d exact sums)
  *   t = X w                 — row expression (no materialization)
  *   p = X't / t't, b = y't / t't — ONE aggregation (d+1 sums)
  *   deflate X ← X − t p', y ← y − b t — composed into the column
  *   expressions of the next component (no intermediate table)
  *
  * so a fit is exactly 2A aggregations over the data + one final model:
  * β = W (P'W)⁻¹ b̂ (driver-side A×A solve), intercept = ȳ − x̄'β.
  * All sums go through the exact decimal path → partition-order
  * independent (PLSSpec pins determinism and the A=d ⇒ OLS identity).
  */
object PLS {

  final case class PLS1Model(features: Seq[String], intercept: Double,
                             beta: Seq[Double]) {
    def predictExpr: Column =
      features.zip(beta).map { case (f, b) => col(f) * lit(b) }
        .foldLeft(lit(intercept))(_ + _)
    def predict(df: DataFrame): DataFrame =
      df.withColumn("prediction", predictExpr)
  }

  def fit(df: DataFrame, features: Seq[String], target: String,
          nComponents: Int,
          sumFn: Column => Column = graft.core.Tables.exactSum _): PLS1Model = {
    val d = features.length
    val a = math.min(nComponents, d)
    // center (means on the same sum grid as the component aggregations)
    val meansRow = df.agg(
      (sumFn(col(target)) / count(col(target))).as("__my"),
      features.map(f =>
        (sumFn(col(f)) / count(col(f))).as(s"__m_$f")): _*)
      .first()
    val my = meansRow.getDouble(0)
    val mx = features.zipWithIndex.map { case (f, i) =>
      meansRow.getDouble(i + 1) }
    var xCols: Seq[Column] = features.zip(mx).map { case (f, m) =>
      col(f).cast("double") - lit(m) }
    var yCol: Column = col(target).cast("double") - lit(my)

    val ws = Array.ofDim[Double](a, d)
    val ps = Array.ofDim[Double](a, d)
    val bs = Array.ofDim[Double](a)

    for (c <- 0 until a) {
      // w = X'y, normalized
      val xyAgg = df.agg(sumFn(xCols.head * yCol).as("s0"),
        xCols.tail.zipWithIndex.map { case (xc, i) =>
          sumFn(xc * yCol).as(s"s${i + 1}") }: _*).first()
      val wRaw = (0 until d).map(xyAgg.getDouble)
      val wNorm = math.sqrt(wRaw.map(v => v * v).sum)
      require(wNorm > 1e-12, s"PLS component ${c + 1}: degenerate weights")
      val w = wRaw.map(_ / wNorm)
      val t = xCols.zip(w).map { case (xc, wi) => xc * lit(wi) }.reduce(_ + _)
      // p = X't / t't, b = y't / t't
      val ptAgg = df.agg(sumFn(t * t).as("tt"),
        (features.indices.map(i => sumFn(xCols(i) * t).as(s"p$i")) :+
          sumFn(yCol * t).as("yt")): _*).first()
      val tt = ptAgg.getDouble(0)
      require(tt > 1e-12, s"PLS component ${c + 1}: zero score variance")
      val p = (0 until d).map(i => ptAgg.getDouble(i + 1) / tt)
      val b = ptAgg.getDouble(d + 1) / tt
      ws(c) = w.toArray; ps(c) = p.toArray; bs(c) = b
      // deflate into the next component's expressions
      xCols = xCols.zip(p).map { case (xc, pi) => xc - t * lit(pi) }
      yCol = yCol - t * lit(b)
    }

    // β = W (P'W)⁻¹ b̂  (a × a solve on the driver)
    val ptw = Array.tabulate(a, a)((i, j) =>
      (0 until d).map(k => ps(i)(k) * ws(j)(k)).sum)
    val inv = graft.operators.OutlierOps.invertGaussJordan(ptw)
    val alpha = (0 until a).map(i =>
      (0 until a).map(j => inv(i)(j) * bs(j)).sum)
    val beta = (0 until d).map(k =>
      (0 until a).map(c => ws(c)(k) * alpha(c)).sum)
    val intercept = my - features.indices.map(i => mx(i) * beta(i)).sum
    PLS1Model(features, intercept, beta)
  }
}
