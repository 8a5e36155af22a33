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
                             beta: Seq[Double],
                             trainRmse: Double = Double.NaN) {
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
    // pass 1: means on the same sum grid as the moment aggregation
    val meansRow = df.agg(
      (sumFn(col(target)) / count(col(target))).as("__my"),
      features.map(f =>
        (sumFn(col(f)) / count(col(f))).as(s"__m_$f")) :+
        count(col(target)).as("__n"): _*)
      .first()
    val nRows = meansRow.getLong(meansRow.fieldIndex("__n"))
    val my = meansRow.getDouble(0)
    val mx = features.zipWithIndex.map { case (f, i) =>
      meansRow.getDouble(i + 1) }
    val xc = features.zip(mx).map { case (f, m) =>
      col(f).cast("double") - lit(m) }
    val yc = col(target).cast("double") - lit(my)

    // pass 2: ALL sufficient statistics at once — the d×d centered
    // scatter S = Xc'Xc and b = Xc'yc. Every NIPALS quantity is moment
    // algebra (t = Xw is never materialized: t't = w'Sw, X't = Sw,
    // y't = w'b; deflation X←X(I − wp') maps S←(I−pw')S(I−wp'),
    // b←(I−pw')(b − b̂·Sw)), so the whole A-component fit is TWO
    // distributed scans + O(A·d²) driver arithmetic, where the
    // data-side NIPALS paid 1+2A scans — and, crucially, the only
    // distributed sums are of RAW centered products (O(0.1)
    // magnitudes), so no deflated-to-1e-6 products ever meet the sum
    // grid, which is what had broken the A=d ⇒ OLS identity.
    val momAggs =
      (for { i <- 0 until d; j <- i until d } yield
        sumFn(xc(i) * xc(j)).as(s"__s_${i}_$j")) ++
      features.indices.map(i => sumFn(xc(i) * yc).as(s"__b_$i")) :+
      sumFn(yc * yc).as("__syy")
    val momRow = df.agg(momAggs.head, momAggs.tail: _*).first()
    val sMat = Array.ofDim[Double](d, d)
    for (i <- 0 until d; j <- i until d) {
      val v = momRow.getDouble(momRow.fieldIndex(s"__s_${i}_$j"))
      sMat(i)(j) = v; sMat(j)(i) = v
    }
    var bVec = Array.tabulate(d)(i =>
      momRow.getDouble(momRow.fieldIndex(s"__b_$i")))
    val bOrig = bVec.clone()
    val syy = momRow.getDouble(momRow.fieldIndex("__syy"))
    var sCur = sMat.map(_.clone())

    def matVec(m: Array[Array[Double]], v: Array[Double]): Array[Double] =
      Array.tabulate(d)(i => (0 until d).map(j => m(i)(j) * v(j)).sum)
    def dot(u: Array[Double], v: Array[Double]): Double =
      (0 until d).map(i => u(i) * v(i)).sum

    val ws = Array.ofDim[Double](a, d)
    val ps = Array.ofDim[Double](a, d)
    val bs = Array.ofDim[Double](a)
    for (c <- 0 until a) {
      val wNorm = math.sqrt(dot(bVec, bVec))
      require(wNorm > 1e-12, s"PLS component ${c + 1}: degenerate weights")
      val w = bVec.map(_ / wNorm)
      val sw = matVec(sCur, w)
      val tt = dot(w, sw)
      require(tt > 1e-12, s"PLS component ${c + 1}: zero score variance")
      val p = sw.map(_ / tt)
      val bc = dot(w, bVec) / tt
      ws(c) = w; ps(c) = p; bs(c) = bc
      // deflate the moments: S ← (I − p wᵀ) S (I − w pᵀ), b ← (I − p wᵀ)(b − b̂·Sw)
      val bMinus = Array.tabulate(d)(i => bVec(i) - bc * sw(i))
      val wb = dot(w, bMinus)
      bVec = Array.tabulate(d)(i => bMinus(i) - p(i) * wb)
      val sRight = Array.tabulate(d, d) { (i, j) =>
        sCur(i)(j) - sw(i) * p(j) } // S(I − w pᵀ) since Sw is symmetric-applied
      val wSRight = Array.tabulate(d)(j =>
        (0 until d).map(i => w(i) * sRight(i)(j)).sum)
      sCur = Array.tabulate(d, d) { (i, j) =>
        sRight(i)(j) - p(i) * wSRight(j) }
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
    // training RMSE from the same moments (no further scan):
    // SSR = syy − 2β'b + β'Sβ
    val ssr = syy -
      2.0 * (0 until d).map(i => beta(i) * bOrig(i)).sum +
      (for { i <- 0 until d; j <- 0 until d } yield
        beta(i) * beta(j) * sMat(i)(j)).sum
    val rmse = math.sqrt(math.max(ssr, 0.0) / nRows)
    PLS1Model(features, intercept, beta, rmse)
  }
}
