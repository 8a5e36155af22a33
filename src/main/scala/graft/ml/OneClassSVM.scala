package graft.ml

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
import graft.core.{PortableHash, Tables}

/** One-class SVM outlier detector (reference
  * Orange/classification/outlier_detection.py:17-180 OneClassSVMLearner,
  * sklearn OneClassSVM with RBF kernel).
  *
  * Distributed re-expression: the RBF kernel is approximated with
  * Random Fourier Features (Rahimi & Recht, "Random Features for
  * Large-Scale Kernel Machines", NIPS 2007) — z_j(x) = √(2/D)·cos(ω_j·x
  * + b_j) with ω ~ N(0, γ·2) and b ~ U[0, 2π] — turning the kernel
  * problem into a LINEAR one-class SVM (Schölkopf et al. 2001):
  *
  *   min_w,ρ  ½‖w‖² − ρ + 1/(νn) Σ max(0, ρ − w·z(x_i))
  *
  * solved by full-batch subgradient descent: each iteration is ONE
  * distributed aggregation (Σ z_i over the margin violators + their
  * count, detSum-reduced, weights broadcast) — the same iterative-ML
  * shape as SGD.scala, linear per pass at any scale.
  *
  * Determinism: ω/b come from md5-derived Box–Muller draws
  * (PortableHash), gradient sums reduce through detSum, and weights are
  * rounded to 10 decimals per step — same result every run, any
  * partitioning. */
object OneClassSVM {

  /** Deterministic uniform in (0,1) from a label. */
  private def u01(s: String): Double =
    (PortableHash.hash32(s) + 1.0) / 4294967297.0

  /** Box–Muller normal draw keyed by a label. */
  private def normal(s: String): Double = {
    val u1 = u01(s + "_u1"); val u2 = u01(s + "_u2")
    math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
  }

  /** Random Fourier Feature expressions for the given input columns:
    * D cosine features with frequencies baked in as literals. */
  def rffFeatures(xs: Seq[Column], d: Int, gamma: Double): Seq[Column] = {
    val scale = math.sqrt(2.0 * gamma)
    (0 until d).map { j =>
      val proj = xs.zipWithIndex.map { case (x, i) =>
        x * (scale * normal(s"rff_${j}_$i")) }.reduce(_ + _)
      val b = 2.0 * math.Pi * u01(s"rffb_$j")
      (cos(proj + b) * math.sqrt(2.0 / d)).as(s"z$j")
    }
  }

  /** Fit + score: returns input + (score, is_outlier) where score =
    * w·z − ρ (negative ⇒ outlier), rounded to 6 decimals.
    * @param nu    Schölkopf's ν — upper bound on the outlier fraction
    * @param d     number of Fourier features
    * @param gamma RBF width (sklearn's gamma) */
  def fitPredict(df: DataFrame, xs: Seq[(String, Column)], nu: Double = 0.1,
                 d: Int = 32, gamma: Double = 0.5, iterations: Int = 30,
                 lr: Double = 0.1): DataFrame = {
    val spark = df.sparkSession
    val feats = rffFeatures(xs.map(_._2), d, gamma)
    val base = df.select(col("*") +: feats: _*).cache()
    val n = base.count()
    require(n > 0, "empty input")

    val wSchema = StructType((0 until d).map(j =>
      StructField(s"wc$j", DoubleType, nullable = false)))
    def wDF(w: Array[Double]) = spark.createDataFrame(
      java.util.Arrays.asList(Row.fromSeq(w.toSeq)), wSchema)
    def margin = (0 until d).map(j => col(s"z$j") * col(s"wc$j")).reduce(_ + _)

    var w = Array.fill(d)(1.0 / d) // uniform init, deterministic
    var rho = 0.0
    val inv = 1.0 / (nu * n)
    for (_ <- 1 to iterations) {
      val withM = base.crossJoin(broadcast(wDF(w)))
        .withColumn("__viol", (margin < rho).cast("int"))
      val aggs = (0 until d).map(j =>
        Tables.detSum(when(col("__viol") === 1, col(s"z$j")).otherwise(0.0))
          .as(s"g$j")) :+ sum(col("__viol")).as("nv")
      val row = withM.agg(aggs.head, aggs.tail: _*).head()
      val nv = row.getLong(d)
      w = w.zipWithIndex.map { case (wi, j) =>
        val g = wi - inv * (if (row.isNullAt(j)) 0.0 else row.getDouble(j))
        math.rint((wi - lr * g) * 1e10) / 1e10 }
      rho = math.rint((rho - lr * (-1.0 + inv * nv)) * 1e10) / 1e10
    }
    // finishing step: at the optimum, ρ is the ν-quantile of the
    // projections w·z (Schölkopf's KKT condition) — set it exactly so
    // is_outlier flags the ν-fraction regardless of GD step-size. The
    // k-th smallest margin = max of the k smallest (value-based, no
    // row-order dependence).
    val k = math.max(1, math.floor(nu * n).toInt)
    val mCol = base.crossJoin(broadcast(wDF(w)))
      .select(margin.as("__m")).orderBy(col("__m").asc).limit(k)
      .agg(max(col("__m"))).head()
    rho = math.rint(mCol.getDouble(0) * 1e10) / 1e10
    val out = base.crossJoin(broadcast(wDF(w)))
      .withColumn("score", round(margin - rho, 6))
      .withColumn("is_outlier", (col("score") < 0).cast("int"))
      .drop((0 until d).map(j => s"wc$j"): _*)
      .drop((0 until d).map(j => s"z$j"): _*)
    base.unpersist()
    out
  }
}
