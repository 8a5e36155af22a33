package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Probability calibration and threshold optimization (reference
  * Orange/classification/calibration.py).
  *
  *  - [[optimizeThresholdCA]]: ThresholdLearner(OptimizeCA) — choose the
  *    decision threshold maximizing training CA; ties → threshold
  *    closest to 0.5, then smallest (the reference's tie rule,
  *    calibration.py:70-84). Scale shape mirrors Scoring.auc: ONE
  *    groupBy on the probability reduces the corpus to distinct probs,
  *    a running-total window orders only that small table — candidate
  *    thresholds ARE the distinct predicted probabilities, as in the
  *    reference's threshold curve.
  *  - [[thresholdPredict]]: ThresholdClassifier — predict positive iff
  *    p ≥ threshold (calibration.py:13-45).
  *  - [[plattCalibrate]]: CalibratedLearner(Sigmoid) — Platt scaling is
  *    a 1-D logistic regression of the outcome on the score; reuses the
  *    deterministic full-batch GD of SGD.logRegGD.
  */
object Calibration {

  /** Returns one row (threshold, ca, n): the CA-optimal threshold over
    * the distinct predicted probabilities. Predicting positive iff
    * p ≥ θ gives TP(θ) = Σ_{p≥θ} npos and TN(θ) = Σ_{p<θ} nneg. */
  def optimizeThresholdCA(df: DataFrame, isPos: Column, prob0: Column): DataFrame = {
    // same 1e-6 score grid as Scoring.onGrid: a floating-point
    // probability is snapped before it keys the threshold window, so the
    // window input is bounded by construction (probabilities ∈ [0,1] ⇒
    // ≤ 10⁶+1 grid rows)
    val prob = df.select(prob0.as("__g")).schema.head.dataType match {
      case org.apache.spark.sql.types.DoubleType |
           org.apache.spark.sql.types.FloatType => round(prob0, 6)
      case _ => prob0
    }
    val byP = df.groupBy(prob.as("__p")).agg(
      sum(when(isPos, 1L).otherwise(0L)).as("__np"),
      sum(when(isPos, 0L).otherwise(1L)).as("__nn"))
    val wAsc = Window.orderBy(col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDesc = Window.orderBy(col("__p").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byP
      .withColumn("__tp", sum(col("__np")).over(wDesc))
      .withColumn("__tn", sum(col("__nn")).over(wAsc) - col("__nn"))
      .withColumn("__n", sum(col("__np") + col("__nn"))
        .over(Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .withColumn("__ca",
        (col("__tp") + col("__tn")).cast(DoubleType) / col("__n"))
      .orderBy(col("__ca").desc, abs(col("__p") - 0.5).asc, col("__p").asc)
      .limit(1)
      .select(round(col("__p"), 6).as("threshold"),
        round(col("__ca"), 6).as("ca"), col("__n").as("n"))
  }

  /** ThresholdClassifier: class-1 iff p ≥ threshold. */
  def thresholdPredict(df: DataFrame, prob: Column, threshold: Double): Column =
    when(prob >= threshold, 1).otherwise(0)

  /** Platt sigmoid calibration: fit p_cal = σ(w·s + w0) by deterministic
    * full-batch GD on (score, outcome); returns the fitted weights row
    * (same contract as SGD.logRegGD: one row w_score, w_bias, …). */
  def plattCalibrate(df: DataFrame, score: Column, isPos: Column,
                     iters: Int = 15, lr: Double = 1.0): DataFrame =
    SGD.logRegGD(df, Seq(("score", score)),
      when(isPos, 1).otherwise(0), iterations = iters, lr = lr)
}
