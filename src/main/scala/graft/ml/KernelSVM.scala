package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Kernel (RBF) SVM classifier (reference Orange/classification/svm.py:11-45
  * SVCLearner — sklearn SVC(kernel='rbf')).
  *
  * Distributed re-expression: the RBF kernel is linearized with the same
  * Random Fourier Features the one-class detector uses
  * ([[OneClassSVM.rffFeatures]], Rahimi & Recht 2007), after which the
  * kernel SVC is a LINEAR hinge-loss fit — handled by the existing
  * deterministic full-batch subgradient machinery ([[SGD.linearGD]],
  * HingeLoss). One aggregation per iteration, weights broadcast, no
  * kernel matrix anywhere — the 100 TB shape, where sklearn's SMO on an
  * n×n Gram matrix stops at ~10⁵ rows.
  *
  * Determinism: the ω/b draws are md5-keyed (PortableHash) and the GD
  * trajectory is 10-decimal-rounded per step, so the fit is identical
  * across runs and partitionings. KernelSVMSpec pins the capability gap:
  * an interval-labeled fixture that the linear SVC cannot beat the
  * majority baseline on, while the RFF-SVC separates it. */
object KernelSVM {

  /** Fit an RBF SVC via RFF + hinge GD; y must be ±1. Returns the
    * linearGD weights row (w_z0..w_z{d-1}, intercept, accuracy). */
  def rbfSvcFit(df: DataFrame, xs: Seq[Column], y: Column,
                d: Int = 32, gamma: Double = 8.0, iterations: Int = 30,
                lr: Double = 1.0): DataFrame = {
    val feats = OneClassSVM.rffFeatures(xs, d, gamma)
      .zipWithIndex.map { case (f, j) => (s"z$j", f.as(s"z$j")) }
    // wide-path contract: null feature rows dropped up front (the
    // primitive-array gradient cannot represent them)
    val nonNull = xs.map(_.isNotNull).reduce(_ && _)
    SGD.linearGD(df.filter(nonNull), feats.map { case (n, c) => (n, c) }, y,
      iterations, lr, SGD.HingeLoss)
  }

  /** Fit and report (accuracy, d, gamma) — the query-facing summary row
    * (the d-dimensional weight vector itself is fit detail). */
  def rbfSvcAccuracy(df: DataFrame, xs: Seq[Column], y: Column,
                     d: Int = 32, gamma: Double = 8.0,
                     iterations: Int = 30, lr: Double = 1.0): DataFrame =
    rbfSvcFit(df, xs, y, d, gamma, iterations, lr)
      .select(col("accuracy"), lit(d).as("rff_dim"),
        lit(gamma).as("gamma"))
}
