package graft

import org.apache.spark.sql.functions._
import graft.ml.{KernelSVM, SGD}

/** RFF kernel SVC (svm.py:11-45): capability + determinism pins. */
class KernelSVMSpec extends SparkSpec {
  import spark.implicits._

  private lazy val interval = {
    // 1-D interval label: +1 iff x ∈ (0.3, 0.7) — not linearly separable
    // in x, so a linear SVC cannot beat the 60% majority baseline by
    // much, while the RBF feature space separates it.
    (0 until 400).map(i => (i.toLong, i / 400.0)).toDF("id", "x")
  }
  private val yCol = when(col("x") > 0.3 && col("x") < 0.7, 1).otherwise(-1)

  test("RBF SVC separates an interval label the linear SVC cannot") {
    val lin = SGD.linearGD(interval, Seq(("x", col("x"))), yCol,
      iterations = 30, lr = 1.0, SGD.HingeLoss)
      .select(col("accuracy")).head().getDouble(0)
    val rbf = KernelSVM.rbfSvcFit(interval, Seq(col("x")), yCol)
      .select(col("accuracy")).head().getDouble(0)
    assert(lin <= 0.70, s"linear unexpectedly separates: $lin")
    assert(rbf >= 0.90, s"rbf failed to separate: $rbf")
  }

  test("fit is deterministic under repartitioning") {
    val a = KernelSVM.rbfSvcFit(interval, Seq(col("x")), yCol).collect()
    val b = KernelSVM.rbfSvcFit(interval.repartition(7), Seq(col("x")), yCol)
      .collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }
}
