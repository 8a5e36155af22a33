package graft

import org.apache.spark.sql.functions._
import graft.ml.Softmax

/** Pins for the in-house softmax GD (reference
  * softmax_regression.py): partitioning determinism (the scaled-long
  * gradient grid must make the trajectory order-independent),
  * convergence above chance, and count consistency. */
class SoftmaxSpec extends SparkSpec {

  private def fitOn(parts: Int) = {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .repartition(parts)
    Softmax.fit(e,
      (0 until 8).map(i =>
        (s"e$i", element_at(col("embedding"), i + 1).cast("double"))),
      col("label"), numClasses = 10, iterations = 10, lr = 10.0,
      lambda = 1.0)
  }

  test("softmax trajectory is partition-order independent") {
    val a = fitOn(1).collect().map(_.toSeq).toSeq
    val b = fitOn(17).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("softmax converges above chance and counts are consistent") {
    val rows = fitOn(4).collect()
    assert(rows.length == 10)
    val n = rows.map(_.getAs[Long]("support")).sum
    assert(rows.map(_.getAs[Long]("predicted")).sum == n)
    val acc = rows.head.getAs[Double]("accuracy")
    assert(acc > 0.1, s"accuracy $acc not above 10-class chance")
    // weights moved off the origin and stayed on the 1e-10 grid
    val w = rows.flatMap(r => (0 until 8).map(i => r.getAs[Double](s"w_e$i")))
    assert(w.exists(_ != 0.0))
    assert(w.forall(v => (math.rint(v * 1e10) / 1e10) == v))
  }
}
