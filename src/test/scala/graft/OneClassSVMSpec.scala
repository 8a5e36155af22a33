package graft

import org.apache.spark.sql.functions._
import graft.ml.OneClassSVM

/** One-class SVM via RFF + linear subgradient descent
  * (outlier_detection.py:17-180 semantics). */
class OneClassSVMSpec extends SparkSpec {
  import spark.implicits._

  test("planted far outliers score below the dense blob") {
    val inliers = (1 to 200).map(i =>
      (i.toLong, math.sin(i * 0.7) * 0.1, math.cos(i * 1.3) * 0.1))
    val outliers = Seq((901L, 5.0, -5.0), (902L, -6.0, 6.0), (903L, 7.0, 7.0))
    val df = (inliers ++ outliers).toDF("id", "x", "y")
    val out = OneClassSVM.fitPredict(df,
        Seq(("x", col("x")), ("y", col("y"))), nu = 0.05, d = 32,
        gamma = 0.5)
      .select("id", "score", "is_outlier")
      .as[(Long, Double, Int)].collect()
    val byId = out.map(r => r._1 -> r).toMap
    // every planted outlier scores below every inlier's median zone
    val inScores = out.filter(_._1 < 900).map(_._2)
    val outScores = Seq(901L, 902L, 903L).map(byId(_)._2)
    assert(outScores.max < inScores.min)
    assert(Seq(901L, 902L, 903L).forall(byId(_)._3 == 1))
    // the dense blob is mostly inliers (ν bounds the outlier share)
    val flagged = out.count(_._3 == 1)
    assert(flagged <= out.length * 0.2)
  }

  test("deterministic across runs and partitionings") {
    val df1 = (1 to 100).map(i => (i.toLong, math.sin(i * 0.9)))
      .toDF("id", "x")
    val df2 = df1.repartition(7)
    val a = OneClassSVM.fitPredict(df1, Seq(("x", col("x"))), d = 16)
      .select("id", "score").as[(Long, Double)].collect().sortBy(_._1).toSeq
    val b = OneClassSVM.fitPredict(df2, Seq(("x", col("x"))), d = 16)
      .select("id", "score").as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }
}
