package graft

import org.apache.spark.sql.functions._
import graft.ml.DecisionTree

/** Regression TreeLearner semantics (regression/tree.py:16 with the
  * compute_grouped_MSE scorer): variance-reduction splits, mean
  * leaves, the min_leaf / nvalid guard. */
class TreeRegressionSpec extends SparkSpec {
  import spark.implicits._

  // feature a stratifies y perfectly (a0 → 10s, a1 → 30s); feature b
  // is orthogonal noise — the root split must be a
  private def df = Seq(
    ("a0", "b0", 10.0), ("a0", "b1", 11.0), ("a0", "b0", 9.0),
    ("a0", "b1", 10.0), ("a0", "b0", 10.0), ("a0", "b1", 10.0),
    ("a1", "b0", 30.0), ("a1", "b1", 31.0), ("a1", "b0", 29.0),
    ("a1", "b1", 30.0), ("a1", "b0", 30.0), ("a1", "b1", 30.0)
  ).toDF("a", "b", "y")

  test("root splits on the variance-reducing feature, leaves are exact means") {
    val out = DecisionTree.depth2Regression(df,
        Seq(("a", col("a")), ("b", col("b"))), col("y"))
      .as[(String, String, String, String, Long, Double)].collect()
    assert(out.forall(_._1 == "a"), s"root is not a: ${out.toSeq}")
    assert(out.forall(_._3 == "b"), "leaf feature is not b")
    // leaf (a0, b0): mean(10, 9, 10) = 9.666667
    val l = out.find(r => r._2 == "a0" && r._4 == "b0").get
    assert(l._5 == 3 && l._6 == 9.666667, s"leaf wrong: $l")
    // leaf (a1, b1): mean(31, 30, 30) = 30.333333
    val r = out.find(rr => rr._2 == "a1" && rr._4 == "b1").get
    assert(r._5 == 3 && r._6 == 30.333333, s"leaf wrong: $r")
  }

  test("min_leaf starves a feature down to <2 valid groups → score 0") {
    // feature c separates y BETTER than a (singleton y=100 carries all
    // the variance) but its split leaves a 1-row group; at minLeaf=2
    // compute_grouped_MSE's nvalid guard zeroes c and the root falls
    // back to a
    val d2 = Seq(
      ("a0", "c0", 10.0), ("a0", "c0", 11.0), ("a0", "c0", 9.0),
      ("a1", "c0", 30.0), ("a1", "c0", 31.0), ("a1", "c1", 100.0)
    ).toDF("a", "c", "y")
    val feats = Seq(("a", col("a")), ("c", col("c")))
    val atOne = DecisionTree.depth2Regression(d2, feats, col("y"),
      minLeaf = 1).select("root_feature").distinct().as[String].collect()
    assert(atOne.toSeq == Seq("c"), s"minLeaf=1 root $atOne")
    val atTwo = DecisionTree.depth2Regression(d2, feats, col("y"),
      minLeaf = 2).select("root_feature").distinct().as[String].collect()
    assert(atTwo.toSeq == Seq("a"), s"minLeaf=2 root $atTwo")
  }

  test("deterministic across partitionings") {
    val feats = Seq(("a", col("a")), ("b", col("b")))
    val one = DecisionTree.depth2Regression(df, feats, col("y"))
      .collect().toSeq
    val many = DecisionTree.depth2Regression(df.repartition(7), feats,
      col("y")).collect().toSeq
    assert(one == many)
  }
}
