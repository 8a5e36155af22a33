package graft

import org.apache.spark.sql.functions._
import graft.ml.ClusterEval

/** AdjustedMutualInfoScore semantics (reference evaluation/clustering.py:63
  * → sklearn adjusted_mutual_info_score, arithmetic average). */
class ClusterEvalSpec extends SparkSpec {
  import spark.implicits._

  private val labels = Seq(
    ("a", "x"), ("a", "x"), ("a", "x"), ("a", "y"),
    ("b", "y"), ("b", "y"), ("b", "x"), ("b", "y"),
    ("c", "z"), ("c", "z"), ("c", "z"), ("c", "y")
  ).toDF("pred", "actual")

  test("perfect agreement scores AMI = 1") {
    val r = ClusterEval.adjustedMutualInfo(
      labels, col("actual"), col("actual")).first()
    assert(r.getAs[Double]("ami") == 1.0, r.toString)
    // MI equals both entropies for identical labelings
    assert(r.getAs[Double]("mi") == r.getAs[Double]("h_u"), r.toString)
  }

  test("single-cluster prediction scores AMI = 0 (MI = EMI = H(U) = 0)") {
    val r = ClusterEval.adjustedMutualInfo(
      labels, lit("only"), col("actual")).first()
    assert(r.getAs[Double]("mi") == 0.0 && r.getAs[Double]("h_u") == 0.0)
    assert(r.getAs[Double]("ami") == 0.0, r.toString)
  }

  test("chance-adjusted: AMI < raw-MI normalization, within [-1, 1]") {
    val r = ClusterEval.adjustedMutualInfo(
      labels, col("pred"), col("actual")).first()
    val nmi = r.getAs[Double]("mi") /
      ((r.getAs[Double]("h_u") + r.getAs[Double]("h_v")) / 2)
    val ami = r.getAs[Double]("ami")
    assert(ami < nmi, s"ami $ami should be penalized below nmi $nmi")
    assert(ami >= -1.0 && ami <= 1.0)
    assert(r.getAs[Double]("emi") > 0.0)
  }

  test("degenerate inputs: both-trivial scores 1.0; null labels dropped") {
    // sklearn special case: one cluster on BOTH sides → 1.0
    val r = ClusterEval.adjustedMutualInfo(labels, lit("only"), lit("x")).first()
    assert(r.getAs[Double]("ami") == 1.0, r.toString)
    // null labels are filtered, not NPE'd, and the result is finite
    val withNulls = labels.withColumn("p2",
      when(col("pred") === "a", lit(null)).otherwise(col("pred")))
    val r2 = ClusterEval.adjustedMutualInfo(
      withNulls, col("p2"), col("actual")).first()
    assert(!r2.getAs[Double]("ami").isNaN)
  }

  test("lgamma matches ln(k!) on exact integer factorials") {
    var f = 1.0
    for (k <- 1 to 20) {
      f *= k
      assert(math.abs(ClusterEval.lgamma(k + 1.0) - math.log(f)) < 1e-10, s"k=$k")
    }
  }
}
