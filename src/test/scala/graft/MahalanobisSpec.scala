package graft

import org.apache.spark.sql.functions._
import graft.core.Tables._
import graft.operators.OutlierOps

/** General N-D Mahalanobis (distance.py:807-868) vs the cofactor closed
  * forms used by the oracle queries, plus inverse correctness. */
class MahalanobisSpec extends SparkSpec {
  import spark.implicits._

  test("Gauss-Jordan inverse: A * inv(A) == I") {
    val a = Array(
      Array(4.0, 1.0, 0.5), Array(1.0, 3.0, 0.2), Array(0.5, 0.2, 2.0))
    val inv = OutlierOps.invertGaussJordan(a)
    for (i <- 0 until 3; j <- 0 until 3) {
      val e = (0 until 3).map(k => a(i)(k) * inv(k)(j)).sum
      assert(math.abs(e - (if (i == j) 1.0 else 0.0)) < 1e-12, s"($i,$j)=$e")
    }
  }

  test("mahalanobisND matches the 2-D closed form") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").as("x"), col("l_extendedprice").as("y"))
    // both scores on the SAME rows ((l_orderkey, l_linenumber) is not
    // unique in the synthetic lineitem — a key join would cross-match)
    val nd = OutlierOps.mahalanobisND(df, Seq("x", "y"))
    val stats = df.agg(
      exactMean(col("x")).as("mx"), exactMean(col("y")).as("my"),
      exactVarSamp(col("x")).as("vx"), exactVarSamp(col("y")).as("vy"),
      exactCovarSamp(col("x"), col("y")).as("cxy"))
    val dx = col("x") - col("mx"); val dy = col("y") - col("my")
    val det = col("vx") * col("vy") - col("cxy") * col("cxy")
    val maxDiff = nd.crossJoin(broadcast(stats))
      .withColumn("md2c", (dx * dx * col("vy") - dx * dy * col("cxy") * 2.0
        + dy * dy * col("vx")) / det)
      .select(max(abs(col("md2") - col("md2c")))).first().getDouble(0)
    assert(maxDiff < 1e-8, s"max |nd - closed| = $maxDiff")
  }

  test("mahalanobisND on independent unit-variance features ~ squared z-norm") {
    // x ~ {-1, 1}, y ~ {-2, 2} independent: Σ = diag(var x, var y);
    // md2 of (1, 2) = 1/vx + 4/vy
    val df = (for { x <- Seq(-1.0, 1.0); y <- Seq(-2.0, 2.0) } yield (x, y))
      .toDF("x", "y")
    val got = OutlierOps.mahalanobisND(df, Seq("x", "y"))
      .filter(col("x") === 1.0 && col("y") === 2.0)
      .select(col("md2")).first().getDouble(0)
    // sample variance with ddof=1: vx = 4/3, vy = 16/3
    val want = 1.0 / (4.0 / 3) + 4.0 / (16.0 / 3)
    assert(math.abs(got - want) < 1e-12, s"$got vs $want")
  }
}
