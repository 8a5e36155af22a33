package graft

import org.apache.spark.sql.functions._
import graft.ml.{AdaBoost, LinearClosed, Stacking, Clustering}

/** Closed-form regularized regression, AdaBoost stumps, stacking, and
  * silhouette — hand-computable fixtures pin the exact semantics. */
class EnsembleSpec extends SparkSpec {
  import spark.implicits._

  // --- LinearClosed ------------------------------------------------------

  test("ridge2 with alpha=0 recovers exact linear coefficients") {
    val df = (1 to 40).map { i =>
      val x1 = (i % 7) / 7.0; val x2 = (i % 5) / 5.0
      (x1, x2, 0.7 * x1 + 0.2 * x2 + 0.1)
    }.toDF("x1", "x2", "y")
    val r = LinearClosed.ridge2(df, ("a", col("x1")), ("b", col("x2")),
      col("y"), alpha = 0.0).head()
    assert(math.abs(r.getDouble(0) - 0.7) < 1e-6)
    assert(math.abs(r.getDouble(1) - 0.2) < 1e-6)
    assert(math.abs(r.getDouble(2) - 0.1) < 1e-6)
  }

  test("ridge2 shrinks weights monotonically in alpha") {
    val df = (1 to 40).map { i =>
      val x1 = (i % 7) / 7.0; val x2 = (i % 5) / 5.0
      (x1, x2, 0.7 * x1 + 0.2 * x2)
    }.toDF("x1", "x2", "y")
    def w1(a: Double) = LinearClosed.ridge2(df, ("a", col("x1")),
      ("b", col("x2")), col("y"), a).head().getDouble(0)
    assert(w1(0.0) > w1(1.0) && w1(1.0) > w1(10.0) && w1(10.0) > 0)
  }

  test("lasso soft-threshold: large alpha zeroes the weight, b = ȳ") {
    val df = (1 to 20).map { i =>
      val x = (i % 4) / 4.0; (x, 0.5 * x + 1.0)
    }.toDF("x", "y")
    val r = LinearClosed.lassoEnet1(df, ("x", col("x")), col("y"),
      alphaLasso = 100.0, alphaEnet = 1e-9, l1Ratio = 0.5).head()
    assert(r.getDouble(0) == 0.0) // w_lasso killed
    // b_lasso = mean(y) exactly when w = 0
    val my = 0.5 * (1 to 20).map(i => (i % 4) / 4.0).sum / 20 + 1.0
    assert(math.abs(r.getDouble(1) - my) < 1e-6)
    // enet with negligible alpha ≈ OLS slope 0.5
    assert(math.abs(r.getDouble(2) - 0.5) < 1e-6)
  }

  // --- AdaBoost ----------------------------------------------------------

  test("adaboost round 1 finds the separating stump on separable data") {
    val df = (1 to 20).map(i => (i.toDouble, if (i <= 5) 1.0 else -1.0))
      .toDF("x", "y")
    val cands = AdaBoost.candidates(Seq("x" -> Seq(3.0, 5.0, 12.0)))
    val out = AdaBoost.fitStumps(df, Map("x" -> col("x")), col("y"),
      cands, rounds = 1).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Double]("thr") == 5.0 && r.getAs[Int]("pol") == 1)
    assert(r.getAs[Double]("err") == 0.0)
    assert(r.getAs[Double]("acc") == 1.0)
  }

  test("adaboost reweighting moves later rounds to different stumps") {
    // y = +1 iff x<=5 OR x>15: one stump can't separate; boosting should
    // pick complementary stumps and beat any single candidate's accuracy
    val df = (1 to 20).map(i =>
      (i.toDouble, if (i <= 5 || i > 15) 1.0 else -1.0)).toDF("x", "y")
    val cands = AdaBoost.candidates(Seq("x" -> Seq(5.0, 15.0)))
    val out = AdaBoost.fitStumps(df, Map("x" -> col("x")), col("y"),
      cands, rounds = 3).collect()
    val thrs = out.map(_.getAs[Double]("thr")).toSet
    assert(thrs == Set(5.0, 15.0))
    assert(out.head.getAs[Double]("acc") >= 0.75) // single stump caps at 0.75
  }

  test("adaboost is deterministic across runs") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
    val cands = AdaBoost.candidates(Seq(
      "qty" -> Seq(10.0, 25.0, 40.0), "disc" -> Seq(0.02, 0.05, 0.08)))
    def run() = AdaBoost.fitStumps(df,
      Map("qty" -> col("l_quantity"), "disc" -> col("l_discount")),
      when(col("l_extendedprice") > 30000, 1.0).otherwise(-1.0),
      cands, rounds = 3).collect().map(_.toString).toSeq
    assert(run() == run())
  }

  // --- Stacking ----------------------------------------------------------

  test("stacking meta learner favors the informative base") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .withColumn("qty_bin",
        floor(col("l_quantity") / 10).cast("int").cast("string"))
      .withColumn("disc_bin",
        floor(col("l_discount") * 100 / 3).cast("int").cast("string"))
      .withColumn("cls",
        when(col("l_quantity") > 25 || col("l_discount") > 0.05, "hi")
          .otherwise("lo"))
    val r = Stacking.fitCA(df, Seq("qty_bin", "disc_bin"), "cls", "hi",
      col("l_orderkey"), k = 4).head()
    val acc = r.getAs[Double]("accuracy")
    // majority rate of "hi" in this fixture is ~0.66; NB bins are
    // informative, so the stacked accuracy must clearly beat majority
    val majRate = {
      val c = df.groupBy("cls").count().collect()
        .map(x => x.getString(0) -> x.getLong(1)).toMap
      c.values.max.toDouble / c.values.sum
    }
    assert(acc > majRate + 0.05)
    // the NB indicator carries the signal: its weight dominates
    assert(r.getAs[Double]("w_nb") > math.abs(r.getAs[Double]("w_maj")))
  }

  // --- Silhouette --------------------------------------------------------

  test("exact silhouette matches hand computation on two tight clusters") {
    val df = Seq((1, 0, 0.0), (2, 0, 1.0), (3, 1, 10.0), (4, 1, 11.0))
      .toDF("id", "c", "x")
    val s = Clustering.silhouetteExact(df, "id", "c", Seq("x"))
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    // point 1: a=1, b=(10+11)/2=10.5 → (10.5-1)/10.5 = 0.904762
    assert(s(1) == 0.904762)
    // point 3: a=1, b=(10+9)/2=9.5 → 8.5/9.5 = 0.894737
    assert(s(3) == 0.894737)
  }

  test("singleton cluster scores silhouette 0") {
    val df = Seq((1, 0, 0.0), (2, 0, 1.0), (3, 1, 10.0)).toDF("id", "c", "x")
    val s = Clustering.silhouetteExact(df, "id", "c", Seq("x"))
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(s(3) == 0.0)
  }

  test("simplified silhouette agrees with exact on well-separated blobs") {
    val pts = ((1 to 10).map(i => (i, 0, i * 0.1)) ++
      (11 to 20).map(i => (i, 1, 100.0 + (i - 10) * 0.1)))
      .toDF("id", "c", "x")
    val exact = Clustering.silhouetteExact(pts, "id", "c", Seq("x"))
      .agg(avg(col("s"))).head().getDouble(0)
    val simpl = Clustering.silhouetteSimplified(pts, "id", "c", Seq("x"))
      .agg(avg(col("mean_s"))).head().getDouble(0)
    // both ≈ 1 for far-apart blobs; surrogate within a small tolerance
    assert(exact > 0.98 && simpl > 0.98 && math.abs(exact - simpl) < 0.02)
  }
}
