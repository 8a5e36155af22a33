package graft

import org.apache.spark.sql.functions._
import graft.ml.{GradBoost, RandomForest}

/** In-house Newton-boosted stumps and the deterministic hash-bagged
  * forest — hand-checkable fixtures pin split selection, leaf algebra,
  * vote semantics, and run-to-run / repartition determinism. */
class GradBoostSpec extends SparkSpec {
  import spark.implicits._

  // --- GradBoost ---------------------------------------------------------

  test("gbt round 1 picks the separating split on separable data") {
    val df = (1 to 40).map(i => (i.toDouble, if (i <= 20) 1.0 else 0.0))
      .toDF("x", "y")
    val cands = GradBoost.splits(Seq("x" -> Seq(10.0, 20.0, 30.0)))
    val out = GradBoost.fitLogistic(df, Seq("x" -> col("x")), col("y"),
      cands, rounds = 1, lr = 1.0).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Double]("thr") == 20.0)
    // left leaf pushes toward class 1, right leaf toward class 0
    assert(r.getAs[Double]("gamma_l") > 0 && r.getAs[Double]("gamma_r") < 0)
  }

  test("gbt training accuracy is monotone-ish and reaches 1.0 when separable") {
    val df = (1 to 40).map(i => (i.toDouble, if (i <= 20) 1.0 else 0.0))
      .toDF("x", "y")
    val cands = GradBoost.splits(Seq("x" -> Seq(10.0, 20.0, 30.0)))
    val out = GradBoost.fitLogistic(df, Seq("x" -> col("x")), col("y"),
      cands, rounds = 4, lr = 0.5).collect()
    assert(out.head.getAs[Double]("acc") == 1.0)
    // the first, purest split shows a clearly positive gain
    assert(out.head.getAs[Double]("gain") > 0.0)
  }

  test("gbt is deterministic across repartitionings") {
    val df = (1 to 300).map { i =>
      val x1 = (i % 13).toDouble; val x2 = (i % 7).toDouble
      (x1, x2, if (x1 + 0.5 * x2 > 8) 1.0 else 0.0)
    }.toDF("x1", "x2", "y")
    val cands = GradBoost.splits(Seq(
      "x1" -> Seq(4.0, 8.0), "x2" -> Seq(2.0, 4.0)))
    def fit(d: org.apache.spark.sql.DataFrame) =
      GradBoost.fitLogistic(d, Seq("x1" -> col("x1"), "x2" -> col("x2")),
        col("y"), cands, rounds = 5, lr = 0.4)
        .collect().map(_.toSeq).toSeq
    assert(fit(df.repartition(1)) == fit(df.repartition(7)))
  }

  test("gbt chunked bitset crosses the 2^16-row chunk boundary bit-exactly") {
    // 70_000 rows in ONE partition = a full 65 536-row chunk + a trimmed
    // tail; 7 partitions keep every chunk partial. Counts and gradient
    // sums are integer, so both layouts must match exactly.
    val df = spark.range(70000).select(
      (col("id") % 13).cast("double").as("x1"),
      when(col("id") % 13 > 6, 1.0).otherwise(0.0).as("y"))
    val cands = GradBoost.splits(Seq("x1" -> Seq(4.0, 8.0)))
    def fit(parts: Int) =
      GradBoost.fitLogistic(df.repartition(parts),
        Seq("x1" -> col("x1")), col("y"), cands, rounds = 3, lr = 0.4)
        .collect().map(_.toSeq).toSeq
    assert(fit(1) == fit(7))
  }

  test("gbt subsample/colsample stay deterministic and change the fit") {
    val df = (1 to 200).map { i =>
      val x1 = (i % 11).toDouble; val x2 = (i % 5).toDouble
      (i.toLong, x1, x2, if (x1 > 5) 1.0 else 0.0)
    }.toDF("id", "x1", "x2", "y")
    val cands = GradBoost.splits(Seq(
      "x1" -> Seq(3.0, 5.0, 8.0), "x2" -> Seq(2.0)))
    def fit(sub: Double, cs: Double) =
      GradBoost.fitLogistic(df,
        Seq("x1" -> col("x1"), "x2" -> col("x2")), col("y"), cands,
        rounds = 4, lr = 0.4, subsample = sub, colsample = cs,
        rowKey = col("id").cast("string")).collect().map(_.toSeq).toSeq
    assert(fit(0.8, 0.5) == fit(0.8, 0.5))
    // colsample=0.5 on 2 features keeps exactly one per round, so
    // round 2 (feature x2 only) cannot pick an x1 split
    val csOnly = GradBoost.fitLogistic(df,
      Seq("x1" -> col("x1"), "x2" -> col("x2")), col("y"), cands,
      rounds = 2, lr = 0.4, colsample = 0.5).collect()
    assert(csOnly(0).getAs[String]("feat") == "x1")
    assert(csOnly(1).getAs[String]("feat") == "x2")
  }

  // --- RandomForest ------------------------------------------------------

  test("forest vote recovers a clean discrete rule and is deterministic") {
    val df = (1 to 300).map { i =>
      val a = (i % 3).toString; val b = (i % 4).toString
      val c = (i % 5).toString
      (i.toLong, a, b, c, if (i % 3 == 0) "pos" else "neg")
    }.toDF("id", "a", "b", "c", "y")
    def fit() = RandomForest.fitVote(df,
      Seq(("a", col("a")), ("b", col("b")), ("c", col("c"))), col("y"),
      col("id").cast("string"), trees = 3)
      .collect().map(_.toSeq).toSeq
    val out = fit()
    assert(out == fit())
    // trees 2 and 3 keep feature a and learn the a==0 rule exactly;
    // tree 1 (b, c only) is outvoted 2-to-1 → the vote is perfect
    val correct = out.collect {
      case s if s(0) == s(1) => s(2).asInstanceOf[Long] }.sum
    val total = out.map(_(2).asInstanceOf[Long]).sum
    assert(correct == total)
  }

  test("forest tree feature subsets rotate cyclically") {
    val fs = Seq("a", "b", "c")
    assert(RandomForest.treeFeats(fs, 1) == Seq("b", "c"))
    assert(RandomForest.treeFeats(fs, 2) == Seq("a", "c"))
    assert(RandomForest.treeFeats(fs, 3) == Seq("a", "b"))
    assert(RandomForest.treeFeats(fs, 4) == Seq("b", "c"))
  }

  test("forest confusion matrix counts every labeled row exactly once") {
    val li = core.Tables.load(spark, sf, "lineitem")
    val out = RandomForest.fitVote(li,
      Seq(("flag", col("l_returnflag")),
        ("qty_bin", floor((col("l_quantity") - 1) / 10)),
        ("disc_bin", floor(col("l_discount") * 20))),
      col("l_linestatus"),
      concat_ws("#", col("l_orderkey"), col("l_linenumber")),
      trees = 3).collect()
    val n = out.map(_.getAs[Long]("n")).sum
    assert(n == li.filter(col("l_linestatus").isNotNull).count())
  }
}
