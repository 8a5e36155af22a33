package graft

import org.apache.spark.sql.functions._
import graft.functions.ScoreOps
import graft.operators.OutlierOps
import graft.preprocess.EntropyMDL

/** Semantics tests for the §2.10 scorers and the EntropyMDL discretizer
  * (the one §2.8 strategy with no SQL oracle — rows-only in the driver,
  * so its behavior is pinned here instead). */
class ScoringSpec extends SparkSpec {
  import spark.implicits._

  test("EntropyMDL finds the separating cut on separable data") {
    // class flips exactly at x=10: MDL must accept one cut near 10
    val df = ((1 to 10).map(i => (i.toDouble, "a")) ++
      (11 to 20).map(i => (i.toDouble, "b"))).toDF("x", "y")
    val cuts = EntropyMDL.cuts(df, "x", "y")
    assert(cuts.length == 1)
    assert(cuts.head == 10.5)
  }

  test("EntropyMDL yields no cut when feature is uninformative") {
    // class independent of x → every candidate split fails MDL
    val df = (1 to 40).map(i => (i.toDouble, if (i % 2 == 0) "a" else "b"))
      .toDF("x", "y")
    assert(EntropyMDL.cuts(df, "x", "y").isEmpty)
  }

  test("EntropyMDL recurses: two class changes → two cuts") {
    val df = ((1 to 10).map(i => (i.toDouble, "a")) ++
      (11 to 20).map(i => (i.toDouble, "b")) ++
      (21 to 30).map(i => (i.toDouble, "c"))).toDF("x", "y")
    val cuts = EntropyMDL.cuts(df, "x", "y")
    assert(cuts == Seq(10.5, 20.5))
  }

  test("EntropyMDL grid pre-bin bounds candidates and keeps the cut " +
       "within grid resolution") {
    // 2000 distinct values, class flips at x=1000.5
    val df = (1 to 2000).map(i => (i.toDouble, if (i <= 1000) "a" else "b"))
      .toDF("x", "y")
    val exact = EntropyMDL.cuts(df, "x", "y")
    assert(exact.length == 1 && exact.head == 1000.5)
    // force the grid path (2000 distinct > 128 candidates): the cut must
    // land within one grid cell (~2000/128 ≈ 15.6) of the true boundary
    val grid = EntropyMDL.cuts(df, "x", "y", maxCandidates = 128)
    assert(grid.length == 1)
    assert(math.abs(grid.head - 1000.5) <= 2000.0 / 128)
    // far above the cap the grid path is never taken → bit-identical
    assert(EntropyMDL.cuts(df, "x", "y", maxCandidates = 1 << 20) == exact)
  }

  test("EntropyMDL.discretize bins by the fitted cuts") {
    val df = ((1 to 10).map(i => (i.toDouble, "a")) ++
      (11 to 20).map(i => (i.toDouble, "b"))).toDF("x", "y")
    val bins = EntropyMDL.discretize(df, "x", "y", "bin")
      .groupBy("bin").count().orderBy("bin")
      .as[(Int, Long)].collect()
    assert(bins.toSeq == Seq((0, 10L), (1, 10L)))
  }

  test("chi2 is ~0 for independent feature and grows with dependence") {
    val ind = (1 to 400).map(i => (s"f${i % 2}", s"c${i % 4 / 2}"))
      .toDF("f", "c")
    val chiInd = ScoreOps.chi2(ind, "f", "c").head()
    assert(math.abs(chiInd.getDouble(0)) < 1e-9)
    assert(chiInd.getLong(1) == 1L) // (2-1)*(2-1)
    val dep = (1 to 400).map(i => (s"f${i % 2}", s"c${i % 2}")).toDF("f", "c")
    assert(ScoreOps.chi2(dep, "f", "c").head().getDouble(0) > 100)
  }

  test("ANOVA F separates shifted groups") {
    val df = ((1 to 50).map(i => (i % 7 * 0.1, "a")) ++
      (1 to 50).map(i => (5.0 + i % 7 * 0.1, "b"))).toDF("x", "g")
    val r = ScoreOps.anovaF(df, "x", "g").head()
    assert(r.getDouble(0) > 1000) // huge between-group variance
    assert(r.getLong(1) == 1L && r.getLong(2) == 98L)
  }

  test("symmetric uncertainty is 1 for a perfect predictor, ~0 for noise") {
    val perfect = (1 to 100).map(i => (s"v${i % 3}", s"v${i % 3}"))
      .toDF("f", "c")
    val su = ScoreOps.symmetricUncertainty(perfect, col("f"), "f", "c").head()
    assert(math.abs(su.getDouble(1) - 1.0) < 1e-9)
    val noise = (1 to 360).map(i => (s"f${i % 3}", s"c${i % 4 / 2}"))
      .toDF("f", "c")
    val su2 = ScoreOps.symmetricUncertainty(noise, col("f"), "f", "c").head()
    assert(math.abs(su2.getDouble(1)) < 1e-6)
  }

  test("isolation forest scores an isolated point highest") {
    val df = ((1 to 200).map(i => (i, (i % 10) * 0.1, (i % 7) * 0.1)) :+
      ((201, 50.0, 50.0))).toDF("id", "x", "y")
    val scored = graft.ml.IsolationForest
      .scoreColumn(df, Seq("x", "y"), Seq("id"), "s", nTrees = 50)
      .orderBy(desc("s")).select("id", "s").as[(Int, Double)].collect()
    assert(scored.head._1 == 201) // the far point isolates first
    assert(scored.head._2 > 0.6)  // canonical outlier threshold
    assert(scored.last._2 < 0.6)  // cluster members below it
  }

  test("1-D DBSCAN separates two dense blobs and marks isolated noise") {
    // blob A: 1.0–1.9 (10 pts), blob B: 50.0–50.9 (10 pts), noise: 200.0
    val pts = (1 to 10).map(i => (i, 1.0 + i * 0.1)) ++
      (11 to 20).map(i => (i, 50.0 + (i - 10) * 0.1)) :+ ((21, 200.0))
    val out = graft.ml.Clustering
      .dbscan1d(pts.toDF("id", "v"), "id", "v", eps = 1.0, minPts = 3)
      .select("id", "cluster").as[(Int, Long)].collect().toMap
    assert(out(1) == out(10) && out(1) >= 0)    // blob A one cluster
    assert(out(11) == out(20) && out(11) >= 0)  // blob B one cluster
    assert(out(1) != out(11))                   // distinct clusters
    assert(out(21) == -1)                       // isolated point = noise
  }

  test("LOF flags an isolated point higher than cluster members") {
    val df = ((1 to 20).map(i => (i, i * 0.01)) :+ ((21, 100.0)))
      .toDF("id", "v")
    val lof = OutlierOps.lof1d(df, "id", "v", 3)
      .orderBy(desc("lof")).as[(Int, Double)].collect()
    assert(lof.head._1 == 21)      // the outlier has the top LOF
    assert(lof.head._2 > 10)
    assert(lof.last._2 < 2)        // deep cluster members near 1
  }

  test("grouped LOF is bit-identical to the all-pairs formulation") {
    // duplicates (incl. a >k run of coincident points), ties at exactly
    // the k-distance, and an isolated outlier
    val vs = Seq(1.0, 1.0, 1.0, 1.0, 1.0, 2.0, 3.0, 3.0, 4.0, 5.0, 5.0,
      7.0, 7.0, 7.0, 7.0, 10.0, 13.0, 50.0)
    val df = vs.zipWithIndex.map { case (v, i) => (i + 1, v) }.toDF("id", "v")
    val fast = OutlierOps.lof1d(df, "id", "v", 3)
      .as[(Int, Double)].collect().toSeq.sortBy(_._1)
    val slow = OutlierOps.lof1dAllPairs(df, "id", "v", 3)
      .as[(Int, Double)].collect().toSeq.sortBy(_._1)
    assert(fast == slow)
  }

  test("grouped LOF matches all-pairs on real fixture data") {
    val sup = spark.read.parquet(s"$sf/supplier.parquet")
    val fast = OutlierOps.lof1d(sup, "s_suppkey", "s_acctbal", 3)
      .as[(Long, Double)].collect().toSeq.sortBy(_._1)
    val slow = OutlierOps.lof1dAllPairs(sup, "s_suppkey", "s_acctbal", 3)
      .as[(Long, Double)].collect().toSeq.sortBy(_._1)
    assert(fast.nonEmpty && fast == slow)
  }

  test("RReliefF ranks the predictive feature above the irrelevant one") {
    // y tracks x1 exactly; x2 cycles independently of y
    val df = (1 to 60).map { i =>
      (i.toLong, i * 0.5, (i % 7).toDouble, i * 0.5 * 3.0)
    }.toDF("id", "x1", "x2", "y")
    val w = graft.functions.ReliefF.rWeights(df, "id", Seq("x1", "x2"), "y",
        col("id") % 3 === 0, 3)
      .as[(String, Double)].collect().toMap
    assert(w("x1") > w("x2"),
      s"predictive feature not ranked higher: $w")
  }

  test("RReliefF is deterministic across partitionings") {
    val df = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_custkey").cast("double").as("f1"),
        substring(col("o_orderpriority"), 1, 1).cast("double").as("f2"))
    val a = graft.functions.ReliefF.rWeights(df, "o_orderkey",
      Seq("f1", "f2"), "o_totalprice", col("o_orderkey") <= 100, 3)
      .as[(String, Double)].collect().toSeq.sortBy(_._1)
    val b = graft.functions.ReliefF.rWeights(df.repartition(9), "o_orderkey",
      Seq("f1", "f2"), "o_totalprice", col("o_orderkey") <= 100, 3)
      .as[(String, Double)].collect().toSeq.sortBy(_._1)
    assert(a.nonEmpty && a == b)
  }
}
