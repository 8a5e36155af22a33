package graft

import org.apache.spark.sql.functions._
import graft.ml.KNN

/** kNN learner semantics (reference Orange/classification/knn.py,
  * Orange/regression/knn.py): vote/mean of the k nearest, deterministic
  * tiebreaks, facade wiring, and the LSH scale path's vote logic. */
class KNNSpec extends SparkSpec {
  import spark.implicits._

  private val train = Seq(
    // (id, x, y, cls, yval): two tight clusters around 0 and 10
    (1L, 0.0, 0.0, "a", 1.0), (2L, 0.5, 0.0, "a", 2.0),
    (3L, 0.0, 0.5, "a", 3.0), (4L, 1.0, 1.0, "b", 4.0),
    (5L, 10.0, 10.0, "b", 10.0), (6L, 10.5, 10.0, "b", 11.0),
    (7L, 10.0, 10.5, "b", 12.0), (8L, 9.0, 9.0, "a", 13.0)
  ).toDF("id", "x", "y", "cls", "yval")

  test("classify votes the k nearest with smallest-label tiebreak") {
    val test = Seq((100L, 0.2, 0.2), (101L, 10.2, 10.2)).toDF("id", "x", "y")
    val got = KNN.classify(test, train, "id", Seq("x", "y"), "cls", 3)
      .as[(Long, String)].collect().toMap
    // 100's 3-NN = {1,2,3} → all "a"; 101's = {5,6,7} → all "b"
    assert(got == Map(100L -> "a", 101L -> "b"))
    // k=4 at 101 pulls in id 8 ("a"): vote 3b/1a → still "b";
    // k=2 at a constructed midpoint with a 1-1 split → smallest label
    val mid = Seq((200L, 5.0, 5.0)).toDF("id", "x", "y")
    // 2-NN of the midpoint: ids 4 (b) and 8 (a) → tie → "a"
    val tie = KNN.classify(mid, train, "id", Seq("x", "y"), "cls", 2)
      .as[(Long, String)].collect().toMap
    assert(tie == Map(200L -> "a"))
  }

  test("regress averages the k nearest targets") {
    val test = Seq((100L, 0.1, 0.1)).toDF("id", "x", "y")
    val got = KNN.regress(test, train, "id", Seq("x", "y"), "yval", 3)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(got(100L) - (1.0 + 2.0 + 3.0) / 3) < 1e-9)
  }

  test("distance ties at the k boundary break by train id") {
    val tr = Seq((1L, 1.0, "p"), (2L, -1.0, "q"), (3L, 1.0, "r"))
      .toDF("id", "x", "cls")
    val test = Seq((10L, 0.0)).toDF("id", "x")
    // all three at distance 1; k=2 keeps ids 1,2 → tie vote p/q → "p"
    val got = KNN.classify(test, tr, "id", Seq("x"), "cls", 2)
      .as[(Long, String)].collect().toMap
    assert(got == Map(10L -> "p"))
  }

  test("Learner facade predicts through fit/predict") {
    val test = Seq((100L, 0.2, 0.2, "?", 0.0), (101L, 10.2, 10.2, "?", 0.0))
      .toDF("id", "x", "y", "cls", "yval")
    val m = KNN.KNNClassifier("id", Seq("x", "y"), "cls", 3).fit(train)
    val preds = m.predict(test.drop("cls", "yval"))
      .select(col("id"), col("prediction"))
      .as[(Long, String)].collect().toMap
    assert(preds == Map(100L -> "a", 101L -> "b"))
  }

  test("IVF shortlist with nprobe = nlist is identical to the exact path") {
    // the recall-1 identity (same device ann_ivf pins for cosine): with
    // every list probed, the IVF candidate set IS the full train set and
    // the re-rank uses the identical fixed-chain d2 + TopKPairs selection
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id").as("id"),
        element_at(col("embedding"), 1).as("x"),
        element_at(col("embedding"), 2).as("y"),
        element_at(col("embedding"), 3).as("z"),
        col("label"))
    val test = emb.filter(col("id") % 10 === 0)
    val tr = emb.filter(col("id") % 10 =!= 0)
    val fs = Seq("x", "y", "z")
    val exactC = KNN.classify(test, tr, "id", fs, "label", 5)
      .as[(Long, Int)].collect().toMap
    val ivfC = KNN.classify(test, tr, "id", fs, "label", 5,
      ivf = Some((8, 8)))
      .as[(Long, Int)].collect().toMap
    assert(ivfC == exactC)
    assert(exactC.nonEmpty)
    val exactR = KNN.regress(test, tr, "id", fs, "label", 5)
      .as[(Long, Double)].collect().toMap
    val ivfR = KNN.regress(test, tr, "id", fs, "label", 5,
      ivf = Some((8, 8)))
      .as[(Long, Double)].collect().toMap
    assert(ivfR == exactR) // decimal-path means ⇒ bit-equal
  }

  test("IVF shortlist with few probes still finds within-cluster neighbors") {
    // two well-separated clusters, nlist = 2, nprobe = 1: every test
    // point's true neighbors share its cluster, so even the minimal
    // probe budget reproduces the exact answer
    val test = Seq((100L, 0.2, 0.2), (101L, 10.2, 10.2)).toDF("id", "x", "y")
    val exact = KNN.classify(test, train, "id", Seq("x", "y"), "cls", 3)
      .as[(Long, String)].collect().toMap
    val ivf = KNN.classify(test, train, "id", Seq("x", "y"), "cls", 3,
      ivf = Some((2, 1)))
      .as[(Long, String)].collect().toMap
    assert(ivf == exact)
  }

  test("production-nprobe agreement floor on the sf0.1 customer fixture") {
    // r13 ask #5: every prior IVF pin is at the nprobe = nlist identity;
    // this pins prediction AGREEMENT with the exact path at real probe
    // budgets (nprobe ≪ nlist) on the same 150-test/14850-train split
    // ml_knn_class runs. Measured 1.000 at both settings (the 2-D
    // feature space clusters coarsely, so 5-NN votes are robust to the
    // shortlist); the floor leaves headroom for legitimate plan churn.
    val cust = spark.read.parquet("/root/testdata/sf0.1/customer.parquet")
    val test = cust.filter(col("c_custkey") % 100 === 0)
    val tr = cust.filter(col("c_custkey") % 100 =!= 0)
    val fs = Seq("c_acctbal", "c_nationkey")
    val exact = KNN.classify(test, tr, "c_custkey", fs, "c_mktsegment", 5)
      .as[(Long, String)].collect().toMap
    assert(exact.size == 150)
    for (cfg <- Seq((8, 2), (16, 4))) {
      val ivf = KNN.classify(test, tr, "c_custkey", fs, "c_mktsegment", 5,
        ivf = Some(cfg))
        .as[(Long, String)].collect().toMap
      val agree = exact.count { case (id, p) => ivf.get(id).contains(p) }
      assert(agree.toDouble / exact.size >= 0.95,
        s"ivf=$cfg agreement ${agree.toDouble / exact.size}")
    }
  }

  test("ensureHashAggCapacity lifts only the Spark-default fallback threshold") {
    // TopKPairs runs through ObjectHashAggregate; at the default 128-key
    // fallback every task sort-spills its whole candidate slice (the sf10
    // kNN disk-full). The helper must lift the default but never clobber
    // an explicit user setting.
    val conf = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val before = spark.conf.getOption(conf)
    try {
      spark.conf.unset(conf) // back to the Spark default (128)
      graft.functions.TopKAgg.ensureHashAggCapacity(spark)
      assert(spark.conf.get(conf) == (1 << 18).toString)
      spark.conf.set(conf, "4096") // explicit user choice
      graft.functions.TopKAgg.ensureHashAggCapacity(spark)
      assert(spark.conf.get(conf) == "4096")
    } finally {
      before match {
        case Some(v) => spark.conf.set(conf, v)
        case None => spark.conf.unset(conf)
      }
    }
  }

  test("LSH classify equals exact vote over the LSH candidate set") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val dim = emb.select(size(col("embedding"))).first().getInt(0)
    val test = emb.filter(col("vec_id") % 100 === 0)
    val tr = emb.filter(col("vec_id") % 100 =!= 0)
    val got = KNN.classifyEmbeddingsLSH(
      test, tr, "vec_id", "embedding", dim, "label", 5, nPlanes = 6)
      .as[(Long, Int)].collect().toMap
    // ground truth: vote over the same lshTopKCosine candidates, driver-side
    val nn = graft.similarity.SimilarityOps.lshTopKCosine(
      test, tr, "vec_id", "embedding", dim, 5, 6)
      .join(tr.select(col("vec_id").as("neighbor_id"), col("label")), "neighbor_id")
      .select(col("query_id"), col("label")).as[(Long, Int)].collect()
    val want = nn.groupBy(_._1).map { case (q, rows) =>
      q -> rows.groupBy(_._2).map { case (l, xs) => (l, xs.length) }
        .toSeq.sortBy { case (l, n) => (-n, l) }.head._1
    }
    assert(got == want)
    assert(got.nonEmpty)
  }
}
