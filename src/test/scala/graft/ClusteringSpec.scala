package graft

import org.apache.spark.sql.functions._
import graft.ml.Clustering

/** Grid DBSCAN (the N-D scale path) semantics, incl. the differential
  * check against the oracle-verified 1-D window implementation. */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def partition(rows: Seq[(Int, Long)]): Set[Set[Int]] =
    rows.filter(_._2 >= 0).groupBy(_._2).values.map(_.map(_._1).toSet).toSet

  test("grid DBSCAN matches the window 1-D implementation's partition") {
    val pts = ((1 to 10).map(i => (i, 1.0 + i * 0.1)) ++
      (11 to 20).map(i => (i, 50.0 + (i - 10) * 0.1)) :+ ((21, 200.0)))
      .toDF("id", "v")
    val byWindow = Clustering.dbscan1d(pts, "id", "v", 1.0, 3)
      .select("id", "cluster").as[(Int, Long)].collect().toSeq
    val byGrid = Clustering.dbscanGrid(pts, "id", Seq("v"), 1.0, 3)
      .select(col("id"), col("cluster")).as[(Int, Long)].collect().toSeq
    assert(partition(byWindow) == partition(byGrid))
    // identical noise set too
    assert(byWindow.filter(_._2 == -1).map(_._1).toSet ==
           byGrid.filter(_._2 == -1).map(_._1).toSet)
  }

  test("grid DBSCAN separates two 2-D blobs with noise") {
    val blobA = (1 to 12).map(i => (i, (i % 4) * 0.3, (i % 3) * 0.3))
    val blobB = (21 to 32).map(i => (i, 10.0 + (i % 4) * 0.3, 10.0 + (i % 3) * 0.3))
    val noise = Seq((99, 100.0, -50.0))
    val df = (blobA ++ blobB ++ noise).toDF("id", "x", "y")
    val out = Clustering.dbscanGrid(df, "id", Seq("x", "y"), 1.0, 3)
      .select(col("id"), col("cluster")).as[(Int, Long)].collect().toMap
    assert(blobA.map(p => out(p._1)).distinct.size == 1)
    assert(blobB.map(p => out(p._1)).distinct.size == 1)
    assert(out(1) != out(21))
    assert(out(99) == -1)
  }

  test("grid vs window DBSCAN agree on real fixture data") {
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey").as("id"), col("c_acctbal").as("v"))
    val byWindow = Clustering.dbscan1d(cust, "id", "v", 50.0, 3)
      .select(col("id").cast("int"), col("cluster")).as[(Int, Long)]
      .collect().toSeq
    val byGrid = Clustering.dbscanGrid(cust, "id", Seq("v"), 50.0, 3)
      .select(col("id").cast("int"), col("cluster")).as[(Int, Long)]
      .collect().toSeq
    assert(byWindow.size == byGrid.size)
    assert(partition(byWindow) == partition(byGrid))
    assert(byWindow.filter(_._2 == -1).map(_._1).toSet ==
           byGrid.filter(_._2 == -1).map(_._1).toSet)
  }

  test("chunked 1-D DBSCAN is bit-identical to the global-window version") {
    // dense runs engineered to straddle chunk boundaries (chunkWidth=3,
    // eps=1.5): cores on both sides of v=3,6,… must chain across chunks,
    // borders at exactly eps from a core, duplicates, and isolated noise
    val vs = Seq(0.2, 0.9, 1.4, 2.8, 2.9, 3.05, 3.1, 4.4, 5.9, 6.05,
      6.1, 7.4, 8.9, 9.0, 9.0, 10.5, 14.0, 20.0, 20.4, 21.9, -2.0, -0.1)
    val pts = vs.zipWithIndex.map { case (v, i) => (i + 1, v) }.toDF("id", "v")
    val global = Clustering.dbscan1d(pts, "id", "v", 1.5, 3)
      .select("id", "n_nbr", "is_core", "cluster")
      .as[(Int, Long, Int, Long)].collect().toSeq.sortBy(_._1)
    val chunked = Clustering.dbscan1dChunked(pts, "id", "v", 1.5, 3, 3.0)
      .select("id", "n_nbr", "is_core", "cluster")
      .as[(Int, Long, Int, Long)].collect().toSeq.sortBy(_._1)
    assert(global == chunked)
  }

  test("chunked 1-D DBSCAN matches on real fixture data") {
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey").as("id"), col("c_acctbal").as("v"))
    val global = Clustering.dbscan1d(cust, "id", "v", 10.0, 3)
      .select(col("id").cast("long"), col("n_nbr"), col("is_core"), col("cluster"))
      .as[(Long, Long, Int, Long)].collect().toSeq.sortBy(_._1)
    val chunked = Clustering.dbscan1dChunked(cust, "id", "v", 10.0, 3, 2000.0)
      .select(col("id").cast("long"), col("n_nbr"), col("is_core"), col("cluster"))
      .as[(Long, Long, Int, Long)].collect().toSeq.sortBy(_._1)
    assert(global == chunked)
  }

  test("large-star/small-star CC matches union-find on mixed topologies") {
    // long chain (diameter stress), a clique, a pair, isolated-by-absence
    val chain = (1 to 200).sliding(2).map(p => (p(0).toLong, p(1).toLong)).toSeq
    val clique = for (a <- 301 to 306; b <- (a + 1) to 306)
      yield (a.toLong, b.toLong)
    val pair = Seq((401L, 400L))
    val edges = (chain ++ clique ++ pair).toDF("u", "v")
    val got = Clustering.connectedComponentsLSS(edges)
      .as[(Long, Long)].collect().toMap
    // driver-side union-find ground truth
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    (chain ++ clique ++ pair).foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(k => k -> find(k)).toMap
    assert(got.size == want.size)
    assert(want.forall { case (n, lbl) => got(n) == lbl })
  }

  test("grid DBSCAN: cross-cell clusters chain through adjacent cells") {
    // points spaced 0.9 apart with eps=1.0: one chain across many cells
    val df = (1 to 15).map(i => (i, i * 0.9)).toDF("id", "v")
    val out = Clustering.dbscanGrid(df, "id", Seq("v"), 1.0, 2)
      .select(col("cluster")).distinct().count()
    assert(out == 1) // single cluster, no noise
  }
}
