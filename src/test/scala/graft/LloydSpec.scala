package graft

import org.apache.spark.sql.functions._
import graft.ml.Lloyd

/** Pins for deterministic Lloyd k-means: partitioning determinism,
  * count consistency, and Lloyd's monotone-inertia property. */
class LloydSpec extends SparkSpec {

  private def emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def fitOn(parts: Int, iters: Int) =
    Lloyd.fit(emb.repartition(parts), col("vec_id"),
      (0 until 4).map(i =>
        (s"e$i", element_at(col("embedding"), i + 1).cast("double"))),
      k = 4, iterations = iters)

  test("lloyd trajectory is partition-order independent") {
    val a = fitOn(1, 8).collect().map(_.toSeq).toSeq
    val b = fitOn(13, 8).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("lloyd sizes cover the table and inertia does not increase") {
    val n = emb.count()
    val r1 = fitOn(4, 1).collect()
    val r8 = fitOn(4, 8).collect()
    assert(r8.map(_.getAs[Long]("size")).sum == n)
    val i1 = r1.map(_.getAs[Double]("inertia")).sum
    val i8 = r8.map(_.getAs[Double]("inertia")).sum
    assert(i8 <= i1 + 1e-6, s"inertia rose: 1-iter $i1 -> 8-iter $i8")
    // centroids sit on the 10-decimal grid the oracle rounds to
    val cs = r8.flatMap(r => (0 until 4).map(i => r.getAs[Double](s"c_e$i")))
    assert(cs.forall(v => (math.rint(v * 1e10) / 1e10) == v))
  }
}
