package graft

import org.apache.spark.sql.functions._
import graft.ml.PowerPCA

/** Pins for deflated power-iteration PCA: partitioning determinism
  * (moments reduce through detSum), dominance ordering, and the
  * Σ leverage = nComp identity of orthonormal components. */
class PowerPCASpec extends SparkSpec {

  private def emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def feats = (0 until 8).map(i =>
    (s"e$i", element_at(col("embedding"), i + 1).cast("double")))

  test("power PCA is partition-order independent") {
    val a = PowerPCA.eigs(emb.repartition(1), feats, 2, 25)
      .collect().map(_.toSeq).toSeq
    val b = PowerPCA.eigs(emb.repartition(11), feats, 2, 25)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("dominant eigenvalue leads and ratios are sane") {
    val r = PowerPCA.eigs(emb, feats, 2, 25).collect()
      .sortBy(_.getAs[Int]("component"))
    val l1 = r(0).getAs[Double]("eigenvalue")
    val l2 = r(1).getAs[Double]("eigenvalue")
    assert(l1 > 0 && l2 > 0 && l1 >= l2, s"eigenvalues $l1, $l2")
    val evr = r.map(_.getAs[Double]("evr"))
    assert(evr.forall(e => e > 0 && e < 1) && evr.sum < 1)
  }

  test("leverage scores sum to the component count") {
    val lev = PowerPCA.leverage(emb, feats, 3, 25).collect()
    assert(lev.length == 8)
    val tot = lev.map(_.getAs[Double]("leverage")).sum
    // orthonormal v's ⇒ Σ_j Σ_c v_cj² = nComp (up to grid rounding)
    assert(math.abs(tot - 3.0) < 1e-4, s"leverage sum $tot")
    assert(lev.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to 8))
  }
}
