package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.ml.feature.PCA
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.{DenseMatrix, Vector}

/** Manifold / matrix-factorization projections (reference
  * Orange/projection/manifold.py:119 MDS, cur.py:13 CUR).
  *
  * MDS: classical (Torgerson) scaling — double-center the squared
  * distance matrix, take the top-2 eigenpairs. The reference itself runs
  * this in-memory on the full table; at 100 TB the honest contract is a
  * deterministic SAMPLE (the survey marks t-SNE/MDS "driver-side on
  * sampled data, non-goal at scale"): distances for the ≤N-point sample
  * are computed in one driver pass, eigenvectors by power iteration (no
  * linear-algebra dependency). Out-of-sample points could be placed by
  * landmark triangulation — round 2.
  *
  * CUR: column selection by PCA leverage scores — the statistical
  * leverage of column j is Σ_k loadings²[j,k] over the top-k right
  * singular vectors; the distributed part (covariance/PCA) is MLlib's,
  * the ranking is a tiny driver table.
  */
object Manifold {

  /** Classical MDS of a sampled embedding table → (id, mds1, mds2).
    * Sample = first `n` rows by id (deterministic). */
  def mdsSampled(df: DataFrame, idCol: String, arrayCol: String,
                 n: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df.select(col(idCol).cast("long"),
        col(arrayCol).cast("array<double>"))
      .orderBy(col(idCol)).limit(n)
      .as[(Long, Seq[Double])].collect()
    val ids = rows.map(_._1); val x = rows.map(_._2.toArray)
    val m = ids.length
    // squared Euclidean distances
    val d2 = Array.tabulate(m, m) { (i, j) =>
      var s = 0.0; var k = 0
      while (k < x(i).length) { val d = x(i)(k) - x(j)(k); s += d * d; k += 1 }
      s
    }
    // double centering: B = -1/2 J D² J
    val rowMean = d2.map(_.sum / m)
    val grand = rowMean.sum / m
    val bMat = Array.tabulate(m, m) { (i, j) =>
      -0.5 * (d2(i)(j) - rowMean(i) - rowMean(j) + grand) }
    // top-2 eigenpairs by deflated power iteration (deterministic start)
    def powerIter(mat: Array[Array[Double]]): (Double, Array[Double]) = {
      var v = Array.tabulate(m)(i => 1.0 / math.sqrt(m.toDouble) *
        (if (i % 2 == 0) 1 else -1) * (1.0 + i.toDouble / m))
      var lambda = 0.0
      for (_ <- 0 until 200) {
        val w = Array.tabulate(m)(i =>
          mat(i).indices.map(j => mat(i)(j) * v(j)).sum)
        val norm = math.sqrt(w.map(a => a * a).sum)
        if (norm > 0) { v = w.map(_ / norm) }
        lambda = v.indices.map(i =>
          v(i) * mat(i).indices.map(j => mat(i)(j) * v(j)).sum).sum
      }
      (lambda, v)
    }
    val (l1, v1) = powerIter(bMat)
    val deflated = Array.tabulate(m, m) { (i, j) => bMat(i)(j) - l1 * v1(i) * v1(j) }
    val (l2, v2) = powerIter(deflated)
    val c1 = math.sqrt(math.max(l1, 0)); val c2 = math.sqrt(math.max(l2, 0))
    ids.indices.map { i =>
      (ids(i), math.rint(v1(i) * c1 * 1e6) / 1e6,
               math.rint(v2(i) * c2 * 1e6) / 1e6)
    }.toDF(idCol, "mds1", "mds2")
  }

  /** CUR column selection: rank embedding dimensions by PCA leverage
    * scores over the top-k components. */
  def curLeverage(df: DataFrame, arrayCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val data = df.withColumn("features",
      array_to_vector(col(arrayCol).cast("array<double>")))
    val model = new PCA().setK(k).setInputCol("features")
      .setOutputCol("pca").fit(data)
    val pc: DenseMatrix = model.pc // nFeatures × k loadings
    (0 until pc.numRows).map { j =>
      val lev = (0 until pc.numCols).map(c => {
        val v = pc(j, c); v * v }).sum
      (j, math.rint(lev * 1e6) / 1e6)
    }.sortBy(r => (-r._2, r._1))
      .zipWithIndex.map { case ((dim, lev), r) => (r + 1, dim, lev) }
      .toDF("rank", "dimension", "leverage")
  }
}
