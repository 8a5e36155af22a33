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

  /** t-SNE on a deterministic sample (reference
    * Orange/projection/manifold.py:287 TSNE, openTSNE-backed): exact
    * perplexity-calibrated affinities (per-point σ by binary search),
    * classical-MDS (≡ PCA-score) init, early-exaggerated momentum
    * gradient descent — all driver-side on ≤`n` points, the same
    * sampled-matrix contract as [[mdsSampled]]. Every remaining row is
    * then placed distributively by [[extendByLandmarks]] (the analogue
    * of openTSNE's transform-by-interpolation). Deterministic: fixed
    * sample, fixed init, fixed schedule. */
  def tsneSampled(df: DataFrame, idCol: String, arrayCol: String,
                  n: Int, perplexity: Double = 30.0,
                  iters: Int = 300): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df.select(col(idCol).cast("long"),
        col(arrayCol).cast("array<double>"))
      .orderBy(col(idCol)).limit(n)
      .as[(Long, Seq[Double])].collect()
    val ids = rows.map(_._1); val x = rows.map(_._2.toArray)
    val m = ids.length
    require(m >= 4, "need at least 4 sample points")
    val d2 = Array.tabulate(m, m) { (i, j) =>
      var s = 0.0; var k = 0
      while (k < x(i).length) { val d = x(i)(k) - x(j)(k); s += d * d; k += 1 }
      s
    }
    // per-point σ calibrated to the target perplexity (binary search on β)
    val target = math.log(math.min(perplexity, (m - 1).toDouble))
    val p = Array.ofDim[Double](m, m)
    for (i <- 0 until m) {
      var bLo = 1e-20; var bHi = 1e20; var beta = 1.0
      for (_ <- 0 until 64) {
        var sum = 0.0; var sumD = 0.0
        for (j <- 0 until m if j != i) {
          val e = math.exp(-d2(i)(j) * beta); sum += e; sumD += d2(i)(j) * e
        }
        val h = if (sum > 0) math.log(sum) + beta * sumD / sum else 0.0
        if (h > target) { bLo = beta; beta = if (bHi < 1e19) (beta + bHi) / 2 else beta * 2 }
        else { bHi = beta; beta = (beta + bLo) / 2 }
      }
      var sum = 0.0
      for (j <- 0 until m if j != i) { p(i)(j) = math.exp(-d2(i)(j) * beta); sum += p(i)(j) }
      if (sum > 0) for (j <- 0 until m) p(i)(j) /= sum
    }
    // symmetrize, floor
    val pij = Array.tabulate(m, m) { (i, j) =>
      math.max((p(i)(j) + p(j)(i)) / (2.0 * m), 1e-12) }
    // init from classical scaling of the sample, shrunk to the usual 1e-4 scale
    val init = mdsSampled(df, idCol, arrayCol, n)
      .orderBy(col(idCol)).as[(Long, Double, Double)].collect()
    val maxAbs = math.max(1e-9, init.flatMap(r => Seq(r._2.abs, r._3.abs)).max)
    val y = Array.tabulate(m, 2)((i, c) =>
      (if (c == 0) init(i)._2 else init(i)._3) / maxAbs * 1e-4)
    val vel = Array.ofDim[Double](m, 2)
    // per-coordinate adaptive gains (van der Maaten's reference
    // implementation) — prevents the oscillation a fixed step shows on
    // tight clusters
    val gains = Array.fill(m, 2)(1.0)
    // sklearn's learning_rate='auto': max(N / early_exaggeration / 4, 50)
    val lr = math.max(m / 12.0 / 4.0, 50.0)
    for (it <- 0 until iters) {
      val exag = if (it < 100) 12.0 else 1.0
      val mom = if (it < 100) 0.5 else 0.8
      // q_ij ∝ (1+||yi−yj||²)⁻¹
      val num = Array.ofDim[Double](m, m)
      var zSum = 0.0
      for (i <- 0 until m; j <- 0 until m if i != j) {
        val dy0 = y(i)(0) - y(j)(0); val dy1 = y(i)(1) - y(j)(1)
        num(i)(j) = 1.0 / (1.0 + dy0 * dy0 + dy1 * dy1); zSum += num(i)(j)
      }
      for (i <- 0 until m) {
        var g0 = 0.0; var g1 = 0.0
        for (j <- 0 until m if j != i) {
          val q = math.max(num(i)(j) / zSum, 1e-12)
          val coef = (exag * pij(i)(j) - q) * num(i)(j)
          g0 += coef * (y(i)(0) - y(j)(0)); g1 += coef * (y(i)(1) - y(j)(1))
        }
        val gr = Array(4.0 * g0, 4.0 * g1)
        for (c <- 0 to 1) {
          gains(i)(c) =
            if (math.signum(gr(c)) != math.signum(vel(i)(c)))
              gains(i)(c) + 0.2
            else math.max(gains(i)(c) * 0.8, 0.01)
          vel(i)(c) = mom * vel(i)(c) - lr * gains(i)(c) * gr(c)
        }
      }
      for (i <- 0 until m) { y(i)(0) += vel(i)(0); y(i)(1) += vel(i)(1) }
    }
    val landmarks = ids.indices.map(i =>
      (ids(i), math.rint(y(i)(0) * 1e6) / 1e6, math.rint(y(i)(1) * 1e6) / 1e6))
      .toDF(idCol, "tsne1", "tsne2")
    extendByLandmarks(df, idCol, arrayCol, landmarks, "tsne1", "tsne2", 3)
  }

  /** Distributed out-of-sample placement: each non-landmark row gets the
    * inverse-distance-weighted average of its k nearest landmarks'
    * coordinates (openTSNE transform / landmark-MDS triangulation
    * analogue). Landmarks are broadcast (≤ sample size rows); per row
    * the candidate set is the landmark table — bounded work, codegen'd
    * distance expressions, no shuffle of the big side beyond the top-k
    * window on its own id. Landmark rows keep their exact coords. */
  def extendByLandmarks(df: DataFrame, idCol: String, arrayCol: String,
                        landmarks: DataFrame, c1: String, c2: String,
                        k: Int): DataFrame = {
    val spark = df.sparkSession
    val lm = landmarks
      .join(df.select(col(idCol).cast("long").as(idCol),
        col(arrayCol).cast("array<double>").as("__lv")), idCol)
      .select(col(idCol).cast("long").as("__lid"), col("__lv"),
        col(c1).as("__c1"), col(c2).as("__c2"))
    val pts = df.select(col(idCol).cast("long").as(idCol),
      col(arrayCol).cast("array<double>").as("__v"))
    val d2 = aggregate(zip_with(col("__v"), col("__lv"),
      (a, b) => (a - b) * (a - b)), lit(0.0), (acc, z) => acc + z)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__d2").asc, col("__lid").asc)
    // each rank appears once per group, so these aggregates are
    // singletons — the weighted mean below then adds them in a FIXED
    // left-to-right order (a plain sum over the k doubles would be
    // partition-order dependent)
    val aggCols =
      (1 to k).map(i =>
        sum(when(col("__rk") === i, col("__w"))).as(s"__w$i")) ++
      (1 to k).map(i =>
        sum(when(col("__rk") === i, col("__w") * col("__c1"))).as(s"__a$i")) ++
      (1 to k).map(i =>
        sum(when(col("__rk") === i, col("__w") * col("__c2"))).as(s"__b$i"))
    def z(n: String) = coalesce(col(n), lit(0.0))
    val wSum = (1 to k).map(i => z(s"__w$i")).reduce(_ + _)
    val aSum = (1 to k).map(i => z(s"__a$i")).reduce(_ + _)
    val bSum = (1 to k).map(i => z(s"__b$i")).reduce(_ + _)
    val nonLm = pts.join(lm.select(col("__lid")),
        pts(idCol) === col("__lid"), "left_anti")
      .crossJoin(broadcast(lm))
      .withColumn("__d2", d2)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .withColumn("__w", lit(1.0) / (col("__d2") + lit(1e-9)))
      .groupBy(col(idCol))
      .agg(aggCols.head, aggCols.tail: _*)
      .select(col(idCol),
        (round(aSum / wSum * 1e6) / 1e6).as(c1),
        (round(bSum / wSum * 1e6) / 1e6).as(c2))
    landmarks.select(col(idCol).cast("long").as(idCol), col(c1), col(c2))
      .unionByName(nonLm)
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
