package graft.ml

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Agglomerative hierarchical clustering (reference
  * Orange/clustering/hierarchical.py:437-470 HierarchicalClustering,
  * linkages at hierarchical.py:19-23).
  *
  * The reference materializes the full N×N distance matrix — inherently
  * driver-side. The Spark shape mirrors the MDS/sample pattern the
  * survey adopts for matrix algorithms: fit the dendrogram on a
  * DETERMINISTIC sample (first `maxPoints` ids — bounded driver work,
  * Lance–Williams updates), then extend to all rows distributively by
  * nearest-centroid assignment (one broadcast join, codegen'd distance
  * expressions — the same shape as KMeans scoring, linear at 100 TB).
  *
  * Determinism: merge ties break on (distance, smaller min-id, smaller
  * max-id); output cluster ids are ranked by smallest member id.
  */
object Hierarchical {

  /** Lance–Williams agglomerative linkage over an in-memory point set.
    * Returns cluster label per input index (0..k−1, labels ordered by
    * each cluster's smallest member index). */
  def linkageLabels(pts: Array[Array[Double]], nClusters: Int,
                    linkage: String): Array[Int] = {
    val n = pts.length
    require(n >= 1, "empty input")
    val k = math.max(1, math.min(nClusters, n))
    // squared distances for ward, plain euclidean otherwise
    def dist(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      if (linkage == "ward") s else math.sqrt(s)
    }
    val d = Array.tabulate(n, n)((i, j) => if (i == j) 0.0 else dist(pts(i), pts(j)))
    val size = Array.fill(n)(1)
    val active = scala.collection.mutable.SortedSet(0 until n: _*)
    val members = Array.tabulate(n)(i => scala.collection.mutable.ArrayBuffer(i))
    var clusters = n
    while (clusters > k) {
      // closest active pair; ties → smallest (i, j)
      var bi = -1; var bj = -1; var bd = Double.PositiveInfinity
      for (i <- active; j <- active if j > i) {
        if (d(i)(j) < bd) { bd = d(i)(j); bi = i; bj = j }
      }
      // Lance–Williams update of d(merged, k) stored into row bi
      val (ni, nj) = (size(bi).toDouble, size(bj).toDouble)
      for (o <- active if o != bi && o != bj) {
        val (dik, djk, dij) = (d(bi)(o), d(bj)(o), d(bi)(bj))
        val nk = size(o).toDouble
        val upd = linkage match {
          case "single"   => math.min(dik, djk)
          case "complete" => math.max(dik, djk)
          case "average"  => (ni * dik + nj * djk) / (ni + nj)
          case "ward"     => // on squared distances
            ((ni + nk) * dik + (nj + nk) * djk - nk * dij) / (ni + nj + nk)
          case other => throw new IllegalArgumentException(s"linkage $other")
        }
        d(bi)(o) = upd; d(o)(bi) = upd
      }
      size(bi) += size(bj)
      members(bi) ++= members(bj)
      active -= bj
      clusters -= 1
    }
    val labels = new Array[Int](n)
    val ordered = active.toSeq.sortBy(c => members(c).min)
    ordered.zipWithIndex.foreach { case (c, lbl) =>
      members(c).foreach(m => labels(m) = lbl) }
    labels
  }

  /** Fit on the first `maxPoints` ids, assign every row to the nearest
    * fitted-cluster centroid. Returns (id, cluster). */
  def cluster(df: DataFrame, idCol: String, features: Seq[String],
              nClusters: Int, linkage: String = "average",
              maxPoints: Int = 200): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val proj = df.select(col(idCol).cast("long").as("__id") +:
      features.map(f => col(f).cast("double")): _*)
    val sample = proj.orderBy(col("__id")).limit(maxPoints).collect()
    val pts = sample.map(r => Array.tabulate(features.size)(i => r.getDouble(i + 1)))
    val labels = linkageLabels(pts, nClusters, linkage)
    // per-cluster centroids of the fitted sample (driver-side, tiny)
    val byLbl = labels.zip(pts).groupBy(_._1)
    val centroids = byLbl.toSeq.sortBy(_._1).map { case (lbl, rows) =>
      (lbl, Array.tabulate(features.size)(i =>
        rows.map(_._2(i)).sum / rows.length)) }
    val centDF = broadcast(centroids.map { case (l, c) => (l, c.toSeq) }
      .toDF("__cl", "__cent"))
    val dist2 = features.zipWithIndex.map { case (f, i) =>
      val diff = col(f).cast("double") - element_at(col("__cent"), i + 1)
      diff * diff }.reduce(_ + _)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__id"))
      .orderBy(col("__d2").asc, col("__cl").asc)
    df.select(col(idCol).cast("long").as("__id") +: features.map(col): _*)
      .crossJoin(centDF)
      .withColumn("__d2", dist2)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("__id").as(idCol), col("__cl").as("cluster"))
  }
}
