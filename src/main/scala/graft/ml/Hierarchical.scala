package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
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

  // ---- oracle-exact variant: moment-based average-squared linkage ----

  /** DuckDB-faithful ROUND(x, 12): std::round(x·1e12)/1e12, half away
    * from zero on the scaled FP product. */
  private def r12(v: Double): Double = {
    val p = v * 1e12
    (if (p >= 0) math.floor(p + 0.5) else math.ceil(p - 0.5)) / 1e12
  }

  private case class CState(cid: Int, n: Long, s: Array[Double],
                            ss: Double, mid: Long)

  /** Agglomerative clustering with AVERAGE-SQUARED-EUCLIDEAN linkage —
    * the oracle-exact twin of [[cluster]]'s "average" mode. On squared
    * distances the average linkage has a closed moment form,
    * D(A,B) = ms_A + ms_B − 2·μ_A·μ_B  (ms = mean squared norm), so a
    * cluster is just (n, Σx, Σ‖x‖²) and a merge is componentwise
    * addition — the whole dendrogram becomes a deterministic scalar
    * trajectory both engines replay step for step (argmin ties break on
    * (linkage, smaller cid, larger cid); linkage values round to the
    * 1e-12 grid). Fit on the first `sampleN` ids; every row is then
    * assigned distributively to the nearest fitted centroid (broadcast
    * join, ties → smallest label) exactly like [[cluster]].
    * Labels rank clusters by smallest member id. */
  def clusterMoments(df: DataFrame, idCol: String,
                     feats: Seq[(String, Column)], nClusters: Int,
                     sampleN: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val d = feats.size
    val proj = df.select(col(idCol).cast("long").as("__id") +:
      feats.map { case (n, f) => f.cast("double").as(s"__x_$n") }: _*)
    val sample = proj.orderBy(col("__id")).limit(sampleN).collect()
    var st: Vector[CState] = sample.zipWithIndex.map { case (r, i) =>
      val x = Array.tabulate(d)(f => r.getDouble(f + 1))
      CState(i, 1L, x,
        (0 until d).map(f => x(f) * x(f)).reduceLeft(_ + _), r.getLong(0))
    }.toVector
    val k = math.max(1, math.min(nClusters, st.size))
    def link(a: CState, b: CState): Double =
      r12(a.ss / a.n + b.ss / b.n - 2.0 *
        (0 until d).map(f => (a.s(f) / a.n) * (b.s(f) / b.n))
          .reduceLeft(_ + _))
    while (st.size > k) {
      var best: (Double, Int, Int) = (Double.PositiveInfinity, -1, -1)
      for (ai <- st.indices; bi <- st.indices if st(bi).cid > st(ai).cid) {
        val cand = (link(st(ai), st(bi)), st(ai).cid, st(bi).cid)
        if (cand._1 < best._1 ||
            (cand._1 == best._1 && (cand._2 < best._2 ||
              (cand._2 == best._2 && cand._3 < best._3)))) best = cand
      }
      val a = st.find(_.cid == best._2).get
      val b = st.find(_.cid == best._3).get
      val merged = CState(a.cid, a.n + b.n,
        Array.tabulate(d)(f => a.s(f) + b.s(f)), a.ss + b.ss,
        math.min(a.mid, b.mid))
      st = st.filterNot(c => c.cid == a.cid || c.cid == b.cid) :+ merged
    }
    val labeled = st.sortBy(_.mid).zipWithIndex
    val cent = labeled.map { case (c, lbl) =>
      (lbl, Array.tabulate(d)(f => r12(c.s(f) / c.n))) }
    val centDF = broadcast(cent.map { case (l, c) => (l, c.toSeq) }
      .toDF("__cl", "__cent"))
    val dist2 = feats.zipWithIndex.map { case ((n, _), i) =>
      val diff = col(s"__x_$n") - element_at(col("__cent"), i + 1)
      diff * diff }.reduce(_ + _)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__id"))
      .orderBy(col("__d2").asc, col("__cl").asc)
    proj
      .crossJoin(centDF)
      .withColumn("__d2", dist2)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("__id").as(idCol), col("__cl").as("cluster"))
  }

  /** DuckDB twin of [[clusterMoments]]: the merge trajectory unrolls as
    * (pairs → best → state) CTE triples; assignment replays the
    * broadcast-argmin. `select` reads from `assigned(id, cluster)`. */
  def clusterMomentsSql(table: String, idSql: String,
                        featsSql: Seq[(String, String)], nClusters: Int,
                        sampleN: Int, select: String): String = {
    val d = featsSql.size
    val names = featsSql.map(_._1)
    val sCols = names.map(n => s"s_$n")
    val steps = sampleN - nClusters
    val stepCtes = (0 until steps).flatMap { t =>
      val cur = s"st_$t"
      val muDot = names.map(n => s"(a.s_$n / a.n) * (b.s_$n / b.n)")
        .mkString(" + ")
      Seq(
        s"""pr_$t AS (
           |  SELECT a.cid AS ac, b.cid AS bc,
           |    ROUND(a.ss / a.n + b.ss / b.n - 2.0 * ($muDot), 12) AS lk
           |  FROM $cur a JOIN $cur b ON a.cid < b.cid)""".stripMargin,
        s"""bs_$t AS (SELECT ac, bc FROM pr_$t
           |  ORDER BY lk, ac, bc LIMIT 1)""".stripMargin,
        s"""st_${t + 1} AS MATERIALIZED (
           |  SELECT s.cid, s.n, ${sCols.map(c => s"s.$c").mkString(", ")},
           |    s.ss, s.mid
           |  FROM $cur s CROSS JOIN bs_$t
           |  WHERE s.cid <> bs_$t.ac AND s.cid <> bs_$t.bc
           |  UNION ALL
           |  SELECT a.cid, a.n + b.n,
           |    ${names.map(n => s"a.s_$n + b.s_$n").mkString(", ")},
           |    a.ss + b.ss, LEAST(a.mid, b.mid)
           |  FROM $cur a CROSS JOIN $cur b CROSS JOIN bs_$t
           |  WHERE a.cid = bs_$t.ac AND b.cid = bs_$t.bc)""".stripMargin)
    }
    val ssInit = names.map(n => s"x_$n * x_$n").mkString(" + ")
    val d2 = names.map(n => s"(t.x_$n - f.c_$n) * (t.x_$n - f.c_$n)")
      .mkString(" + ")
    s"""WITH samp AS MATERIALIZED (
       |  SELECT ROW_NUMBER() OVER (ORDER BY id) - 1 AS cid, id,
       |    ${names.map(n => s"x_$n").mkString(", ")}
       |  FROM (SELECT $idSql AS id,
       |    ${featsSql.map { case (n, e) =>
           s"CAST($e AS DOUBLE) AS x_$n" }.mkString(",\n    ")}
       |  FROM $table ORDER BY 1 LIMIT $sampleN) t),
       |st_0 AS MATERIALIZED (
       |  SELECT cid, CAST(1 AS BIGINT) AS n,
       |    ${names.map(n => s"x_$n AS s_$n").mkString(", ")},
       |    ($ssInit) AS ss, id AS mid
       |  FROM samp),
       |${stepCtes.mkString(",\n")},
       |fin AS MATERIALIZED (
       |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY mid) - 1 AS INT) AS lbl,
       |    ${names.map(n => s"ROUND(s_$n / n, 12) AS c_$n").mkString(", ")}
       |  FROM st_$steps),
       |allr AS (SELECT $idSql AS id,
       |    ${featsSql.map { case (n, e) =>
           s"CAST($e AS DOUBLE) AS x_$n" }.mkString(",\n    ")}
       |  FROM $table),
       |assigned AS (
       |  SELECT id, lbl AS cluster FROM (
       |    SELECT t.id, f.lbl,
       |      ROW_NUMBER() OVER (PARTITION BY t.id
       |        ORDER BY ($d2) ASC, f.lbl ASC) AS rn
       |    FROM allr t CROSS JOIN fin f)
       |  WHERE rn = 1)
       |$select""".stripMargin
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
