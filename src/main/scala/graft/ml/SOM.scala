package graft.ml

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Self-organizing map (reference Orange/projection/som.py — batch SOM).
  *
  * Batch SOM is the cluster-friendly variant: one epoch = (1) every row
  * finds its best-matching unit against the broadcast codebook (narrow
  * map — the codebook is rows×cols×dim, tiny), (2) per-BMU vector sums
  * aggregate in one shuffle (posexplode → groupBy(bmu, dim)), (3) the
  * driver blends the per-unit sums through the Gaussian neighborhood
  * kernel (grid²·dim work — negligible) into the new codebook.
  * Deterministic: codebook initialized from the first rows×cols vectors
  * by id, no sampling, fixed epochs — same result every run (SOMSpec).
  *
  * Oracle-exact ([[fitSql]]): the whole trajectory is IEEE arithmetic
  * both engines perform identically — per-BMU sums reduce through
  * detSum's DECIMAL(38,14) grid, the Gaussian neighborhood weights are
  * driver-computed literals inlined into the SQL (no libm call crosses
  * the engine boundary), the BMU argmin compares fixed-order distance
  * forms with lowest-unit tie-break, and skipped-empty-unit terms
  * become exact +0.0 adds. The unrolled twin is one (assign, group,
  * pivot, blend) CTE quad per epoch. */
object SOM {

  /** @return per-unit assignment counts + mean quantization error after
    * training: (unit_row, unit_col, n_assigned, mean_qerr). */
  def fit(df: DataFrame, idCol: String, arrayCol: String,
          rows: Int, cols: Int, epochs: Int, sigma: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val data = df.select(col(idCol).cast("long").as("id"),
      col(arrayCol).cast("array<double>").as("x"))

    val k = rows * cols
    var codebook: Array[Array[Double]] = data.orderBy(col("id")).limit(k)
      .select("x").as[Seq[Double]].collect().map(_.toArray)
    val dim = codebook.head.length

    def gridDist2(a: Int, b: Int): Double = {
      val (ra, ca) = (a / cols, a % cols); val (rb, cb) = (b / cols, b % cols)
      ((ra - rb) * (ra - rb) + (ca - cb) * (ca - cb)).toDouble
    }

    // the codebook goes to executors as a proper broadcast variable —
    // shipped once per epoch, not re-serialized with every task closure
    def bmuOf(cb: Array[Array[Double]]) = {
      val bc = spark.sparkContext.broadcast(cb)
      udf { (xs: Seq[Double]) =>
        val m = bc.value
        var best = 0; var bd = Double.MaxValue; var j = 0
        while (j < m.length) {
          var d = 0.0; var i = 0
          while (i < xs.length) { val t = xs(i) - m(j)(i); d += t * t; i += 1 }
          if (d < bd) { bd = d; best = j }
          j += 1
        }
        best
      }
    }

    for (_ <- 1 to epochs) {
      val assigned = data.withColumn("bmu", bmuOf(codebook)(col("x")))
      // per-BMU per-dim sums AND row counts in ONE aggregation (one job
      // per epoch): count rides the dim=0 group (each row contributes
      // exactly one dim=0 element)
      val sums = assigned
        .select(col("bmu"), posexplode(col("x")).as(Seq("dim", "v")))
        .groupBy(col("bmu"), col("dim"))
        // order-independent accumulation — the codebook must be identical
        // across partitionings for the determinism contract (SOMSpec)
        .agg(graft.core.Tables.detSum(col("v")).as("s"),
          count(lit(1)).as("cnt"))
        .collect()
      val counts = sums.filter(_.getInt(1) == 0)
        .map(r => r.getInt(0) -> r.getLong(3)).toMap
      val sumVec = Array.fill(k, dim)(0.0)
      sums.foreach(r => sumVec(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      // neighborhood-kernel blend (driver-side, grid²·dim)
      codebook = (0 until k).toArray.map { j =>
        val num = Array.fill(dim)(0.0); var den = 0.0
        for (b <- 0 until k; if counts.contains(b)) {
          val h = math.exp(-gridDist2(j, b) / (2.0 * sigma * sigma))
          den += h * counts(b)
          var i = 0
          while (i < dim) { num(i) += h * sumVec(b)(i); i += 1 }
        }
        if (den > 0) num.map(_ / den) else codebook(j)
      }
    }

    val finalBmu = bmuOf(codebook)
    val bcFinal = spark.sparkContext.broadcast(codebook)
    val qerrUdf = udf { (xs: Seq[Double], j: Int) =>
      val m = bcFinal.value
      var d = 0.0; var i = 0
      while (i < xs.length) { val t = xs(i) - m(j)(i); d += t * t; i += 1 }
      math.sqrt(d)
    }
    data.withColumn("bmu", finalBmu(col("x")))
      .withColumn("qerr", qerrUdf(col("x"), col("bmu")))
      .groupBy(col("bmu"))
      .agg(count(lit(1)).as("n_assigned"),
        round(graft.core.Tables.detSum(col("qerr")) / count(lit(1)), 4)
          .as("mean_qerr"))
      .select((col("bmu") / cols).cast("int").as("unit_row"),
        pmod(col("bmu"), lit(cols)).as("unit_col"),
        col("n_assigned"), col("mean_qerr"))
      .orderBy(col("unit_row"), col("unit_col"))
  }

  /** DuckDB twin of [[fit]] for array columns read straight from
    * parquet (`arraySql(i)` must yield the i-th 0-based component).
    * Epochs unroll as (assignment, group, pivot, blend) CTE quads; the
    * Gaussian neighborhood factors inline as the identical doubles the
    * driver computed. */
  def fitSql(table: String, idSql: String, arraySql: Int => String,
             dim: Int, rows: Int, cols: Int, epochs: Int,
             sigma: Double): String = {
    val k = rows * cols
    def dl(v: Double): String = if (v < 0) s"($v)" else v.toString
    def h(a: Int, b: Int): Double = {
      val (ra, ca) = (a / cols, a % cols)
      val (rb, cb) = (b / cols, b % cols)
      val g2 = ((ra - rb) * (ra - rb) + (ca - cb) * (ca - cb)).toDouble
      math.exp(-g2 / (2.0 * sigma * sigma))
    }
    def det(t: String) =
      s"CAST(SUM(CAST(ROUND(($t), 12) AS DECIMAL(38,14))) AS DOUBLE)"
    val xs = (0 until dim).map(i => s"x_$i")
    val feats =
      s"""feats AS MATERIALIZED (
         |  SELECT $idSql AS id, ${(0 until dim).map(i =>
             s"CAST(${arraySql(i)} AS DOUBLE) AS x_$i").mkString(", ")}
         |  FROM $table)""".stripMargin
    val init =
      s"""seeds AS (
         |  SELECT *, ROW_NUMBER() OVER (ORDER BY id) AS rn
         |  FROM (SELECT * FROM feats ORDER BY id LIMIT $k) s),
         |cb0 AS MATERIALIZED (
         |  SELECT ${(0 until k).flatMap(u => (0 until dim).map(i =>
             s"MAX(CASE WHEN rn = ${u + 1} THEN x_$i END) AS m_${u}_$i"))
             .mkString(",\n    ")}
         |  FROM seeds)""".stripMargin
    def distExpr(cb: String, u: Int) = (0 until dim).map(i =>
      s"(x_$i - $cb.m_${u}_$i) * (x_$i - $cb.m_${u}_$i)").mkString(" + ")
    def argminCase = {
      val arms = (0 until k - 1).map { u =>
        val conds = (u + 1 until k).map(j => s"dd_$u <= dd_$j")
          .mkString(" AND ")
        s"WHEN $conds THEN $u"
      }
      s"CASE ${arms.mkString(" ")} ELSE ${k - 1} END"
    }
    val epochCtes = (1 to epochs).map { e =>
      val cb = s"cb${e - 1}"
      val asg =
        s"""asg$e AS (
           |  SELECT ${xs.mkString(", ")},
           |    ${(0 until k).map(u => s"${distExpr(cb, u)} AS dd_$u")
               .mkString(",\n    ")},
           |    $argminCase AS bmu
           |  FROM feats CROSS JOIN $cb)""".stripMargin
      val grp =
        s"""grp$e AS (
           |  SELECT bmu, COUNT(*) AS n,
           |    ${(0 until dim).map(i => s"${det(s"x_$i")} AS s_$i")
               .mkString(", ")}
           |  FROM asg$e GROUP BY bmu)""".stripMargin
      val piv =
        s"""piv$e AS MATERIALIZED (
           |  SELECT ${(0 until k).map(b =>
               s"COALESCE(MAX(CASE WHEN bmu = $b THEN CAST(n AS DOUBLE) END), 0.0) AS n_$b")
               .mkString(",\n    ")},
           |    ${(0 until k).flatMap(b => (0 until dim).map(i =>
               s"COALESCE(MAX(CASE WHEN bmu = $b THEN s_$i END), 0.0) AS s_${b}_$i"))
               .mkString(",\n    ")}
           |  FROM grp$e)""".stripMargin
      // blend: den_u first (lateral aliases), then each codebook entry;
      // +0.0 terms for empty units are exact no-ops, matching the
      // driver's skip-missing loop
      val dens = (0 until k).map { u =>
        (0 until k).map(b => s"${dl(h(u, b))} * n_$b").mkString(" + ") +
          s" AS den_$u"
      }
      val entries = (0 until k).flatMap { u =>
        (0 until dim).map { i =>
          val num = (0 until k).map(b => s"${dl(h(u, b))} * s_${b}_$i")
            .mkString(" + ")
          s"CASE WHEN den_$u > 0 THEN ($num) / den_$u " +
            s"ELSE $cb.m_${u}_$i END AS m_${u}_$i"
        }
      }
      val blend =
        s"""cb$e AS MATERIALIZED (
           |  SELECT ${entries.mkString(",\n    ")}
           |  FROM (SELECT ${dens.mkString(",\n    ")}, piv$e.*
           |    FROM piv$e) p CROSS JOIN $cb)""".stripMargin
      s"$asg,\n$grp,\n$piv,\n$blend"
    }
    val cbF = s"cb$epochs"
    val qerrCase = (0 until k - 1).foldRight(s"SQRT(dd_${k - 1})") {
      (u, rest) => s"CASE WHEN bmu = $u THEN SQRT(dd_$u) ELSE $rest END"
    }
    s"""WITH $feats,
       |$init,
       |${epochCtes.mkString(",\n")},
       |asgF AS (
       |  SELECT ${xs.mkString(", ")},
       |    ${(0 until k).map(u => s"${distExpr(cbF, u)} AS dd_$u")
           .mkString(",\n    ")},
       |    $argminCase AS bmu
       |  FROM feats CROSS JOIN $cbF)
       |SELECT CAST(bmu // $cols AS INT) AS unit_row,
       |  CAST(bmu % $cols AS INT) AS unit_col,
       |  CAST(COUNT(*) AS BIGINT) AS n_assigned,
       |  ROUND(${det(qerrCase)} / COUNT(*), 4) AS mean_qerr
       |FROM asgF
       |GROUP BY bmu
       |ORDER BY unit_row, unit_col""".stripMargin
  }
}
