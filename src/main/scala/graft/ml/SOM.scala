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
  * Iterative → rows-only driver check, like the other fitted models.
  */
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
}
