package graft.preprocess

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Fayyad–Irani entropy-MDL discretization (reference
  * Orange/preprocess/discretize.py:695 + Cython helpers _discretize.pyx):
  * recursively split a continuous feature at the boundary minimizing
  * class entropy, accepting splits only when the MDL criterion passes.
  *
  * Distributed design: ONE Spark aggregation builds the compact
  * (value → per-class counts) contingency — the only pass over the data —
  * then the recursion runs driver-side over that bounded array. The
  * contingency is bounded: when the feature's distinct-value count
  * exceeds `maxCandidates` (a truly continuous column, where distinct ≈
  * row count and the collect would OOM the driver at scale), values are
  * first snapped to a ≤`maxCandidates`-cell equal-width grid, and each
  * occupied cell becomes one candidate (represented by its max observed
  * value, so cuts still land between real data points). Semantics match
  * the exact recursion above grid resolution; below it, candidate cuts
  * are merged — the standard large-scale approximation.
  */
object EntropyMDL {

  /** Fit: returns the cut points for `feature` against discrete `target`. */
  def cuts(df: DataFrame, feature: String, target: String,
           maxCandidates: Int = 1 << 16): Seq[Double] = {
    val base = df.filter(col(feature).isNotNull && col(target).isNotNull)
      .select(col(feature).cast("double").as("x"), col(target).as("c"))
    val nDistinct = base
      .select(approx_count_distinct(col("x"), rsd = 0.02).as("nd"))
      .first().getLong(0)
    // (candidate value, class, count) rows — exact per-value below the
    // cap, per-grid-cell above it. Both shapes are ≤ ~maxCandidates ×
    // classes rows on the driver.
    val cont: Array[(Double, String, Long)] =
      if (nDistinct <= maxCandidates) {
        base.groupBy(col("x").as("v"), col("c"))
          .agg(count(lit(1)).as("n"))
          .collect()
          .map(r => (r.getDouble(0), r.getString(1), r.getLong(2)))
      } else {
        val mm = base.agg(min(col("x")).as("lo"), max(col("x")).as("hi")).first()
        val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
        val cell = base.select(
            width_bucket(col("x"), lit(lo), lit(hi), lit(maxCandidates))
              .as("b"), col("c"), col("x"))
          .groupBy(col("b"), col("c"))
          .agg(count(lit(1)).as("n"), max(col("x")).as("vc"))
          .collect()
        // one representative value per cell (max over the cell's classes)
        val rep = cell.groupBy(_.getLong(0))
          .map { case (b, rs) => b -> rs.map(_.getDouble(3)).max }
        cell.map(r => (rep(r.getLong(0)), r.getString(1), r.getLong(2)))
      }
    val classes = cont.map(_._2).distinct.sorted
    val cIdx = classes.zipWithIndex.toMap
    // sorted array of (value, classCounts)
    val byVal = cont.groupBy(_._1).toSeq
      .map { case (v, rows) =>
        val counts = Array.fill(classes.length)(0L)
        rows.foreach(r => counts(cIdx(r._2)) += r._3)
        (v, counts)
      }.sortBy(_._1)
    val values = byVal.map(_._1).toArray
    val counts = byVal.map(_._2).toArray

    def entropy(dist: Array[Long]): Double = {
      val n = dist.sum.toDouble
      if (n == 0) 0.0
      else dist.filter(_ > 0).map { k =>
        val p = k / n; -p * math.log(p) / math.log(2)
      }.sum
    }
    def add(a: Array[Long], b: Array[Long]): Array[Long] =
      a.zip(b).map { case (x, y) => x + y }
    def nClasses(dist: Array[Long]): Int = dist.count(_ > 0)

    val cutsBuf = scala.collection.mutable.ArrayBuffer.empty[Double]

    def split(lo: Int, hi: Int): Unit = { // [lo, hi) index range
      if (hi - lo < 2) return
      val total = (lo until hi).map(counts).reduce(add)
      val n = total.sum.toDouble
      val entS = entropy(total)
      // scan boundaries: prefix class counts
      var best = -1; var bestEnt = Double.MaxValue
      var bestLeft: Array[Long] = null; var bestRight: Array[Long] = null
      val prefix = Array.fill(total.length)(0L)
      for (i <- lo until hi - 1) {
        counts(i).indices.foreach(j => prefix(j) += counts(i)(j))
        val left = prefix.clone()
        val right = total.zip(left).map { case (t, l) => t - l }
        val nl = left.sum.toDouble; val nr = right.sum.toDouble
        val e = (nl / n) * entropy(left) + (nr / n) * entropy(right)
        if (e < bestEnt) {
          bestEnt = e; best = i; bestLeft = left; bestRight = right
        }
      }
      if (best < 0) return
      // MDL acceptance (Fayyad & Irani 1993):
      // gain > (log2(n-1) + log2(3^k - 2) - k·E(S) + k1·E(S1) + k2·E(S2)) / n
      val gain = entS - bestEnt
      val k = nClasses(total); val k1 = nClasses(bestLeft); val k2 = nClasses(bestRight)
      val delta = math.log(math.pow(3, k) - 2) / math.log(2) -
        (k * entS - k1 * entropy(bestLeft) - k2 * entropy(bestRight))
      val threshold = (math.log(n - 1) / math.log(2) + delta) / n
      if (gain > threshold) {
        cutsBuf += (values(best) + values(best + 1)) / 2.0
        split(lo, best + 1)
        split(best + 1, hi)
      }
    }
    split(0, values.length)
    cutsBuf.sorted.toSeq
  }

  /** Fit + apply: adds `<out>` bin index column via the fitted cuts. */
  def discretize(df: DataFrame, feature: String, target: String,
                 out: String): DataFrame = {
    val ts = cuts(df, feature, target)
    val expr = ts.zipWithIndex.reverse.foldLeft(lit(ts.length)) {
      case (els, (t, i)) => when(col(feature) < t, i).otherwise(els)
    }
    df.withColumn(out, expr.cast("int"))
  }
}
