package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Density clustering (reference Orange/clustering/dbscan.py, sklearn
  * DBSCAN) — exact 1-D specialization.
  *
  * In one dimension DBSCAN reduces to sort-order window algebra, fully
  * expressible as range-frame window functions (no pair joins):
  *   - core point:  |N_eps(x)| ≥ minPts  → RANGE BETWEEN -eps AND eps count
  *   - clusters:    consecutive cores with gap ≤ eps chain together
  *   - border:      non-core adopts the nearest core's cluster within eps
  *   - noise:       everything else (cluster = -1)
  *
  * Scale: the global value-ordered window is a RANGE partition (Spark
  * sorts once); for N-D data the same contract is served by grid-cell
  * bucketing + per-cell local DBSCAN + boundary merge — scheduled round 2.
  */
object Clustering {

  /** @return input + (n_nbr, is_core, cluster); cluster −1 = noise. */
  def dbscan1d(df: DataFrame, id: String, v: String, eps: Double,
               minPts: Int): DataFrame = {
    val wOrd = Window.orderBy(col(v).asc, col(id).asc)
    val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, 0)
    val wNext = wOrd.rowsBetween(0, Window.unboundedFollowing)

    val flagged = df
      // SQL-text window: the DataFrame rangeBetween API only accepts
      // integral offsets, while RANGE frames over a double key need a
      // double literal boundary.
      .withColumn("n_nbr", expr(
        s"count(1) OVER (ORDER BY $v RANGE BETWEEN $eps PRECEDING AND $eps FOLLOWING)"))
      .withColumn("is_core", (col("n_nbr") >= minPts).cast("int"))

    // chain consecutive cores: a core starts a new cluster when the
    // previous core is further than eps away
    val chained = flagged
      .withColumn("core_break",
        when(col("is_core") === 1 &&
          (last(when(col("is_core") === 1, col(v)), ignoreNulls = true)
            .over(wOrd.rowsBetween(Window.unboundedPreceding, -1)).isNull ||
           col(v) - last(when(col("is_core") === 1, col(v)), ignoreNulls = true)
            .over(wOrd.rowsBetween(Window.unboundedPreceding, -1)) > eps), 1)
          .otherwise(0))
      .withColumn("core_cluster",
        when(col("is_core") === 1, sum(col("core_break")).over(wPrev) - 1))

    // border points adopt the nearer in-range core's cluster
    chained
      .withColumn("prev_v", last(when(col("is_core") === 1, col(v)),
        ignoreNulls = true).over(wPrev))
      .withColumn("prev_cl", last(col("core_cluster"),
        ignoreNulls = true).over(wPrev))
      .withColumn("next_v", first(when(col("is_core") === 1, col(v)),
        ignoreNulls = true).over(wNext))
      .withColumn("next_cl", first(col("core_cluster"),
        ignoreNulls = true).over(wNext))
      .withColumn("cluster",
        when(col("is_core") === 1, col("core_cluster"))
          .when(col("prev_v").isNotNull && col(v) - col("prev_v") <= eps &&
            (col("next_v").isNull || col("next_v") - col(v) > eps ||
             col(v) - col("prev_v") <= col("next_v") - col(v)), col("prev_cl"))
          .when(col("next_v").isNotNull && col("next_v") - col(v) <= eps,
            col("next_cl"))
          .otherwise(lit(-1)))
      .drop("core_break", "core_cluster",
        "prev_v", "prev_cl", "next_v", "next_cl")
  }
}
