package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables._

/** Local Outlier Factor (reference
  * Orange/classification/outlier_detection.py:17-180, sklearn LOF).
  *
  * Exact LOF needs each point's k-NN set; here the neighbor candidate
  * set is the full pair join (exact, n² pairs) — correct at fixture
  * scale and for any pre-bucketed subset. The 100 TB path replaces the
  * self-join with an LSH / grid pre-bucketing that bounds candidates per
  * point (same contract: a pair table (a_id, b_id, dist)), after which
  * the k-dist / lrd / LOF cascade below is unchanged — it is three
  * hash-partitioned aggregations on a_id, all map-side combinable.
  *
  * Duplicate-point guard: reachability distance is floored at 1e-9 so
  * coincident points yield a large-but-finite LOF instead of ∞/NaN
  * (sklearn does the same via its own eps).
  */
object OutlierOps {

  /** LOF over a 1-D value column. Returns (id, lof). */
  def lof1d(df: DataFrame, idCol: String, valueCol: String, k: Int): DataFrame = {
    val a = df.select(col(idCol).as("a_id"), col(valueCol).as("a_v"))
    val b = df.select(col(idCol).as("b_id"), col(valueCol).as("b_v"))
    val pairs = a.join(b, col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"), abs(col("a_v") - col("b_v")).as("dist"))

    val w = Window.partitionBy(col("a_id")).orderBy(col("dist").asc, col("b_id").asc)
    val kdist = pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") === k)
      .select(col("a_id"), col("dist").as("kdist"))

    // N(a): all points within k-distance (ties included, standard LOF)
    val nbr = pairs.join(kdist, "a_id").filter(col("dist") <= col("kdist"))
      .select(col("a_id"), col("b_id"), col("dist"))

    val reach = nbr
      .join(kdist.select(col("a_id").as("b_id"), col("kdist").as("kdist_b")), "b_id")
      .select(col("a_id"), col("b_id"),
        greatest(col("kdist_b"), col("dist"), lit(1e-9)).as("reach"))

    val lrd = reach.groupBy(col("a_id"))
      .agg((count(lit(1)) / detSum(col("reach"))).as("lrd"))

    nbr.join(lrd.select(col("a_id").as("b_id"), col("lrd").as("lrd_b")), "b_id")
      .groupBy(col("a_id"))
      .agg((detSum(col("lrd_b")) / count(lit(1))).as("mean_lrd_b"))
      .join(lrd, "a_id")
      .select(col("a_id"), round(col("mean_lrd_b") / col("lrd"), 6).as("lof"))
  }
}
