package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CN2 rule induction (reference Orange/classification/rules.py) — the
  * distributed evaluator for its inner loop.
  *
  * CN2 beam-searches single conditions (feature = value), scoring each
  * candidate rule by Laplace accuracy (rules.py LaplaceAccuracyEvaluator):
  * (majority-class covered + 1) / (covered + #classes). The evaluation of
  * ALL candidate rules is one aggregation pass per feature (contingency),
  * so each beam iteration is shuffle-bounded, not candidate-bounded.
  * This implements the evaluator + top-k selection; the outer
  * separate-and-conquer loop (remove covered, repeat) composes it.
  */
object Rules {

  /** Evaluate every (feature = value ⇒ majority class) rule; return the
    * top-k by Laplace accuracy (ties → feature, value asc). */
  def bestRules(df: DataFrame, features: Seq[String], classCol: String,
                k: Int): DataFrame = {
    val nClasses = df.agg(countDistinct(col(classCol)).as("k_cls"))
    val perFeature = features.map { f =>
      df.groupBy(col(f).cast("string").as("value"), col(classCol).as("c"))
        .agg(count(lit(1)).as("nc"))
        .select(lit(f).as("feature"), col("value"), col("c"), col("nc"))
    }.reduce(_.unionByName(_))
    val wRule = Window.partitionBy(col("feature"), col("value"))
      .orderBy(col("nc").desc, col("c").asc)
    val rules = perFeature
      .withColumn("covered", sum(col("nc")).over(
        Window.partitionBy(col("feature"), col("value"))))
      .withColumn("rn", row_number().over(wRule))
      .filter(col("rn") === 1)
      .crossJoin(broadcast(nClasses))
      .select(col("feature"), col("value"), col("c").as("predicted"),
        col("nc").as("n_correct"), col("covered"),
        round((col("nc") + 1) / (col("covered") + col("k_cls")), 6)
          .as("laplace"))
    rules
      .withColumn("rank", row_number().over(Window.orderBy(
        col("laplace").desc, col("feature").asc, col("value").asc)))
      .filter(col("rank") <= k)
      .orderBy(col("rank"))
  }
}
