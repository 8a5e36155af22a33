package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Tables._

/** Fisher linear discriminant, 2-class × 2-feature closed form (reference
  * Orange/projection/lda.py:12, sklearn LDA).
  *
  * w = S_w⁻¹ (μ₁ − μ₀) with the pooled within-class scatter inverted via
  * the 2×2 cofactor formula. Everything reduces to ONE aggregation pass
  * (12 conditional exact sums) + scalar arithmetic — fully distributed,
  * no collect, and bit-deterministic against the SQL oracle. Class mean
  * projections come free as w·μ_c (linearity), so separation is reported
  * without a second pass. Higher dimensions go through MLlib
  * PCA-style matrix routines (round 2); this is the oracle-checkable
  * core. */
object LDA2 {

  /** @return one row: weights (w1,w2), per-class mean projections,
    * separation. */
  def fisher2(df: DataFrame, x: String, y: String, classCol: String,
              classA: String, classB: String): DataFrame = {
    val cx = col(x); val cy = col(y); val c = col(classCol)
    def s(cond: Column, v: Column) = exactSum(when(cond, v))
    val a = c === classA; val b = c === classB
    val stats = df.filter(a || b).agg(
      s(a, cx).as("sxa"), s(a, cy).as("sya"),
      s(a, cx * cx).as("sxxa"), s(a, cx * cy).as("sxya"),
      s(a, cy * cy).as("syya"), count(when(a, lit(1))).as("na"),
      s(b, cx).as("sxb"), s(b, cy).as("syb"),
      s(b, cx * cx).as("sxxb"), s(b, cx * cy).as("sxyb"),
      s(b, cy * cy).as("syyb"), count(when(b, lit(1))).as("nb"))
    stats
      .withColumn("muax", col("sxa") / col("na"))
      .withColumn("muay", col("sya") / col("na"))
      .withColumn("mubx", col("sxb") / col("nb"))
      .withColumn("muby", col("syb") / col("nb"))
      .withColumn("sxx", (col("sxxa") - col("sxa") * col("sxa") / col("na")) +
        (col("sxxb") - col("sxb") * col("sxb") / col("nb")))
      .withColumn("sxy", (col("sxya") - col("sxa") * col("sya") / col("na")) +
        (col("sxyb") - col("sxb") * col("syb") / col("nb")))
      .withColumn("syy", (col("syya") - col("sya") * col("sya") / col("na")) +
        (col("syyb") - col("syb") * col("syb") / col("nb")))
      .withColumn("det", col("sxx") * col("syy") - col("sxy") * col("sxy"))
      .withColumn("d1", col("mubx") - col("muax"))
      .withColumn("d2", col("muby") - col("muay"))
      .withColumn("w1", (col("syy") * col("d1") - col("sxy") * col("d2")) / col("det"))
      .withColumn("w2", (col("sxx") * col("d2") - col("sxy") * col("d1")) / col("det"))
      .select(
        round(col("w1"), 8).as("w1"),
        round(col("w2"), 8).as("w2"),
        round(col("w1") * col("muax") + col("w2") * col("muay"), 6).as("proj_a"),
        round(col("w1") * col("mubx") + col("w2") * col("muby"), 6).as("proj_b"),
        round(col("w1") * col("d1") + col("w2") * col("d2"), 6).as("separation"))
  }
}
