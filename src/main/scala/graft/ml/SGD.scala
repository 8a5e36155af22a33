package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Tables._

/** Gradient-descent linear classifier (reference Orange/classification/
  * sgd.py, sklearn SGDClassifier with log loss — full-batch variant).
  *
  * Each iteration is ONE distributed aggregation: the logistic-loss
  * gradient Σ (σ(w·x) − y)·x reduces map-side (detSum terms), the tiny
  * weight vector lives on the driver — the classic Spark iterative-ML
  * shape (same as MLlib's own optimizers).
  *
  * Oracle-exactness (unusual for an iterative fit): gradients go through
  * detSum and the weights are rounded to 10 decimals after every step,
  * which snaps Spark's and DuckDB's trajectories to the same values —
  * the SQL twin unrolls the iterations as chained CTEs. Features should
  * be pre-scaled to ~[0,1] so per-term libm ulp error stays far below
  * the rounding grid.
  */
object SGD {

  /** @param feats   (name, expression) pairs, pre-scaled to ~[0,1]
    * @param y       0/1 label expression
    * @return one row: final weights, intercept, training accuracy. */
  def logRegGD(df: DataFrame, feats: Seq[(String, Column)], y: Column,
               iterations: Int, lr: Double): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val spark = df.sparkSession
    val k = feats.size
    // materialize features once; weights enter as a broadcast row rather
    // than literals so every iteration reuses the SAME physical plan —
    // literal weights would force a whole-stage-codegen recompile per
    // step (measured 3 s/iteration vs ~0.3 s with a stable plan)
    val base = df.select(feats.map { case (n, f) => f.as(s"x_$n") } :+
      y.cast("int").as("y"): _*).cache()
    val wSchema = StructType((0 to k).map(i =>
      StructField(s"wc$i", DoubleType, nullable = false)))
    def wDF(w: Array[Double]) = spark.createDataFrame(
      java.util.Arrays.asList(Row.fromSeq(w.toSeq)), wSchema)
    def zOf = feats.zipWithIndex.map { case ((n, _), i) =>
      col(s"x_$n") * col(s"wc$i") }.reduce(_ + _) + col(s"wc$k")
    def pOf = lit(1.0) / (lit(1.0) + exp(-zOf))

    // order-independent gradient sums via SCALED LONGS, not decimals:
    // per-row residual r = σ(z)−y and features are bounded in [−1,1], so
    // round(t·10¹²) is exact in a double and Σ over ≤8·10⁶ rows fits a
    // long (8e6·1e12 ≪ 2⁶³) — integer addition is associative
    // (partition-order free) and whole-stage-codegen fast, where
    // DECIMAL(38) accumulation measured ~2 s per 600k-row pass.
    // The envelope is VERIFIED, not assumed: one pre-pass checks the row
    // count and per-feature |x| bound; outside it, gradients fall back to
    // detSum's DECIMAL(38) accumulation (equally order-independent).
    val preCols = count(lit(1)).as("n") +:
      feats.map { case (n, _) => max(abs(col(s"x_$n"))).as(s"m_$n") }
    val pre = base.agg(preCols.head, preCols.tail: _*).head()
    val nRows = pre.getLong(0)
    // null max(abs(x)) (empty table / all-null feature) ⇒ outside envelope
    val maxAbs = (1 to k).map(i =>
      if (pre.isNullAt(i)) Double.PositiveInfinity else pre.getDouble(i))
      .foldLeft(0.0)(math.max)
    val scaledSafe = nRows > 0 && nRows <= 8000000L && maxAbs <= 1.0
    def gradSum(c: Column): Column =
      if (scaledSafe)
        (sum(round(c * 1e12, 0).cast("long")) / lit(1e12)).cast("double")
      else detSum(c)

    var w = Array.fill(k + 1)(0.0) // weights + intercept, zero init
    for (_ <- 1 to iterations if nRows > 0) {
      val withR = base.crossJoin(broadcast(wDF(w)))
        .select(col("*"), (pOf - col("y")).as("r")) // σ evaluated once/row
      val aggs = feats.map { case (n, _) =>
        gradSum(col("r") * col(s"x_$n")) } :+ gradSum(col("r"))
      val row = withR.agg(aggs.head, aggs.tail: _*).head()
      w = w.zipWithIndex.map { case (wi, i) =>
        math.rint((wi - lr * row.getDouble(i) / nRows) * 1e10) / 1e10 }
    }
    val correct = (when(pOf > 0.5, 1).otherwise(0) === col("y")).cast("int")
    val outCols = feats.zipWithIndex.map { case ((name, _), i) =>
      lit(w(i)).as(s"w_$name") } :+
      lit(w(k)).as("intercept") :+
      round(sum(correct) / count(lit(1)), 6).as("accuracy")
    val out = base.crossJoin(broadcast(wDF(w)))
      .agg(outCols.head, outCols.tail: _*)
    val result = out.collect()
    base.unpersist()
    spark.createDataFrame(
      java.util.Arrays.asList(result: _*), out.schema)
  }

  /** DuckDB twin of [[logRegGD]]: iterations unrolled as chained CTEs.
    * `featsSql` = (name, sqlExpr) with the same scaling; `table`/`ySql`
    * mirror the Spark inputs. */
  def logRegGDSql(table: String, featsSql: Seq[(String, String)],
                  ySql: String, iterations: Int, lr: Double): String = {
    // twin of the Spark side's gradient sum, INCLUDING the envelope
    // check: the env CTE evaluates the same nRows/max|x| predicate the
    // Spark side pre-computes, so both engines pick the same branch —
    // scaled-long inside the envelope, detSum's DECIMAL(38,14) outside.
    def scaledSum(t: String) = {
      val fast =
        s"(CAST(SUM(CAST(ROUND(($t) * 1e12, 0) AS BIGINT)) AS BIGINT) / 1e12)"
      val slow =
        s"CAST(SUM(CAST(ROUND(($t), 12) AS DECIMAL(38,14))) AS DOUBLE)"
      s"(CASE WHEN (SELECT safe FROM env) THEN $fast ELSE $slow END)"
    }
    val names = featsSql.map(_._1)
    val wCols = names.map(n => s"w_$n") :+ "b"
    val init = wCols.map(c => s"CAST(0.0 AS DOUBLE) AS $c").mkString(", ")
    def z(it: String) = featsSql.map { case (n, e) =>
      s"$it.w_$n * ($e)" }.mkString(" + ") + s" + $it.b"
    def p(it: String) = s"(1.0 / (1.0 + EXP(-(${z(it)}))))"
    val steps = (1 to iterations).map { i =>
      val prev = s"it${i - 1}"
      val upd = featsSql.map { case (n, e) =>
        s"ROUND(MIN($prev.w_$n) - $lr * ${scaledSum(s"(${p(prev)} - ($ySql)) * ($e)")} / COUNT(*), 10) AS w_$n"
      } :+
        s"ROUND(MIN($prev.b) - $lr * ${scaledSum(s"${p(prev)} - ($ySql)")} / COUNT(*), 10) AS b"
      s"it$i AS (SELECT ${upd.mkString(",\n  ")} FROM $table CROSS JOIN $prev)"
    }
    val last = s"it$iterations"
    val acc = s"ROUND(SUM(CASE WHEN (CASE WHEN ${p(last)} > 0.5 THEN 1 ELSE 0 END) = ($ySql) THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)"
    val envAbs = featsSql.map { case (_, e) => s"ABS($e)" }.mkString(", ")
    val env = s"env AS (SELECT COUNT(*) BETWEEN 1 AND 8000000 AND " +
      s"COALESCE(MAX(GREATEST($envAbs)), 1e300) <= 1.0 AS safe FROM $table)"
    s"""WITH $env,
       |it0 AS (SELECT $init),
       |${steps.mkString(",\n")}
       |SELECT ${names.map(n => s"MIN($last.w_$n) AS w_$n").mkString(", ")},
       |  MIN($last.b) AS intercept, $acc AS accuracy
       |FROM $table CROSS JOIN $last""".stripMargin
  }
}
