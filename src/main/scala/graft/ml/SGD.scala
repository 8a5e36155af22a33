package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Tables._

/** Gradient-descent linear models (reference Orange/classification/sgd.py
  * and Orange/regression/svm.py — sklearn SGDClassifier/SGDRegressor/
  * LinearSVR, full-batch variant) with pluggable loss.
  *
  * Each iteration is ONE distributed aggregation: the loss gradient
  * Σ r(w·x, y)·x reduces map-side, the tiny weight vector lives on the
  * driver — the classic Spark iterative-ML shape (same as MLlib's own
  * optimizers).
  *
  * Oracle-exactness (unusual for an iterative fit): gradients go through
  * order-independent sums and the weights are rounded to 10 decimals
  * after every step, which snaps Spark's and DuckDB's trajectories to
  * the same values — the SQL twin unrolls the iterations as chained
  * CTEs. Features should be pre-scaled to ~[0,1] so per-term libm ulp
  * error stays far below the rounding grid. Supported losses: logistic
  * (σ(z)−y residual), ε-insensitive (LinearSVR subgradient sign(z−y)
  * outside the tube), hinge (SVC subgradient −y when y·z<1).
  */
object SGD {

  /** A GD loss = per-row gradient residual r (gradient is Σ r·x) plus
    * the final training metric, in both Column and DuckDB-SQL form.
    * The residual must be branch-deterministic: comparisons only on
    * values both engines compute bit-identically (z is a fixed-order
    * dot product of 10-decimal-rounded weights with parquet doubles). */
  sealed trait GDLoss {
    def residual(z: Column, y: Column): Column
    def residualSql(z: String, y: String): String
    def metricName: String
    /** aggregated training metric; `gsum` is the order-independent sum */
    def metric(z: Column, y: Column, gsum: Column => Column,
               n: Long): Column
    def metricSql(z: String, y: String, gsum: String => String): String
  }

  /** Logistic loss, y ∈ {0,1}: r = σ(z) − y; metric = accuracy. */
  case object LogisticLoss extends GDLoss {
    private def p(z: Column) = lit(1.0) / (lit(1.0) + exp(-z))
    def residual(z: Column, y: Column): Column = p(z) - y
    def residualSql(z: String, y: String): String =
      s"(1.0 / (1.0 + EXP(-($z)))) - ($y)"
    def metricName = "accuracy"
    def metric(z: Column, y: Column, gsum: Column => Column,
               n: Long): Column = {
      val correct = (when(p(z) > 0.5, 1).otherwise(0) === y).cast("int")
      round(sum(correct) / count(lit(1)), 6)
    }
    def metricSql(z: String, y: String, gsum: String => String): String =
      s"ROUND(SUM(CASE WHEN (CASE WHEN (1.0 / (1.0 + EXP(-($z)))) > 0.5 " +
      s"THEN 1 ELSE 0 END) = ($y) THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)"
  }

  /** ε-insensitive loss (LinearSVR, reference Orange/regression/svm.py):
    * r = sign(z−y) outside the ε-tube, 0 inside; metric = MSE (through
    * the order-independent sum so both engines agg identically). */
  final case class EpsilonInsensitiveLoss(eps: Double) extends GDLoss {
    def residual(z: Column, y: Column): Column = {
      val e = z - y
      when(abs(e) > eps, signum(e)).otherwise(lit(0.0))
    }
    def residualSql(z: String, y: String): String =
      s"(CASE WHEN ABS(($z) - ($y)) > $eps " +
      s"THEN CAST(SIGN(($z) - ($y)) AS DOUBLE) ELSE 0.0 END)"
    def metricName = "mse"
    def metric(z: Column, y: Column, gsum: Column => Column,
               n: Long): Column =
      round(gsum((z - y) * (z - y)) / lit(n.toDouble), 6)
    def metricSql(z: String, y: String, gsum: String => String): String =
      s"ROUND(${gsum(s"(($z) - ($y)) * (($z) - ($y))")} / COUNT(*), 6)"
  }

  /** Hinge loss (linear SVC subgradient), y ∈ {−1,+1}:
    * r = −y when y·z < 1 else 0; metric = sign accuracy. */
  case object HingeLoss extends GDLoss {
    def residual(z: Column, y: Column): Column =
      when(y * z < 1.0, -y).otherwise(lit(0.0))
    def residualSql(z: String, y: String): String =
      s"(CASE WHEN ($y) * ($z) < 1.0 THEN -($y) ELSE 0.0 END)"
    def metricName = "accuracy"
    def metric(z: Column, y: Column, gsum: Column => Column,
               n: Long): Column = {
      val correct = (when(z > 0, 1).otherwise(-1) === y).cast("int")
      round(sum(correct) / count(lit(1)), 6)
    }
    def metricSql(z: String, y: String, gsum: String => String): String =
      s"ROUND(SUM(CASE WHEN (CASE WHEN ($z) > 0 THEN 1 ELSE -1 END) = " +
      s"($y) THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)"
  }

  /** Full-batch GD over `loss`.
    * @param feats (name, expression) pairs, pre-scaled to ~[0,1]
    * @param y     label expression (0/1 logistic, real SVR, ±1 hinge)
    * @return one row: final weights, intercept, training metric. */
  def linearGD(df: DataFrame, feats: Seq[(String, Column)], y: Column,
               iterations: Int, lr: Double, loss: GDLoss): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val spark = df.sparkSession
    val k = feats.size
    // materialize features once; weights enter as a broadcast row rather
    // than literals so every iteration reuses the SAME physical plan —
    // literal weights would force a whole-stage-codegen recompile per
    // step (measured 3 s/iteration vs ~0.3 s with a stable plan)
    val base = df.select(feats.map { case (n, f) => f.as(s"x_$n") } :+
      y.cast("double").as("y"): _*).cache()
    val wSchema = StructType((0 to k).map(i =>
      StructField(s"wc$i", DoubleType, nullable = false)))
    def wDF(w: Array[Double]) = spark.createDataFrame(
      java.util.Arrays.asList(Row.fromSeq(w.toSeq)), wSchema)
    def zOf = feats.zipWithIndex.map { case ((n, _), i) =>
      col(s"x_$n") * col(s"wc$i") }.reduce(_ + _) + col(s"wc$k")

    // order-independent gradient sums via SCALED LONGS, not decimals:
    // per-row residual and features are bounded in [−1,1], so
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
        .select(col("*"),
          loss.residual(zOf, col("y")).as("r")) // evaluated once per row
      val aggs = feats.map { case (n, _) =>
        gradSum(col("r") * col(s"x_$n")) } :+ gradSum(col("r"))
      val row = withR.agg(aggs.head, aggs.tail: _*).head()
      w = w.zipWithIndex.map { case (wi, i) =>
        math.rint((wi - lr * row.getDouble(i) / nRows) * 1e10) / 1e10 }
    }
    val outCols = feats.zipWithIndex.map { case ((name, _), i) =>
      lit(w(i)).as(s"w_$name") } :+
      lit(w(k)).as("intercept") :+
      loss.metric(zOf, col("y"), gradSum, nRows).as(loss.metricName)
    val out = base.crossJoin(broadcast(wDF(w)))
      .agg(outCols.head, outCols.tail: _*)
    val result = out.collect()
    base.unpersist()
    spark.createDataFrame(
      java.util.Arrays.asList(result: _*), out.schema)
  }

  /** DuckDB twin of [[linearGD]]: iterations unrolled as chained CTEs.
    * `featsSql` = (name, sqlExpr) with the same scaling; `table`/`ySql`
    * mirror the Spark inputs. */
  def linearGDSql(table: String, featsSql: Seq[(String, String)],
                  ySql: String, iterations: Int, lr: Double,
                  loss: GDLoss): String = {
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
    val steps = (1 to iterations).map { i =>
      val prev = s"it${i - 1}"
      val r = loss.residualSql(z(prev), ySql)
      val upd = featsSql.map { case (n, e) =>
        s"ROUND(MIN($prev.w_$n) - $lr * ${scaledSum(s"($r) * ($e)")} / COUNT(*), 10) AS w_$n"
      } :+
        s"ROUND(MIN($prev.b) - $lr * ${scaledSum(r)} / COUNT(*), 10) AS b"
      s"it$i AS (SELECT ${upd.mkString(",\n  ")} FROM $table CROSS JOIN $prev)"
    }
    val last = s"it$iterations"
    val metric = loss.metricSql(z(last), ySql, scaledSum)
    val envAbs = featsSql.map { case (_, e) => s"ABS($e)" }.mkString(", ")
    val env = s"env AS (SELECT COUNT(*) BETWEEN 1 AND 8000000 AND " +
      s"COALESCE(MAX(GREATEST($envAbs)), 1e300) <= 1.0 AS safe FROM $table)"
    s"""WITH $env,
       |it0 AS (SELECT $init),
       |${steps.mkString(",\n")}
       |SELECT ${names.map(n => s"MIN($last.w_$n) AS w_$n").mkString(", ")},
       |  MIN($last.b) AS intercept, $metric AS ${loss.metricName}
       |FROM $table CROSS JOIN $last""".stripMargin
  }

  /** Logistic-loss GD (reference Orange/classification/sgd.py), y ∈
    * {0,1} — kept as the named entry point used by ScoringSheet /
    * Calibration. */
  def logRegGD(df: DataFrame, feats: Seq[(String, Column)], y: Column,
               iterations: Int, lr: Double): DataFrame =
    linearGD(df, feats, y, iterations, lr, LogisticLoss)

  /** DuckDB twin of [[logRegGD]]. */
  def logRegGDSql(table: String, featsSql: Seq[(String, String)],
                  ySql: String, iterations: Int, lr: Double): String =
    linearGDSql(table, featsSql, ySql, iterations, lr, LogisticLoss)
}
