package graft.ml

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables._
import graft.queries.SqlGen._

/** AdaBoost over depth-1 decision stumps (reference
  * Orange/ensembles/ada_boost.py — sklearn AdaBoostClassifier, discrete
  * SAMME, which for two classes is classic AdaBoost.M1; stump base
  * estimator is sklearn's default depth-limited tree at its smallest).
  *
  * Distributed shape: the per-round sample weights are never
  * materialized — boosting's identity w_i = exp(−y_i·F(x_i)) lets each
  * round score EVERY candidate stump in ONE map-side-combined
  * aggregation (2K+1 deterministic sums over the staged weight
  * expression). R rounds = R scans + 1 final accuracy scan. The model
  * (R stumps + alphas) is driver-side and tiny.
  *
  * Oracle-exactness (same device as [[SGD]]): weighted errors go through
  * the order-independent 12-decimal sum and are rounded to 10 decimals
  * before the argmin, alphas are rounded to 10 decimals, so Spark and
  * the CTE-unrolled DuckDB twin select identical stump sequences.
  */
object AdaBoost {

  /** One candidate stump h(x) = pol · (x ≤ thr ? +1 : −1). */
  final case class Cand(feat: String, thr: Double, pol: Int)

  /** Expand per-feature threshold lists into the ±polarity candidate
    * list in deterministic order (feature order, then threshold, +/−). */
  def candidates(featThrs: Seq[(String, Seq[Double])]): Seq[Cand] =
    for ((f, ts) <- featThrs; t <- ts; p <- Seq(1, -1)) yield Cand(f, t, p)

  private def clampEps(e: Double): Double =
    math.min(math.max(e, 1e-10), 1.0 - 1e-10)

  /** Fit `rounds` stumps; returns one row per round:
    * (round, feat, thr, pol, alpha, err, acc) where acc is the final
    * ensemble's training accuracy (repeated on every row so the output
    * stays a single rectangular table).
    * @param feats feature name → Column (raw scale — stumps are
    *              scale-free, no normalization needed)
    * @param y     label in {−1, +1} */
  def fitStumps(df: DataFrame, feats: Map[String, Column], y: Column,
                cands: Seq[Cand], rounds: Int): DataFrame = {
    val spark = df.sparkSession
    val base = df.select(
      feats.toSeq.sortBy(_._1).map { case (n, c) => c.as(s"x_$n") } :+
        y.cast("double").as("y"): _*).cache()
    def h(c: Cand): Column =
      lit(c.pol.toDouble) *
        when(col(s"x_${c.feat}") <= c.thr, 1.0).otherwise(-1.0)

    var picked = Vector.empty[(Int, Double, Double)] // (candIdx, alpha, err)
    def fExpr: Column = picked.foldLeft(lit(0.0)) {
      case (acc, (k, a, _)) => acc + lit(a) * h(cands(k))
    }
    for (_ <- 1 to rounds) {
      val w = exp(-col("y") * fExpr)
      val aggs = detSum(w).as("wsum") +: cands.zipWithIndex.map {
        case (c, k) =>
          detSum(w * (lit(1.0) - col("y") * h(c)) / 2.0).as(s"e_$k")
      }
      val row = base.agg(aggs.head, aggs.tail: _*).head()
      val wsum = row.getDouble(0)
      val errs = cands.indices.map(k =>
        k -> math.rint(row.getDouble(k + 1) / wsum * 1e10) / 1e10)
      val (bestK, err) = errs.minBy { case (k, e) => (e, k) }
      val ec = clampEps(err)
      val alpha = math.rint(0.5 * math.log((1.0 - ec) / ec) * 1e10) / 1e10
      picked :+= ((bestK, alpha, err))
    }
    val pred = when(fExpr > 0, 1.0).otherwise(-1.0)
    val acc = base.agg((sum(when(pred === col("y"), 1L).otherwise(0L)) /
      count(lit(1))).as("acc")).head().getDouble(0)
    base.unpersist()

    val schema = StructType(Seq(
      StructField("round", IntegerType, nullable = false),
      StructField("feat", StringType, nullable = false),
      StructField("thr", DoubleType, nullable = false),
      StructField("pol", IntegerType, nullable = false),
      StructField("alpha", DoubleType, nullable = false),
      StructField("err", DoubleType, nullable = false),
      StructField("acc", DoubleType, nullable = false)))
    val rows = picked.zipWithIndex.map { case ((k, a, e), i) =>
      val c = cands(k)
      Row(i + 1, c.feat, c.thr, c.pol, a, e, math.rint(acc * 1e6) / 1e6)
    }
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema)
  }

  /** DuckDB twin of [[fitStumps]]: per round, the candidate errors, the
    * rank-1 argmin, and the alpha live in chained CTEs; later rounds
    * reference earlier selections through CROSS JOINed 1-row CTEs, with
    * each selected stump re-expanded as a CASE over the candidate list. */
  def fitStumpsSql(table: String, featsSql: Map[String, String],
                   ySql: String, cands: Seq[Cand], rounds: Int): String = {
    def hSql(c: Cand): String =
      s"(${c.pol}.0 * (CASE WHEN (${featsSql(c.feat)}) <= ${c.thr} " +
        s"THEN 1.0 ELSE -1.0 END))"
    // h of the round-j selection, dispatched on sel_j.k
    def hSel(j: Int): String =
      cands.indices.map(k => s"WHEN ${k} THEN ${hSql(cands(k))}")
        .mkString(s"(CASE sel_$j.k ", " ", " END)")
    def fSql(upto: Int): String =
      if (upto < 1) "0.0"
      else (1 to upto).map(j => s"sel_$j.alpha * ${hSel(j)}").mkString(" + ")
    def selJoins(upto: Int): String =
      (1 to upto).map(j => s" CROSS JOIN sel_$j").mkString

    val roundCtes = (1 to rounds).map { r =>
      val w = s"EXP(-($ySql) * (${fSql(r - 1)}))"
      val errCols = cands.zipWithIndex.map { case (c, k) =>
        s"${sqlDetSum(s"$w * (1.0 - ($ySql) * ${hSql(c)}) / 2.0")} AS e_$k"
      }
      val errs =
        s"errs_$r AS (SELECT ${sqlDetSum(w)} AS wsum, " +
          s"${errCols.mkString(", ")} FROM $table${selJoins(r - 1)})"
      val unp = cands.indices.map(k =>
        s"SELECT $k AS k, ROUND(e_$k / wsum, 10) AS err FROM errs_$r")
        .mkString("unp_" + r + " AS (", " UNION ALL ", ")")
      val sel =
        s"""sel_$r AS (
           |  SELECT k, err,
           |    ROUND(0.5 * LN((1.0 - LEAST(GREATEST(err, 1e-10), 1.0 - 1e-10))
           |      / LEAST(GREATEST(err, 1e-10), 1.0 - 1e-10)), 10) AS alpha
           |  FROM (SELECT k, err,
           |          ROW_NUMBER() OVER (ORDER BY err ASC, k ASC) AS rn
           |        FROM unp_$r) WHERE rn = 1)""".stripMargin
      s"$errs,\n$unp,\n$sel"
    }
    val accCte =
      s"""acc AS (
         |  SELECT ROUND(SUM(CASE WHEN (CASE WHEN (${fSql(rounds)}) > 0
         |    THEN 1.0 ELSE -1.0 END) = ($ySql) THEN 1 ELSE 0 END) * 1.0
         |    / COUNT(*), 6) AS acc
         |  FROM $table${selJoins(rounds)})""".stripMargin
    val outRows = (1 to rounds).map { j =>
      val feat = cands.indices.map(k =>
        s"WHEN $k THEN '${cands(k).feat}'")
        .mkString(s"(CASE sel_$j.k ", " ", " END)")
      val thr = cands.indices.map(k => s"WHEN $k THEN ${cands(k).thr}")
        .mkString(s"(CASE sel_$j.k ", " ", " END)")
      val pol = cands.indices.map(k => s"WHEN $k THEN ${cands(k).pol}")
        .mkString(s"(CASE sel_$j.k ", " ", " END)")
      s"SELECT $j AS round, $feat AS feat, $thr AS thr, " +
        s"CAST($pol AS INT) AS pol, sel_$j.alpha AS alpha, " +
        s"sel_$j.err AS err, acc.acc AS acc FROM sel_$j CROSS JOIN acc"
    }
    s"""WITH ${roundCtes.mkString(",\n")},
       |$accCte
       |${outRows.mkString("\n UNION ALL ")}
       |ORDER BY round""".stripMargin
  }
}
