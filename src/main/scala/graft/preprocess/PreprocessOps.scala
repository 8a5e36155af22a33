package graft.preprocess

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables._

/** Preprocessing transforms: discretize / continuize / impute / normalize
  * — reference: Orange/preprocess/discretize.py, continuize.py:11-100,
  * impute.py:14-390, normalize.py:11-110, transformation.py:15-339.
  *
  * Pattern shared by all fitted transforms: a *fit* aggregation computes
  * the parameters (min/max/mean/std/quantiles) as a 1-row DataFrame, and
  * the *apply* step crossJoin(broadcast(params)) + scalar expressions.
  * That keeps the apply side shuffle-free and codegen'd — the right shape
  * for 100 TB (one tiny broadcast instead of a window-over-nothing, which
  * would funnel all rows through one partition).
  */
object PreprocessOps {

  /** Fit one row of named stats and broadcast-attach it. */
  def withStats(df: DataFrame, stats: Seq[Column]): DataFrame =
    df.crossJoin(broadcast(df.agg(stats.head, stats.tail: _*)))

  // --- Discretize (discretize.py) ---------------------------------------

  /** EqualWidth (discretize.py:211): k bins over [min,max] computed from
    * the data. Returns df + `<out>` bin index 0..k-1 (max value folded
    * into the last bin, like Orange). */
  def equalWidth(df: DataFrame, c: String, k: Int, out: String): DataFrame = {
    val fitted = withStats(df, Seq(min(col(c)).as("__mn"), max(col(c)).as("__mx")))
    fitted.withColumn(out,
        least(floor((col(c) - col("__mn")) / ((col("__mx") - col("__mn")) / k)),
              lit(k - 1)).cast("int"))
      .drop("__mn", "__mx")
  }

  /** EqualFreq (discretize.py:181) — deterministic variant via ntile over
    * a total order (value + unique tiebreak). Note: ntile is a global
    * sort; the scale path uses approx quantile thresholds instead
    * (equalFreqApprox). */
  def equalFreqNtile(df: DataFrame, c: String, k: Int, tiebreak: Seq[String],
                     out: String): DataFrame = {
    val ord = (col(c).asc +: tiebreak.map(col(_).asc))
    df.withColumn(out, ntile(k).over(Window.orderBy(ord: _*)) - 1)
  }

  /** Scale path: thresholds from approx quantiles, then a codegen'd
    * width_bucket-style CASE — single pass + broadcast, no global sort. */
  def equalFreqApprox(df: DataFrame, c: String, k: Int, out: String): DataFrame = {
    val qs = df.stat.approxQuantile(c, (1 until k).map(_.toDouble / k).toArray, 1e-4)
    val expr = qs.zipWithIndex.reverse.foldLeft(lit(k - 1)) {
      case (els, (q, i)) => when(col(c) <= q, i).otherwise(els)
    }
    df.withColumn(out, expr.cast("int"))
  }

  /** FixedWidth bins (discretize.py:251): floor(x/width) with given origin. */
  def fixedWidth(c: Column, width: Double, origin: Double = 0d): Column =
    floor((c - origin) / width).cast("long")

  /** FixedTimeWidth (discretize.py:272): truncate timestamps to a unit. */
  def timeBin(c: Column, unit: String): Column = date_trunc(unit, c)

  /** Tumbling numeric-epoch window (also the batch twin of the streaming
    * op): bucket start in epoch seconds. */
  def epochBucket(ts: Column, seconds: Int): Column =
    (floor(unix_timestamp(ts) / seconds) * seconds).cast("long")

  // --- Continuize (continuize.py:11-100) ---------------------------------

  /** One-hot indicators for an enumerated value list (Indicators
    * treatment; transformation.py:100-173). Value list must be known —
    * Orange's discrete variables carry it. */
  def oneHot(df: DataFrame, c: String, values: Seq[String],
             prefix: String): DataFrame =
    values.foldLeft(df) { (d, v) =>
      d.withColumn(s"$prefix$v",
        when(col(c).isNull, null).otherwise(when(col(c) === v, 1).otherwise(0)))
    }

  /** AsOrdinal: value → its index in the dictionary (continuize.py). */
  def asOrdinal(c: Column, values: Seq[String]): Column =
    values.zipWithIndex.reverse.foldLeft(lit(null).cast("int")) {
      case (els, (v, i)) => when(c === v, i).otherwise(els)
    }

  // --- Impute (impute.py) -------------------------------------------------

  /** ReplaceUnknowns with the column mean (impute.py:96): fit + broadcast
    * + coalesce. */
  def imputeMean(df: DataFrame, c: String, out: String): DataFrame =
    withStats(df, Seq(exactMean(col(c)).as("__mean")))
      .withColumn(out, coalesce(col(c), col("__mean")))
      .drop("__mean")

  /** ReplaceUnknowns with a constant (impute.py:131-174). */
  def imputeConst(c: Column, v: Any): Column = coalesce(c, lit(v))

  /** AsValue (impute.py:285-324): unknown → distinct token + indicator. */
  def imputeAsValue(df: DataFrame, c: String, token: String = "N/A"): DataFrame =
    df.withColumn(s"${c}_defined", col(c).isNotNull.cast("int"))
      .withColumn(c, coalesce(col(c).cast("string"), lit(token)))

  /** Model-based imputation (impute.py:176-260): a learner predicts the
    * missing value from other columns; here the fitted model is the
    * per-group conditional mean (Orange's default tree/majority learners
    * reduce to exactly this for a single discrete predictor). Broadcast
    * join of the tiny fitted table + coalesce — no shuffle of the fact
    * side at scale. */
  def imputeModelGroupMean(df: DataFrame, c: String, by: String,
                           out: String): DataFrame = {
    val fitted = df.groupBy(col(by))
      .agg(exactMean(col(c)).as("__pred"))
    df.join(broadcast(fitted), Seq(by), "left")
      .withColumn(out, coalesce(col(c), col("__pred")))
      .drop("__pred")
  }

  /** Random imputation (impute.py:325-390): missing values drawn from the
    * column's empirical distribution — seeded inverse-CDF: u =
    * hash32(key)/2³², pick the ⌈u·n⌉-th defined value in sorted order.
    * The global row_number over defined values is the fixture-scale CDF;
    * at 100 TB the same contract is served by an approx-quantile sketch
    * (percentile_approx) instead of the exact ranking. */
  def imputeRandom(df: DataFrame, c: String, key: Column,
                   out: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val defined = df.filter(col(c).isNotNull)
      .select(col(c).as("__dv"), key.as("__dk"))
      .withColumn("__idx",
        row_number().over(Window.orderBy(col("__dv").asc, col("__dk").asc)))
    val n = defined.agg(count(lit(1)).as("__ndef"))
    val u = (hashVal32(concat(lit("imp_"), key)) + 0.5) / 4294967296.0
    df.crossJoin(broadcast(n))
      .withColumn("__pick",
        when(col(c).isNull, floor(u * col("__ndef")).cast("long") + 1))
      .join(broadcast(defined.select(col("__idx"), col("__dv"))),
        col("__pick") === col("__idx"), "left")
      .withColumn(out, coalesce(col(c), col("__dv")))
      .drop("__pick", "__idx", "__dv", "__ndef")
  }

  // --- Normalize / Scale (normalize.py, preprocess.py:261-356,467-545) ---

  /** Z-score standardization (center by mean, scale by sample SD). */
  def normalizeBySD(df: DataFrame, c: String, out: String,
                    center: Boolean = true): DataFrame = {
    val fitted = withStats(df,
      Seq(exactMean(col(c)).as("__m"), exactStdSamp(col(c)).as("__s")))
    val centered = if (center) col(c) - col("__m") else col(c)
    fitted.withColumn(out, centered / col("__s")).drop("__m", "__s")
  }

  /** Span normalization to [0,1] (zero-based option → x/max). */
  def normalizeBySpan(df: DataFrame, c: String, out: String,
                      zeroBased: Boolean = false): DataFrame = {
    val fitted = withStats(df, Seq(min(col(c)).as("__mn"), max(col(c)).as("__mx")))
    val e = if (zeroBased) col(c) / col("__mx")
            else (col(c) - col("__mn")) / (col("__mx") - col("__mn"))
    fitted.withColumn(out, e).drop("__mn", "__mx")
  }
}
