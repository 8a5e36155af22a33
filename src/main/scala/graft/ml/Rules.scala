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

  private case class CN2Rule(order: Int, feature: String, value: String,
                             predicted: String, nCorrect: Long,
                             covered: Long, laplace: Double)

  /** CN2 ordered decision list via separate-and-conquer
    * (rules.py:896-1007 `find_rules` + `exclusive_cover_and_remove`;
    * CN2Learner appends a default majority rule): loop — evaluate every
    * (feature = value ⇒ majority class) rule on the REMAINING rows,
    * keep the Laplace-best, remove its covered rows, repeat until no
    * candidate covers `minCovered` rows or `maxRules` rules exist.
    *
    * Scale shape: each iteration is ONE grouping-sets contingency scan
    * (StatsOps.multiFeatureContingency — map-side partial, no row ever
    * leaves the cluster); the candidate table is ≤ Σ|values|·|classes|
    * rows, so rule selection is driver-side closed form (the accepted
    * tiny-aggregate pattern). Ties pin (laplace desc, feature asc,
    * value asc) and majority pins (count desc, class asc), so the
    * trajectory — and the unrolled-CTE oracle [[cn2OrderedSql]] — are
    * deterministic. The default rule mimics the reference: majority
    * over the ORIGINAL data (fit_storage passes the unconsumed X,Y,W). */
  def cn2Ordered(df: DataFrame, features: Seq[String], classCol: String,
                 maxRules: Int, minCovered: Long = 1L): DataFrame = {
    val spark = df.sparkSession
    val base = df.select(
      features.map(f => col(f).cast("string").as(f)) :+
        col(classCol).cast("string").as("__cls"): _*).cache()
    val kCls = base.agg(countDistinct(col("__cls")).as("k")).head().getLong(0)
    def majority(rows: Seq[(String, Long)]): (String, Long) =
      rows.minBy { case (c, n) => (-n, c) }
    val rules = scala.collection.mutable.ArrayBuffer.empty[CN2Rule]
    var remaining = base
    var stop = false
    while (!stop && rules.size < maxRules) {
      val conts = graft.functions.StatsOps
        .multiFeatureContingency(remaining, features, "__cls")
      val cand = features.flatMap { f =>
        conts(f).collect().iterator
          .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
          .map(r => (f, r.getString(0), r.getString(1), r.getLong(2)))
      }
      val byRule = cand.groupBy(t => (t._1, t._2)).toSeq
        .map { case ((f, v), rows) =>
          val covered = rows.map(_._4).sum
          val (cls, nc) = majority(rows.map(t => (t._3, t._4)))
          CN2Rule(rules.size + 1, f, v, cls, nc, covered,
            (nc + 1.0) / (covered + kCls))
        }
        .filter(_.covered >= minCovered)
      if (byRule.isEmpty) stop = true
      else {
        val best = byRule.minBy(r => (-r.laplace, r.feature, r.value))
        rules += best
        remaining = remaining.filter(!(col(best.feature) <=> lit(best.value)))
      }
    }
    // default rule = majority classifier over the original data
    val clsCounts = base.groupBy(col("__cls")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val total = clsCounts.map(_._2).sum
    val (dc, dn) = majority(clsCounts)
    rules += CN2Rule(rules.size + 1, "_default", "", dc, dn, total,
      (dn + 1.0) / (total + kCls))
    base.unpersist()
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    def r6(v: Double) = new java.math.BigDecimal(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val schema = StructType(Seq(
      StructField("rule_order", IntegerType, nullable = false),
      StructField("feature", StringType, nullable = false),
      StructField("value", StringType, nullable = false),
      StructField("predicted", StringType, nullable = false),
      StructField("n_correct", LongType, nullable = false),
      StructField("covered", LongType, nullable = false),
      StructField("laplace", DoubleType, nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(rules.toSeq.map(r => Row(r.order, r.feature,
        r.value, r.predicted, r.nCorrect, r.covered, r6(r.laplace))): _*),
      schema)
  }

  /** DuckDB twin of [[cn2Ordered]]: the covering loop unrolled as CTE
    * rounds (the AdaBoost device) — cont_i contingency over rem_{i-1},
    * best_i Laplace-argmax with the same tie pins, rem_i filtered by a
    * CASE dispatch on best_i's data-dependent (feature, value). An
    * empty best_i empties every later rem via the cross join, matching
    * the driver loop's stop. CTEs are MATERIALIZED: each rem is
    * referenced once per feature branch, so inlining would expand the
    * rem chain |features|^maxRules times (DuckDB planner blow-up). */
  def cn2OrderedSql(table: String, feats: Seq[(String, String)],
                    clsSql: String, maxRules: Int,
                    minCovered: Long = 1L): String = {
    val featCols = feats.map { case (n, e) => s"$e AS $n" }.mkString(", ")
    def caseRm(b: String, r: String): String =
      s"CASE $b.feature " +
        feats.dropRight(1).map { case (n, _) =>
          s"WHEN '$n' THEN $r.$n = $b.value" }.mkString(" ") +
        s" ELSE $r.${feats.last._1} = $b.value END"
    val iters = (1 to maxRules).map { i =>
      val rem = s"rem${i - 1}"
      val cont = feats.map { case (n, _) =>
        s"SELECT '$n' AS feature, $n AS value, __cls AS c, COUNT(*) AS nc " +
          s"FROM $rem GROUP BY 2, 3"
      }.mkString("\n  UNION ALL\n  ")
      s"""cont$i AS MATERIALIZED (
         |  $cont),
         |best$i AS MATERIALIZED (
         |  SELECT feature, value, c AS predicted, nc AS n_correct, covered,
         |         (nc + 1.0) / (covered + (SELECT k FROM kc)) AS lap
         |  FROM (SELECT feature, value, c, nc,
         |          CAST(SUM(nc) OVER (PARTITION BY feature, value) AS BIGINT) AS covered,
         |          ROW_NUMBER() OVER (PARTITION BY feature, value
         |                             ORDER BY nc DESC, c ASC) AS rn
         |        FROM cont$i)
         |  WHERE rn = 1 AND covered >= $minCovered
         |  ORDER BY lap DESC, feature ASC, value ASC LIMIT 1),
         |rem$i AS MATERIALIZED (
         |  SELECT r.* FROM $rem r, best$i b
         |  WHERE NOT (${caseRm("b", "r")}))""".stripMargin
    }
    val rulesUnion = (1 to maxRules).map { i =>
      if (i == 1) s"SELECT 1 AS rule_order, * FROM best1"
      else s"SELECT $i, * FROM best$i"
    }.mkString("\n  UNION ALL ")
    s"""WITH base0 AS MATERIALIZED (
       |  SELECT $featCols, $clsSql AS __cls FROM $table),
       |kc AS (SELECT CAST(COUNT(DISTINCT __cls) AS BIGINT) AS k FROM base0),
       |rem0 AS (SELECT * FROM base0),
       |${iters.mkString(",\n")},
       |rules AS MATERIALIZED (
       |  $rulesUnion),
       |dflt AS (
       |  SELECT CAST((SELECT COUNT(*) FROM rules) + 1 AS INT) AS rule_order,
       |         '_default' AS feature, '' AS value, c AS predicted,
       |         nc AS n_correct, covered,
       |         (nc + 1.0) / (covered + (SELECT k FROM kc)) AS lap
       |  FROM (SELECT __cls AS c, CAST(COUNT(*) AS BIGINT) AS nc,
       |               CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS covered,
       |               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, __cls ASC) AS rn
       |        FROM base0 GROUP BY __cls) WHERE rn = 1)
       |SELECT rule_order, feature, value, predicted, n_correct, covered,
       |       ROUND(lap, 6) AS laplace
       |FROM (SELECT * FROM rules UNION ALL SELECT * FROM dflt)
       |ORDER BY rule_order""".stripMargin
  }

  /** CN2 UNORDERED rule set (rules.py find_rules with a target class per
    * class + CN2UnorderedLearner): for each class c — over the ORIGINAL
    * data — loop: evaluate every (feature = value ⇒ c) rule by Laplace
    * accuracy toward c, keep the best, remove its covered POSITIVES
    * (covered ∧ y = c, rules.py exclusive_cover_and_remove with
    * target_class), repeat. Classes induce independently, so rules may
    * overlap across classes — prediction is a weighted vote
    * ([[cn2PredictUnordered]]). Same contingency-scan + driver-argmax
    * shape and tie pins as [[cn2Ordered]]; oracle = per-(class, round)
    * CTE unrolling ([[cn2UnorderedSql]]). */
  def cn2Unordered(df: DataFrame, features: Seq[String], classCol: String,
                   maxPerClass: Int, minCovered: Long = 1L): DataFrame = {
    val spark = df.sparkSession
    val base = df.select(
      features.map(f => col(f).cast("string").as(f)) :+
        col(classCol).cast("string").as("__cls"): _*).cache()
    val kCls = base.agg(countDistinct(col("__cls")).as("k")).head().getLong(0)
    val classes = base.select(col("__cls")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    final case class UR(cls: String, order: Int, feature: String,
                        value: String, nCorrect: Long, covered: Long,
                        laplace: Double)
    val rules = scala.collection.mutable.ArrayBuffer.empty[UR]
    for (c <- classes) {
      var remaining = base
      var stop = false
      var order = 0
      while (!stop && order < maxPerClass) {
        val conts = graft.functions.StatsOps
          .multiFeatureContingency(remaining, features, "__cls")
        val cand = features.flatMap { f =>
          conts(f).collect().iterator
            .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
            .map(r => (f, r.getString(0), r.getString(1), r.getLong(2)))
        }
        val byRule = cand.groupBy(t => (t._1, t._2)).toSeq
          .map { case ((f, v), rows) =>
            val covered = rows.map(_._4).sum
            val ncc = rows.collectFirst {
              case (_, _, cls, n) if cls == c => n }.getOrElse(0L)
            UR(c, order + 1, f, v, ncc, covered,
              (ncc + 1.0) / (covered + kCls))
          }
          .filter(r => r.covered >= minCovered && r.nCorrect >= 1)
        if (byRule.isEmpty) stop = true
        else {
          val best = byRule.minBy(r => (-r.laplace, r.feature, r.value))
          rules += best
          order += 1
          remaining = remaining.filter(
            !(col(best.feature) <=> lit(best.value) &&
              col("__cls") <=> lit(c)))
        }
      }
    }
    // trailing default rule — global majority (rules.py fit_storage)
    val clsCounts = base.groupBy(col("__cls")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val total = clsCounts.map(_._2).sum
    val (dc, dn) = clsCounts.minBy { case (cc, n) => (-n, cc) }
    // the default row carries the majority CLASS in `value`
    rules += UR("_default", 1, "_default", dc, dn, total,
      (dn + 1.0) / (total + kCls))
    base.unpersist()
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    def r6(v: Double) = new java.math.BigDecimal(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val schema = StructType(Seq(
      StructField("cls", StringType, nullable = false),
      StructField("rule_order", IntegerType, nullable = false),
      StructField("feature", StringType, nullable = false),
      StructField("value", StringType, nullable = false),
      StructField("n_correct", LongType, nullable = false),
      StructField("covered", LongType, nullable = false),
      StructField("laplace", DoubleType, nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(rules.toSeq.map(r => Row(r.cls, r.order,
        r.feature, r.value, r.nCorrect, r.covered, r6(r.laplace))): _*),
      schema)
  }

  /** DuckDB twin of [[cn2Unordered]]: the per-class covering loops
    * unrolled as (class × round) CTE rounds. `classes` are the literal
    * class values of the fixture (the engine derives them from data;
    * the oracle needs them at SQL-generation time). */
  def cn2UnorderedSql(table: String, feats: Seq[(String, String)],
                      clsSql: String, classes: Seq[String],
                      maxPerClass: Int, minCovered: Long = 1L): String = {
    val featCols = feats.map { case (n, e) => s"$e AS $n" }.mkString(", ")
    def caseRm(b: String, r: String): String =
      s"CASE $b.feature " +
        feats.dropRight(1).map { case (n, _) =>
          s"WHEN '$n' THEN $r.$n = $b.value" }.mkString(" ") +
        s" ELSE $r.${feats.last._1} = $b.value END"
    val blocks = classes.zipWithIndex.flatMap { case (c, ci) =>
      (1 to maxPerClass).map { i =>
        val rem = if (i == 1) s"base0" else s"rem_${ci}_${i - 1}"
        val cont = feats.map { case (n, _) =>
          s"SELECT '$n' AS feature, $n AS value, " +
            s"CAST(COUNT(*) AS BIGINT) AS covered, " +
            s"CAST(SUM(CASE WHEN __cls = '$c' THEN 1 ELSE 0 END) AS BIGINT) AS ncc " +
            s"FROM $rem GROUP BY 2"
        }.mkString("\n  UNION ALL\n  ")
        s"""cont_${ci}_$i AS MATERIALIZED (
           |  $cont),
           |best_${ci}_$i AS MATERIALIZED (
           |  SELECT feature, value, ncc, covered,
           |         (ncc + 1.0) / (covered + (SELECT k FROM kc)) AS lap
           |  FROM cont_${ci}_$i
           |  WHERE covered >= $minCovered AND ncc >= 1
           |  ORDER BY lap DESC, feature ASC, value ASC LIMIT 1),
           |rem_${ci}_$i AS MATERIALIZED (
           |  SELECT r.* FROM $rem r, best_${ci}_$i b
           |  WHERE NOT (${caseRm("b", "r")} AND r.__cls = '$c'))""".stripMargin
      }
    }
    val rulesUnion = classes.zipWithIndex.flatMap { case (c, ci) =>
      (1 to maxPerClass).map { i =>
        s"SELECT '$c' AS cls, $i AS rule_order, feature, value, " +
          s"ncc AS n_correct, covered, lap FROM best_${ci}_$i"
      }
    }.mkString("\n  UNION ALL ")
    s"""WITH base0 AS MATERIALIZED (
       |  SELECT $featCols, $clsSql AS __cls FROM $table),
       |kc AS (SELECT CAST(COUNT(DISTINCT __cls) AS BIGINT) AS k FROM base0),
       |${blocks.mkString(",\n")},
       |rules AS MATERIALIZED (
       |  $rulesUnion),
       |dflt AS (
       |  SELECT '_default' AS cls, 1 AS rule_order, '_default' AS feature,
       |         c AS value, nc AS n_correct, covered,
       |         (nc + 1.0) / (covered + (SELECT k FROM kc)) AS lap
       |  FROM (SELECT __cls AS c, CAST(COUNT(*) AS BIGINT) AS nc,
       |               CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS covered,
       |               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, __cls ASC) AS rn
       |        FROM base0 GROUP BY __cls) WHERE rn = 1)
       |SELECT cls, rule_order, feature, value, n_correct, covered,
       |       ROUND(lap, 6) AS laplace
       |FROM (SELECT * FROM rules UNION ALL SELECT * FROM dflt)
       |ORDER BY cls, rule_order, feature, value""".stripMargin
  }

  /** Unordered rule-set prediction (rules.py:1202-1243
    * `unordered_predict`, coverage-weighted vote): every firing rule
    * adds its positive-coverage weight to its class; argmax (tie →
    * class asc); rows no rule fires on take the default class. */
  def cn2PredictUnordered(rules: Seq[(String, String, String, Long)],
                          default: String, df: DataFrame): DataFrame = {
    val classes = rules.map(_._1).distinct.sorted
    val scores = classes.map { c =>
      val contrib = rules.filter(_._1 == c).map { case (_, f, v, w) =>
        when(col(f).cast("string") === lit(v), lit(w.toDouble))
          .otherwise(lit(0.0))
      }
      c -> (if (contrib.isEmpty) lit(0.0) else contrib.reduce(_ + _))
    }
    val anyFire = scores.map(_._2).reduce(_ + _) > 0.0
    val best = scores.tail.foldLeft(
      struct(scores.head._2.as("s"), lit(scores.head._1).as("c"))) {
      case (acc, (c, s)) =>
        when(s > acc.getField("s"), struct(s.as("s"), lit(c).as("c")))
          .otherwise(acc)
    }
    df.withColumn("prediction",
      when(anyFire, best.getField("c")).otherwise(lit(default)))
  }

  /** Decision-list prediction (rules.py:1176-1200 `ordered_predict`):
    * rules fire in order, first match wins; the trailing `_default`
    * rule covers everything. `rules` = ordered (feature, value,
    * predicted) triples as produced by [[cn2Ordered]]. Compiles to one
    * nested CASE — a pure projection, zero shuffle at any scale. */
  def cn2Predict(rules: Seq[(String, String, String)],
                 df: DataFrame): DataFrame = {
    val pred = rules.foldRight(lit(null).cast("string")) {
      case ((f, v, p), acc) =>
        if (f == "_default") lit(p)
        else when(col(f).cast("string") === lit(v), lit(p)).otherwise(acc)
    }
    df.withColumn("prediction", pred)
  }
}
