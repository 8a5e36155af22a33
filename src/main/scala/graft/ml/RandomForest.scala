package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Tables._

/** Deterministic random forest over depth-2 contingency trees (reference
  * Orange/classification/random_forest.py + Orange/modelling/randomforest.py
  * — sklearn RandomForestClassifier). The sklearn forest is RNG-bound
  * (bootstrap resampling + per-node feature draws), which would forfeit
  * the cross-engine oracle; this re-expression keeps the forest's defining
  * semantics — per-tree row bagging, per-tree feature subsets, majority
  * vote — with REPLAYABLE randomness:
  *
  *  - bagging: tree t keeps rows where md5-hash(rowKey, t) mod 1000 <
  *    632 (Bernoulli(0.632), the bootstrap's expected coverage; the
  *    portable-hash device every dedup/sampling operator here uses);
  *  - feature subsets: tree t drops feature (t−1) mod F — a cyclic
  *    rotation, data-independent, inlined identically in the SQL twin;
  *  - base tree: the oracle-proven depth-2 multiway entropy induction
  *    ([[DecisionTree.depth2]] — contingency algebra, two scans per
  *    tree, every rank over the tiny contingency, never the corpus).
  *
  * Vote: each tree predicts its leaf's majority class (rows whose
  * (root value, leaf value) never appeared in the tree's bag abstain);
  * the forest takes the class with most votes, ties to the smallest
  * class label, all-abstain rows fall back to the global majority.
  * Output is the training confusion matrix (actual, predicted, n).
  *
  * Scale shape: T trees = 2T contingency scans (each a map-side-combined
  * groupBy) + ONE vote scan with T broadcast leaf tables folded into a
  * single codegen'd CASE expression — no per-row shuffles, no MLlib job
  * storm, model state on the driver is ≤ T·|leaves| rows. */
object RandomForest {

  /** Per-tree feature subset: drop feature (t−1) mod F (1-based t). */
  def treeFeats[A](feats: Seq[A], t: Int): Seq[A] =
    feats.zipWithIndex.collect {
      case (f, i) if i != (t - 1) % feats.size => f }

  private def bagFilter(rowKey: Column, t: Int, permille: Int): Column =
    pmod(hashVal32(concat_ws("#", rowKey, lit("rfbag"), lit(t))),
      lit(1000)) < lit(permille)

  /** Fit `trees` bagged depth-2 trees and emit the majority-vote
    * confusion matrix (actual, predicted, n), ordered. */
  def fitVote(df: DataFrame, feats: Seq[(String, Column)], cls: Column,
              rowKey: Column, trees: Int,
              bagPermille: Int = 632): DataFrame = {
    // each tree drops one feature and the depth-2 induction needs two
    require(feats.size >= 3,
      s"random forest needs >= 3 features, got ${feats.size}")
    val spark = df.sparkSession
    val base = df.filter(cls.isNotNull).select(
      feats.map { case (n, c) => c.cast("string").as(s"f_$n") } :+
        cls.cast("string").as("cls") :+
        rowKey.as("__rk"): _*).cache()
    base.count()

    // per-tree leaf tables (tiny — collected to the driver, the model)
    val models = (1 to trees).map { t =>
      val sub = treeFeats(feats, t)
      val bag = base.filter(bagFilter(col("__rk"), t, bagPermille))
      DecisionTree.depth2(bag,
        sub.map { case (n, _) => (n, col(s"f_$n")) }, col("cls"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getString(3), r.getString(5)))
    }
    val classes = base.select(col("cls")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val globalMajority = base.groupBy(col("cls"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .minBy { case (c, n) => (-n, c) }._1

    // tree t's prediction: one CASE chain over its collected leaves
    def predT(t: Int): Column =
      models(t - 1).foldLeft(when(lit(false), "")) {
        case (acc, (rf, rv, lf, lv, maj)) =>
          acc.when(col(s"f_$rf") === rv && col(s"f_$lf") === lv, maj)
      }.otherwise(lit(null).cast("string"))
    val withPreds = base.select(
      col("cls") +: (1 to trees).map(t => predT(t).as(s"p_$t")): _*)
    // votes per class → argmax (ties to the smallest class); zero votes
    // (all trees abstained) → global majority
    val votes = classes.map { c =>
      (1 to trees).map(t =>
        when(col(s"p_$t") === c, 1).otherwise(0)).reduce(_ + _)
    }
    val maxVotes = votes.reduce((a, b) => greatest(a, b))
    val argmax = coalesce(
      classes.zip(votes).map { case (c, v) =>
        when(v === maxVotes && maxVotes > 0, c) }: _*)
    val out = withPreds
      .withColumn("predicted", coalesce(argmax, lit(globalMajority)))
      .groupBy(col("cls").as("actual"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("actual"), col("predicted"))
    base.unpersist()
    out
  }

  /** DuckDB twin of [[fitVote]]: each tree's [[DecisionTree.depth2Sql]]
    * runs over its hash-bagged subquery; the vote replays via a LEFT
    * JOIN of every row (ROW_NUMBER identity) against the UNION'd leaf
    * tables, per-row per-class counts, and the identical
    * (votes DESC, class ASC) argmax with the global-majority fallback. */
  def fitVoteSql(table: String, featsSql: Seq[(String, String)],
                 clsSql: String, rowKeySql: String, trees: Int,
                 bagPermille: Int = 632): String = {
    def bagSql(t: Int): String = {
      val h = hashVal32Sql(s"concat_ws('#', $rowKeySql, 'rfbag', '$t')")
      s"($h) % 1000 < $bagPermille"
    }
    val treeCtes = (1 to trees).map { t =>
      val sub = treeFeats(featsSql, t)
      val bagged = s"(SELECT * FROM $table WHERE ${bagSql(t)})"
      s"t$t AS MATERIALIZED (\n${DecisionTree.depth2Sql(bagged, sub, clsSql)})"
    }
    val leavesCte = (1 to trees).map(t =>
      s"SELECT $t AS tree, root_feature, root_value, leaf_feature, " +
        s"leaf_value, majority FROM t$t")
      .mkString("leaves AS MATERIALIZED (", " UNION ALL ", ")")
    val rowVal = (kind: String) => featsSql.map { case (n, e) =>
      s"WHEN l.${kind}_feature = '$n' THEN r.f_$n" }
      .mkString("CASE ", " ", " END")
    s"""WITH ${treeCtes.mkString(",\n")},
       |$leavesCte,
       |rows_ AS MATERIALIZED (
       |  SELECT ROW_NUMBER() OVER () AS rid,
       |    CAST(($clsSql) AS VARCHAR) AS actual,
       |    ${featsSql.map { case (n, e) =>
            s"CAST(($e) AS VARCHAR) AS f_$n" }.mkString(", ")}
       |  FROM $table WHERE ($clsSql) IS NOT NULL),
       |gmaj AS (SELECT actual AS c FROM rows_ GROUP BY actual
       |  ORDER BY COUNT(*) DESC, actual ASC LIMIT 1),
       |prow AS (
       |  SELECT r.rid, r.actual, l.majority AS p
       |  FROM rows_ r LEFT JOIN leaves l
       |    ON l.root_value = (${rowVal("root")})
       |   AND l.leaf_value = (${rowVal("leaf")})),
       |vcnt AS (
       |  SELECT rid, actual, p AS c, COUNT(*) AS v
       |  FROM prow WHERE p IS NOT NULL GROUP BY rid, actual, p),
       |vpick AS (
       |  SELECT rid, actual, c,
       |    ROW_NUMBER() OVER (PARTITION BY rid ORDER BY v DESC, c ASC) AS rk
       |  FROM vcnt),
       |pred AS (
       |  SELECT r.rid, r.actual,
       |    COALESCE(v.c, (SELECT c FROM gmaj)) AS predicted
       |  FROM (SELECT DISTINCT rid, actual FROM rows_) r
       |  LEFT JOIN (SELECT rid, c FROM vpick WHERE rk = 1) v
       |    ON v.rid = r.rid)
       |SELECT actual, predicted, COUNT(*) AS n
       |FROM pred GROUP BY actual, predicted
       |ORDER BY actual, predicted""".stripMargin
  }
}
