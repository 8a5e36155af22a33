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

  /** Tree t's bag: 32-bit window (t−1)%5 of md5(rowKey, group) — every
    * 5 trees share one digest, so a T-tree forest pays ⌈T/5⌉ md5 per
    * row (the md5 was 70% of the fit's wall time when hashed per tree). */
  private def bagFilter(rowKey: Column, t: Int, permille: Int): Column = {
    val g = (t - 1) / 5
    pmod(hashVal32At(concat_ws("#", rowKey, lit("rfbag"), lit(g)),
      1 + 6 * ((t - 1) % 5)), lit(1000)) < lit(permille)
  }

  /** String-cast feature/class columns + the per-tree bag flags — md5
    * membership evaluated ONCE into this projection instead of re-hashed
    * on every tree's scan. */
  private[graft] def baseProjection(df: DataFrame,
      feats: Seq[(String, Column)], cls: Column, rowKey: Column,
      trees: Int, bagPermille: Int): DataFrame =
    df.filter(cls.isNotNull).select(
      feats.map { case (n, c) => c.cast("string").as(s"f_$n") } ++:
        (cls.cast("string").as("cls") +:
          (1 to trees).map(t =>
            bagFilter(rowKey, t, bagPermille).cast("int").as(s"b_$t"))): _*)

  /** Level-1 joint contingency for ALL trees from one scan: the long
    * form carries the tree id, one map-side-combined groupBy. */
  private[graft] def levelOneFrom(base: DataFrame,
      feats: Seq[(String, Column)], trees: Int): DataFrame = {
    val pairs1 = for { t <- 1 to trees; (n, _) <- treeFeats(feats, t) }
      yield (t, n)
    base.select(explode(array(pairs1.map { case (t, n) =>
        struct(lit(t).as("tree"), lit(n).as("fname"),
          col(s"f_$n").as("fval"), col(s"b_$t").as("inbag")) }: _*))
        .as("fv"), col("cls"))
      .filter(col("fv.inbag") === 1)
      .select(col("fv.tree").as("tree"), col("fv.fname").as("fname"),
        col("fv.fval").as("fval"), col("cls"))
      .groupBy(col("tree"), col("fname"), col("fval"), col("cls"))
      .agg(count(lit(1)).as("nvc"))
  }

  /** [[levelOneFrom]] over a fresh (uncached) projection — the plan-pin
    * surface for PlanSpec. */
  private[graft] def levelOneContingency(df: DataFrame,
      feats: Seq[(String, Column)], cls: Column, rowKey: Column,
      trees: Int, bagPermille: Int = 632): DataFrame =
    levelOneFrom(baseProjection(df, feats, cls, rowKey, trees,
      bagPermille), feats, trees)

  /** Fit `trees` bagged depth-2 trees and emit the majority-vote
    * confusion matrix (actual, predicted, n), ordered. */
  def fitVote(df: DataFrame, feats: Seq[(String, Column)], cls: Column,
              rowKey: Column, trees: Int,
              bagPermille: Int = 632): DataFrame = {
    // each tree drops one feature and the depth-2 induction needs two
    require(feats.size >= 3,
      s"random forest needs >= 3 features, got ${feats.size}")
    val spark = df.sparkSession
    import org.apache.spark.sql.expressions.Window
    val base = baseProjection(df, feats, cls, rowKey, trees, bagPermille)
      .cache()
    base.count()

    // All T trees fit in TWO corpus scans (not 2T): the long-form
    // explode carries the tree id, so every tree's level-1/level-2
    // contingency comes out of ONE map-side-combined groupBy, and the
    // entropy/rank algebra runs per tree over the joint (still tiny)
    // contingency. Numerically identical to fitting each tree with
    // [[DecisionTree.depth2]] on its bag — same per-group decimal sums,
    // same 10-decimal rounding, same (h ASC, fname ASC) ties — which is
    // exactly what the SQL twin replays per tree.
    def term = round(graft.core.Tables.detSum(
      -(col("nvc") / col("nt")) * log2(col("nvc") / col("nv"))), 10)

    val cont1 = levelOneFrom(base, feats, trees)
    val h1 = cont1
      .withColumn("nv", sum(col("nvc")).over(
        Window.partitionBy(col("tree"), col("fname"), col("fval"))))
      .withColumn("nt", sum(col("nvc")).over(
        Window.partitionBy(col("tree"), col("fname"))))
      .groupBy(col("tree"), col("fname")).agg(term.as("h_cond"))
    val roots: Map[Int, String] = h1
      .withColumn("rk", row_number().over(Window.partitionBy(col("tree"))
        .orderBy(col("h_cond").asc, col("fname").asc)))
      .filter(col("rk") === 1)
      .select(col("tree"), col("fname")).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap

    val pairs2 = for { t <- 1 to trees; (n, _) <- treeFeats(feats, t)
                       if n != roots(t) } yield (t, n)
    val long2 = base.select(explode(array(pairs2.map { case (t, n) =>
        struct(lit(t).as("tree"), col(s"f_${roots(t)}").as("root_val"),
          lit(n).as("fname"), col(s"f_$n").as("fval"),
          col(s"b_$t").as("inbag")) }: _*)).as("fv"), col("cls"))
      .filter(col("fv.inbag") === 1)
      .select(col("fv.tree").as("tree"), col("fv.root_val").as("root_val"),
        col("fv.fname").as("fname"), col("fv.fval").as("fval"), col("cls"))
    val cont2 = long2.groupBy(col("tree"), col("root_val"), col("fname"),
      col("fval"), col("cls")).agg(count(lit(1)).as("nvc"))
    val h2 = cont2
      .withColumn("nv", sum(col("nvc")).over(Window.partitionBy(
        col("tree"), col("root_val"), col("fname"), col("fval"))))
      .withColumn("nt", sum(col("nvc")).over(Window.partitionBy(
        col("tree"), col("root_val"), col("fname"))))
      .groupBy(col("tree"), col("root_val"), col("fname"))
      .agg(term.as("h_cond"))
    val pick2 = h2
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("tree"), col("root_val"))
          .orderBy(col("h_cond").asc, col("fname").asc)))
      .filter(col("rk") === 1)
      .select(col("tree"), col("root_val"), col("fname").as("leaf_feat"))
    val leafW = Window.partitionBy(col("tree"), col("root_val"),
      col("fval"))
    val leafRows = cont2.as("c").join(pick2.as("p"),
        col("c.tree") === col("p.tree") &&
        col("c.root_val") === col("p.root_val") &&
        col("c.fname") === col("p.leaf_feat"))
      .select(col("c.tree").as("tree"), col("c.root_val").as("root_val"),
        col("p.leaf_feat").as("leaf_feat"), col("c.fval").as("fval"),
        col("c.cls").as("cls"), col("c.nvc").as("nvc"))
      .withColumn("rk", row_number().over(
        leafW.orderBy(col("nvc").desc, col("cls").asc)))
      .filter(col("rk") === 1).collect()
    // per-tree leaf tables (tiny — the model lives on the driver)
    val models = (1 to trees).map { t =>
      leafRows.filter(_.getInt(0) == t).map { r =>
        (roots(t), r.getString(1), r.getString(2), r.getString(3),
          r.getString(4))
      }
    }
    // one collect serves both the class list and the majority fallback
    val clsCounts = base.groupBy(col("cls"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val classes = clsCounts.map(_._1).sorted.toSeq
    val globalMajority = clsCounts.minBy { case (c, n) => (-n, c) }._1

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
      val h = hashVal32AtSql(
        s"concat_ws('#', $rowKeySql, 'rfbag', '${(t - 1) / 5}')",
        1 + 6 * ((t - 1) % 5))
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
