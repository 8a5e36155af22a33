package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.{ReliefF, ScoreOps}
import graft.operators.OutlierOps
import graft.preprocess.EntropyMDL
import graft.queries.SqlGen._

/** Round-1 completion of SURVEY §2.10 (Chi2 / ANOVA / FCBF / ReliefF /
  * LOF), §2.9 Bhattacharyya, and the §2.8 EntropyMDL discretizer. */
object ScoringQueries {

  private def li(s: SparkSession, d: String) = Tables.load(s, d, "lineitem")
  private def ord(s: SparkSession, d: String) = Tables.load(s, d, "orders")
  private def cust(s: SparkSession, d: String) = Tables.load(s, d, "customer")
  private def sup(s: SparkSession, d: String) = Tables.load(s, d, "supplier")

  /** DuckDB twin of the full EntropyMDL recursion (EntropyMDL.cuts):
    * each unrolled level attempts, for EVERY current segment, the
    * entropy-minimal boundary and the Fayyad–Irani MDL acceptance test;
    * accepted segments split, rejected ones are re-tested (identically,
    * hence idempotently) at later levels — so `levels` unrolled levels
    * reproduce any recursion of depth ≤ levels exactly. Classes must be
    * enumerated (they pivot to count columns); entropy uses LN/LN(2)
    * like the Scala driver recursion. Emits the discretized bins
    * (mdl_bin, n, lo, hi). */
  private def mdlOracleSql(table: String, vExpr: String, clsExpr: String,
                           classes: Seq[String], levels: Int): String = {
    val nc = classes.indices
    def ent(a: Int => String, t: String): String =
      nc.map(j => s"CASE WHEN ${a(j)} > 0 THEN -((${a(j)}) * 1.0 / ($t))" +
          s" * LN((${a(j)}) * 1.0 / ($t)) / LN(2) ELSE 0.0 END")
        .mkString("(", " + ", ")")
    def kcnt(a: Int => String): String =
      nc.map(j => s"CASE WHEN ${a(j)} > 0 THEN 1 ELSE 0 END")
        .mkString("(", " + ", ")")
    val candCols = classes.zipWithIndex.map { case (c, j) =>
      s"CAST(SUM(CASE WHEN ($clsExpr) = '$c' THEN 1 ELSE 0 END) AS BIGINT)" +
        s" AS n$j" }.mkString(", ")
    val ns = nc.map(j => s"n$j").mkString(", ")
    val lvls = (1 to levels).map { l =>
      val p = s"seg${l - 1}"
      s"""win$l AS (
         |  SELECT v, $ns, seg,
         |    ${nc.map(j =>
              s"SUM(n$j) OVER (PARTITION BY seg ORDER BY v) AS l$j")
              .mkString(", ")},
         |    ${nc.map(j =>
              s"SUM(n$j) OVER (PARTITION BY seg) AS t$j").mkString(", ")},
         |    MAX(v) OVER (PARTITION BY seg) AS vmax
         |  FROM $p),
         |bnd$l AS (
         |  SELECT *,
         |    ${nc.map(j => s"t$j - l$j AS r$j").mkString(", ")},
         |    (${nc.map(j => s"l$j").mkString(" + ")}) AS nl,
         |    (${nc.map(j => s"t$j").mkString(" + ")}) AS nt
         |  FROM win$l WHERE v < vmax),
         |sc$l AS (
         |  SELECT *,
         |    (nl * 1.0 / nt) * ${ent(j => s"l$j", "nl")} +
         |    ((nt - nl) * 1.0 / nt) * ${ent(j => s"r$j", "nt - nl")} AS esplit,
         |    ${ent(j => s"t$j", "nt")} AS es,
         |    ${kcnt(j => s"t$j")} AS k,
         |    ${kcnt(j => s"l$j")} AS k1, ${kcnt(j => s"r$j")} AS k2,
         |    ${ent(j => s"l$j", "nl")} AS e1,
         |    ${ent(j => s"r$j", "nt - nl")} AS e2
         |  FROM bnd$l),
         |best$l AS (
         |  SELECT * FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY seg
         |    ORDER BY esplit ASC, v ASC) AS rk FROM sc$l) WHERE rk = 1),
         |acc$l AS (
         |  SELECT seg, v AS cutv FROM best$l
         |  WHERE (es - esplit) > (LN(nt - 1) / LN(2)
         |    + LN(POWER(3, k) - 2) / LN(2)
         |    - (k * es - k1 * e1 - k2 * e2)) / nt),
         |seg$l AS (
         |  SELECT s.v, ${nc.map(j => s"s.n$j").mkString(", ")},
         |    s.seg * 2 + CASE WHEN a.cutv IS NOT NULL AND s.v > a.cutv
         |      THEN 1 ELSE 0 END AS seg
         |  FROM $p s LEFT JOIN acc$l a ON a.seg = s.seg)""".stripMargin
    }.mkString(",\n")
    s"""WITH cand AS (
       |  SELECT ($vExpr) AS v, $candCols
       |  FROM $table
       |  WHERE ($vExpr) IS NOT NULL AND ($clsExpr) IS NOT NULL
       |  GROUP BY 1),
       |seg0 AS (SELECT v, $ns, 0 AS seg FROM cand),
       |$lvls,
       |segmin AS (
       |  SELECT v, (${nc.map(j => s"n$j").mkString(" + ")}) AS nv,
       |    MIN(v) OVER (PARTITION BY seg) AS smin
       |  FROM seg$levels),
       |binned AS (
       |  SELECT v, nv, DENSE_RANK() OVER (ORDER BY smin) - 1 AS mdl_bin
       |  FROM segmin)
       |SELECT CAST(mdl_bin AS INT) AS mdl_bin, CAST(SUM(nv) AS BIGINT) AS n,
       |  MIN(v) AS lo, MAX(v) AS hi
       |FROM binned GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** SQL block computing (su, info_gain) of one feature vs class on
    * lineitem — twin of ScoreOps.symmetricUncertainty. `f` is any SQL
    * expression; `fName` labels the output row. */
  private def suSql(f: String, fName: String, c: String): String =
    s"""SELECT '$fName' AS feature,
       |  ROUND(2.0 * (h_c - h_cond) / (h_f + h_c), 6) AS su,
       |  ROUND(h_c - h_cond, 6) AS info_gain
       |FROM (
       |  WITH cont AS (SELECT $f AS fv, $c AS cv, COUNT(*) AS n
       |                FROM lineitem WHERE $f IS NOT NULL AND $c IS NOT NULL
       |                GROUP BY 1, 2),
       |  tot AS (SELECT SUM(n) AS total FROM cont),
       |  byf AS (SELECT fv, SUM(n) AS nf FROM cont GROUP BY fv),
       |  byc AS (SELECT cv, SUM(n) AS nc FROM cont GROUP BY cv)
       |  SELECT
       |    (SELECT ${sqlDetSum("-(nf / (total * 1.0)) * log2(nf / (total * 1.0))")}
       |     FROM byf CROSS JOIN tot) AS h_f,
       |    (SELECT ${sqlDetSum("-(nc / (total * 1.0)) * log2(nc / (total * 1.0))")}
       |     FROM byc CROSS JOIN tot) AS h_c,
       |    (SELECT ${sqlDetSum("(nf / (total * 1.0)) * (-(n / (nf * 1.0)) * log2(n / (nf * 1.0)))")}
       |     FROM cont JOIN byf USING (fv) CROSS JOIN tot) AS h_cond)""".stripMargin

  val all: Seq[Q] = Seq(

    Q("score_chi2", // Chi2 feature scoring (score.py:107-157)
      (s, d) => ScoreOps.chi2(ord(s, d), "o_orderpriority", "o_orderstatus"),
      Some(s"""WITH cont AS (
              |  SELECT o_orderpriority AS fv, o_orderstatus AS cv, COUNT(*) AS n
              |  FROM orders
              |  WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL
              |  GROUP BY 1, 2),
              |byf AS (SELECT fv, SUM(n) AS nf FROM cont GROUP BY fv),
              |byc AS (SELECT cv, SUM(n) AS nc FROM cont GROUP BY cv),
              |tot AS (SELECT SUM(n) AS total FROM cont),
              |cells AS (
              |  SELECT g.fv, g.cv, g.nf, g.nc, g.total, cont.n
              |  FROM (SELECT * FROM byf CROSS JOIN byc CROSS JOIN tot) g
              |  LEFT JOIN cont ON cont.fv = g.fv AND cont.cv = g.cv)
              |SELECT
              |  ROUND(${sqlDetSum("(COALESCE(n, 0) - (nf * nc) / (total * 1.0)) * (COALESCE(n, 0) - (nf * nc) / (total * 1.0)) / ((nf * nc) / (total * 1.0))")}, 6) AS chi2,
              |  (COUNT(DISTINCT fv) - 1) * (COUNT(DISTINCT cv) - 1) AS dof
              |FROM cells""".stripMargin)),

    Q("score_anova", // one-way ANOVA F (score.py:107-157)
      (s, d) => ScoreOps.anovaF(li(s, d), "l_quantity", "l_returnflag"),
      Some(s"""WITH rows_ AS (
              |  SELECT l_quantity AS xv, l_returnflag AS gv
              |  FROM lineitem
              |  WHERE l_quantity IS NOT NULL AND l_returnflag IS NOT NULL),
              |grp AS (
              |  SELECT gv, ${sqlSum("xv")} AS sg, COUNT(*) AS ng
              |  FROM rows_ GROUP BY 1),
              |tot AS (
              |  SELECT ${sqlSum("sg")} AS s, CAST(SUM(ng) AS BIGINT) AS n, COUNT(*) AS k
              |  FROM grp),
              |between_ AS (
              |  SELECT ROUND(${sqlDetSum("ng * (sg / ng - s / n) * (sg / ng - s / n)")}, 6) AS ssb,
              |         MAX(n) AS n, MAX(k) AS k
              |  FROM grp CROSS JOIN tot),
              |within_ AS (
              |  SELECT ROUND(${sqlDetSum("(xv - sg / ng) * (xv - sg / ng)")}, 6) AS ssw
              |  FROM rows_ JOIN grp USING (gv))
              |SELECT ROUND((ssb / (k - 1)) / (ssw / (n - k)), 6) AS f_stat,
              |       (k - 1) AS df_between, (n - k) AS df_within
              |FROM between_ CROSS JOIN within_""".stripMargin)),

    Q("score_gainratio", // GainRatio (score.py:308-325): InfoGain divided
      // by the feature's own entropy, Quinlan's multi-valued correction.
      (s, d) => graft.functions.StatsOps.gainRatio(
        ord(s, d), "o_orderpriority", "o_orderstatus"),
      Some(s"""WITH cont AS (
              |  SELECT o_orderpriority AS f, o_orderstatus AS c, COUNT(*) AS n
              |  FROM orders GROUP BY 1, 2),
              |tot AS (SELECT SUM(n) AS total FROM cont),
              |byf AS (SELECT f, SUM(n) AS nf FROM cont GROUP BY f),
              |byc AS (SELECT c, SUM(n) AS nc FROM cont GROUP BY c),
              |hc AS (SELECT ${sqlDetSum("-(nc * 1.0 / total) * log2(nc * 1.0 / total)")} AS h_class
              |       FROM byc CROSS JOIN tot),
              |hcond AS (SELECT ${sqlDetSum("(nf * 1.0 / total) * (-(n * 1.0 / nf) * log2(n * 1.0 / nf))")} AS h_cond
              |          FROM cont JOIN byf USING (f) CROSS JOIN tot),
              |hattr AS (SELECT ${sqlDetSum("-(nf * 1.0 / total) * log2(nf * 1.0 / total)")} AS h_attr
              |          FROM byf CROSS JOIN tot)
              |SELECT ROUND((h_class - h_cond) /
              |         (CASE WHEN h_attr = 0 THEN 1.0 ELSE h_attr END), 6) AS gain_ratio,
              |       ROUND(h_class - h_cond, 6) AS info_gain,
              |       ROUND(h_attr, 6) AS h_attr
              |FROM hc CROSS JOIN hcond CROSS JOIN hattr""".stripMargin)),

    Q("score_gini", // Gini impurity gain (score.py:328-337, _gini at
      // score.py:245-250): Gini(class) − Σ_f p(f)·Gini(class|f).
      (s, d) => graft.functions.StatsOps.giniGain(
        ord(s, d), "o_orderpriority", "o_orderstatus"),
      Some(s"""WITH cont AS (
              |  SELECT o_orderpriority AS f, o_orderstatus AS c, COUNT(*) AS n
              |  FROM orders GROUP BY 1, 2),
              |tot AS (SELECT SUM(n) AS total FROM cont),
              |byf AS (SELECT f, SUM(n) AS nf FROM cont GROUP BY f),
              |byc AS (SELECT c, SUM(n) AS nc FROM cont GROUP BY c),
              |gclass AS (SELECT 1.0 - ${sqlDetSum("(nc * 1.0 / total) * (nc * 1.0 / total)")} AS gini_class
              |           FROM byc CROSS JOIN tot),
              |gcond AS (SELECT 1.0 - ${sqlDetSum("n * 1.0 * n / (nf * 1.0 * total)")} AS gini_cond
              |          FROM cont JOIN byf USING (f) CROSS JOIN tot)
              |SELECT ROUND(gini_class - gini_cond, 6) AS gini_gain,
              |       ROUND(gini_class, 6) AS gini_class,
              |       ROUND(gini_cond, 6) AS gini_cond
              |FROM gclass CROSS JOIN gcond""".stripMargin)),

    Q("score_fcbf_su", // FCBF symmetric uncertainty (score.py:252-297);
      // continuous features enter pre-discretized, as in the reference.
      (s, d) => Seq[(org.apache.spark.sql.Column, String)](
          (col("l_returnflag"), "l_returnflag"),
          (floor(col("l_quantity") / 10), "qty_bin"),
          (floor(col("l_discount") * 20), "disc_bin"))
        .map { case (f, n) =>
          ScoreOps.symmetricUncertainty(li(s, d), f, n, "l_linestatus") }
        .reduce(_.unionByName(_))
        .orderBy(col("feature")),
      Some(Seq(
          ("l_returnflag", "l_returnflag"),
          ("FLOOR(l_quantity / 10)", "qty_bin"),
          ("FLOOR(l_discount * 20)", "disc_bin"))
        .map { case (f, n) => suSql(f, n, "l_linestatus") }
        .mkString("", "\nUNION ALL\n", "\nORDER BY feature"))),

    Q("dist_bhattacharyya", // distance.py:788-806 between class-conditional
      // distributions of binned quantity for return flags R vs A.
      (s, d) => ScoreOps.bhattacharyya(li(s, d),
        floor(col("l_quantity") / 5), "l_returnflag", "R", "A"),
      Some(s"""WITH binned AS (
              |  SELECT CAST(FLOOR(l_quantity / 5) AS BIGINT) AS b, l_returnflag AS c
              |  FROM lineitem WHERE l_returnflag IN ('R', 'A')),
              |counts AS (SELECT b, c, COUNT(*) AS n FROM binned GROUP BY 1, 2),
              |totals AS (SELECT c, SUM(n) AS nc FROM counts GROUP BY c),
              |p AS (SELECT b, c, n / (nc * 1.0) AS p
              |      FROM counts JOIN totals USING (c))
              |SELECT ROUND(-LN(${sqlDetSum("SQRT(pa.p * pb.p)")}), 6) AS bhattacharyya
              |FROM (SELECT b, p FROM p WHERE c = 'R') pa
              |JOIN (SELECT b, p FROM p WHERE c = 'A') pb USING (b)""".stripMargin)),

    Q("score_relieff", // ReliefF (score.py:338-420): m=100 deterministic
      // references, k=3 hits/misses, span-normalized Manhattan.
      (s, d) => ReliefF.weights(cust(s, d), "c_custkey",
        Seq("c_acctbal", "c_nationkey"), "c_mktsegment",
        col("c_custkey") <= 100, 3),
      Some(s"""WITH spans AS (
              |  SELECT MAX(c_acctbal) - MIN(c_acctbal) AS span_a,
              |         MAX(c_nationkey) - MIN(c_nationkey) AS span_n
              |  FROM customer),
              |refs AS (SELECT c_custkey AS rid, c_mktsegment AS rclass,
              |                c_acctbal AS ra, c_nationkey AS rk
              |         FROM customer WHERE c_custkey <= 100),
              |pairs AS (
              |  SELECT rid, o.c_custkey AS oid,
              |    CASE WHEN rclass = o.c_mktsegment THEN 1 ELSE 0 END AS hit,
              |    ABS(ra - o.c_acctbal) / span_a AS da,
              |    ABS(rk - o.c_nationkey) / span_n AS dn,
              |    ABS(ra - o.c_acctbal) / span_a + ABS(rk - o.c_nationkey) / span_n AS dist
              |  FROM refs CROSS JOIN spans
              |  JOIN customer o ON o.c_custkey <> rid),
              |topk AS (
              |  SELECT * FROM (
              |    SELECT pairs.*, ROW_NUMBER() OVER (
              |      PARTITION BY rid, hit ORDER BY dist ASC, oid ASC) AS rnk
              |    FROM pairs)
              |  WHERE rnk <= 3),
              |perref AS (
              |  SELECT rid, hit, ${sqlDetSum("da")} AS d_a,
              |         ${sqlDetSum("dn")} AS d_n, COUNT(*) AS cnt
              |  FROM topk GROUP BY rid, hit),
              |folded AS (
              |  SELECT rid,
              |    ${sqlDetSum("CASE WHEN hit = 0 THEN d_a / cnt ELSE -d_a / cnt END")} AS t_a,
              |    ${sqlDetSum("CASE WHEN hit = 0 THEN d_n / cnt ELSE -d_n / cnt END")} AS t_n
              |  FROM perref GROUP BY rid),
              |m AS (SELECT COUNT(*) AS m FROM refs),
              |agg AS (SELECT ${sqlDetSum("t_a")} AS w_a, ${sqlDetSum("t_n")} AS w_n
              |        FROM folded)
              |SELECT 'c_acctbal' AS feature, ROUND(w_a / m, 6) AS weight
              |FROM agg CROSS JOIN m
              |UNION ALL
              |SELECT 'c_nationkey' AS feature, ROUND(w_n / m, 6) AS weight
              |FROM agg CROSS JOIN m
              |ORDER BY feature""".stripMargin)),

    Q("outliers_oneclass_svm", // OneClassSVM (outlier_detection.py:17-180)
      // via Random Fourier Features + linear one-class subgradient
      // descent. Oracle-exact: the RFF constants are deterministic
      // doubles the twin inlines as literals, so the whole 20-step
      // trajectory unrolls as chained CTEs (the ml_sgd_logreg device)
      // including the rank-k finishing ρ.
      (s, d) => graft.ml.OneClassSVM.fitPredict(
          sup(s, d).select(col("s_suppkey"),
            (col("s_acctbal") / 10000.0).as("xa")),
          Seq(("xa", col("xa"))), nu = 0.05, d = 16, gamma = 2.0,
          iterations = 20)
        .agg(count(lit(1)).as("n"),
          sum(col("is_outlier")).as("n_outliers"),
          round(min(col("score")), 6).as("min_score"),
          round(max(col("score")), 6).as("max_score")),
      Some(graft.ml.OneClassSVM.fitPredictSummarySql(
        "supplier", Seq("s_acctbal / 10000.0"),
        nu = 0.05, d = 16, gamma = 2.0, iterations = 20))),

    Q("outliers_lof", // Local Outlier Factor, k=3 (outlier_detection.py)
      (s, d) => OutlierOps.lof1d(sup(s, d), "s_suppkey", "s_acctbal", 3)
        .orderBy(col("a_id")),
      Some(s"""WITH pairs AS (
              |  SELECT a.s_suppkey AS a_id, b.s_suppkey AS b_id,
              |         ABS(a.s_acctbal - b.s_acctbal) AS dist
              |  FROM supplier a JOIN supplier b ON a.s_suppkey <> b.s_suppkey),
              |kd AS (
              |  SELECT a_id, dist AS kdist FROM (
              |    SELECT pairs.*, ROW_NUMBER() OVER (
              |      PARTITION BY a_id ORDER BY dist ASC, b_id ASC) AS rnk
              |    FROM pairs)
              |  WHERE rnk = 3),
              |nbr AS (
              |  SELECT p.a_id, p.b_id, p.dist
              |  FROM pairs p JOIN kd ON kd.a_id = p.a_id
              |  WHERE p.dist <= kd.kdist),
              |reach AS (
              |  SELECT n.a_id, n.b_id, GREATEST(kb.kdist, n.dist, 1e-9) AS reach
              |  FROM nbr n JOIN kd kb ON kb.a_id = n.b_id),
              |lrd AS (SELECT a_id, COUNT(*) / ${sqlDetSum("reach")} AS lrd
              |        FROM reach GROUP BY a_id),
              |num AS (
              |  SELECT n.a_id, ${sqlDetSum("lb.lrd")} / COUNT(*) AS mean_lrd_b
              |  FROM nbr n JOIN lrd lb ON lb.a_id = n.b_id GROUP BY n.a_id)
              |SELECT num.a_id AS a_id, ROUND(mean_lrd_b / lrd.lrd, 6) AS lof
              |FROM num JOIN lrd ON lrd.a_id = num.a_id
              |ORDER BY num.a_id""".stripMargin)),

    Q("discretize_entropy_mdl", // Fayyad–Irani MDL splits (discretize.py:695)
      // The recursion IS SQL-expressible: the oracle unrolls it level-
      // wise (every segment attempts its entropy-argmin boundary + MDL
      // acceptance per level; re-testing a rejected segment is
      // idempotent, so L levels cover any depth ≤ L). Fixture: quantity
      // vs its 5 derived decade classes — MDL recovers the 4 decade
      // boundaries through 3 accept levels and rejects inside the pure
      // leaves, exercising both branches. (quantity vs l_returnflag is
      // MDL-rejected at the root on this data — kept in ScoringSpec.)
      (s, d) => EntropyMDL.discretize(
          li(s, d).withColumn("qty_class",
            floor((col("l_quantity") - 1) / 10).cast("string")),
          "l_quantity", "qty_class", "mdl_bin")
        .groupBy(col("mdl_bin"))
        .agg(count(lit(1)).as("n"),
          min(col("l_quantity")).as("lo"), max(col("l_quantity")).as("hi"))
        .orderBy(col("mdl_bin")),
      Some(mdlOracleSql("lineitem", "l_quantity",
        "CAST(CAST(FLOOR((l_quantity - 1) / 10) AS BIGINT) AS VARCHAR)",
        Seq("0", "1", "2", "3", "4"), levels = 5))),

    Q("score_rrelieff", // RReliefF for a continuous target (score.py
      // RReliefF): m=100 references, k=3 neighbors, span-normalized
      // Manhattan; W = NdCdA/NdC − (NdA−NdCdA)/(m−NdC). Same broadcast-
      // refs pair volume as score_relieff (100 × |customer|) — a larger
      // ref predicate on a bigger table turns the non-equi pair join
      // into a bench-killing 60M-row BNLJ at sf0.1.
      (s, d) => ReliefF.rWeights(
        cust(s, d).select(col("c_custkey"),
          col("c_nationkey").cast("double").as("c_nat"),
          (col("c_custkey") % 97).cast("double").as("c_mod"),
          col("c_acctbal")),
        "c_custkey", Seq("c_nat", "c_mod"), "c_acctbal",
        col("c_custkey") <= 100, 3),
      Some(s"""WITH base AS (
              |  SELECT c_custkey, CAST(c_nationkey AS DOUBLE) AS c_nat,
              |         CAST(c_custkey % 97 AS DOUBLE) AS c_mod, c_acctbal
              |  FROM customer),
              |spans AS (
              |  SELECT MAX(c_nat) - MIN(c_nat) AS span_n,
              |         MAX(c_mod) - MIN(c_mod) AS span_m,
              |         MAX(c_acctbal) - MIN(c_acctbal) AS span_y
              |  FROM base),
              |refs AS (SELECT c_custkey AS rid, c_acctbal AS ry,
              |                c_nat AS rn, c_mod AS rm
              |         FROM base WHERE c_custkey <= 100),
              |pairs AS (
              |  SELECT rid, o.c_custkey AS oid,
              |    ABS(rn - o.c_nat) / span_n AS da_n,
              |    ABS(rm - o.c_mod) / span_m AS da_m,
              |    ABS(rn - o.c_nat) / span_n
              |      + ABS(rm - o.c_mod) / span_m AS dist,
              |    ABS(ry - o.c_acctbal) / span_y AS dy
              |  FROM refs CROSS JOIN spans
              |  JOIN base o ON o.c_custkey <> rid),
              |topk AS (
              |  SELECT * FROM (
              |    SELECT pairs.*, ROW_NUMBER() OVER (
              |      PARTITION BY rid ORDER BY dist ASC, oid ASC) AS rnk
              |    FROM pairs)
              |  WHERE rnk <= 3),
              |agg AS (
              |  SELECT ${sqlDetSum("dy")} AS ndc, COUNT(*) AS m,
              |    ${sqlDetSum("da_n")} AS nda_n, ${sqlDetSum("dy * da_n")} AS ndcda_n,
              |    ${sqlDetSum("da_m")} AS nda_m, ${sqlDetSum("dy * da_m")} AS ndcda_m
              |  FROM topk)
              |SELECT 'c_nat' AS feature,
              |  ROUND(ndcda_n / ndc - (nda_n - ndcda_n) / (CAST(m AS DOUBLE) - ndc), 6) AS weight
              |FROM agg
              |UNION ALL
              |SELECT 'c_mod' AS feature,
              |  ROUND(ndcda_m / ndc - (nda_m - ndcda_m) / (CAST(m AS DOUBLE) - ndc), 6) AS weight
              |FROM agg""".stripMargin))
  )
}
