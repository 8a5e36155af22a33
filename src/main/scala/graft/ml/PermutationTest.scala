package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Permutation-test overfitting diagnostic — reference
  * Orange/widgets/evaluate/owpermutationplot.py: N label permutations,
  * each fitted and scored on-train and by k-fold CV (N_FOLD = 7 there),
  * against the |Spearman(y, y_permuted)|·100 label correlation; the
  * two-point linregress through (100, baseline score) and
  * (mean corr, mean permuted score) gives the score-vs-correlation
  * slope (`permutation:62-94`). A real signal keeps the baseline far
  * above the permuted cloud; an overfit learner's train score stays
  * high while CV collapses.
  *
  * Engine adaptation (all deterministic, full CTE replay): the learner
  * is simple linear regression y ~ x scored by R² (the reference picks
  * R2 for continuous targets, `permutation:68`), permutations are the
  * md5-order shuffle device (randomize_shuffle), folds are md5-hash
  * buckets, and every reduction runs through the exact-DECIMAL sums.
  * Scale shape: one union of nPerm+1 label-assignments over a bounded
  * diagnostic sample, two grouped aggregations (per perm, per
  * perm×fold) — no per-permutation driver loop. */
object PermutationTest {

  /** Returns one row per permutation (perm 0 = identity):
    * (perm, corr100, r2_train, r2_cv, slope_tr, slope_cv) — slope
    * columns are the two-point linregress slopes, constant across
    * rows. */
  def permutationDiag(df: DataFrame, id: String, x: Column, y: Column,
                      nPerm: Int, folds: Int): DataFrame = {
    val base = df.select(col(id).cast("long").as("__id"),
      x.cast("double").as("__x"), y.cast("double").as("__y"))
    // perm 0 keeps labels; perm p reorders labels by the seeded
    // md5-order permutation (np.random.shuffle's deterministic twin).
    // ALL permutations come from ONE exploded projection with two
    // per-perm windows — not a per-permutation driver loop: the old
    // shape paid 2 eager rank checkpoints + a shuffle join PER
    // permutation (~3 s of pure job-launch each on a 300-row input);
    // this one is a single lazy plan whose windows partition by perm,
    // so perms rank in parallel and the pairing (hence every output
    // bit and the unchanged oracle SQL) is identical. Per-perm window
    // partitions hold one diagnostic sample each — bounded by the
    // operator's sample contract, never corpus-sized.
    val permKey = md5(concat(lit("perm"), col("perm").cast("string"),
      lit("#"), col("__lid").cast("string")))
    val left = base
      .select(explode(sequence(lit(1), lit(nPerm))).as("perm"),
        col("__id"), col("__x"), col("__y"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("perm")).orderBy(col("__id"))))
    val right = base
      .select(explode(sequence(lit(1), lit(nPerm))).as("perm"),
        col("__id").as("__lid"), col("__y").as("__yp"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("perm")).orderBy(permKey, col("__lid"))))
      .select(col("perm"), col("__rn"), col("__yp"))
    val perms = base
      .select(lit(0).as("perm"), col("__id"), col("__x"), col("__y"),
        col("__y").as("__yp"))
      .unionByName(left.join(right, Seq("perm", "__rn"))
        .select(col("perm"), col("__id"), col("__x"), col("__y"),
          col("__yp")))
    val withFold = perms.withColumn("fold",
      pmod(Tables.hashVal32(concat(lit("fold#"),
        col("__id").cast("string"))), lit(folds)))

    // |Spearman(y, yp)|·100 — average ranks (the spearman_rank_corr
    // device) + exact Pearson over the ranks
    val wy = Window.partitionBy(col("perm")).orderBy(col("__y"))
    val wyv = Window.partitionBy(col("perm"), col("__y"))
    val wp = Window.partitionBy(col("perm")).orderBy(col("__yp"))
    val wpv = Window.partitionBy(col("perm"), col("__yp"))
    val corrs = perms.select(col("perm"),
        (rank().over(wy) + (count(lit(1)).over(wyv) - 1) / 2.0).as("rx"),
        (rank().over(wp) + (count(lit(1)).over(wpv) - 1) / 2.0).as("ry"))
      .groupBy(col("perm"))
      .agg(round(abs(Tables.exactCorr(col("rx"), col("ry"))) * 100, 6)
        .as("corr100"))

    def sumCols(pre: String) = Seq(
      count(lit(1)).cast("double").as("n" + pre),
      Tables.exactSum(col("__x")).as(s"sx$pre"),
      Tables.exactSum(col("__yp")).as(s"sy$pre"),
      Tables.exactSum(col("__x") * col("__yp")).as(s"sxy$pre"),
      Tables.exactSum(col("__x") * col("__x")).as(s"sxx$pre"),
      Tables.exactSum(col("__yp") * col("__yp")).as(s"syy$pre"))
    val totals = withFold.groupBy(col("perm"))
      .agg(sumCols("").head, sumCols("").tail: _*)
    val foldSums = withFold.groupBy(col("perm"), col("fold"))
      .agg(sumCols("f").head, sumCols("f").tail: _*)

    // test-on-train: closed-form simple regression on all rows,
    // R² = 1 − SSres/SStot with SSres expanded over the exact sums
    val trainScores = totals
      .withColumn("b_tr", (col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx")))
      .withColumn("a_tr",
        col("sy") / col("n") - col("b_tr") * (col("sx") / col("n")))
      .withColumn("sstot", col("syy") - col("sy") * col("sy") / col("n"))
      .withColumn("ssres_tr",
        col("syy") - lit(2) * col("a_tr") * col("sy")
          - lit(2) * col("b_tr") * col("sxy")
          + col("n") * col("a_tr") * col("a_tr")
          + lit(2) * col("a_tr") * col("b_tr") * col("sx")
          + col("b_tr") * col("b_tr") * col("sxx"))
      .withColumn("r2_train",
        round(lit(1.0) - col("ssres_tr") / col("sstot"), 6))
      .select(col("perm"), col("r2_train"), col("sstot"))

    // k-fold CV: train-side sums = totals − fold sums, per-fold fit,
    // residuals pooled over held folds (Orange's pooled-Results R²)
    val cvScores = foldSums.join(totals, "perm")
      .withColumn("ntf", col("n") - col("nf"))
      .withColumn("sxt", col("sx") - col("sxf"))
      .withColumn("syt", col("sy") - col("syf"))
      .withColumn("sxyt", col("sxy") - col("sxyf"))
      .withColumn("sxxt", col("sxx") - col("sxxf"))
      .withColumn("b_f", (col("ntf") * col("sxyt") - col("sxt") * col("syt")) /
        (col("ntf") * col("sxxt") - col("sxt") * col("sxt")))
      .withColumn("a_f",
        col("syt") / col("ntf") - col("b_f") * (col("sxt") / col("ntf")))
      .withColumn("ssres_f",
        col("syyf") - lit(2) * col("a_f") * col("syf")
          - lit(2) * col("b_f") * col("sxyf")
          + col("nf") * col("a_f") * col("a_f")
          + lit(2) * col("a_f") * col("b_f") * col("sxf")
          + col("b_f") * col("b_f") * col("sxxf"))
      .groupBy(col("perm"))
      .agg(Tables.detSum(col("ssres_f")).as("ssres_cv"))

    val res = corrs
      .join(trainScores, "perm")
      .join(cvScores, "perm")
      .withColumn("r2_cv", round(lit(1.0) - col("ssres_cv") / col("sstot"), 6))
      .select(col("perm"), col("corr100"), col("r2_train"), col("r2_cv"))
    val baseRow = res.filter(col("perm") === 0)
      .select(col("r2_train").as("t0"), col("r2_cv").as("c0"))
    val meanRow = res.filter(col("perm") > 0).agg(
      (Tables.detSum(col("corr100")) / nPerm).as("mc"),
      (Tables.detSum(col("r2_train")) / nPerm).as("mt"),
      (Tables.detSum(col("r2_cv")) / nPerm).as("mv"))
    res.crossJoin(broadcast(baseRow)).crossJoin(broadcast(meanRow))
      .select(col("perm"), col("corr100"), col("r2_train"), col("r2_cv"),
        round((col("t0") - col("mt")) / (lit(100.0) - col("mc")), 6)
          .as("slope_tr"),
        round((col("c0") - col("mv")) / (lit(100.0) - col("mc")), 6)
          .as("slope_cv"))
      .orderBy(col("perm"))
  }

  /** DuckDB twin of [[permutationDiag]] over the embeddings table —
    * `idPred` bounds the diagnostic sample, x/y are 1-based embedding
    * components. */
  def permutationDiagSql(idPred: String, xIdx: Int, yIdx: Int,
                         nPerm: Int, folds: Int): String = {
    import graft.queries.SqlGen.{sqlSum, sqlDetSum, sqlCorr}
    val permUnions = (1 to nPerm).map { p =>
      s"""SELECT $p AS perm, l.id, l.x, l.y, r.yp FROM
         |  (SELECT id, x, y, ROW_NUMBER() OVER (ORDER BY id) AS rn FROM b) l
         |  JOIN (SELECT y AS yp, ROW_NUMBER() OVER (
         |    ORDER BY md5('perm$p#' || CAST(id AS VARCHAR)), id) AS rn
         |    FROM b) r USING (rn)""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    def sums(pre: String) =
      s"""CAST(COUNT(*) AS DOUBLE) AS n$pre, ${sqlSum("x")} AS sx$pre,
         |    ${sqlSum("yp")} AS sy$pre, ${sqlSum("x * yp")} AS sxy$pre,
         |    ${sqlSum("x * x")} AS sxx$pre,
         |    ${sqlSum("yp * yp")} AS syy$pre""".stripMargin
    s"""WITH b AS MATERIALIZED (
       |  SELECT vec_id AS id, CAST(embedding[$xIdx] AS DOUBLE) AS x,
       |    CAST(embedding[$yIdx] AS DOUBLE) AS y
       |  FROM embeddings WHERE $idPred),
       |pm AS MATERIALIZED (
       |  SELECT 0 AS perm, id, x, y, y AS yp FROM b
       |  UNION ALL
       |  $permUnions),
       |pf AS MATERIALIZED (
       |  SELECT *, ${Tables.hashVal32Sql("'fold#' || CAST(id AS VARCHAR)")}
       |    % $folds AS fold FROM pm),
       |rk AS (SELECT perm,
       |  RANK() OVER (PARTITION BY perm ORDER BY y)
       |    + (COUNT(*) OVER (PARTITION BY perm, y) - 1) / 2.0 AS rx,
       |  RANK() OVER (PARTITION BY perm ORDER BY yp)
       |    + (COUNT(*) OVER (PARTITION BY perm, yp) - 1) / 2.0 AS ry
       |  FROM pm),
       |co AS (SELECT perm, ROUND(ABS(${sqlCorr("rx", "ry")}) * 100, 6)
       |  AS corr100 FROM rk GROUP BY perm),
       |tt AS (SELECT perm, ${sums("")} FROM pf GROUP BY perm),
       |fs AS (SELECT perm, fold, ${sums("f")} FROM pf GROUP BY perm, fold),
       |tr AS (
       |  SELECT perm, sstot, ROUND(1.0 - ssres_tr / sstot, 6) AS r2_train
       |  FROM (
       |    SELECT perm, sstot,
       |      syy - 2 * a_tr * sy - 2 * b_tr * sxy + n * a_tr * a_tr
       |        + 2 * a_tr * b_tr * sx + b_tr * b_tr * sxx AS ssres_tr
       |    FROM (
       |      SELECT *, sy / n - b_tr * (sx / n) AS a_tr,
       |        syy - sy * sy / n AS sstot
       |      FROM (
       |        SELECT *, (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b_tr
       |        FROM tt) t1) t2) t3),
       |cv AS (
       |  SELECT perm, ${sqlDetSum("ssres_f")} AS ssres_cv FROM (
       |    SELECT perm,
       |      syyf - 2 * a_f * syf - 2 * b_f * sxyf + nf * a_f * a_f
       |        + 2 * a_f * b_f * sxf + b_f * b_f * sxxf AS ssres_f
       |    FROM (
       |      SELECT *, syt / ntf - b_f * (sxt / ntf) AS a_f FROM (
       |        SELECT *, (ntf * sxyt - sxt * syt) /
       |          (ntf * sxxt - sxt * sxt) AS b_f
       |        FROM (
       |          SELECT fs.*, tt.n - fs.nf AS ntf, tt.sx - fs.sxf AS sxt,
       |            tt.sy - fs.syf AS syt, tt.sxy - fs.sxyf AS sxyt,
       |            tt.sxx - fs.sxxf AS sxxt
       |          FROM fs JOIN tt USING (perm)) q1) q2) q3) q4
       |  GROUP BY perm),
       |res AS (SELECT co.perm, co.corr100, tr.r2_train,
       |    ROUND(1.0 - cv.ssres_cv / tr.sstot, 6) AS r2_cv
       |  FROM co JOIN tr USING (perm) JOIN cv USING (perm)),
       |mn AS (SELECT ${sqlDetSum("corr100")} / $nPerm AS mc,
       |    ${sqlDetSum("r2_train")} / $nPerm AS mt,
       |    ${sqlDetSum("r2_cv")} / $nPerm AS mv
       |  FROM res WHERE perm > 0),
       |b0r AS (SELECT r2_train AS t0, r2_cv AS c0 FROM res WHERE perm = 0)
       |SELECT res.perm, res.corr100, res.r2_train, res.r2_cv,
       |  ROUND((t0 - mt) / (100.0 - mc), 6) AS slope_tr,
       |  ROUND((c0 - mv) / (100.0 - mc), 6) AS slope_cv
       |FROM res CROSS JOIN b0r CROSS JOIN mn
       |ORDER BY perm""".stripMargin
  }
}
