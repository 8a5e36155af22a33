package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.core.Tables._
import graft.preprocess.PreprocessOps
import graft.queries.SqlGen._

/** Oracle-verified queries for SURVEY §2.7 (expression language) and
  * §2.8 (preprocessing transforms: discretize/continuize/impute/
  * normalize). */
object PreprocessQueries {

  private def li(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.load(s, d, "lineitem")
  private def ord(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.load(s, d, "orders")
  private def cust(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.load(s, d, "customer")
  private def sup(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.load(s, d, "supplier")

  val all: Seq[Q] = Seq(

    Q("discretize_equalwidth", // discretize.py:211 — fit min/max, 10 bins
      (s, d) => PreprocessOps.equalWidth(li(s, d), "l_extendedprice", 10, "bin")
        .groupBy(col("bin")).agg(count(lit(1)).as("n"),
          min(col("l_extendedprice")).as("lo"),
          max(col("l_extendedprice")).as("hi"))
        .orderBy(col("bin")),
      Some("""SELECT bin, COUNT(*) AS n, MIN(l_extendedprice) AS lo,
             |       MAX(l_extendedprice) AS hi
             |FROM (SELECT l_extendedprice,
             |        CAST(LEAST(FLOOR((l_extendedprice - mn) / ((mx - mn) / 10)), 9) AS INT) AS bin
             |      FROM lineitem CROSS JOIN (SELECT MIN(l_extendedprice) AS mn,
             |        MAX(l_extendedprice) AS mx FROM lineitem))
             |GROUP BY bin ORDER BY bin""".stripMargin)),

    Q("discretize_equalfreq", // discretize.py:181 — quartiles via ntile
      (s, d) => PreprocessOps.equalFreqNtile(cust(s, d), "c_acctbal", 4,
          Seq("c_custkey"), "tile")
        .groupBy(col("tile")).agg(count(lit(1)).as("n"),
          min(col("c_acctbal")).as("lo"), max(col("c_acctbal")).as("hi"))
        .orderBy(col("tile")),
      Some("""SELECT tile, COUNT(*) AS n, MIN(c_acctbal) AS lo, MAX(c_acctbal) AS hi
             |FROM (SELECT c_acctbal,
             |        NTILE(4) OVER (ORDER BY c_acctbal ASC, c_custkey ASC) - 1 AS tile
             |      FROM customer)
             |GROUP BY tile ORDER BY tile""".stripMargin)),

    Q("discretize_equalfreq_approx", // discretize.py:181 at scale: grid-
      // histogram thresholds (one map-side-combined agg + broadcast CASE;
      // no global sort / SinglePartition Exchange — PlanSpec pin), with
      // the integer threshold rule recomputed verbatim by the oracle.
      // The ntile twin above stays as the toy-exact variant.
      (s, d) => PreprocessOps.equalFreqGrid(cust(s, d), "c_acctbal", 4, "tile")
        .groupBy(col("tile")).agg(count(lit(1)).as("n"),
          min(col("c_acctbal")).as("lo"), max(col("c_acctbal")).as("hi"))
        .orderBy(col("tile")),
      Some(PreprocessOps.equalFreqGridSql("customer", "c_acctbal", 4))),

    Q("discretize_fixedwidth", // discretize.py:251
      (s, d) => ord(s, d)
        .withColumn("bucket", PreprocessOps.fixedWidth(col("o_totalprice"), 50000))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
        .orderBy(col("bucket")),
      Some("""SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket,
             |       COUNT(*) AS n
             |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin)),

    Q("discretize_time_year", // FixedTimeWidth (discretize.py:272)
      (s, d) => li(s, d)
        .groupBy(PreprocessOps.timeBin(col("l_shipdate"), "year").as("y"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("y")),
      Some("""SELECT date_trunc('year', l_shipdate) AS y, COUNT(*) AS n
             |FROM lineitem GROUP BY 1 ORDER BY y""".stripMargin)),

    Q("continuize_onehot", // Indicators treatment (transformation.py:100-173)
      (s, d) => PreprocessOps.oneHot(ord(s, d), "o_orderstatus",
          Seq("F", "O", "P"), "st_")
        .select(col("o_orderkey"), col("st_F"), col("st_O"), col("st_P"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
             |  CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS "st_F",
             |  CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS "st_O",
             |  CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END AS "st_P"
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    Q("continuize_asordinal", // AsOrdinal treatment (continuize.py)
      (s, d) => ord(s, d).select(col("o_orderkey"),
          PreprocessOps.asOrdinal(col("o_orderpriority"),
            Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
            .as("prio_ord"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
             |  CASE o_orderpriority WHEN '1-URGENT' THEN 0 WHEN '2-HIGH' THEN 1
             |    WHEN '3-MEDIUM' THEN 2 WHEN '4-NOT SPECIFIED' THEN 3
             |    WHEN '5-LOW' THEN 4 END AS prio_ord
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    Q("discretize_nice_bins", // Binning with nice decimal thresholds
      // (discretize.py:332-523): candidate widths = factor/10^-floor(log10
      // (max-min)), ends snapped outward, bin count closest to n=4 wins
      // (tie -> more bins). The SQL twin recomputes the full selection.
      (s, d) => {
        val (_, binned) = PreprocessOps.niceBinning(
          sup(s, d), "s_acctbal", 4, "bin")
        binned.groupBy(col("bin")).agg(count(lit(1)).as("n_rows"),
            min(col("s_acctbal")).as("lo"), max(col("s_acctbal")).as("hi"))
          .orderBy(col("bin"))
      },
      Some("""WITH s AS (
             |  SELECT MIN(s_acctbal) AS mn, MAX(s_acctbal) AS mx,
             |         COUNT(DISTINCT s_acctbal) AS nu
             |  FROM supplier WHERE s_acctbal IS NOT NULL),
             |fac AS (SELECT * FROM (VALUES (1, 0.01), (2, 0.02), (3, 0.025),
             |  (4, 0.05), (5, 0.1), (6, 0.2), (7, 0.25), (8, 0.5), (9, 1.0),
             |  (10, 2.0), (11, 5.0), (12, 10.0), (13, 20.0)) f(fidx, f)),
             |cand0 AS (
             |  SELECT fidx, f / POW(10, -FLOOR(LOG10(mx - mn))) AS width,
             |         mn, mx, nu
             |  FROM fac CROSS JOIN s),
             |cand AS (
             |  SELECT fidx, width, nu,
             |         FLOOR(mn / width) * width AS mnw,
             |         CEIL(mx / width) * width AS mxw,
             |         ROUND((CEIL(mx / width) * width - FLOOR(mn / width) * width)
             |               / width) AS nbins
             |  FROM cand0),
             |sel AS (
             |  SELECT * FROM cand
             |  WHERE nbins >= 2 AND nbins <= LEAST(50, nu) AND nbins >= 3
             |  ORDER BY ABS(4 - nbins) ASC, nbins DESC, fidx ASC
             |  LIMIT 1),
             |assigned AS (
             |  SELECT s_acctbal,
             |    CAST(LEAST(FLOOR((s_acctbal - sel.mnw) / sel.width),
             |               sel.nbins - 1) AS INT) AS bin
             |  FROM supplier CROSS JOIN sel
             |  WHERE s_acctbal IS NOT NULL)
             |SELECT bin, COUNT(*) AS n_rows, MIN(s_acctbal) AS lo,
             |       MAX(s_acctbal) AS hi
             |FROM assigned GROUP BY bin ORDER BY bin""".stripMargin)),

    Q("discretize_nice_time", // time Binning (discretize.py:523-635):
      // the calendar width ladder over the events span (30 days) keeps
      // {1 day: ~30, 1 week: 5, 2 weeks: 3} candidates; closest-to-4
      // with more-bins tie-break selects Monday-snapped 1-week bins.
      // The oracle pins that outcome generically via date_trunc('week').
      (s, d) => {
        // events.ts is nanosecond-epoch int64 in parquet → µs timestamp
        val ev = Tables.load(s, d, "events")
          .withColumn("tstamp", timestamp_micros(expr("ts div 1000")))
        val (_, _, binned) = PreprocessOps.niceTimeBinning(ev, "tstamp", 4, "bin")
        binned.groupBy(col("bin")).agg(count(lit(1)).as("n_rows"),
            min(col("tstamp")).as("lo"), max(col("tstamp")).as("hi"))
          .orderBy(col("bin"))
      },
      Some("""WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS tstamp FROM events),
             |s AS (SELECT date_trunc('week', MIN(tstamp)) AS w0 FROM e)
             |SELECT CAST(FLOOR(DATE_DIFF('second', w0, tstamp) / (7 * 86400.0)) AS INT) AS bin,
             |       COUNT(*) AS n_rows, MIN(tstamp) AS lo, MAX(tstamp) AS hi
             |FROM e CROSS JOIN s
             |GROUP BY 1 ORDER BY bin""".stripMargin)),

    Q("continuize_treatments", // DomainContinuizer's remaining multinomial
      // treatments (continuize.py:11-100): FrequentAsBase (data-fitted
      // base = the modus), FirstAsBase, Remove, RemoveMultinomial,
      // AsNormalizedOrdinal. Each treatment's output table is melted to
      // (treatment, out_col, value_sum) rows so the data-dependent
      // column set (FrequentAsBase drops the modus indicator) stays
      // schema-stable for the oracle compare.
      (s, d) => {
        import graft.preprocess.PreprocessOps.{MultinomialTreatment => MT}
        val vars = Seq(
          ("o_orderpriority", Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
            "4-NOT SPECIFIED", "5-LOW")),
          ("o_orderstatus", Seq("F", "O", "P")))
        val base = ord(s, d).select(col("o_orderkey"),
          col("o_orderpriority"), col("o_orderstatus"))
        def melt(t: org.apache.spark.sql.DataFrame, label: String) = {
          val aggs = t.columns.toSeq.map(c =>
            exactSum(col(c).cast("double")).as(c))
          t.agg(aggs.head, aggs.tail: _*)
            .select(lit(label).as("treatment"), explode(array(
              t.columns.toSeq.map(c => struct(lit(c).as("out_col"),
                col(c).as("value_sum"))): _*)).as("kv"))
            .select(col("treatment"), col("kv.out_col").as("out_col"),
              col("kv.value_sum").as("value_sum"))
        }
        Seq[(MT, String)](
          (MT.FrequentAsBase, "FrequentAsBase"),
          (MT.FirstAsBase, "FirstAsBase"),
          (MT.Remove, "Remove"),
          (MT.RemoveMultinomial, "RemoveMultinomial"),
          (MT.AsNormalizedOrdinal, "AsNormalizedOrdinal"))
          .map { case (t, lbl) =>
            melt(graft.preprocess.PreprocessOps.continuize(base, vars, t), lbl) }
          .reduce(_.unionByName(_))
          .orderBy(col("treatment"), col("out_col"))
      },
      Some(s"""WITH cp AS (SELECT o_orderpriority AS v, COUNT(*) AS n,
              |             ROW_NUMBER() OVER (ORDER BY o_orderpriority) - 1 AS idx
              |           FROM orders GROUP BY 1),
              |cs AS (SELECT o_orderstatus AS v, COUNT(*) AS n,
              |         ROW_NUMBER() OVER (ORDER BY o_orderstatus) - 1 AS idx
              |       FROM orders GROUP BY 1),
              |kp AS (SELECT v FROM cp ORDER BY n DESC, v ASC LIMIT 1),
              |ks AS (SELECT v FROM cs ORDER BY n DESC, v ASC LIMIT 1),
              |okey AS (SELECT ${sqlSum("o_orderkey")} AS s FROM orders)
              |SELECT * FROM (
              |  SELECT 'FrequentAsBase' AS treatment, 'o_orderkey' AS out_col,
              |         (SELECT s FROM okey) AS value_sum
              |  UNION ALL
              |  SELECT 'FrequentAsBase', 'o_orderpriority=' || v, CAST(n AS DOUBLE)
              |  FROM cp WHERE v <> (SELECT v FROM kp)
              |  UNION ALL
              |  SELECT 'FrequentAsBase', 'o_orderstatus=' || v, CAST(n AS DOUBLE)
              |  FROM cs WHERE v <> (SELECT v FROM ks)
              |  UNION ALL
              |  SELECT 'FirstAsBase', 'o_orderkey', (SELECT s FROM okey)
              |  UNION ALL
              |  SELECT 'FirstAsBase', 'o_orderpriority=' || v, CAST(n AS DOUBLE)
              |  FROM cp WHERE idx <> 0
              |  UNION ALL
              |  SELECT 'FirstAsBase', 'o_orderstatus=' || v, CAST(n AS DOUBLE)
              |  FROM cs WHERE idx <> 0
              |  UNION ALL
              |  SELECT 'Remove', 'o_orderkey', (SELECT s FROM okey)
              |  UNION ALL
              |  SELECT 'RemoveMultinomial', 'o_orderkey', (SELECT s FROM okey)
              |  UNION ALL
              |  SELECT 'AsNormalizedOrdinal', 'o_orderkey', (SELECT s FROM okey)
              |  UNION ALL
              |  SELECT 'AsNormalizedOrdinal', 'o_orderpriority',
              |    CAST(SUM(CAST(n * (idx / 4.0) AS DECIMAL(38,6))) AS DOUBLE)
              |  FROM cp
              |  UNION ALL
              |  SELECT 'AsNormalizedOrdinal', 'o_orderstatus',
              |    CAST(SUM(CAST(n * (idx / 2.0) AS DECIMAL(38,6))) AS DOUBLE)
              |  FROM cs)
              |ORDER BY treatment, out_col""".stripMargin)),

    Q("encode_target_smoothed", // smoothed mean target encoding
      // (micci-barreca KDD'01; beyond-reference pipeline op): per
      // returnflag, (Σy + m·ȳ)/(n + m) with m=10 — one groupBy + a
      // broadcast map-back, no second fact shuffle. Emitted as the
      // per-category encoding map (the fitted "model").
      (s, d) => PreprocessOps.targetEncodeSmoothed(
          li(s, d), "l_returnflag", "l_extendedprice", "enc", m = 10.0)
        .groupBy(col("l_returnflag"), col("enc"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("l_returnflag")),
      Some(s"""WITH g AS (SELECT ${sqlSum("l_extendedprice")} AS gs,
              |                  COUNT(l_extendedprice) AS gn FROM lineitem),
              |e AS (
              |  SELECT l_returnflag,
              |    ROUND((${sqlSum("l_extendedprice")} + 10.0 * (gs / gn)) /
              |          (COUNT(l_extendedprice) + 10.0), 6) AS enc
              |  FROM lineitem CROSS JOIN g
              |  GROUP BY l_returnflag, gs, gn)
              |SELECT l.l_returnflag, e.enc, COUNT(*) AS n
              |FROM lineitem l JOIN e USING (l_returnflag)
              |GROUP BY l.l_returnflag, e.enc
              |ORDER BY l.l_returnflag""".stripMargin)),

    Q("impute_mean", // ReplaceUnknowns/Average (impute.py:96)
      // The fixture has no NULLs, so nulls are synthesized (qty<5 →
      // unknown), then imputed with the exact mean of the rest.
      (s, d) => {
        val withNulls = li(s, d).withColumn("v",
          when(col("l_quantity") < 5, null).otherwise(col("l_quantity")))
        PreprocessOps.imputeMean(withNulls, "v", "imputed")
          .select(col("l_orderkey"), col("l_linenumber"), col("imputed"))
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("imputed"))
      },
      Some(s"""SELECT l_orderkey, l_linenumber, COALESCE(v, m) AS imputed
              |FROM (SELECT l_orderkey, l_linenumber,
              |        CASE WHEN l_quantity < 5 THEN NULL ELSE l_quantity END AS v
              |      FROM lineitem)
              |CROSS JOIN (SELECT ${sqlMean("CASE WHEN l_quantity < 5 THEN NULL ELSE l_quantity END")} AS m
              |            FROM lineitem)
              |ORDER BY l_orderkey, l_linenumber, imputed""".stripMargin)),

    Q("impute_asvalue", // AsValue (impute.py:285-324): token + indicator
      (s, d) => {
        val withNulls = ord(s, d).withColumn("status",
          when(col("o_orderstatus") === "P", null).otherwise(col("o_orderstatus")))
        PreprocessOps.imputeAsValue(withNulls, "status")
          .select(col("o_orderkey"), col("status"), col("status_defined"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey,
             |  CASE WHEN o_orderstatus = 'P' THEN 'N/A' ELSE o_orderstatus END AS status,
             |  CASE WHEN o_orderstatus = 'P' THEN 0 ELSE 1 END AS status_defined
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    Q("impute_model", // Model-based impute (impute.py:176-260): the
      // fitted model is the per-returnflag conditional mean.
      (s, d) => {
        val withNulls = li(s, d).withColumn("v",
          when(col("l_tax") > 0.05, null).otherwise(col("l_discount")))
        PreprocessOps.imputeModelGroupMean(withNulls, "v", "l_returnflag",
            "imputed")
          .select(col("l_orderkey"), col("l_linenumber"), col("imputed"))
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("imputed"))
      },
      Some(s"""WITH base AS (
              |  SELECT l_orderkey, l_linenumber, l_returnflag,
              |    CASE WHEN l_tax > 0.05 THEN NULL ELSE l_discount END AS v
              |  FROM lineitem),
              |fitted AS (SELECT l_returnflag, ${sqlMean("v")} AS p
              |           FROM base GROUP BY 1)
              |SELECT l_orderkey, l_linenumber, COALESCE(v, p) AS imputed
              |FROM base JOIN fitted USING (l_returnflag)
              |ORDER BY l_orderkey, l_linenumber, imputed""".stripMargin)),

    Q("impute_random", // Random impute (impute.py:325-390): seeded draw
      // from the empirical distribution via inverse CDF.
      (s, d) => {
        val withNulls = ord(s, d).withColumn("v",
          when(col("o_orderstatus") === "P", null).otherwise(col("o_totalprice")))
        PreprocessOps.imputeRandom(withNulls, "v", col("o_orderkey"),
            "imputed")
          .select(col("o_orderkey"), col("imputed"))
          .orderBy(col("o_orderkey"))
      },
      Some {
        val h = hashVal32Sql("CONCAT('imp_', o_orderkey)")
        s"""WITH base AS (
           |  SELECT o_orderkey,
           |    CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_totalprice END AS v
           |  FROM orders),
           |defined AS (
           |  SELECT v AS dv,
           |    ROW_NUMBER() OVER (ORDER BY v ASC, o_orderkey ASC) AS idx
           |  FROM base WHERE v IS NOT NULL),
           |n AS (SELECT COUNT(*) AS ndef FROM defined),
           |picked AS (
           |  SELECT o_orderkey, v,
           |    CASE WHEN v IS NULL THEN
           |      CAST(FLOOR((($h + 0.5) / 4294967296.0) * ndef) AS BIGINT) + 1
           |    END AS pick
           |  FROM base CROSS JOIN n)
           |SELECT p.o_orderkey, COALESCE(p.v, d.dv) AS imputed
           |FROM picked p LEFT JOIN defined d ON d.idx = p.pick
           |ORDER BY o_orderkey""".stripMargin
      }),

    Q("preprocess_pipeline", // PreprocessorList (preprocess.py:60-90):
      // chained impute → normalize → discretize as ONE composed plan —
      // the stage stats (mean, sd, min/max) are sub-aggregations feeding
      // the next stage's expressions, exactly how a fitted preprocessor
      // chain replays on a cluster. Imputed and normalized values are
      // pinned to 6 decimals at the stage boundaries so the DECIMAL
      // casts in downstream exact sums are digit-exact across engines
      // (the recorded half-up/half-even cast hazard).
      (s, d) => {
        val base = li(s, d).select(
          when(col("l_quantity") < 5, null).otherwise(col("l_quantity")).as("v"))
        val m = base.agg(exactMean(col("v")).as("m"))
        val imp = base.crossJoin(broadcast(m))
          .select(round(coalesce(col("v"), col("m")), 6).as("v_imp"))
        val st = imp.agg(exactMean(col("v_imp")).as("mm"),
          exactStdSamp(col("v_imp")).as("sd"))
        // + 0.0 normalizes IEEE −0.0 (a value equal to the stage mean
        // rounds to −0.0 in DuckDB but +0.0 in Spark)
        val norm = imp.crossJoin(broadcast(st))
          .select((round((col("v_imp") - col("mm")) / col("sd"), 6) + 0.0)
            .as("zr"))
        val mx = norm.agg(min(col("zr")).as("mn"), max(col("zr")).as("mx"))
        norm.crossJoin(broadcast(mx))
          .select(col("zr"), least(floor((col("zr") - col("mn")) /
            ((col("mx") - col("mn")) / 10)), lit(9.0)).cast("int").as("bin"))
          .groupBy(col("bin")).agg(count(lit(1)).as("n"),
            min(col("zr")).as("lo"), max(col("zr")).as("hi"))
          .orderBy(col("bin"))
      },
      Some(s"""WITH base AS (
              |  SELECT CASE WHEN l_quantity < 5 THEN NULL ELSE l_quantity END AS v
              |  FROM lineitem),
              |imp AS (SELECT ROUND(COALESCE(v, m), 6) AS v_imp
              |  FROM base CROSS JOIN (SELECT ${sqlMean("v")} AS m FROM base)),
              |norm AS (SELECT ROUND((v_imp - mm) / sd, 6) + 0.0 AS zr
              |  FROM imp CROSS JOIN (SELECT ${sqlMean("v_imp")} AS mm,
              |    ${sqlStdSamp("v_imp")} AS sd FROM imp)),
              |binned AS (SELECT zr,
              |    CAST(LEAST(FLOOR((zr - mn) / ((mx - mn) / 10)), 9) AS INT) AS bin
              |  FROM norm CROSS JOIN (SELECT MIN(zr) AS mn, MAX(zr) AS mx FROM norm))
              |SELECT bin, COUNT(*) AS n, MIN(zr) AS lo, MAX(zr) AS hi
              |FROM binned GROUP BY bin ORDER BY bin""".stripMargin)),

    Q("normalize_zscore", // Normalize by SD (normalize.py:11-110).
      // Rounded to 6 decimals: the raw quotient differs by 1 ulp between
      // engines at sf0.1 (sqrt-of-derived-variance divisor).
      (s, d) => PreprocessOps.normalizeBySD(cust(s, d), "c_acctbal", "z")
        .select(col("c_custkey"), round(col("z"), 6).as("z"))
        .orderBy(col("c_custkey")),
      Some(s"""SELECT c_custkey, ROUND((c_acctbal - m) / sd, 6) AS z
              |FROM customer CROSS JOIN (
              |  SELECT ${sqlMean("c_acctbal")} AS m,
              |         ${sqlStdSamp("c_acctbal")} AS sd FROM customer)
              |ORDER BY c_custkey""".stripMargin)),

    Q("normalize_span", // Normalize by span to [0,1]
      (s, d) => PreprocessOps.normalizeBySpan(sup(s, d), "s_acctbal", "scaled")
        .select(col("s_suppkey"), col("scaled"))
        .orderBy(col("s_suppkey")),
      Some("""SELECT s_suppkey, (s_acctbal - mn) / (mx - mn) AS scaled
             |FROM supplier CROSS JOIN (SELECT MIN(s_acctbal) AS mn,
             |  MAX(s_acctbal) AS mx FROM supplier)
             |ORDER BY s_suppkey""".stripMargin)),

    Q("scale_center_median", // Scale: center by median (preprocess.py:467-545)
      (s, d) => {
        val fitted = PreprocessOps.withStats(cust(s, d),
          Seq(round(percentile(col("c_acctbal"), lit(0.5)), 6).as("__med")))
        fitted.select(col("c_custkey"),
            (col("c_acctbal") - col("__med")).as("centered"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_acctbal - med AS centered
             |FROM customer CROSS JOIN (
             |  SELECT ROUND(CAST(quantile_cont(c_acctbal, 0.5) AS DOUBLE), 6) AS med
             |  FROM customer)
             |ORDER BY c_custkey""".stripMargin)),

    Q("feature_construction", // §2.7 expression language → Column algebra
      (s, d) => li(s, d).select(
          col("l_orderkey"), col("l_linenumber"),
          round(sqrt(col("l_quantity")), 6).as("f_sqrt"),
          round(log(col("l_extendedprice")), 6).as("f_log"),
          round(exp(col("l_discount")), 6).as("f_exp"),
          round(sin(col("l_tax")), 6).as("f_sin"),
          round(pow(col("l_quantity"), 2) + col("l_tax") * 10, 6).as("f_poly"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("f_sqrt")),
      Some("""SELECT l_orderkey, l_linenumber,
             |  ROUND(SQRT(l_quantity), 6) AS f_sqrt,
             |  ROUND(LN(l_extendedprice), 6) AS f_log,
             |  ROUND(EXP(l_discount), 6) AS f_exp,
             |  ROUND(SIN(l_tax), 6) AS f_sin,
             |  ROUND(POW(l_quantity, 2) + l_tax * 10, 6) AS f_poly
             |FROM lineitem ORDER BY l_orderkey, l_linenumber, f_sqrt""".stripMargin)),

    Q("datetime_features", // TimeVariable accessors (§2.7 date/time ops)
      (s, d) => ord(s, d).select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          dayofweek(col("o_orderdate")).as("dow"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
             |  CAST(year(o_orderdate) AS INT) AS y,
             |  CAST(month(o_orderdate) AS INT) AS mo,
             |  CAST(day(o_orderdate) AS INT) AS dom,
             |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
             |  CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) AS epoch_s
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    Q("preprocess_pipeline_project", // ProjectPCA + AdaptiveNormalize
      // (preprocess.py:442-449, 614-659) composed as ONE declarative
      // plan: AdaptiveNormalize dispatches per column on the zero
      // fraction (sparse → span scale, dense → z-score — the engine's
      // columnar analog of the reference's representation test), then
      // ProjectPCA replaces the feature block with top-2 component
      // scores. Stats = one scan; fit = one moments scan; transform =
      // one narrow map with the model inlined as literals.
      (s, d) => {
        val e = Tables.load(s, d, "embeddings")
        val dims = 0 until 8
        val base = e.select(col("vec_id") +: dims.map(i =>
          element_at(col("embedding"), i + 1).cast("double").as(s"x$i")): _*)
        val aggs = dims.flatMap(i => Seq(
          exactMean(col(s"x$i")).as(s"m$i"),
          exactStdSamp(col(s"x$i")).as(s"sd$i"),
          (sum(when(col(s"x$i") === 0.0, 1L).otherwise(0L)).cast("double") /
            count(lit(1))).as(s"zf$i"),
          min(col(s"x$i")).as(s"mn$i"), max(col(s"x$i")).as(s"mx$i")))
        val st = base.agg(aggs.head, aggs.tail: _*)
        val nz = base.crossJoin(broadcast(st)).select(col("vec_id") +:
          dims.map(i =>
            (round(when(col(s"zf$i") >= 0.5,
                col(s"x$i") / (col(s"mx$i") - col(s"mn$i")))
              .otherwise((col(s"x$i") - col(s"m$i")) / col(s"sd$i")), 6)
              + 0.0).as(s"z$i")): _*)
        graft.ml.PowerPCA.project(nz,
          dims.map(i => (s"z$i", col(s"z$i"))), Seq("vec_id"),
          nComp = 2, iters = 25)
          .orderBy(col("vec_id"))
      },
      Some {
        val dims = 0 until 8
        val eb = s"""eb AS MATERIALIZED (
           |  SELECT vec_id, ${dims.map(i =>
               s"CAST(embedding[${i + 1}] AS DOUBLE) AS x$i").mkString(", ")}
           |  FROM embeddings)""".stripMargin
        val ebst = s"""ebst AS (
           |  SELECT ${dims.map(i =>
               s"${sqlMean(s"x$i")} AS m$i, ${sqlStdSamp(s"x$i")} AS sd$i, " +
               s"CAST(SUM(CASE WHEN x$i = 0 THEN 1 ELSE 0 END) AS DOUBLE)" +
               s" / COUNT(*) AS zf$i, MIN(x$i) AS mn$i, MAX(x$i) AS mx$i")
               .mkString(",\n    ")}
           |  FROM eb)""".stripMargin
        val nrm = s"""nrm AS MATERIALIZED (
           |  SELECT vec_id, ${dims.map(i =>
               s"ROUND(CASE WHEN zf$i >= 0.5 THEN x$i / (mx$i - mn$i) " +
               s"ELSE (x$i - m$i) / sd$i END, 6) + 0.0 AS z$i")
               .mkString(",\n    ")}
           |  FROM eb CROSS JOIN ebst)""".stripMargin
        graft.ml.PowerPCA.projectSql("nrm",
          dims.map(i => (s"z$i", s"z$i")), Seq("vec_id"),
          nComp = 2, iters = 25, prelude = s"$eb,\n$ebst,\n$nrm")
      }),

    Q("preprocess_project_cur", // ProjectCUR (preprocess.py:451-463,
      // compute_U=False): the transform IS the top-rank-leverage column
      // subset, emitted long (vec_id, dim, x) so the data-dependent
      // column choice is a broadcast join, not a dynamic schema.
      (s, d) => graft.ml.PowerPCA.projectCUR(
          Tables.load(s, d, "embeddings"),
          (0 until 8).map(i => (s"e$i", element_at(col("embedding"), i + 1))),
          Seq("vec_id"), rank = 3, nComp = 3, iters = 25)
        .orderBy(col("vec_id"), col("dim")),
      Some(graft.ml.PowerPCA.projectCURSql("embeddings",
        (0 until 8).map(i => (s"e$i", s"embedding[${i + 1}]")),
        Seq("vec_id"), rank = 3, nComp = 3, iters = 25))),

    Q("time_parse_formats", // TimeVariable._ISO_FORMATS probe chain
      // (variable.py:937-972) under oracle: each row renders its
      // timestamp in one of 8 reference formats (date+time, T-separator,
      // date-only, compact 14/8-digit, ordinal %Y-%j, time-only,
      // fractional+%z) and TabReader.timeProbe must recover the exact
      // epoch. The oracle computes the ground-truth epoch ARITHMETICALLY
      // (no string round-trip), so a probe picking the wrong format —
      // e.g. %Y-%j leaking into %Y-%m — breaks the hash match.
      (s, d) => {
        val secs = (col("o_orderkey") % 86400).cast("long")
        val micros = (col("o_orderkey") % 1000000).cast("long")
        val base = ord(s, d).select(
          col("o_orderkey"), secs.as("secs"), micros.as("us"),
          expr("timestampadd(SECOND, o_orderkey % 86400, CAST(o_orderdate AS TIMESTAMP))").as("ts"))
        val rendered = base.withColumn("s",
          when(col("o_orderkey") % 8 === 0, date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
          .when(col("o_orderkey") % 8 === 1, date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss"))
          .when(col("o_orderkey") % 8 === 2, date_format(col("ts"), "yyyy-MM-dd"))
          .when(col("o_orderkey") % 8 === 3, date_format(col("ts"), "yyyyMMddHHmmss"))
          .when(col("o_orderkey") % 8 === 4, date_format(col("ts"), "yyyyMMdd"))
          .when(col("o_orderkey") % 8 === 5, date_format(col("ts"), "yyyy-DDD"))
          .when(col("o_orderkey") % 8 === 6, date_format(col("ts"), "HH:mm:ss"))
          .otherwise(concat(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"),
            lit("."), lpad(col("us").cast("string"), 6, "0"), lit("+0100"))))
        rendered.select(col("o_orderkey"),
            round(graft.sources.TabReader.timeProbe(col("s")).cast("double"), 6)
              .as("t_epoch"))
          .orderBy(col("o_orderkey"))
      },
      Some("""WITH b AS (
             |  SELECT o_orderkey,
             |    o_orderkey % 86400 AS secs,
             |    o_orderkey % 1000000 AS us,
             |    CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) AS de,
             |    o_orderkey % 8 AS c
             |  FROM orders)
             |SELECT o_orderkey,
             |  ROUND(CASE
             |    WHEN c IN (0, 1, 3) THEN CAST(de + secs AS DOUBLE)
             |    WHEN c IN (2, 4, 5) THEN CAST(de AS DOUBLE)
             |    WHEN c = 6 THEN CAST(secs AS DOUBLE)
             |    ELSE ((de + secs - 3600) * 1000000 + us) / 1000000.0
             |  END, 6) AS t_epoch
             |FROM b ORDER BY o_orderkey""".stripMargin)),

    Q("random_variates", // §2.7 seeded random variates — portable hash →
      // uniform → Box-Muller normal / inverse-CDF exponential.
      (s, d) => {
        val u1 = (hashVal32(concat(lit("u1_"), col("o_orderkey"))) + 0.5) / 4294967296.0
        val u2 = (hashVal32(concat(lit("u2_"), col("o_orderkey"))) + 0.5) / 4294967296.0
        ord(s, d).select(
            col("o_orderkey"),
            round(u1, 6).as("runif"),
            round(sqrt(-log(u1) * 2.0) * cos(u2 * (2.0 * math.Pi)), 6).as("rnorm"),
            round(-log(u1), 6).as("rexp"))
          .orderBy(col("o_orderkey"))
      },
      Some {
        val h1 = sqlHash32("CONCAT('u1_', o_orderkey)")
        val h2 = sqlHash32("CONCAT('u2_', o_orderkey)")
        s"""SELECT o_orderkey,
           |  ROUND(($h1 + 0.5) / 4294967296.0, 6) AS runif,
           |  ROUND(SQRT(-LN(($h1 + 0.5) / 4294967296.0) * 2.0)
           |        * COS((($h2 + 0.5) / 4294967296.0) * ${2.0 * math.Pi}), 6) AS rnorm,
           |  ROUND(-LN(($h1 + 0.5) / 4294967296.0), 6) AS rexp
           |FROM orders ORDER BY o_orderkey""".stripMargin
      })
  )
}
