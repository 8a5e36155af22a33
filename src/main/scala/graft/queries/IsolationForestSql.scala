package graft.queries

import graft.core.Tables

/** DuckDB replay of graft.ml.IsolationForest's hash-driven induction for
  * the `outliers_isolation_forest` oracle (reference
  * outlier_detection.py IsolationForestLearner; Liu/Ting/Zhou 2008).
  *
  * The Spark op fits driver-side on the first 512 lineitem rows ordered by
  * an md5 key hash, with every random draw an md5 hash of
  * (tag, tree, node path) — a pure function of the sample. This generator
  * emits the same induction as SQL:
  *   samp    — the 512-row deterministic sample with a dense rank rn;
  *   draws   — ψ=256 with-replacement subsample draws per tree;
  *   a0..a8  — per-level row→node assignment (path = "0"/"1" string);
  *   s,l / n,l — per-node stats and the (att, split | leaf) decision,
  *               exactly mirroring IsolationForest.fit's candidate set,
  *               hash-chosen attribute and `lo + u·(hi−lo)` split;
  *   w0..w8 / hit0..hit8 — unrolled scoring walk over ALL rows;
  *   final   — s(x) = 2^(−E[h]/c(256)), rounded to 6, top 20.
  * Double math (ln, power, /) is identical IEEE in both engines; the only
  * divergence channel is the 50-term path-length sum order, absorbed by
  * ROUND(…, 6) exactly like the repo's other fitted-model oracles. */
object IsolationForestSql {
  private def hv(expr: String): String = Tables.hashVal32Sql(expr)

  /** c(n) for a SQL integer expression (Liu et al. eq. 1; 0 for n ≤ 1). */
  private def cOf(n: String): String =
    s"(CASE WHEN $n <= 1 THEN 0.0 ELSE 2.0*(ln($n - 1.0) + 0.5772156649) - 2.0*($n - 1.0)/$n END)"

  /** @param maxDepth -1 (default) derives the depth cap the Scala fit uses:
    *   ⌈log₂ ψ⌉ with ψ = min(256, fitRows) (IsolationForest.fit). A
    *   hardcoded 8 was only correct for fitRows ≥ 256; the derived form
    *   keeps the two forests in lockstep for small fit tables too. The
    *   caller must still ensure the fit table actually HAS ≥ fitRows rows
    *   (otherwise the Scala side's n shrinks below fitRows and ψ with it). */
  def oracle(nTrees: Int, fitRows: Int, maxDepth: Int = -1): String = {
    // fitRows ≤ 0 would make ψ ≤ 0, log(ψ) NaN and the derived depth
    // Int.MinValue — the (0 to depth) level ranges go empty and the
    // generated SQL is malformed (dangling commas) instead of failing here
    require(fitRows >= 1, s"isolation-forest oracle needs fitRows >= 1, got $fitRows")
    require(nTrees >= 1, s"isolation-forest oracle needs nTrees >= 1, got $nTrees")
    val psi = math.min(256, fitRows)
    val depth =
      if (maxDepth >= 0) maxDepth
      else math.ceil(math.log(psi.toDouble) / math.log(2.0)).toInt
    val levels = (0 to depth).map { l =>
      val depthCap = if (l >= depth) "TRUE" else "FALSE"
      val next =
        if (l < depth)
          s""",
             |a${l + 1} AS MATERIALIZED (
             |  SELECT a.t, a.i, a.f0, a.f1,
             |    a.path || CASE WHEN (CASE n.att WHEN 0 THEN a.f0 ELSE a.f1 END) < n.split
             |              THEN '0' ELSE '1' END AS path
             |  FROM a$l a JOIN n$l n ON n.t = a.t AND n.path = a.path
             |  WHERE n.split IS NOT NULL)"""
        else ""
      s"""s$l AS MATERIALIZED (
         |  SELECT t, path, COUNT(*) AS sz,
         |    MIN(f0) AS lo0, MAX(f0) AS hi0, MIN(f1) AS lo1, MAX(f1) AS hi1
         |  FROM a$l GROUP BY t, path),
         |n$l AS MATERIALIZED (
         |  SELECT t, path, sz,
         |    (CASE WHEN lo0 < hi0 THEN 1 ELSE 0 END
         |     + CASE WHEN lo1 < hi1 THEN 1 ELSE 0 END) AS natt,
         |    CASE WHEN sz <= 1 OR $depthCap OR natt = 0 THEN NULL
         |         WHEN natt = 2 THEN ${hv(s"'ifs_att_' || t || '_' || path")} % 2
         |         WHEN lo0 < hi0 THEN 0 ELSE 1 END AS att,
         |    CASE att WHEN 0 THEN lo0 WHEN 1 THEN lo1 END AS lo,
         |    CASE att WHEN 0 THEN hi0 WHEN 1 THEN hi1 END AS hi,
         |    CASE WHEN att IS NULL THEN NULL
         |         ELSE lo + (${hv(s"'ifs_split_' || t || '_' || path")} / 4294967296.0) * (hi - lo)
         |         END AS split0,
         |    CASE WHEN split0 IS NULL OR split0 <= lo THEN NULL ELSE split0 END AS split
         |  FROM s$l)$next""".stripMargin
    }.mkString(",\n")

    val walks = (0 to depth).map { l =>
      val next =
        if (l < depth)
          s""",
             |w${l + 1} AS MATERIALIZED (
             |  SELECT w.rid, w.l_orderkey, w.l_linenumber, w.f0, w.f1, w.t,
             |    w.path || CASE WHEN (CASE n.att WHEN 0 THEN w.f0 ELSE w.f1 END) < n.split
             |              THEN '0' ELSE '1' END AS path
             |  FROM w$l w JOIN n$l n ON n.t = w.t AND n.path = w.path
             |  WHERE n.split IS NOT NULL)"""
        else ""
      s"""hit$l AS (
         |  SELECT w.rid, w.l_orderkey, w.l_linenumber, $l + ${cOf("n.sz")} AS pl
         |  FROM w$l w JOIN n$l n ON n.t = w.t AND n.path = w.path
         |  WHERE n.split IS NULL)$next""".stripMargin
    }.mkString(",\n")

    val hitUnion = (0 to depth).map(l => s"SELECT * FROM hit$l")
      .mkString("\nUNION ALL\n")

    s"""WITH samp0 AS (
       |  SELECT CAST(l_quantity AS DOUBLE) AS f0,
       |         CAST(l_extendedprice AS DOUBLE) AS f1,
       |         ${hv("'ifs_' || l_orderkey || '_' || l_linenumber")} AS h,
       |         l_orderkey, l_linenumber
       |  FROM lineitem),
       |samp AS MATERIALIZED (
       |  SELECT f0, f1,
       |    ROW_NUMBER() OVER (ORDER BY h, l_orderkey, l_linenumber, f0, f1) AS rn
       |  FROM samp0
       |  ORDER BY h, l_orderkey, l_linenumber, f0, f1 LIMIT $fitRows),
       |nsamp AS MATERIALIZED (SELECT COUNT(*) AS n FROM samp),
       |draws AS MATERIALIZED (
       |  SELECT tt.t, ii.i,
       |    (${hv("'ifs_sub_' || tt.t || '_' || ii.i")} % (SELECT n FROM nsamp)) + 1 AS rn
       |  FROM (SELECT unnest(range(0, $nTrees)) AS t) tt,
       |       (SELECT unnest(range(0, 256)) AS i) ii
       |  WHERE ii.i < (SELECT LEAST(256, n) FROM nsamp)),
       |a0 AS MATERIALIZED (
       |  SELECT d.t, d.i, s.f0, s.f1, '' AS path
       |  FROM draws d JOIN samp s USING (rn)),
       |$levels,
       |data AS MATERIALIZED (
       |  -- rid = physical row identity: (l_orderkey, l_linenumber) repeats
       |  -- in the synthetic lineitem, and each physical row scores
       |  -- independently on the Spark side
       |  SELECT ROW_NUMBER() OVER () AS rid, l_orderkey, l_linenumber,
       |         CAST(l_quantity AS DOUBLE) AS f0,
       |         CAST(l_extendedprice AS DOUBLE) AS f1
       |  FROM lineitem),
       |w0 AS MATERIALIZED (
       |  SELECT d.rid, d.l_orderkey, d.l_linenumber, d.f0, d.f1, tt.t, '' AS path
       |  FROM data d, (SELECT unnest(range(0, $nTrees)) AS t) tt),
       |$walks,
       |pls AS (
       |  SELECT ANY_VALUE(l_orderkey) AS l_orderkey,
       |         ANY_VALUE(l_linenumber) AS l_linenumber, SUM(pl) AS spl
       |  FROM ($hitUnion)
       |  GROUP BY rid)
       |SELECT l_orderkey, l_linenumber,
       |  ROUND(POWER(2.0, -(spl / $nTrees.0) / ${cOf("256")}), 6) AS if_score
       |FROM pls
       |ORDER BY if_score DESC, l_orderkey, l_linenumber
       |LIMIT 20""".stripMargin
  }
}
