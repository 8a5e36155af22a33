package graft.ml

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Community detection (reference Orange/clustering/louvain.py:103 —
  * Louvain over a kNN similarity graph built from the data matrix).
  *
  * The reference pipeline is: rows → kNN graph → Louvain communities.
  * Distributed re-expression: the kNN graph comes from the similarity
  * machinery (brute-force or LSH top-k, same as the ANN operators); the
  * community step here is synchronous label propagation — each node
  * adopts the most frequent label among its neighbors (ties → smallest
  * label), a fixed number of rounds. Each round is one join + one
  * aggregation, both hash-partitioned on node id — the same shuffle
  * shape at any scale. Louvain's modularity-greedy refinement over this
  * scaffold is round-2; LPA already yields the connected dense groups
  * the widget surfaces.
  *
  * Deterministic: synchronous updates + total tie order ⇒ same result
  * every run (pinned by CommunitySpec).
  */
object Community {

  /** Driver fast path threshold: graphs whose edge list fits this cap
    * run their LPA/refinement rounds in driver arrays instead of 8-10
    * cluster jobs over a few thousand rows each (the same adaptive
    * device as the CC driver union-find — a 500-node kNN subgraph does
    * not deserve a shuffle per round). 2M directed edges ≈ 32 MB, well
    * inside the accepted tiny-collect envelope; bigger graphs take the
    * distributed loop below unchanged. The local rounds replicate the
    * distributed arithmetic operation-for-operation (integer counts and
    * degrees; identical double expressions for gain/Q), so both paths —
    * and the unrolled-CTE oracle — agree bit-for-bit. */
  private[ml] val LocalEdgeCap = 2000000L

  private def longIds(df: DataFrame, a: String, b: String): Boolean = {
    import org.apache.spark.sql.types.LongType
    df.schema(a).dataType == LongType && df.schema(b).dataType == LongType
  }

  private def labelsDf(spark: org.apache.spark.sql.SparkSession,
                       lab: Array[(Long, Long)]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("node", LongType, nullable = false),
      StructField("label", LongType, nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(lab.map(p => Row(p._1, p._2)): _*), schema)
  }

  /** Synchronous LPA rounds on a collected directed edge array —
    * plurality label among neighbors, ties to the smallest label,
    * exactly the distributed count-argmax. */
  private def lpaLocal(sym: Array[(Long, Long)],
                       rounds: Int): Array[(Long, Long)] = {
    val nbrs = sym.groupMap(_._1)(_._2)
    var labels: Map[Long, Long] = nbrs.keysIterator.map(n => n -> n).toMap
    for (_ <- 0 until rounds) {
      labels = nbrs.map { case (u, vs) =>
        val counts = scala.collection.mutable.HashMap.empty[Long, Long]
        vs.foreach { v =>
          val l = labels(v); counts.update(l, counts.getOrElse(l, 0L) + 1L) }
        u -> counts.toSeq.minBy { case (l, n) => (-n, l) }._1
      }
    }
    labels.toArray.sortBy(_._1)
  }

  /** @param edges undirected edge list (src, dst) — will be symmetrized.
    * @param useLocal allow the sub-[[LocalEdgeCap]] driver fast path
    *   (false forces the distributed rounds — CommunitySpec's
    *   differential check; a per-call parameter, NOT process-global
    *   state, so concurrent sessions in one JVM can't flip each other's
    *   path mid-query).
    * @return (node, community) after `rounds` synchronous LPA rounds. */
  def labelPropagation(edges: DataFrame, src: String, dst: String,
                       rounds: Int, useLocal: Boolean = true): DataFrame = {
    val sym = edges.select(col(src).as("u"), col(dst).as("v"))
      .unionByName(edges.select(col(dst).as("u"), col(src).as("v")))
      .distinct()
      .cache()
    if (useLocal && longIds(edges, src, dst)) {
      // ONE limit-collect job decides the path AND fetches the edges
      // (r16 VERDICT item 4: count()-then-collect() was two jobs, and
      // the count is a FULL scan at scale where limit(cap+1) terminates
      // early): ≤ cap rows back ⇒ that IS the complete edge set.
      val eArr = sym.limit(LocalEdgeCap.toInt + 1).collect()
      if (eArr.length <= LocalEdgeCap) {
        sym.unpersist()
        return labelsDf(edges.sparkSession,
          lpaLocal(eArr.map(r => (r.getLong(0), r.getLong(1))), rounds))
      }
    }
    var labels = sym.select(col("u").as("node")).distinct()
      .withColumn("label", col("node"))
    for (_ <- 0 until rounds) {
      val counts = sym
        .join(labels.withColumnRenamed("node", "v"), "v")
        .groupBy(col("u"), col("label"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("u"))
        .orderBy(col("n").desc, col("label").asc)
      val prev = labels
      labels = counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("u").as("node"), col("label"))
      // cut the lineage each round: iterative plans otherwise stack
      // joins into one deep tree (driver-side planning blowup at scale)
      labels = labels.localCheckpoint(eager = true)
      // free the superseded round's blocks (no-op on the initial plan)
      graft.core.Tables.unpersistLocalCheckpoint(prev)
    }
    sym.unpersist()
    labels
  }

  /** kNN graph via LSH-bucketed cosine top-k (the scale path): candidate
    * pairs come from an equi-join on bucket id, never an all-pairs scan.
    * Same contract as [[knnGraph]] — canonical (least, greatest) edges. */
  def knnGraphLSH(emb: DataFrame, idCol: String, arrayCol: String,
                  dim: Int, k: Int, nPlanes: Int): DataFrame =
    graft.similarity.SimilarityOps
      .lshTopKCosine(emb, emb, idCol, arrayCol, dim, k, nPlanes)
      .select(least(col("query_id"), col("neighbor_id")).as("src"),
        greatest(col("query_id"), col("neighbor_id")).as("dst"))
      .distinct()

  /** Newman modularity Q = Σ_c [e_c/m − (Σ_tot(c)/2m)²] of a labeling
    * over an undirected edge list (each edge once, no self-loops).
    * One join + two aggregations — used as the acceptance check for
    * [[louvain]] refinement rounds. */
  def modularity(edges: DataFrame, src: String, dst: String,
                 labels: DataFrame): Double = {
    val e = edges.select(col(src).as("u"), col(dst).as("v"))
    val lab = labels.select(col("node"), col("label"))
    val m = e.count().toDouble
    if (m == 0) return 0.0
    val sym = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
    val deg = sym.groupBy("u").agg(count(lit(1)).as("deg"))
    val sigma = deg.join(lab, deg("u") === lab("node"))
      .groupBy("label").agg(sum("deg").as("tot"))
    val sumSq = sigma.agg(sum(col("tot") * col("tot"))).head().getLong(0).toDouble
    val intra = e
      .join(lab.select(col("node"), col("label").as("la")), e("u") === col("node"))
      .drop("node")
      .join(lab.select(col("node"), col("label").as("lb")), col("v") === col("node"))
      .filter(col("la") === col("lb")).count().toDouble
    intra / m - sumSq / (4.0 * m * m)
  }

  /** Louvain-style refinement over the LPA scaffold (reference
    * Orange/clustering/louvain.py:103): greedy synchronous moves — each
    * node considers adopting a neighboring community, taking the move
    * with the largest modularity gain ΔQ = [e_{i→c} − e_{i→a}]/m −
    * k_i·(Σ_tot(c) − Σ_tot(a) + k_i)/(2m²) when positive. Because
    * simultaneous moves can interact, each round is accepted only if
    * global modularity actually improved (one scalar aggregation) —
    * guaranteeing Q is non-decreasing and giving a deterministic
    * fixpoint. Each round is joins + aggs hash-partitioned on node id. */
  def louvain(edges: DataFrame, src: String, dst: String,
              lpaRounds: Int, refineRounds: Int,
              useLocal: Boolean = true): DataFrame = {
    if (useLocal && longIds(edges, src, dst)) {
      // one limit-collect decides the path and fetches the edges (see
      // labelPropagation)
      val eSmall = edges.select(col(src).as("u"), col(dst).as("v")).distinct()
      val cap = (LocalEdgeCap / 2).toInt
      val eArr = eSmall.limit(cap + 1).collect()
      if (eArr.length <= cap)
        return louvainLocal(edges.sparkSession,
          eArr.map(r => (r.getLong(0), r.getLong(1))),
          lpaRounds, refineRounds)
    }
    val e = edges.select(col(src).as("u"), col(dst).as("v")).distinct().cache()
    val sym = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(eager = true)
    val m = sym.count() / 2.0
    var labels = labelPropagation(e, "u", "v", lpaRounds)
    if (m == 0) { e.unpersist(); return labels }
    val deg = sym.groupBy("u").agg(count(lit(1)).as("deg"))
      .select(col("u").as("node"), col("deg"))
      .localCheckpoint(eager = true)
    // modularity with m / deg / sym hoisted: two jobs per evaluation
    def qOf(lab: DataFrame): Double = {
      val sigma = lab.join(deg, "node").groupBy("label").agg(sum("deg").as("tot"))
      val sumSq = sigma.agg(sum(col("tot") * col("tot"))).head().getLong(0).toDouble
      val intra = e
        .join(lab.select(col("node"), col("label").as("la")), e("u") === col("node"))
        .drop("node")
        .join(lab.select(col("node"), col("label").as("lb")), col("v") === col("node"))
        .filter(col("la") === col("lb")).count().toDouble
      intra / m - sumSq / (4.0 * m * m)
    }
    var q = qOf(labels)
    var improved = true
    var round = 0
    while (improved && round < refineRounds) {
      round += 1
      val sigma = labels.join(deg, "node")
        .groupBy("label").agg(sum("deg").as("tot"))
      // e_{i→c}: edges from node i into community c
      val toC = sym
        .join(labels.select(col("node").as("v"), col("label").as("c")), "v")
        .groupBy(col("u").as("node"), col("c")).agg(count(lit(1)).as("eic"))
      val own = labels.withColumnRenamed("label", "a")
      val cand = toC.join(own, "node").join(deg, "node")
        .join(sigma.select(col("label").as("c"), col("tot").as("totC")), "c")
        .join(sigma.select(col("label").as("a"), col("tot").as("totA")), "a")
        .withColumn("eia",
          max(when(col("c") === col("a"), col("eic")).otherwise(0))
            .over(org.apache.spark.sql.expressions.Window.partitionBy("node")))
        .filter(col("c") =!= col("a"))
        .withColumn("gain",
          (col("eic") - col("eia")) / lit(m) -
            col("deg") * (col("totC") - col("totA") + col("deg")) /
              lit(2.0 * m * m))
        .filter(col("gain") > 0)
      val w = Window.partitionBy("node")
        .orderBy(col("gain").desc, col("c").asc)
      val moves = cand.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).select(col("node"), col("c"))
        .localCheckpoint(eager = true)
      if (moves.isEmpty) improved = false // fixpoint: nothing gains
      else {
        val next = labels.join(moves, Seq("node"), "left")
          .select(col("node"), coalesce(col("c"), col("label")).as("label"))
          .localCheckpoint(eager = true)
        val qNext = qOf(next)
        if (qNext > q + 1e-12) {
          // accepted: the old labels checkpoint is superseded
          graft.core.Tables.unpersistLocalCheckpoint(labels)
          labels = next; q = qNext
        } else {
          graft.core.Tables.unpersistLocalCheckpoint(next)
          improved = false
        }
      }
      graft.core.Tables.unpersistLocalCheckpoint(moves)
    }
    e.unpersist()
    labels
  }

  /** [[louvain]] on a collected canonical edge array — the identical
    * trajectory (LPA scaffold, per-round greedy moves, Q-acceptance) in
    * driver arrays; all counts/degrees are integers and the gain/Q
    * doubles use the same operation order as the distributed columns,
    * so local, distributed, and the unrolled-CTE oracle agree. */
  private def louvainLocal(spark: org.apache.spark.sql.SparkSession,
      e: Array[(Long, Long)], lpaRounds: Int,
      refineRounds: Int): DataFrame = {
    val sym = e ++ e.map(p => (p._2, p._1))
    val m = sym.length / 2.0
    var labels: Map[Long, Long] = lpaLocal(sym.distinct, lpaRounds).toMap
    if (m == 0)
      return labelsDf(spark, labels.toArray.sortBy(_._1))
    val deg: Map[Long, Long] =
      sym.groupBy(_._1).map { case (u, l) => u -> l.length.toLong }
    def qOf(lab: Map[Long, Long]): Double = {
      val tot = scala.collection.mutable.HashMap.empty[Long, Long]
      lab.foreach { case (n, l) => tot.update(l, tot.getOrElse(l, 0L) + deg(n)) }
      val sumSq = tot.valuesIterator.map(t => t * t).sum.toDouble
      val intra = e.count(p => lab(p._1) == lab(p._2)).toDouble
      intra / m - sumSq / (4.0 * m * m)
    }
    var q = qOf(labels)
    var improved = true
    var round = 0
    while (improved && round < refineRounds) {
      round += 1
      val tot = scala.collection.mutable.HashMap.empty[Long, Long]
      labels.foreach { case (n, l) =>
        tot.update(l, tot.getOrElse(l, 0L) + deg(n)) }
      val toC = scala.collection.mutable.HashMap.empty[(Long, Long), Long]
      sym.foreach { case (u, v) =>
        val k = (u, labels(v)); toC.update(k, toC.getOrElse(k, 0L) + 1L) }
      val moves = toC.toSeq.groupBy(_._1._1).flatMap { case (node, entries) =>
        val a = labels(node)
        val eia = entries.collectFirst {
          case ((_, c), n) if c == a => n }.getOrElse(0L)
        val d = deg(node)
        val cands = entries.iterator
          .filter { case ((_, c), _) => c != a }
          .map { case ((_, c), eic) =>
            (c, (eic - eia) / m - d * (tot(c) - tot(a) + d) / (2.0 * m * m)) }
          .filter(_._2 > 0).toSeq
        if (cands.isEmpty) None
        else Some(node -> cands.minBy { case (c, g) => (-g, c) }._1)
      }
      if (moves.isEmpty) improved = false
      else {
        val next = labels.map { case (n, l) => n -> moves.getOrElse(n, l) }
        val qNext = qOf(next)
        if (qNext > q + 1e-12) { labels = next; q = qNext }
        else improved = false
      }
    }
    labelsDf(spark, labels.toArray.sortBy(_._1))
  }

  /** DuckDB twin of [[louvain]] (LPA scaffold + modularity-greedy
    * refinement), for a caller-supplied CTE prefix that defines the
    * symmetrized distinct edge table `sym(u, v)`.
    *
    * The refinement rounds unroll exactly because rejection is
    * idempotent: when a round's best moves don't improve Q (or no move
    * gains), the Scala loop stops while the unrolled SQL re-runs the
    * SAME round on unchanged labels — recomputing the same candidate
    * moves and the same rejection — so the final labeling agrees. All
    * modularity inputs (edge counts, degree totals) are integers; the
    * few-term double expressions (gain, Q) are written in the identical
    * operation order on both engines.
    *
    * @param prefix  WITH-body CTEs ending in `sym(u, v)` (both
    *                directions of each distinct undirected edge)
    * @param select  final SELECT reading from rl`refineRounds`(node, label)
    */
  def louvainSql(prefix: String, lpaRounds: Int, refineRounds: Int,
                 select: String): String = {
    val lpa = (1 to lpaRounds).map { r =>
      s"""lab$r AS MATERIALIZED (
         |  SELECT u AS node, label FROM (
         |    SELECT s.u, l.label,
         |      ROW_NUMBER() OVER (PARTITION BY s.u
         |        ORDER BY COUNT(*) DESC, l.label ASC) AS rn
         |    FROM sym s JOIN lab${r - 1} l ON l.node = s.v
         |    GROUP BY s.u, l.label)
         |  WHERE rn = 1)""".stripMargin
    }
    // Q(labeling) = intra/m − ΣΣ_tot²/(4·m·m); sym counts each
    // undirected edge twice, so intra = same-label sym count / 2.
    def qSql(lab: String): String =
      s"""SELECT
         |  ((SELECT CAST(COUNT(*) AS DOUBLE) / 2.0
         |    FROM sym s JOIN $lab la ON la.node = s.u
         |    JOIN $lab lb ON lb.node = s.v
         |    WHERE la.label = lb.label) / m.m) -
         |  ((SELECT CAST(SUM(tot * tot) AS DOUBLE) FROM (
         |      SELECT l.label, SUM(d.deg) AS tot
         |      FROM $lab l JOIN deg d ON d.node = l.node
         |      GROUP BY l.label)) / (4.0 * m.m * m.m)) AS q
         |FROM mval m""".stripMargin
    val refine = (1 to refineRounds).flatMap { r =>
      val prev = s"rl${r - 1}"
      Seq(
        s"""sg_$r AS MATERIALIZED (
           |  SELECT l.label, SUM(d.deg) AS tot
           |  FROM $prev l JOIN deg d ON d.node = l.node
           |  GROUP BY l.label)""".stripMargin,
        s"""tc_$r AS MATERIALIZED (
           |  SELECT s.u AS node, l.label AS c, COUNT(*) AS eic
           |  FROM sym s JOIN $prev l ON l.node = s.v
           |  GROUP BY s.u, l.label)""".stripMargin,
        s"""cn_$r AS (
           |  SELECT t.node, t.c, t.eic, o.a, d.deg,
           |    sc.tot AS totc, sa.tot AS tota,
           |    COALESCE(MAX(CASE WHEN t.c = o.a THEN t.eic ELSE 0 END)
           |      OVER (PARTITION BY t.node), 0) AS eia
           |  FROM tc_$r t
           |  JOIN (SELECT node, label AS a FROM $prev) o ON o.node = t.node
           |  JOIN deg d ON d.node = t.node
           |  JOIN sg_$r sc ON sc.label = t.c
           |  JOIN sg_$r sa ON sa.label = o.a)""".stripMargin,
        s"""gn_$r AS (
           |  SELECT node, c,
           |    (eic - eia) / m.m -
           |      deg * (totc - tota + deg) / (2.0 * m.m * m.m) AS gain
           |  FROM cn_$r CROSS JOIN mval m WHERE c <> a)""".stripMargin,
        s"""mv_$r AS MATERIALIZED (
           |  SELECT node, c FROM (
           |    SELECT node, c, ROW_NUMBER() OVER (PARTITION BY node
           |      ORDER BY gain DESC, c ASC) AS rn
           |    FROM gn_$r WHERE gain > 0)
           |  WHERE rn = 1)""".stripMargin,
        s"""nx_$r AS MATERIALIZED (
           |  SELECT l.node, COALESCE(mv.c, l.label) AS label
           |  FROM $prev l LEFT JOIN mv_$r mv ON mv.node = l.node)""".stripMargin,
        s"qa_$r AS (${qSql(prev)})",
        s"qb_$r AS (${qSql(s"nx_$r")})",
        s"""rl$r AS MATERIALIZED (
           |  SELECT l.node,
           |    CASE WHEN qb.q > qa.q + 1e-12 THEN n.label
           |         ELSE l.label END AS label
           |  FROM $prev l JOIN nx_$r n ON n.node = l.node
           |  CROSS JOIN qa_$r qa CROSS JOIN qb_$r qb)""".stripMargin)
    }
    s"""WITH $prefix,
       |lab0 AS MATERIALIZED (
       |  SELECT u AS node, u AS label FROM (SELECT DISTINCT u FROM sym)),
       |${lpa.mkString(",\n")},
       |deg AS MATERIALIZED (
       |  SELECT u AS node, COUNT(*) AS deg FROM sym GROUP BY u),
       |mval AS (SELECT COUNT(*) / 2.0 AS m FROM sym),
       |rl0 AS (SELECT node, label FROM lab$lpaRounds),
       |${refine.mkString(",\n")}
       |$select""".stripMargin
  }

  /** PageRank over an undirected (symmetrized-distinct) edge list —
    * the corpus-authority score used for link-graph quality weighting.
    * r₀ = 1/n; r_{t+1}(u) = (1−d)/n + d·Σ_{v∈N(u)} round12(r_t(v)/deg(v)),
    * with the per-neighbor contributions rounded to the 1e-12 grid and
    * summed through DECIMAL — the detSum device — so the trajectory is
    * order-independent and replays exactly in the unrolled-CTE oracle
    * ([[pagerankSql]]) and in the sub-cap driver replay. The symmetric
    * graph has no dangling nodes, so no residual redistribution term.
    * Distributed round = one edge join + one keyed aggregation; the
    * driver fast path takes over below [[LocalEdgeCap]] like the other
    * community rounds. */
  def pagerank(edges: DataFrame, src: String, dst: String,
               rounds: Int, damping: Double = 0.85,
               useLocal: Boolean = true): DataFrame = {
    // distinct AFTER symmetrization too (matching labelPropagation): an
    // input carrying both orientations of an edge, or self-loops, would
    // otherwise double-count degrees and contributions
    val e = edges.select(col(src).as("u"), col(dst).as("v")).distinct()
    val sym = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
      .distinct()
    if (useLocal && longIds(edges, src, dst)) {
      // one limit-collect on the symmetrized table decides the path and
      // fetches the edges (see labelPropagation); |sym| ≤ 2·|e|, so the
      // old 2·count(e) ≤ cap gate is implied by |sym| ≤ cap
      val arr = sym.limit(LocalEdgeCap.toInt + 1).collect()
      if (arr.length <= LocalEdgeCap)
        return pagerankLocalDf(edges.sparkSession,
          arr.map(r => (r.getLong(0), r.getLong(1))), rounds, damping)
    }
    val symC = sym.localCheckpoint(eager = true)
    val deg = symC.groupBy(col("u")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(eager = true)
    val n = deg.count().toDouble
    var ranks = deg.select(col("u").as("node"), (lit(1.0) / n).as("r"))
      .localCheckpoint(eager = true)
    val dec = org.apache.spark.sql.types.DecimalType(38, 14)
    for (_ <- 0 until rounds) {
      val contrib = ranks
        .join(deg.withColumnRenamed("u", "node"), "node")
        .join(symC.withColumnRenamed("u", "node"), "node")
        .select(col("v").as("node"),
          round(col("r") / col("deg"), 12).cast(dec).as("c"))
      ranks = contrib.groupBy(col("node"))
        .agg(((lit(1.0) - lit(damping)) / lit(n) +
          lit(damping) * sum(col("c")).cast("double")).as("r"))
        .localCheckpoint(eager = true)
    }
    ranks
  }

  /** Driver replay of [[pagerank]] — identical decimal-grid arithmetic
    * (round-12 contributions, exact decimal sums, same double ops). */
  private def pagerankLocalDf(spark: org.apache.spark.sql.SparkSession,
      sym: Array[(Long, Long)], rounds: Int, damping: Double): DataFrame = {
    import java.math.{BigDecimal => JBD}
    val nbrs = sym.groupMap(_._1)(_._2)
    val deg = nbrs.map { case (u, vs) => u -> vs.length }
    val n = nbrs.size.toDouble
    var r: Map[Long, Double] = nbrs.keysIterator.map(_ -> 1.0 / n).toMap
    def round12(x: Double): Double =
      JBD.valueOf(x).setScale(12, java.math.RoundingMode.HALF_UP).doubleValue()
    for (_ <- 0 until rounds) {
      val acc = scala.collection.mutable.HashMap.empty[Long, JBD]
      nbrs.foreach { case (v, outs) =>
        val c = JBD.valueOf(round12(r(v) / deg(v)))
          .setScale(14, java.math.RoundingMode.HALF_UP)
        outs.foreach { u =>
          acc.update(u, acc.getOrElse(u, JBD.ZERO).add(c)) }
      }
      r = acc.iterator.map { case (u, s) =>
        u -> ((1.0 - damping) / n + damping * s.doubleValue()) }.toMap
    }
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("node", LongType, nullable = false),
      StructField("r", DoubleType, nullable = false)))
    spark.createDataFrame(java.util.Arrays.asList(
      r.toSeq.sortBy(_._1).map(p => Row(p._1, p._2)): _*), schema)
  }

  /** DuckDB twin of [[pagerank]] for a caller-supplied prefix defining
    * `sym(u, v)`: per-round CTEs computing the identical decimal-grid
    * contribution sums. */
  def pagerankSql(prefix: String, rounds: Int, damping: Double,
                  select: String): String = {
    val body = (1 to rounds).map { t =>
      s"""pr$t AS MATERIALIZED (
         |  SELECT s.v AS node,
         |    (1.0 - $damping) / nv.n + $damping *
         |      CAST(SUM(CAST(ROUND(p.r / d.deg, 12) AS DECIMAL(38,14)))
         |        AS DOUBLE) AS r
         |  FROM sym s
         |  JOIN pr${t - 1} p ON p.node = s.u
         |  JOIN deg d ON d.u = s.u
         |  CROSS JOIN nv
         |  GROUP BY s.v, nv.n)""".stripMargin
    }
    s"""WITH $prefix,
       |deg AS MATERIALIZED (
       |  SELECT u, COUNT(*) AS deg FROM sym GROUP BY u),
       |nv AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg),
       |pr0 AS (SELECT u AS node, 1.0 / nv.n AS r FROM deg CROSS JOIN nv),
       |${body.mkString(",\n")}
       |$select""".stripMargin
  }

  /** TEST-ONLY exact twin of [[knnGraphLSH]]: kNN graph by brute-force
    * O(n²) pair scan. Never in a query path — the engine's graph build is
    * knnGraphLSH (bucketed candidates); this exists solely as the
    * small-fixture ground truth for CommunitySpec's differential checks. */
  private[graft] def knnGraph(emb: DataFrame, idCol: String, arrayCol: String,
               k: Int): DataFrame = {
    val a = emb.select(col(idCol).as("src"),
      col(arrayCol).cast("array<double>").as("va"))
    val b = emb.select(col(idCol).as("dst"),
      col(arrayCol).cast("array<double>").as("vb"))
    val dot = aggregate(zip_with(col("va"), col("vb"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(col("va"), lit(0.0), (acc, x) => acc + x * x))
    val nb = sqrt(aggregate(col("vb"), lit(0.0), (acc, x) => acc + x * x))
    val w = Window.partitionBy(col("src"))
      .orderBy(col("cos").desc, col("dst").asc)
    // rank each node's top-k among ALL other nodes (the reference's
    // matrix_to_knn_graph semantics), then canonicalize each edge to
    // (least, greatest) — labelPropagation re-symmetrizes + dedups.
    a.join(b, col("src") =!= col("dst"))
      .withColumn("cos", dot / (na * nb))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .distinct()
  }
}
