package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Density clustering (reference Orange/clustering/dbscan.py, sklearn
  * DBSCAN) — exact 1-D specialization.
  *
  * In one dimension DBSCAN reduces to sort-order window algebra, fully
  * expressible as range-frame window functions (no pair joins):
  *   - core point:  |N_eps(x)| ≥ minPts  → RANGE BETWEEN -eps AND eps count
  *   - clusters:    consecutive cores with gap ≤ eps chain together
  *   - border:      non-core adopts the nearest core's cluster within eps
  *   - noise:       everything else (cluster = -1)
  *
  * Scale: the global value-ordered window is a RANGE partition (Spark
  * sorts once); for N-D data the same contract is served by grid-cell
  * bucketing + per-cell local DBSCAN + boundary merge — scheduled round 2.
  */
object Clustering {

  /** @return input + (n_nbr, is_core, cluster); cluster −1 = noise. */
  def dbscan1d(df: DataFrame, id: String, v: String, eps: Double,
               minPts: Int): DataFrame = {
    val wOrd = Window.orderBy(col(v).asc, col(id).asc)
    val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, 0)
    val wNext = wOrd.rowsBetween(0, Window.unboundedFollowing)

    val flagged = df
      // SQL-text window: the DataFrame rangeBetween API only accepts
      // integral offsets, while RANGE frames over a double key need a
      // double literal boundary.
      .withColumn("n_nbr", expr(
        s"count(1) OVER (ORDER BY $v RANGE BETWEEN $eps PRECEDING AND $eps FOLLOWING)"))
      .withColumn("is_core", (col("n_nbr") >= minPts).cast("int"))

    // chain consecutive cores: a core starts a new cluster when the
    // previous core is further than eps away
    val chained = flagged
      .withColumn("core_break",
        when(col("is_core") === 1 &&
          (last(when(col("is_core") === 1, col(v)), ignoreNulls = true)
            .over(wOrd.rowsBetween(Window.unboundedPreceding, -1)).isNull ||
           col(v) - last(when(col("is_core") === 1, col(v)), ignoreNulls = true)
            .over(wOrd.rowsBetween(Window.unboundedPreceding, -1)) > eps), 1)
          .otherwise(0))
      .withColumn("core_cluster",
        when(col("is_core") === 1, sum(col("core_break")).over(wPrev) - 1))

    // border points adopt the nearer in-range core's cluster
    chained
      .withColumn("prev_v", last(when(col("is_core") === 1, col(v)),
        ignoreNulls = true).over(wPrev))
      .withColumn("prev_cl", last(col("core_cluster"),
        ignoreNulls = true).over(wPrev))
      .withColumn("next_v", first(when(col("is_core") === 1, col(v)),
        ignoreNulls = true).over(wNext))
      .withColumn("next_cl", first(col("core_cluster"),
        ignoreNulls = true).over(wNext))
      .withColumn("cluster",
        when(col("is_core") === 1, col("core_cluster"))
          .when(col("prev_v").isNotNull && col(v) - col("prev_v") <= eps &&
            (col("next_v").isNull || col("next_v") - col(v) > eps ||
             col(v) - col("prev_v") <= col("next_v") - col(v)), col("prev_cl"))
          .when(col("next_v").isNotNull && col("next_v") - col(v) <= eps,
            col("next_cl"))
          .otherwise(lit(-1)))
      .drop("core_break", "core_cluster",
        "prev_v", "prev_cl", "next_v", "next_cl")
  }

  /** Exact 1-D DBSCAN without a global window — the scale path for
    * [[dbscan1d]], producing bit-identical output.
    *
    * The value axis is cut into chunks of `chunkWidth` (≥ 2·eps); every
    * window runs PARTITIONED BY chunk, so rows never funnel through one
    * partition. Correctness across chunk boundaries comes from ghost
    * rows: each point within eps of a boundary is copied into the
    * adjacent chunk, which makes every real point's eps-ball fully
    * visible inside its own chunk (chunkWidth ≥ 2·eps ⇒ a ball spans at
    * most the two neighboring ghost fringes). Ghosts participate in
    * window frames but never emit rows, and their core flags / cluster
    * ids are computed once in their owner chunk and carried along.
    * Global cluster ordinals = per-chunk running sums + a per-chunk
    * offset table (one tiny driver-side prefix sum over #chunks rows —
    * the classic two-pass distributed scan). */
  def dbscan1dChunked(df: DataFrame, id: String, v: String, eps: Double,
                      minPts: Int, chunkWidth: Double): DataFrame = {
    require(chunkWidth >= 2 * eps, "chunkWidth must be >= 2*eps")
    val spark = df.sparkSession
    import spark.implicits._

    // rows within eps of a chunk edge, re-keyed into the adjacent chunk
    def ghosts(src: DataFrame): DataFrame = {
      val up = src.filter(col(v) >= (col("__ck") + 1) * chunkWidth - eps)
        .withColumn("__ck", col("__ck") + 1)
      val dn = src.filter(col(v) <= col("__ck") * chunkWidth + eps)
        .withColumn("__ck", col("__ck") - 1)
      up.unionByName(dn)
    }
    def withGhosts(src: DataFrame): DataFrame =
      src.withColumn("__ghost", lit(0))
        .unionByName(ghosts(src).withColumn("__ghost", lit(1)))

    val base = df.withColumn("__ck",
      floor(col(v) / chunkWidth).cast("long"))

    // pass 1: neighbor counts (ball fully covered by own chunk + ghosts)
    val counted = withGhosts(base)
      .withColumn("n_nbr", expr(
        s"count(1) OVER (PARTITION BY __ck ORDER BY $v " +
          s"RANGE BETWEEN $eps PRECEDING AND $eps FOLLOWING)"))
      .filter(col("__ghost") === 0).drop("__ghost")
      .withColumn("is_core", (col("n_nbr") >= minPts).cast("int"))

    val wOrd = Window.partitionBy(col("__ck"))
      .orderBy(col(v).asc, col(id).asc)
    val wPrev1 = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    val wPrev0 = wOrd.rowsBetween(Window.unboundedPreceding, 0)
    val wNext0 = wOrd.rowsBetween(0, Window.unboundedFollowing)

    // pass 2: core breaks + local cluster ordinals (ghosts provide the
    // cross-boundary "previous core" but contribute no breaks)
    val lastCoreV = last(when(col("is_core") === 1, col(v)),
      ignoreNulls = true).over(wPrev1)
    val b1 = withGhosts(counted)
      .withColumn("core_break",
        when(col("__ghost") === 0 && col("is_core") === 1 &&
          (lastCoreV.isNull || col(v) - lastCoreV > eps), 1).otherwise(0))
      .withColumn("__local", sum(col("core_break")).over(wPrev0))
    val real1 = b1.filter(col("__ghost") === 0)
      .drop("__ghost").localCheckpoint(eager = true)

    // tiny prefix sum over chunk totals (#chunks rows on the driver)
    val perChunk = real1.groupBy(col("__ck"))
      .agg(sum(col("core_break")).as("cb")).orderBy(col("__ck")).collect()
    var acc = 0L
    val offs = perChunk.map { r =>
      val o = acc; acc += r.getLong(1); (r.getLong(0), o) }.toSeq
    val offDF = offs.toDF("__ck", "__off")
    val clustered = real1.join(broadcast(offDF), "__ck")
      .withColumn("core_cluster",
        when(col("is_core") === 1, col("__local") + col("__off") - 1))

    // pass 3: border adoption — ghosts carry their owner-chunk cluster id
    withGhosts(clustered)
      .withColumn("prev_v", last(when(col("is_core") === 1, col(v)),
        ignoreNulls = true).over(wPrev0))
      .withColumn("prev_cl", last(col("core_cluster"),
        ignoreNulls = true).over(wPrev0))
      .withColumn("next_v", first(when(col("is_core") === 1, col(v)),
        ignoreNulls = true).over(wNext0))
      .withColumn("next_cl", first(col("core_cluster"),
        ignoreNulls = true).over(wNext0))
      .filter(col("__ghost") === 0)
      .withColumn("cluster",
        when(col("is_core") === 1, col("core_cluster"))
          .when(col("prev_v").isNotNull && col(v) - col("prev_v") <= eps &&
            (col("next_v").isNull || col("next_v") - col(v) > eps ||
             col(v) - col("prev_v") <= col("next_v") - col(v)), col("prev_cl"))
          .when(col("next_v").isNotNull && col("next_v") - col(v) <= eps,
            col("next_cl"))
          .otherwise(lit(-1)))
      .drop("__ghost", "__ck", "__off", "__local", "core_break",
        "core_cluster", "prev_v", "prev_cl", "next_v", "next_cl")
  }

  /** Connected components by alternating large-star / small-star
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC 2014) — the cluster-scale CC: converges in O(log n) rounds
    * regardless of component diameter, where min-label propagation
    * pays O(diameter) rounds on chains.
    *
    * Each round is two phases over the edge list, each ONE groupBy +
    * join (hash-partitioned on node id):
    *   large-star: every neighbor v > u links to min(N(u) ∪ {u});
    *   small-star: every neighbor v ≤ u links to that minimum.
    * At the fixpoint every node's surviving edge points at its
    * component's minimum id.
    *
    * @param edges undirected (u, v) pairs, any orientation
    * @return (node, label) — label = smallest node id in the component;
    *         isolated nodes (no edges) are absent, as in the min-label
    *         loop's contract. */
  def connectedComponentsLSS(edges: DataFrame): DataFrame = {
    // canonical (hi, lo) edge form between rounds
    var e = edges.select(greatest(col("u"), col("v")).as("hi"),
        least(col("u"), col("v")).as("lo"))
      .filter(col("hi") =!= col("lo")).distinct()
      .localCheckpoint(eager = true)
    // Hybrid: below this edge count the per-round job overhead of the
    // distributed rounds (checkpoint + convergence counts, ~4 jobs a
    // round) dwarfs the work — a driver union-find finishes in
    // microseconds (measured 5.4 s → instant on an 886-edge input).
    // Callers that pre-contract (dbscanGrid's min-neighbor pass) land
    // here even from large inputs; genuinely big edge sets stay on the
    // O(log n) large-star/small-star path below.
    val nEdges = e.count()
    if (nEdges <= 100000) {
      val collected = e.collect().map(r =>
        (r.getAs[Number](0).longValue(), r.getAs[Number](1).longValue()))
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      collected.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { // union by min id keeps the min-label contract
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      val nodes = collected.flatMap { case (a, b) => Seq(a, b) }.distinct
      val spark = edges.sparkSession
      import spark.implicits._
      return nodes.map(n => (n, find(n))).toSeq.toDF("node", "label")
    }
    var stable = false
    var guard = 0
    while (!stable && guard < 50) {
      guard += 1
      // large-star over FULL neighborhoods: every neighbor v > u links
      // to m(u) = min(N(u) ∪ {u})
      val sym = e.select(col("hi").as("u"), col("lo").as("v"))
        .unionByName(e.select(col("lo").as("u"), col("hi").as("v")))
      val mAll = sym.groupBy("u").agg(min(least(col("v"), col("u"))).as("m"))
      val large = sym.filter(col("v") > col("u")).join(mAll, "u")
        .select(col("v").as("hi"), col("m").as("lo"))
        .filter(col("hi") =!= col("lo")).distinct()
      // small-star: every SMALLER neighbor (and u itself) links to the
      // minimum of the smaller neighborhood
      val mS = large.groupBy("hi").agg(min(col("lo")).as("m"))
      val small = large.join(mS, "hi")
        .select(col("lo").as("a"), col("m"))
        .unionByName(mS.select(col("hi").as("a"), col("m")))
        .filter(col("a") =!= col("m"))
        .select(greatest(col("a"), col("m")).as("hi"),
          least(col("a"), col("m")).as("lo"))
        .distinct().localCheckpoint(eager = true)
      stable = small.count() == e.count() &&
        small.exceptAll(e).limit(1).count() == 0
      // the stability probe above was the last read of the old edge
      // set — free its checkpoint blocks (no-op on round 1's plain plan)
      graft.core.Tables.unpersistLocalCheckpoint(e)
      e = small
    }
    // at the fixpoint the edges form stars around each component min
    e.select(col("hi").as("node"), col("lo").as("label"))
      .unionByName(e.select(col("lo").as("node"), col("lo").as("label")))
      .groupBy("node").agg(min("label").as("label"))
  }

  /** N-dimensional DBSCAN via grid-cell bucketing — the scale path.
    *
    * Cells of side eps bound the neighbor search: a point's eps-ball only
    * intersects its 3^d adjacent cells, so the pair table is an equi-join
    * on cell id (each point exploded to its 3^d neighbor cells, joined
    * against points bucketed by their own cell) — candidates per point are
    * bounded by local density, never O(n²). Core flags are one
    * aggregation; clusters are connected components of the core-core
    * eps-graph via min-label propagation to fixpoint (each round = one
    * join + one aggregation, lineage cut by localCheckpoint); borders
    * adopt the smallest core cluster within eps (the standard
    * deterministic resolution of DBSCAN's border ambiguity).
    *
    * Cluster ids are min core point ids (stable, deterministic). The
    * 1-D specialization above is the oracle-checked twin; ClusteringSpec
    * asserts both produce the same partition on 1-D data. */
  /** Exact silhouette samples (reference widgets/visualize/
    * owsilhouetteplot.py → sklearn silhouette_samples): per point,
    * a = mean distance to its own cluster's other members, b = the
    * smallest mean distance to any other cluster, s = (b−a)/max(a,b);
    * singleton clusters score 0 by convention.
    *
    * All-pairs by construction (the metric itself is O(n²)) — callers
    * cap the input like the reference widget does (it draws ≤ a few
    * thousand rows); [[silhouetteSimplified]] is the 100 TB path. The
    * pair join groups straight into (point, other-cluster) means, so the
    * shuffle payload is the grouped means, never the raw pair list.
    * Deterministic: distances are per-pair doubles through the
    * order-independent 12-decimal sum; SQRT is IEEE-exact in both
    * engines. */
  def silhouetteExact(df: DataFrame, id: String, cluster: String,
                      features: Seq[String]): DataFrame = {
    import graft.core.Tables.detSum
    val pts = df.select(col(id).as("pid") +: col(cluster).as("pc") +:
      features.map(f => col(f).as(s"a_$f")): _*)
    val oth = df.select(col(id).as("oid") +: col(cluster).as("oc") +:
      features.map(f => col(f).as(s"b_$f")): _*)
    val dist = sqrt(features.map(f =>
      (col(s"a_$f") - col(s"b_$f")) * (col(s"a_$f") - col(s"b_$f")))
      .reduce(_ + _))
    // mean distance from each point to each cluster; own-cluster mean
    // divides by |C|−1 automatically because pid ≠ oid drops self
    val means = pts.join(oth, col("pid") =!= col("oid"))
      .groupBy(col("pid"), col("pc"), col("oc"))
      .agg((detSum(dist) / count(lit(1))).as("md"))
    means.groupBy(col("pid"), col("pc"))
      .agg(max(when(col("oc") === col("pc"), col("md"))).as("a"),
        min(when(col("oc") =!= col("pc"), col("md"))).as("b"))
      .select(col("pid"), col("pc"),
        round(when(col("a").isNull || col("b").isNull, 0.0)
          .otherwise((col("b") - col("a")) / greatest(col("a"), col("b"))),
          6).as("s"))
  }

  /** Simplified (centroid-based) silhouette — the standard large-scale
    * surrogate (Hruschka et al. 2004): a = distance to the point's own
    * cluster centroid, b = min distance to any other centroid. One
    * centroid aggregation + one broadcast join over k centroids: O(n·k),
    * no pair table — this is the shape that survives 100 TB. */
  def silhouetteSimplified(df: DataFrame, id: String, cluster: String,
                           features: Seq[String]): DataFrame = {
    import graft.core.Tables.{detSum, exactMean}
    val centCols = features.map(f => exactMean(col(f)).as(s"c_$f"))
    val cents = df.groupBy(col(cluster).as("cc"))
      .agg(centCols.head, centCols.tail: _*)
    val dist = sqrt(features.map(f =>
      (col(f) - col(s"c_$f")) * (col(f) - col(s"c_$f"))).reduce(_ + _))
    val ab = df
      .select(col(id).as("pid") +: col(cluster).as("pc") +:
        features.map(col): _*)
      .crossJoin(broadcast(cents)) // k rows — a map-side nested loop
      .withColumn("d", dist)
      .groupBy(col("pid"), col("pc"))
      .agg(max(when(col("cc") === col("pc"), col("d"))).as("a"),
        min(when(col("cc") =!= col("pc"), col("d"))).as("b"))
    ab.withColumn("s",
      when(col("b").isNull || greatest(col("a"), col("b")) === 0.0, 0.0)
        .otherwise((col("b") - col("a")) / greatest(col("a"), col("b"))))
      .groupBy(col("pc"))
      .agg(round(detSum(col("s")) / count(lit(1)), 6).as("mean_s"),
        count(lit(1)).as("n"))
  }

  /** Grid-bucketed exact DBSCAN that never materializes the eps-pair
    * table. With cell side eps/sqrt(d), all points sharing a cell are
    * mutual eps-neighbors (cell diagonal = eps, closed ball), which
    * yields three scale properties the pair-based formulation lacks:
    *
    *  1. A cell holding >= minPts points is all-core with ZERO counting
    *     work — the counting join runs only for points in sparse cells,
    *     so densifying data does not densify the count pass.
    *  2. Each cell's cores contract to one representative (min core id)
    *     BEFORE any join; the witness pass streams cross-cell core
    *     candidates through a partial DISTINCT on (repA, repB), so what
    *     reaches the shuffle is ~|cell pairs|, never ~|point pairs|.
    *     (Component labels are preserved: the component-minimum core is
    *     its own cell rep, and cell cliques keep members connected.)
    *  3. Border assignment and counting are partial aggregations over
    *     the candidate stream — the eps-pair table (quadratic in local
    *     density) is never cached, shuffled, or re-scanned. At the sf1
    *     density-replica rehearsal this took the query from 145 s
    *     (20x sf0.1 — superlinear) to pair-volume-independent.
    *
    * Results are identical to the brute-force definition (the DuckDB
    * WITH RECURSIVE oracle): core = |closed eps-ball| >= minPts,
    * cluster label = min core id of the eps-connected core component,
    * borders adopt the smallest neighboring core label, noise = -1.
    */
  def dbscanGrid(df: DataFrame, id: String, features: Seq[String],
                 eps: Double, minPts: Int): DataFrame = {
    val d = features.size
    val side = eps / math.sqrt(d.toDouble)
    val reach = math.ceil(eps / side).toInt // = ceil(sqrt(d))
    val cellKeys = features.indices.map(i => s"c$i")

    val pts = df.select(col(id).as("pid") +:
      features.zipWithIndex.map { case (f, i) => col(f).as(s"x$i") }: _*)
    val byCell = pts.select(col("pid") +:
      features.indices.map(i => col(s"x$i")) ++:
      features.indices.map(i =>
        floor(col(s"x$i") / side).cast("long").as(s"c$i")): _*)
      .localCheckpoint(eager = true)
    val cellCounts = byCell.groupBy(cellKeys.map(col): _*)
      .agg(count(lit(1)).as("n_cell"))
    val withCell = byCell.join(cellCounts, cellKeys)

    // neighbor-cell offsets: any eps-neighbor is within `reach` cells
    // per axis; offsets whose min inter-cell distance exceeds eps are
    // pruned (none at d = 2, some corners at d >= 3)
    val allOffsets = features.indices.foldLeft(Seq(Seq.empty[Int])) {
      (acc, _) => acc.flatMap(o => (-reach to reach).map(o :+ _)) }
    def offMin2(o: Seq[Int]): Double =
      o.map(v => math.max(math.abs(v) - 1, 0)).map(v => v.toDouble * v).sum *
        side * side
    val nbrOffsets = allOffsets.filter(o => offMin2(o) <= eps * eps)
    // cross-cell half: each unordered CELL pair generated exactly once
    // (the zero offset is excluded — same-cell cores share a rep)
    val halfCross = nbrOffsets.filter(o =>
      o.dropWhile(_ == 0).headOption.exists(_ > 0))

    def explodeTo(dfIn: DataFrame, offs: Seq[Seq[Int]],
                  keep: Seq[Column]): DataFrame =
      dfIn.withColumn("__off", explode(array(offs.map(o =>
          struct(o.zipWithIndex.map { case (dd, i) =>
            (col(s"c$i") + dd).as(s"n$i") }: _*)): _*)))
        .select(keep ++
          features.indices.map(i => col(s"__off.n$i").as(s"c$i")): _*)

    val dist2 = features.indices.map(i =>
      (col(s"a$i") - col(s"b$i")) * (col(s"a$i") - col(s"b$i")))
      .reduce(_ + _)
    val buildAll = byCell.select(
      col("pid").as("b_id") +:
        features.indices.map(i => col(s"x$i").as(s"b$i")) ++:
        features.indices.map(i => col(s"c$i")): _*)

    // 1. neighbor counts — only for points in sparse cells (dense-cell
    //    points are core by the same-cell-clique property)
    val sparsePts = withCell.filter(col("n_cell") < minPts)
    val probeCnt = explodeTo(sparsePts, nbrOffsets,
      col("pid").as("a_id") +:
        features.indices.map(i => col(s"x$i").as(s"a$i")))
    val cnts = probeCnt.join(buildAll, cellKeys)
      .filter(col("a_id") =!= col("b_id") && dist2 <= eps * eps)
      .groupBy(col("a_id")).agg(count(lit(1)).as("n_other"))
      .withColumnRenamed("a_id", "pid")
    val flags = withCell.join(cnts, Seq("pid"), "left")
      .select(col("pid") +:
        features.indices.map(i => col(s"x$i")) ++:
        features.indices.map(i => col(s"c$i")) :+
        (col("n_cell") >= minPts ||
          (coalesce(col("n_other"), lit(0L)) + 1) >= minPts)
          .cast("int").as("is_core"): _*)
      .localCheckpoint(eager = true)

    // 2. per-cell core representative + cross-cell witness pass
    val cores = flags.filter(col("is_core") === 1)
    val reps = cores.groupBy(cellKeys.map(col): _*)
      .agg(min(col("pid")).as("rep"))
    val coreRep = cores.join(reps, cellKeys)
    val probeW = explodeTo(coreRep, halfCross,
      col("rep").as("ua") +:
        features.indices.map(i => col(s"x$i").as(s"a$i")))
    val buildW = coreRep.select(
      col("rep").as("ub") +:
        features.indices.map(i => col(s"x$i").as(s"b$i")) ++:
        cellKeys.map(col): _*)
    val contracted = probeW.join(buildW, cellKeys)
      .filter(dist2 <= eps * eps)
      .select(col("ua").as("u"), col("ub").as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val repLabels = connectedComponentsLSS(contracted)
    val labels = coreRep.select(col("pid"), col("rep"))
      .join(repLabels.withColumnRenamed("node", "rep"), Seq("rep"), "left")
      .select(col("pid"), coalesce(col("label"), col("rep")).as("lbl"))

    // 3. borders: non-core points adopt the min core label within eps
    val coreLabeled = cores.join(labels, Seq("pid"))
    val nonCore = flags.filter(col("is_core") === 0)
    val probeB = explodeTo(nonCore, nbrOffsets,
      col("pid").as("a_id") +:
        features.indices.map(i => col(s"x$i").as(s"a$i")))
    val buildB = coreLabeled.select(
      features.indices.map(i => col(s"x$i").as(s"b$i")) ++:
        cellKeys.map(col) :+ col("lbl"): _*)
    val borderLbl = probeB.join(buildB, cellKeys)
      .filter(dist2 <= eps * eps)
      .groupBy(col("a_id")).agg(min(col("lbl")).as("border_lbl"))

    flags.select(col("pid"), col("is_core"))
      .join(labels, Seq("pid"), "left")
      .join(borderLbl.withColumnRenamed("a_id", "pid"), Seq("pid"), "left")
      .select(col("pid").as(id), col("is_core"),
        when(col("is_core") === 1, col("lbl"))
          .otherwise(coalesce(col("border_lbl"), lit(-1L))).as("cluster"))
  }
}
