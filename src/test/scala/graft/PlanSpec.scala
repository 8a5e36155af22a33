package graft

import org.apache.spark.sql.functions._

/** Plan-shape regression guards: the properties the 100 TB configuration
  * depends on — pushdown, pruning, broadcast joins, partial aggregation —
  * asserted on the executed plans so a refactor can't silently trade
  * them away. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    // other suites may have cached fixture tables (turning scans into
    // InMemoryTableScan); these assertions are about the cold plan
    spark.catalog.clearCache()
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
  }

  test("flagship entry: filter pushed to parquet scan + pruned schema") {
    spark.catalog.clearCache()
    val p = SparkEntry.entry(spark).queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,5.0)]"))
    // only the 5 needed columns are read, not all 11 (plan text truncates
    // the schema string, so check the prefix + absence of pruned cols)
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double"))
    assert(!p.contains("l_orderkey") && !p.contains("l_shipdate"))
  }

  test("IVF coarse assignment is a pure projection (no exchange, no window)") {
    // the r10 shape crossJoined every row with all nlist centroids and
    // ranked with row_number() — an Exchange + sort of n×nlist expanded
    // rows per Lloyd round; assignTopR must stay a single projection
    spark.catalog.clearCache()
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = (0 until 8).map(j =>
      (j.toLong, Seq.tabulate(64)(i => (j * 64 + i) / 512.0)))
    for (r <- Seq(1, 3)) {
      val df = graft.similarity.SimilarityOps.assignTopR(emb, cents,
        col("embedding").cast("array<double>"),
        graft.functions.CentroidSelect.Cos,
        asc = false, rank = r, "list_id")
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"rank=$r assignment shuffles:\n" +
        p.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
      assert(!p.contains("Window"), s"rank=$r assignment sorts a window")
    }
  }

  test("ann_ivf end-to-end: only the final top-k window remains, no cross join") {
    val p = plan("ann_ivf")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "centroid assignment reintroduced a cross join")
    val windows = p.linesIterator.count(_.contains("Window ["))
    assert(windows == 1, s"expected exactly the final ranking window, got $windows")
  }

  test("3-way join broadcasts both dimension sides (no fact shuffle)") {
    val p = plan("join_inner_3way")
    assert("BroadcastHashJoin".r.findAllIn(p).length == 2)
    assert(!p.contains("SortMergeJoin"))
  }

  test("group-by aggregations are partial (map-side combine)") {
    val p = plan("groupby_17agg")
    assert(p.contains("partial_"))
  }

  test("neighbors join broadcasts the small query side") {
    val p = plan("neighbors_knn")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
  }

  test("filter tree reaches the scan as pushed predicates") {
    val p = plan("filter_continuous")
    assert(p.contains("PushedFilters") && p.contains("GreaterThan"))
  }

  test("simhash pair table is a banded equi-join (no theta join)") {
    val p = plan("dedup_simhash_pairs")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("semantic dedup pair table is a cluster equi-join (no theta join)") {
    // the within-cluster pair stage must join ON list_id (volume =
    // Σ c·(c−1)/2, linear when nlist ∝ corpus) — a theta/cross shape
    // here would be corpus² at any nlist
    val p = plan("dedup_semantic")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("LOF pair table is rank-window bounded (no theta join)") {
    val p = plan("outliers_lof")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("chunked 1-D DBSCAN has no single-partition exchange") {
    val p = plan("ml_dbscan_1d")
    assert(!p.contains("Exchange SinglePartition"))
  }

  test("grid DBSCAN never materializes a pair table") {
    // the cell-clique rewrite streams every pass through partial
    // aggregation: no cached relation (the old pair cache) and no
    // single-partition exchange may appear
    val p = plan("ml_dbscan_grid_2d")
    assert(!p.contains("InMemoryTableScan"))
    assert(!p.contains("Exchange SinglePartition"))
  }

  test("equal-freq grid scale path: no single-partition exchange, no global sort") {
    val p = plan("discretize_equalfreq_approx")
    assert(!p.contains("Exchange SinglePartition"))
  }

  test("impute_random CDF rank has no single-partition exchange") {
    val p = plan("impute_random")
    assert(!p.contains("Exchange SinglePartition"))
  }

  test("randomize_shuffle permutation ranks have no single-partition exchange") {
    val p = plan("randomize_shuffle")
    assert(!p.contains("Exchange SinglePartition"))
  }

  test("pack_sequences prefix sum has no single-partition exchange") {
    val p = plan("pack_sequences")
    assert(!p.contains("Exchange SinglePartition"))
  }

  test("doc_chunk_overlap is a pure projection (no exchange at all)") {
    val p = plan("doc_chunk_overlap")
    // explode + slice only — chunking a 100 TB corpus must not shuffle
    // (the final orderBy is display-only and excluded by the helper when
    // present; any Exchange besides the sort's range partitioning fails)
    assert(!p.contains("Exchange hashpartitioning"))
  }

  test("embedding near-dup candidates come from a band equi-join (no theta join)") {
    val p = plan("dedup_embedding_cosine")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"))
  }

  test("column-axis distances are ONE scan with map-side partial agg") {
    val p = plan("dist_columns_axis")
    assert("FileScan parquet".r.findAllIn(p).length == 1, p.linesIterator
      .filter(_.contains("FileScan")).mkString("\n"))
    assert(p.contains("partial_"))
  }

  test("kNN learner broadcasts the test side (train corpus never shuffles)") {
    val p = plan("ml_knn_class")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("decontamination probes benchmark shingles via broadcast (corpus never shuffles on text)") {
    val p = plan("decontaminate_ngram")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("correlation distance matrix: one fact scan + no global rank window") {
    val p = plan("dist_corr_matrix")
    // the joined stream reads lineitem once; per-column rank maps enter as
    // pre-materialized (checkpointed) value→rank tables, each built from a
    // single-column pruned scan — never via a global rank() window that
    // would funnel the table through one task
    assert("FileScan parquet".r.findAllIn(p).length == 1, p.linesIterator
      .filter(_.contains("FileScan")).mkString("\n"))
    assert(!p.contains("Window [rank("), "global rank window crept back in")
  }

  test("target encoding map joins back via broadcast (no second fact shuffle)") {
    val p = plan("encode_target_smoothed")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"))
  }

  test("salted skew join: salt is a physical join key, broadcast disabled") {
    val p = plan("join_salted_skew")
    assert(p.contains("__salt"), "salt column missing from physical plan")
    assert(p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin"),
      "skew demo must exercise a shuffle join, not broadcast")
  }

  test("forest contingency: map-side partial agg, no single-partition exchange") {
    spark.catalog.clearCache()
    val li = core.Tables.load(spark, sf, "lineitem")
    val cont = graft.ml.RandomForest.levelOneContingency(li,
      Seq(("flag", col("l_returnflag")),
        ("qty_bin", floor((col("l_quantity") - 1) / 10)),
        ("disc_bin", floor(col("l_discount") * 20))),
      col("l_linestatus"),
      concat_ws("#", col("l_orderkey"), col("l_linenumber")), trees = 3)
    val p = cont.queryExecution.executedPlan.toString
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      "contingency must map-side combine")
    assert(!p.contains("Exchange SinglePartition"), p.linesIterator
      .filter(_.contains("Exchange")).mkString("\n"))
  }

  test("stacking lookup joins the fact via broadcast (no fact shuffle for the bases)") {
    spark.catalog.clearCache()
    val li = core.Tables.load(spark, sf, "lineitem")
      .withColumn("qty_bin",
        floor(col("l_quantity") / 10).cast("int").cast("string"))
      .withColumn("disc_bin",
        floor(col("l_discount") * 100 / 3).cast("int").cast("string"))
      .withColumn("cls",
        when(col("l_quantity") > 25 || col("l_discount") > 0.05, "hi")
          .otherwise("lo"))
    val stacked = graft.ml.Stacking.stackedTable(li,
      Seq("qty_bin", "disc_bin"), "cls", col("l_orderkey"), 4)
    val p = stacked.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), "stacked lookup must broadcast")
    assert(!p.contains("SortMergeJoin"), p.linesIterator
      .filter(_.contains("Join")).mkString("\n"))
  }

  test("minhash signature stage is a pure narrow map (no exchange, fused kernel)") {
    spark.catalog.clearCache()
    val docs = core.Tables.load(spark, sf, "documents")
    val sig = graft.text.DedupOps
      .minhashSignaturesFast(docs, "doc_id", "text", 3)
    val p = sig.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"signatures must not shuffle:\n$p")
    assert(p.contains("graft_minhash_sigs"),
      "signature must run through the fused MinhashSigs kernel")
  }

  test("curve windows run over a ≤10⁶-grid: fp scores snap to round(·,6) before the threshold window") {
    spark.catalog.clearCache()
    // a raw double score (NOT pre-rounded by the caller) must be gridded
    // inside the op: the aggregate feeding the single-partition window
    // groups by round(score, 6), bounding the window input by
    // score-range × 10⁶ by construction
    val li = core.Tables.load(spark, sf, "lineitem")
    val rawDouble = col("l_extendedprice").cast("double") * 1.0000001
    for (curve <- Seq(
        graft.ml.Learners.Scoring.auc(li, col("l_returnflag") === "R", rawDouble),
        graft.ml.Learners.Scoring.rocCurve(li, col("l_returnflag") === "R", rawDouble),
        graft.ml.Calibration.optimizeThresholdCA(
          li, col("l_returnflag") === "R", rawDouble))) {
      val p = curve.queryExecution.optimizedPlan.toString
      // the optimizer hoists the grouping key into a Project as
      // _groupingexpression — the round must appear there (or directly
      // in the Aggregate when not hoisted)
      val gridded = p.linesIterator.exists(l => l.contains("round(") &&
        (l.contains("AS _groupingexpression") || l.contains("Aggregate")))
      assert(gridded, s"threshold grouping must round the fp score:\n$p")
    }
  }
}
