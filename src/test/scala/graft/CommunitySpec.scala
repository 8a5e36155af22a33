package graft

import org.apache.spark.sql.functions._
import graft.ml.Community

/** Label-propagation community detection semantics (rows-only query —
  * iterative — so behavior is pinned here). */
class CommunitySpec extends SparkSpec {
  import spark.implicits._

  test("LPA separates two cliques joined by a single bridge edge") {
    // clique A: 1-2-3-4 complete; clique B: 10-11-12-13 complete; bridge 4-10
    def clique(ids: Seq[Int]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = (clique(Seq(1, 2, 3, 4)) ++ clique(Seq(10, 11, 12, 13)) :+
      ((4, 10))).toDF("src", "dst")
    val out = Community.labelPropagation(edges, "src", "dst", 5)
      .as[(Int, Int)].collect().toMap
    assert(Seq(1, 2, 3).map(out).distinct.size == 1)     // A agrees
    assert(Seq(11, 12, 13).map(out).distinct.size == 1)  // B agrees
    assert(out(1) != out(11))                            // A ≠ B
  }

  test("LPA is deterministic across runs") {
    val edges = Seq((1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4), (3, 4))
      .toDF("src", "dst")
    val r1 = Community.labelPropagation(edges, "src", "dst", 4)
      .orderBy("node").as[(Int, Int)].collect().toSeq
    val r2 = Community.labelPropagation(edges, "src", "dst", 4)
      .orderBy("node").as[(Int, Int)].collect().toSeq
    assert(r1 == r2)
  }

  test("kNN graph: canonical dedup'd edges, bounded total count") {
    val emb = (1 to 30).map(i =>
      (i.toLong, Array.tabulate(8)(j => math.sin(i * (j + 1)).toFloat)))
      .toDF("vec_id", "embedding")
    val g = Community.knnGraph(emb, "vec_id", "embedding", 3).cache()
    val n = 30L; val k = 3L
    val total = g.count()
    // each node contributes ≤ k directed picks; canonicalization + dedup
    // can only merge, never add ⇒ total ∈ [n·k/2, n·k]
    assert(total >= n * k / 2 && total <= n * k)
    // canonical form: src < dst, no duplicates
    assert(g.filter(col("src") >= col("dst")).count() == 0)
    assert(g.distinct().count() == total)
    g.unpersist()
  }

  test("modularity: two disjoint triangles under perfect labeling") {
    val edges = Seq((1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4))
      .toDF("src", "dst")
    val labels = Seq((1, 0), (2, 0), (3, 0), (4, 1), (5, 1), (6, 1))
      .toDF("node", "label")
    // e_c/m = 1, Σ_tot per community = 6, m = 6 ⇒ Q = 1 − 2·(6/12)² = 0.5
    val q = Community.modularity(edges, "src", "dst", labels)
    assert(math.abs(q - 0.5) < 1e-12)
    // everything in one community ⇒ Q = 1 − 1 = 0
    val one = labels.withColumn("label", lit(0))
    assert(math.abs(Community.modularity(edges, "src", "dst", one)) < 1e-12)
  }

  test("louvain refinement never decreases modularity vs the LPA scaffold") {
    // two cliques + bridge, but seed LPA short so refinement has work
    def clique(ids: Seq[Int]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = (clique(Seq(1, 2, 3, 4)) ++ clique(Seq(10, 11, 12, 13)) ++
      clique(Seq(20, 21, 22, 23)) :+ ((4, 10)) :+ ((13, 20)))
      .toDF("src", "dst")
    val lpa = Community.labelPropagation(edges, "src", "dst", 1)
    val qLpa = Community.modularity(edges, "src", "dst", lpa)
    val ref = Community.louvain(edges, "src", "dst", 1, 5)
    val qRef = Community.modularity(edges, "src", "dst", ref)
    assert(qRef >= qLpa - 1e-12)
    // deterministic across runs
    val ref2 = Community.louvain(edges, "src", "dst", 1, 5)
    assert(ref.orderBy("node").collect().toSeq ==
      ref2.orderBy("node").collect().toSeq)
  }

  test("driver fast path is bit-identical to the distributed rounds") {
    // long ids engage the local path; useLocal = false forces the
    // distributed loop on the same graph — labels must agree exactly
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = (clique(Seq(1L, 2L, 3L, 4L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) ++ clique(Seq(20L, 21L, 22L, 23L)) :+
      ((4L, 10L)) :+ ((13L, 20L))).toDF("src", "dst")
    def run(useLocal: Boolean) = (
      Community.labelPropagation(edges, "src", "dst", 3, useLocal)
        .orderBy("node").as[(Long, Long)].collect().toSeq,
      Community.louvain(edges, "src", "dst", 1, 4, useLocal)
        .orderBy("node").as[(Long, Long)].collect().toSeq,
      Community.pagerank(edges, "src", "dst", 5, useLocal = useLocal)
        .orderBy("node").as[(Long, Double)].collect().toSeq)
    val (lpaLoc, louLoc, prLoc) = run(useLocal = true)
    val (lpaDist, louDist, prDist) = run(useLocal = false)
    assert(lpaLoc == lpaDist)
    assert(louLoc == louDist)
    assert(prLoc == prDist) // decimal-grid sums ⇒ bit-equal ranks
  }
}
