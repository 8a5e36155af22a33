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

  test("kNN graph yields k edges per populated source") {
    val emb = (1 to 30).map(i =>
      (i.toLong, Array.tabulate(8)(j => math.sin(i * (j + 1)).toFloat)))
      .toDF("vec_id", "embedding")
    val g = Community.knnGraph(emb, "vec_id", "embedding", 3)
    val perSrc = g.groupBy("src").count().agg(max("count")).head.getLong(0)
    assert(perSrc <= 3 && g.count() > 0)
  }
}
