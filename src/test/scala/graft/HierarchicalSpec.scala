package graft

import org.apache.spark.sql.functions._
import graft.ml.Hierarchical

/** Agglomerative linkage semantics (hierarchical.py:19-23,437-470). */
class HierarchicalSpec extends SparkSpec {
  import spark.implicits._

  test("average linkage separates two blobs; labels ordered by min id") {
    val pts = ((0 until 10).map(i => (i.toLong, i * 0.1, 0.0)) ++
      (10 until 20).map(i => (i.toLong, 50.0 + i * 0.1, 0.0)))
      .toDF("id", "x", "y")
    val out = Hierarchical.cluster(pts, "id", Seq("x", "y"), 2, "average")
      .as[(Long, Int)].collect().toMap
    assert((0 until 10).map(i => out(i.toLong)).toSet == Set(0))
    assert((10 until 20).map(i => out(i.toLong)).toSet == Set(1))
  }

  test("single vs complete linkage differ on a chain + clump layout") {
    // a chain of near-spaced points connecting two clumps: single
    // linkage chains everything, complete linkage splits the chain
    val chain = (0 until 30).map(i => (i.toLong, i * 1.0))
    val df = chain.toDF("id", "x")
    val single = Hierarchical.linkageLabels(
      chain.map(p => Array(p._2)).toArray, 2, "single")
    val complete = Hierarchical.linkageLabels(
      chain.map(p => Array(p._2)).toArray, 2, "complete")
    // single: evenly spaced chain merges end to end — the 2-cut is some
    // contiguous split; complete: near-balanced halves (tie cascade can
    // shift the boundary by a step)
    assert(math.abs(complete.count(_ == 0) - 15) <= 2)
    assert(single.toSet == Set(0, 1) && complete.toSet == Set(0, 1))
    // both labelings are contiguous partitions of the chain
    assert(single.sliding(2).count(p => p(0) != p(1)) == 1)
    assert(complete.sliding(2).count(p => p(0) != p(1)) == 1)
  }

  test("ward favors balanced merges on unequal-density blobs") {
    val pts = ((0 until 12).map(i => Array(i * 0.01)) ++
      (0 until 4).map(i => Array(10.0 + i * 0.01))).toArray
    val labels = Hierarchical.linkageLabels(pts, 2, "ward")
    assert(labels.take(12).toSet == Set(0) && labels.drop(12).toSet == Set(1))
  }

  test("assignment extends the fitted tree to unseen rows") {
    // fit on ids 0..19 (maxPoints=20), blobs at 0 and 50; unseen rows
    // 100..109 sit near blob B → must adopt B's cluster
    val fitRows = ((0 until 10).map(i => (i.toLong, i * 0.1)) ++
      (10 until 20).map(i => (i.toLong, 50.0 + i * 0.1)))
    val unseen = (100 until 110).map(i => (i.toLong, 49.0 + (i % 5) * 0.5))
    val df = (fitRows ++ unseen).toDF("id", "x")
    val out = Hierarchical.cluster(df, "id", Seq("x"), 2, "average", 20)
      .as[(Long, Int)].collect().toMap
    assert(unseen.forall { case (i, _) => out(i) == out(15L) })
    assert(out(0L) != out(15L))
  }

  test("deterministic across runs") {
    val emb = (1 to 40).map(i =>
      (i.toLong, math.sin(i * 1.7), math.cos(i * 2.3))).toDF("id", "x", "y")
    val a = Hierarchical.cluster(emb, "id", Seq("x", "y"), 4, "ward")
      .orderBy("id").as[(Long, Int)].collect().toSeq
    val b = Hierarchical.cluster(emb, "id", Seq("x", "y"), 4, "ward")
      .orderBy("id").as[(Long, Int)].collect().toSeq
    assert(a == b)
  }
}
