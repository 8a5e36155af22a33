package graft

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Deterministic bisecting k-means (Bisect) + CN2-SD weighted covering
  * — invariant pins for the round-7 oracle devices (the strong check is
  * the DuckDB oracle; these pin semantics on the small fixture). */
class BisectSpec extends SparkSpec {

  private def emb = Tables.load(spark, sf, "embeddings")
  private def feats = (0 until 6).map(i =>
    (s"e$i", element_at(col("embedding"), i + 1).cast("double")))

  test("bisect produces k clusters partitioning all rows") {
    val total = emb.count()
    val out = graft.ml.Bisect.fit(emb, col("vec_id"), feats, 5, 4).collect()
    assert(out.length == 5)
    assert(out.map(_.getLong(1)).sum == total)
    assert(out.map(_.getInt(0)).sorted.sameElements(0 until 5))
  }

  test("bisect is deterministic across partitionings") {
    val a = graft.ml.Bisect.fit(emb, col("vec_id"), feats, 4, 3)
      .collect().map(_.toSeq).toSeq
    val b = graft.ml.Bisect.fit(emb.repartition(7), col("vec_id"), feats, 4, 3)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("cn2SD: positive-WRAcc rules, gamma-decayed weights, default last") {
    val base = Tables.load(spark, sf, "lineitem").select(
      col("l_returnflag").cast("string").as("flag"),
      floor((col("l_quantity") - 1) / 10).cast("int").cast("string")
        .as("qty_bin"),
      col("l_linestatus").as("cls"))
    val out = graft.ml.Rules.cn2SD(base, Seq("flag", "qty_bin"), "cls",
      maxRules = 3).collect()
    val rules = out.dropRight(1)
    val dflt = out.last
    assert(dflt.getString(1) == "_default")
    assert(rules.forall(_.getDouble(4) > 0)) // wracc > 0
    // orders contiguous from 1
    assert(out.map(_.getInt(0)).toSeq == (1 to out.length))
    // weighted covering keeps total weight below the row count once a
    // rule fired (weights only ever shrink)
    assert(dflt.getDouble(5) <= base.count().toDouble)
  }

  test("hierarchical clusterMoments assigns every row to one of k clusters") {
    val out = graft.ml.Hierarchical.clusterMoments(
      emb, "vec_id", (0 until 4).map(i =>
        (s"e$i", element_at(col("embedding"), i + 1).cast("double"))),
      nClusters = 4, sampleN = 30)
    assert(out.count() == emb.count())
    val clusters = out.select("cluster").distinct().collect()
      .map(_.getInt(0)).sorted
    assert(clusters.sameElements(0 until 4))
  }
}
