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

  /** @param edges undirected edge list (src, dst) — will be symmetrized.
    * @return (node, community) after `rounds` synchronous LPA rounds. */
  def labelPropagation(edges: DataFrame, src: String, dst: String,
                       rounds: Int): DataFrame = {
    val sym = edges.select(col(src).as("u"), col(dst).as("v"))
      .unionByName(edges.select(col(dst).as("u"), col(src).as("v")))
      .distinct()
      .cache()
    var labels = sym.select(col("u").as("node")).distinct()
      .withColumn("label", col("node"))
    for (_ <- 0 until rounds) {
      val counts = sym
        .join(labels.withColumnRenamed("node", "v"), "v")
        .groupBy(col("u"), col("label"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("u"))
        .orderBy(col("n").desc, col("label").asc)
      labels = counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("u").as("node"), col("label"))
      // cut the lineage each round: iterative plans otherwise stack
      // joins into one deep tree (driver-side planning blowup at scale)
      labels = labels.localCheckpoint(eager = true)
    }
    sym.unpersist()
    labels
  }

  /** kNN graph from an embedding table by cosine similarity (brute-force
    * pair scan — swap in the LSH candidate table at scale, same contract). */
  def knnGraph(emb: DataFrame, idCol: String, arrayCol: String,
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
