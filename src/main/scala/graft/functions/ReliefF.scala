package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables._

/** Distributed ReliefF feature scoring (reference
  * Orange/preprocess/score.py:338-420 + Cython kernel
  * Orange/preprocess/_relieff.pyx).
  *
  * Semantics: for m reference instances, find the k nearest same-class
  * (hit) and k nearest other-class (miss) neighbors under span-normalized
  * Manhattan distance; each feature's weight is the mean over references
  * of (mean miss diff − mean hit diff), diffs span-normalized.
  *
  * Distributed design: the m references are a broadcast side of a single
  * map-side join against the full table (no shuffle of the big side);
  * per-reference top-k is a Window over the m·n pair set partitioned by
  * (reference, hit/miss) — m is a user-chosen sample (Orange defaults
  * n_iterations=50), so the pair set is m·n, linear in the data, and the
  * only shuffle is the window's hash partitioning on the m keys. At 100 TB
  * the same plan holds with m references broadcast; for huge m switch the
  * neighbor search to an LSH pre-bucketing (same SimilarityOps machinery
  * as ann_lsh_bucketed).
  *
  * Determinism (oracle-exact): references chosen by key predicate, not
  * rand(); neighbor ties broken by id; all float reductions via detSum.
  */
object ReliefF {

  /** @param features continuous feature columns
    * @param refPred  deterministic predicate choosing the m references */
  def weights(df: DataFrame, idCol: String, features: Seq[String],
              classCol: String, refPred: Column, k: Int): DataFrame = {
    val spans = df.agg(
      features.map(f => (max(col(f)) - min(col(f))).as(s"span_$f")).head,
      features.map(f => (max(col(f)) - min(col(f))).as(s"span_$f")).tail: _*)

    val refs = df.filter(refPred).select(
      col(idCol).as("rid") +: col(classCol).as("rclass") +:
        features.map(f => col(f).as(s"r_$f")): _*)
    val other = df.select(
      col(idCol).as("oid") +: col(classCol).as("oclass") +:
        features.map(f => col(f).as(s"o_$f")): _*)

    val dist = features.map(f =>
      abs(col(s"r_$f") - col(s"o_$f")) / col(s"span_$f")).reduce(_ + _)
    val pairs = broadcast(refs)
      .join(other, col("rid") =!= col("oid"))
      .crossJoin(broadcast(spans))
      .withColumn("hit", (col("rclass") === col("oclass")).cast("int"))
      .withColumn("dist", dist)
    val w = Window.partitionBy(col("rid"), col("hit"))
      .orderBy(col("dist").asc, col("oid").asc)
    val topk = pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)

    // per (reference, hit/miss): mean span-normalized diff per feature
    val perRefAggs = features.map(f =>
      detSum(abs(col(s"r_$f") - col(s"o_$f")) / col(s"span_$f"))
        .as(s"d_$f")) :+ count(lit(1)).as("cnt")
    val perRef = topk.groupBy(col("rid"), col("hit"))
      .agg(perRefAggs.head, perRefAggs.tail: _*)

    // weight_f = Σ_refs (missMean_f − hitMean_f) / m
    val m = refs.count()
    val folded = perRef.groupBy(col("rid"))
      .agg(
        features.map(f => detSum(
          when(col("hit") === 0, col(s"d_$f") / col("cnt"))
            .otherwise(-col(s"d_$f") / col("cnt"))).as(s"t_$f")).head,
        features.map(f => detSum(
          when(col("hit") === 0, col(s"d_$f") / col("cnt"))
            .otherwise(-col(s"d_$f") / col("cnt"))).as(s"t_$f")).tail: _*)
    val agg = folded.agg(
      features.map(f => detSum(col(s"t_$f")).as(s"w_$f")).head,
      features.map(f => detSum(col(s"t_$f")).as(s"w_$f")).tail: _*)

    val spark = df.sparkSession
    val rows = features.map(f =>
      agg.select(lit(f).as("feature"),
        round(col(s"w_$f") / m.toDouble, 6).as("weight")))
    rows.reduce(_.unionByName(_))
  }

  /** RReliefF for continuous targets (reference Orange/preprocess/
    * score.py RReliefF + _relieff.pyx regression kernel; Robnik-Šikonja
    * & Kononenko 2003): per reference take the k nearest neighbors under
    * span-normalized Manhattan distance (no hit/miss split — the target
    * is continuous), accumulate over all (reference, neighbor) pairs
    *   N_dC      = Σ |y_r − y_n| / span_y
    *   N_dA[f]   = Σ d_f           (span-normalized feature diff)
    *   N_dC∧dA[f]= Σ (|y_r − y_n| / span_y) · d_f
    * and score W[f] = N_dC∧dA/N_dC − (N_dA − N_dC∧dA)/(m − N_dC) with
    * m = total neighbor pairs.
    *
    * Same distributed shape as `weights`: broadcast references against
    * the full table (map-side join), one rank window on the m·n pair
    * set, one global deterministic aggregation. Oracle-exact. */
  def rWeights(df: DataFrame, idCol: String, features: Seq[String],
               targetCol: String, refPred: Column, k: Int): DataFrame = {
    val spanCols = (features :+ targetCol).map(f =>
      (max(col(f)) - min(col(f))).as(s"span_$f"))
    val spans = df.agg(spanCols.head, spanCols.tail: _*)

    val refs = df.filter(refPred).select(
      col(idCol).as("rid") +: col(targetCol).as("ry") +:
        features.map(f => col(f).as(s"r_$f")): _*)
    val other = df.select(
      col(idCol).as("oid") +: col(targetCol).as("oy") +:
        features.map(f => col(f).as(s"o_$f")): _*)

    val dist = features.map(f =>
      abs(col(s"r_$f") - col(s"o_$f")) / col(s"span_$f")).reduce(_ + _)
    val pairs = broadcast(refs)
      .join(other, col("rid") =!= col("oid"))
      .crossJoin(broadcast(spans))
      .withColumn("dist", dist)
      .withColumn("dy", abs(col("ry") - col("oy")) / col(s"span_$targetCol"))
    val w = Window.partitionBy(col("rid"))
      .orderBy(col("dist").asc, col("oid").asc)
    val topk = pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)

    val aggs = detSum(col("dy")).as("ndc") +: count(lit(1)).as("m") +:
      features.flatMap { f =>
        val da = abs(col(s"r_$f") - col(s"o_$f")) / col(s"span_$f")
        Seq(detSum(da).as(s"nda_$f"), detSum(col("dy") * da).as(s"ndcda_$f"))
      }
    val agg = topk.agg(aggs.head, aggs.tail: _*)

    features.map { f =>
      agg.select(lit(f).as("feature"),
        round(col(s"ndcda_$f") / col("ndc") -
          (col(s"nda_$f") - col(s"ndcda_$f")) /
            (col("m").cast("double") - col("ndc")), 6).as("weight"))
    }.reduce(_.unionByName(_))
  }
}
