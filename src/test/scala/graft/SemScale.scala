package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scale timer for SemDeDup: runs
  * SimilarityOps.semanticDedup over a replica's embeddings table and
  * prints wall seconds (noop-sink consumer) plus the dedup outcome
  * (groups / dropped counts). The ladder protocol keeps cluster size
  * flat by growing nlist ∝ corpus — the operator's documented
  * production rule — so per-rung pair volume (Σ c·(c−1)/2) grows
  * LINEARLY with the corpus, not quadratically.
  *
  * Above `graft.ann.flatNlistMax` (default 4096) — or with an explicit
  * `ntop` arg — the quantizer goes two-level (r15): per-row assignment
  * drops from O(nlist) to O(√nlist). After the timed runs this also
  * measures the ASSIGNMENT stage alone (quantizer train + rank-1
  * routing, noop-sink), so the assignment-vs-pair-join cost split is
  * on record per rung.
  *
  * Usage:
  *   java -cp … graft.SemScale <dir> <nlist> <eps> [runs] [ntop]
  */
object SemScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nlist = args(1).toInt
    val eps = args(2).toDouble
    val runs = if (args.length > 3) args(3).toInt else 2
    // ntop > 0 forces the two-level quantizer with that many top cells;
    // ntop < 0 forces FLAT at any nlist (raises graft.ann.flatNlistMax)
    // — the r14-counterfactual knob for the cost-split table
    val ntopArg = if (args.length > 4) args(4).toInt else 0
    val ntop = math.max(ntopArg, 0)
    val sp = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "64"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/tmp/spark-sem")
      .getOrCreate()
    sp.sparkContext.setLogLevel("ERROR")
    if (ntopArg < 0)
      sp.conf.set("graft.ann.flatNlistMax", Int.MaxValue.toString)
    // optional 6th arg: raise the pair-volume guard (the refusal
    // message's own documented remedy) — the flat-occupancy protocol
    // grows Σ c·(c−1)/2 LINEARLY with the corpus, so a 20M rung at
    // occupancy ≈312 legitimately carries ~3.1e9 within-cluster pairs
    if (args.length > 5)
      sp.conf.set("graft.dedup.maxSemanticPairs", args(5))
    val e = sp.read.parquet(s"$dir/embeddings.parquet")
    println(s"SEM vectors=${e.count()} dir=$dir nlist=$nlist eps=$eps " +
      s"shuffle=${sp.conf.get("spark.sql.shuffle.partitions")}")
    for (i <- 1 to runs) {
      val t0 = System.nanoTime
      try {
        val out = similarity.SimilarityOps.semanticDedup(
          e, "vec_id", "embedding", 64, nlist, eps, ntop = ntop)
        graft.Bench.consume(out)
        val secs = (System.nanoTime - t0) / 1e9
        // outcome stats on the last run only (extra pass, not timed)
        if (i == runs) {
          val st = out.agg(count(lit(1)).as("n"),
            sum(lit(1) - col("keep")).as("dropped"),
            countDistinct(col("group_id")).as("groups")).head
          println(f"TIMED run$i $secs%.1f s n=${st.getLong(0)} " +
            s"dropped=${st.get(1)} groups=${st.getLong(2)}")
        } else println(f"TIMED run$i $secs%.1f s")
      } catch {
        case ex: IllegalStateException =>
          println(f"GUARD run$i ${(System.nanoTime - t0) / 1e9}%.1f s" +
            s" refused: ${ex.getMessage.take(160)}")
      }
      sp.catalog.clearCache()
    }
    // assignment-only split: quantizer train + rank-1 routing, the term
    // the two-level path bounds at O(corpus·√nlist)
    {
      import org.apache.spark.sql.functions.col
      val flatMax = sp.conf.getOption("graft.ann.flatNlistMax")
        .map(_.toInt).getOrElse(similarity.SimilarityOps.DefaultFlatNlistMax)
      val rows = e.select(col("vec_id").as("__sid"),
        col("embedding").as("__sv"))
      val t0 = System.nanoTime
      val assigned =
        if (ntop > 0 || nlist > flatMax) {
          val effNtop =
            if (ntop > 0) ntop else math.ceil(math.sqrt(nlist)).toInt
          val q = similarity.SimilarityOps.hierCentroids(
            e, "vec_id", "embedding", 64, nlist, effNtop, 2)
          similarity.SimilarityOps.hierAssign1(rows, q.tops, q.children,
            col("__sv").cast("array<double>"), "list_id")
        } else {
          val cents = similarity.SimilarityOps.coarseCentroids(
            e, "vec_id", "embedding", 64, nlist, 2)
          similarity.SimilarityOps.assignTopR(rows, cents,
            col("__sv").cast("array<double>"),
            graft.functions.CentroidSelect.Cos, asc = false, 1, "list_id")
        }
      graft.Bench.consume(assigned)
      println(f"ASSIGN ${(System.nanoTime - t0) / 1e9}%.1f s " +
        s"(quantizer train + rank-1 routing, ${if (ntop > 0 || nlist > flatMax) "two-level" else "flat"})")
    }
    sp.stop()
  }
}
