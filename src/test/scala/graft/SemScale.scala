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
  * Usage:
  *   java -cp … graft.SemScale <dir> <nlist> <eps> [runs]
  */
object SemScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nlist = args(1).toInt
    val eps = args(2).toDouble
    val runs = if (args.length > 3) args(3).toInt else 2
    val sp = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "64"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/tmp/spark-sem")
      .getOrCreate()
    sp.sparkContext.setLogLevel("ERROR")
    val e = sp.read.parquet(s"$dir/embeddings.parquet")
    println(s"SEM vectors=${e.count()} dir=$dir nlist=$nlist eps=$eps " +
      s"shuffle=${sp.conf.get("spark.sql.shuffle.partitions")}")
    for (i <- 1 to runs) {
      val t0 = System.nanoTime
      try {
        val out = similarity.SimilarityOps.semanticDedup(
          e, "vec_id", "embedding", 64, nlist, eps)
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
    sp.stop()
  }
}
