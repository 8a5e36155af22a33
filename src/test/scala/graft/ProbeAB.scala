package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.similarity.SimilarityOps

/** Dev-only A/B timer for the two-level quantizer's QUERY-PROBE seam
  * (r15 verdict "what's wrong" #2): at nlist above the flat ceiling the
  * r15 probe path broadcast ALL nlist children and ranked every one per
  * query — O(queries × nlist × dim) flops; the r16 two-stage path ranks
  * the ~√nlist tops per query and probes only the matched cells'
  * children — O(queries × (√nlist + nprobe·occupancy) × dim). Both arms
  * run the SAME build (the old shape is pinned behind
  * `graft.ann.exhaustiveProbes`), pay the identical deterministic
  * training trajectory, and scan the identical probed lists downstream,
  * so the wall DIFFERENCE isolates the probe seam. Recall through the
  * new path is pinned separately (SimilaritySpec clustered fixture);
  * here queries are a large hash-sample of the corpus — the regime the
  * "queries are the small side by contract" r15 caveat excluded.
  *
  * Usage: `ProbeAB <embDir> <nQ> <k> <nlist> <np1,np2,…>` — emits one
  * JSON line per (nprobe, arm): wall seconds of run 1 (cold) and run 2
  * (warm), consumer = count() (the rank filter forces the full cosine
  * chain, so nothing prunes away).
  */
object ProbeAB {
  def main(args: Array[String]): Unit = {
    val embDir = args(0)
    val nQ = if (args.length > 1) args(1).toInt else 200000
    val k = if (args.length > 2) args(2).toInt else 10
    val nlist = if (args.length > 3) args(3).toInt else 16384
    val nprobes = (if (args.length > 4) args(4) else "16")
      .split(",").map(_.trim.toInt).toSeq
    // lloyd=1 keeps the (identical, shared) training term small so the
    // probe-seam DIFFERENCE stands out of the whole-op walls
    val lloyd = if (args.length > 5) args(5).toInt else 1
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val e = spark.read.parquet(s"$embDir/embeddings.parquet").cache()
    val n = e.count()
    val dim = e.select(size(col("embedding"))).as[Int].head()
    val step = math.max(1L, n / nQ)
    val q = e.filter(pmod(xxhash64(col("vec_id")), lit(step)) === 0).cache()
    val qn = q.count()
    println(s"[probeab] corpus=$n dim=$dim queries=$qn k=$k nlist=$nlist")

    def timed(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // SPARK_GRAFT_PROBE_ARM = two_stage | exhaustive | both (default):
    // the exhaustive arm's implied shuffle grows ∝ queries × nlist, so
    // at large nQ it is measured separately at smaller nQ (its cost is
    // linear in queries — extrapolation is exact by shape)
    val arms = sys.env.getOrElse("SPARK_GRAFT_PROBE_ARM", "both") match {
      case "two_stage" => Seq(false)
      case "exhaustive" => Seq(true)
      case _ => Seq(false, true)
    }
    for (np <- nprobes; exh <- arms) {
      spark.conf.set("graft.ann.exhaustiveProbes", exh.toString)
      def run = SimilarityOps.ivfTopKCosine(
        q, e, "vec_id", "embedding", dim, k, nlist, np,
        lloyd = lloyd).count()
      val (_, cold) = timed(run)
      val (rows, warm) = timed(run)
      val arm = if (exh) "exhaustive" else "two_stage"
      println(f"""{"op":"probe_ab","arm":"$arm","nlist":$nlist,"nprobe":$np,"k":$k,"queries":$qn,"rows":$rows,"cold_sec":$cold%.1f,"warm_sec":$warm%.1f}""")
    }
    spark.stop()
  }
}
