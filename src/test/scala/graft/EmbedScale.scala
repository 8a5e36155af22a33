package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Embeddings-only growth replica (GenScale's `grow` mode restricted to
  * the embeddings table): `EmbedScale <srcDir> <dstDir> <k> [grow|cluster]
  * [nCenters] [noisePermille]` writes k × the source vector count as
  * `<dstDir>/embeddings.parquet`.
  *
  *   - `grow` (default): delegates to [[GenScale.growEmbedding]] — the
  *     SHARED device (same hash keys), so these replicas stay identical
  *     to the full-table-family replicas they stand in for. Exists so
  *     the near-dup broadcast-ceiling fallback (r13 ask #1: an id+vector
  *     side that STRADDLES the 512 MB ceiling, ~2M × 64d ≈ 0.53 GB) can
  *     be measured without generating the whole 15 GB table family.
  *   - `cluster`: [[GenScale.clusteredEmbedding]] — every vector is
  *     center+noise over nCenters hash-drawn well-separated centers
  *     (r14: the production-guidance recall geometry, vs the uniform
  *     adversarial case `grow` produces). vec_id offsets still grow the
  *     corpus ∝ k; the cluster assignment is keyed purely by vec_id.
  */
object EmbedScale {
  def main(args: Array[String]): Unit = {
    val src = args(0); val dst = args(1); val k = args(2).toInt
    val mode = if (args.length > 3) args(3) else "grow"
    require(mode == "grow" || mode == "cluster", s"unknown mode $mode")
    val nCenters = if (args.length > 4) args(4).toInt else 256
    val noisePermille = if (args.length > 5) args(5).toInt else 250
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val OFF = 100000000L

    val base = spark.read.parquet(s"$src/embeddings.parquet")
    // chunked append writes: a k=10000 single unionByName would build a
    // 10000-leg plan (each leg a 64-element transform tree) — chunk the
    // union at 250 replicas and append, identical rows either way
    (0 until k).grouped(250).foreach { chunk =>
      val shifted = chunk.map { i =>
        val s = base.withColumn("vec_id", col("vec_id") + lit(i * OFF))
        if (mode == "grow") GenScale.growEmbedding(s, i) else s
      }.reduce(_.unionByName(_))
      val out =
        if (mode == "cluster")
          GenScale.clusteredEmbedding(shifted, nCenters, noisePermille)
        else shifted
      out.write.mode(if (chunk.head == 0) "overwrite" else "append")
        .parquet(s"$dst/embeddings.parquet")
    }
    println(s"[embedscale] embeddings ($mode): " +
      s"${spark.read.parquet(s"$dst/embeddings.parquet").count()} rows")
    spark.stop()
  }
}
