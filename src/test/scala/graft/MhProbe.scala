package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: isolates the minhash signature stage cost and checks
  * whether the 16 element_at projections share one MinhashSigs eval. */
object MhProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.text.{DedupOps, TextOps}
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    def time(tag: String)(f: => Long): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        println(f"$tag run$i ${(System.nanoTime - t0) / 1e9}%.2f s n=$n")
      }
    }
    // A: current narrow-map named-column signatures
    time("A sigs16cols") {
      DedupOps.minhashSignaturesFast(docs, "doc_id", "text", 3).count()
    }
    // B: signature as ONE array column (no 16-way element_at fanout)
    time("B sigsArray") {
      docs.select(col("doc_id"), TextOps.tokens(col("text")).as("__ts"))
        .filter(size(col("__ts")) >= 3)
        .select(col("doc_id"), graft.functions.MinhashExpr.minhashSigs(
          col("__ts"), 3, DedupOps.MinhashParams, DedupOps.MinhashP,
          xx = true).as("__mins"))
        .count()
    }
    // C: shingle array alone (token + shingle cost floor)
    time("C shingles") {
      docs.select(col("doc_id"), TextOps.tokens(col("text")).as("__ts"))
        .select(col("doc_id"),
          TextOps.shinglesFromTokens(col("__ts"), 3).as("__sh"))
        .filter(size(col("__sh")) > 0)
        .select(sum(size(col("__sh")))).collect()
      0L
    }
    // D: old exploded-aggregation shape for reference
    time("D explodeAgg") {
      val sh = DedupOps.shingleTable(docs, "doc_id", "text", 3)
        .withColumn("__h", pmod(xxhash64(col("shingle")), lit(4294967296L)))
      val aggs = DedupOps.MinhashParams.zipWithIndex.map { case ((a, b), j) =>
        min(pmod(col("__h") * a + b, lit(DedupOps.MinhashP))).as(s"m$j")
      }
      sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*).count()
    }
    spark.stop()
  }
}
