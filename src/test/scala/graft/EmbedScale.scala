package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embeddings-only growth replica (GenScale's `grow` mode restricted to
  * the embeddings table): `EmbedScale <srcDir> <dstDir> <k>` writes
  * k × the source vector count as `<dstDir>/embeddings.parquet`, with
  * the same hash-keyed fresh-vector + 1/8-exact-duplicate device as
  * GenScale.growEmbedding. Exists so the near-dup broadcast-ceiling
  * fallback (r13 ask #1: an id+vector side that STRADDLES the 512 MB
  * ceiling, ~2M × 64d ≈ 0.53 GB) can be measured without generating the
  * whole 15 GB table family at k = 1000. */
object EmbedScale {
  def main(args: Array[String]): Unit = {
    val src = args(0); val dst = args(1); val k = args(2).toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val OFF = 100000000L

    def growEmbedding(df: DataFrame, i: Int): DataFrame = {
      if (i == 0) return df
      def freshVec(jc: org.apache.spark.sql.Column) =
        transform(col("embedding"), (_, j) =>
          ((pmod(xxhash64(lit("growemb"), col("vec_id"), jc, j),
            lit(2001)).cast("double") - lit(1000.0)) / lit(1000.0))
            .cast("float"))
      val isDup =
        pmod(xxhash64(lit("edupflag"), col("vec_id"), lit(i)), lit(8)) === 0
      val partner =
        pmod(xxhash64(lit("eduppick"), col("vec_id"), lit(i)), lit(i))
      val dupVec = when(partner === 0, col("embedding"))
        .otherwise(freshVec(partner))
      df.withColumn("embedding",
        when(isDup, dupVec).otherwise(freshVec(lit(i))))
    }

    val base = spark.read.parquet(s"$src/embeddings.parquet")
    val out = (0 until k).map { i =>
      growEmbedding(base.withColumn("vec_id", col("vec_id") + lit(i * OFF)), i)
    }.reduce(_.unionByName(_))
    out.write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
    println(s"[embedscale] embeddings: ${out.count()} rows")
    spark.stop()
  }
}
