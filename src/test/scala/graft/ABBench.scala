package graft

import org.apache.spark.sql.functions._

/** Dev-only micro-benchmark: chain vs higher-order vs native cosine
  * kernels (run via `sbt "Test/runMain graft.ABBench"`). */
object ABBench {
  def main(args: Array[String]): Unit = {
    val sp = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    sp.sparkContext.setLogLevel("ERROR")
    val e = sp.read.parquet("/root/testdata/sf0.1/embeddings.parquet").cache()
    e.count()
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    def pairs = a.join(b,
      col("ia") % 50 === col("ib") % 50 && col("ia") < col("ib"))
    val chainCos = {
      val d = (1 to 64).map(i => element_at(col("ea"), i).cast("double") *
        element_at(col("eb"), i).cast("double")).reduce(_ + _)
      val na = sqrt((1 to 64).map { i =>
        val x = element_at(col("ea"), i).cast("double"); x * x }.reduce(_ + _))
      val nb = sqrt((1 to 64).map { i =>
        val x = element_at(col("eb"), i).cast("double"); x * x }.reduce(_ + _))
      d / (na * nb)
    }
    val hofCos = {
      val ad = col("ea").cast("array<double>")
      val bd = col("eb").cast("array<double>")
      val d = aggregate(zip_with(ad, bd, (x, y) => x * y),
        lit(0.0), (s, x) => s + x)
      val na = sqrt(aggregate(ad, lit(0.0), (s, x) => s + x * x))
      val nb = sqrt(aggregate(bd, lit(0.0), (s, x) => s + x * x))
      d / (na * nb)
    }
    val nativeCos = graft.functions.VectorExprs.cosineF(col("ea"), col("eb"))
    def time(tag: String, c: org.apache.spark.sql.Column): Unit =
      for (w <- 1 to 3) {
        val t0 = System.nanoTime
        val n = pairs.select(sum(when(c > 0.95, 1L).otherwise(0L)))
          .head().getLong(0)
        println(f"AB $tag run$w: ${(System.nanoTime - t0) / 1e9}%.2f s (hits=$n)")
      }
    time("chain ", chainCos)
    time("hof   ", hofCos)
    time("native", nativeCos)
    sp.stop()
  }
}
