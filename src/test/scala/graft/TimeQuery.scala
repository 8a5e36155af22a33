package graft

/** Dev-only query timer: `sbt "Test/runMain graft.TimeQuery <sfDir> <runs> q1,q2"`
  * — runs each named SparkEntry query <runs> times at local[32] and prints
  * per-run wall seconds (run 1 includes JIT/codegen warmup; compare warm
  * runs against BENCH_r{N}.json). */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val runs = args(1).toInt
    val names = args(2).split(",").toSeq
    val sp = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    sp.sparkContext.setLogLevel("ERROR")
    for (q <- names; i <- 1 to runs) {
      val t0 = System.nanoTime
      val n = SparkEntry.queries(q)(sp, sfDir).collect().length
      println(f"TIMED $q run$i ${(System.nanoTime - t0) / 1e9}%.2f s rows=$n")
      sp.catalog.clearCache()
    }
    sp.stop()
  }
}
