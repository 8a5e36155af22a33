package graft

import org.apache.spark.sql.SparkSession

/** Dev-only scale timer for the exact-substring dedup family (the r13
  * verdict's 1000×-completion rows): runs the named passes over a docs
  * replica directory and prints per-run wall seconds through the same
  * noop-sink consumer Bench uses (so no count-only plan elimination —
  * see [[BenchFidelitySpec]]). The pairs pass reports the volume
  * guard's fail-fast as a first-class outcome: at mutated-replica
  * scale Σc·(c−1)/2 over window-key occupancies is EXPECTED to trip
  * the guard, and "refused with the right message" is the evidence.
  *
  * Usage:
  *   SPARK_DRIVER_MEM=32g sbt "Test/runMain graft.SubstrScale <docsDir> spans,trim,pairs <runs>"
  */
object SubstrScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val passes = args(1).split(",").map(_.trim).toSeq
    val runs = if (args.length > 2) args(2).toInt else 2
    val minRun = 10 // the registered dedup_exact_substring_* config
    val sp = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "64"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/tmp/spark-substr")
      .getOrCreate()
    sp.sparkContext.setLogLevel("ERROR")
    val docs = sp.read.parquet(s"$dir/documents.parquet")
    println(s"SUBSTR docs=${docs.count()} dir=$dir minRun=$minRun " +
      s"shuffle=${sp.conf.get("spark.sql.shuffle.partitions")}")
    for (p <- passes; i <- 1 to runs) {
      val t0 = System.nanoTime
      try {
        val df = p match {
          case "spans" => text.DedupOps
            .exactSubstringSpans(docs, "doc_id", "text", minRun)
          case "trim" => text.DedupOps
            .trimExactSubstrings(docs, "doc_id", "text", minRun)
          case "pairs" => text.DedupOps
            .exactSubstringPairs(docs, "doc_id", "text", minRun)
        }
        Bench.consume(df)
        println(f"TIMED $p run$i ${(System.nanoTime - t0) / 1e9}%.1f s")
      } catch {
        case e: IllegalStateException =>
          println(f"GUARD $p run$i ${(System.nanoTime - t0) / 1e9}%.1f s" +
            s" refused: ${e.getMessage.take(160)}")
      }
      sp.catalog.clearCache()
    }
    sp.stop()
  }
}
