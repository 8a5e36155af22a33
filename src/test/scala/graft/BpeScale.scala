package graft

import org.apache.spark.sql.SparkSession

/** Dev-only scale timer for the multi-round BPE trainer (the r13
  * verdict's "scale row showing per-round cost is flat"): trains at a
  * ladder of round counts over the same docs replica and prints total
  * wall seconds per config — the marginal per-round cost is the
  * difference quotient between adjacent ladder rungs, which a flat
  * per-round profile makes constant. Each `trainBpe` call pays the
  * corpus word-count scan once up front (the only corpus touch);
  * everything after is per-round aggregations over the distinct-word
  * table, so t(b) − t(a) isolates (b − a) pure rounds. (Lineage is
  * truncated by an every-round eager localCheckpoint — there is no
  * round-count boundary to cross.)
  *
  * Usage:
  *   java -cp … graft.BpeScale <docsDir> 8,16,32,48 <runs>
  */
object BpeScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val ladder = args(1).split(",").map(_.trim.toInt).toSeq
    val runs = if (args.length > 2) args(2).toInt else 2
    val sp = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "64"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/tmp/spark-bpe")
      .getOrCreate()
    sp.sparkContext.setLogLevel("ERROR")
    val docs = sp.read.parquet(s"$dir/documents.parquet")
    val words = text.BpeOps.bpeWordTable(docs, "text")
    println(s"BPE docs=${docs.count()} distinctWords=${words.count()} " +
      s"dir=$dir shuffle=${sp.conf.get("spark.sql.shuffle.partitions")}")
    for (rounds <- ladder; i <- 1 to runs) {
      val t0 = System.nanoTime
      val merges = text.BpeOps.trainBpe(docs, "text", rounds).count()
      println(f"TIMED rounds=$rounds run$i ${(System.nanoTime - t0) / 1e9}%.1f s" +
        s" merges=$merges")
      sp.catalog.clearCache()
    }
    sp.stop()
  }
}
