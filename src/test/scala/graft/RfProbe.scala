package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-stage timing probe for ml_random_forest (r16 VERDICT item 8):
  * splits the fitVote wall into (cache build, level-1 contingency +
  * root pick, rest of the induction + vote scan) at an arbitrary SF
  * rung, so the single-row-group fixture artifact (cache build = one
  * task at sf0.1) can be separated from real induction cost on a
  * multi-row-group input (the sf1m replica has 10 row groups).
  *
  *   Test/runMain graft.RfProbe /tmp/sf1m 32
  */
object RfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = graft.core.Tables.load(spark, sfDir, "lineitem")
    val feats = Seq(
      ("flag", col("l_returnflag")),
      ("qty_bin", floor((col("l_quantity") - 1) / 10)),
      ("disc_bin", floor(col("l_discount") * 20)),
      ("tax_bin", floor(col("l_tax") * 25)))
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"RFPROBE $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    for (run <- Seq("cold", "warm")) {
      println(s"RFPROBE == $run ==")
      val base = graft.ml.RandomForest.baseProjection(
        li, feats, col("l_linestatus"),
        concat_ws("#", col("l_orderkey"), col("l_linenumber")),
        trees = 5, bagPermille = 632).cache()
      t("cache_build")(base.count())
      // level-1 contingency + root pick (the first induction collect)
      t("level1_contingency") {
        graft.ml.RandomForest.levelOneFrom(base, feats, 5)
          .groupBy(col("tree"), col("fname")).agg(count(lit(1)))
          .collect()
      }
      // full fit (re-does level 1 internally — its own stages are what
      // the delta vs the two rows above isolates)
      t("full_fitVote") {
        graft.ml.RandomForest.fitVote(li, feats, col("l_linestatus"),
          concat_ws("#", col("l_orderkey"), col("l_linenumber")),
          trees = 5)
          .write.format("noop").mode("overwrite").save()
      }
      base.unpersist(blocking = true)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
