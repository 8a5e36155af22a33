package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Sources

/** Co-located bucketed joins — the pay-shuffle-once-at-write strategy
  * for repeated fact-to-fact joins at scale. The assertions are on the
  * executed plan: a join of two tables bucketed the same way must not
  * shuffle either side. */
class BucketingSpec extends SparkSpec {

  test("join of two same-bucketed tables has NO exchange on either side") {
    val dir = Files.createTempDirectory("graft_bucket_").toString
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val ord = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_orderdate", "o_totalprice")
    Sources.writeBucketed(li, "li_bkt", s"$dir/li", Seq("l_orderkey"), 8)
    Sources.writeBucketed(ord, "ord_bkt", s"$dir/ord", Seq("o_orderkey"), 8)
    try {
      val joined = spark.table("li_bkt").join(spark.table("ord_bkt"),
        col("l_orderkey") === col("o_orderkey"))
      // disable broadcast so the test exercises the sort-merge path the
      // strategy targets (at scale neither fact side broadcasts)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan =
        try joined.queryExecution.executedPlan.toString
        finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      assert(!plan.contains("Exchange"),
        "bucketed join must not shuffle:\n" +
          plan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
      // and the result is the same as the plain shuffled join
      val expected = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS ord_bkt")
    }
  }

  test("bucket pruning: equality filter on the bucket column reads one bucket") {
    val dir = Files.createTempDirectory("graft_bucket_").toString
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    Sources.writeBucketed(li, "li_bkt2", s"$dir/li", Seq("l_orderkey"), 8)
    try {
      // DisableUnnecessaryBucketedScan considers only join/agg
      // distribution, not pruning — pin the bucketed scan on so the
      // pruning path is exercised
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val q = spark.table("li_bkt2").filter(col("l_orderkey") === 1L)
      val plan =
        try q.queryExecution.executedPlan.toString
        finally spark.conf
          .unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      // Spark reports bucket pruning in the scan: 1 of 8 selected
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
        plan.linesIterator.filter(_.contains("Bucket")).mkString("\n"))
    } finally spark.sql("DROP TABLE IF EXISTS li_bkt2")
  }
}
