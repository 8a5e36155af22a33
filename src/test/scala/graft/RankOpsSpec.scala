package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.RankOps

/** RankOps distributed average-rank vs the global-window formulation it
  * replaces — must be bit-identical (Spearman queries' oracles depend on
  * it), including ties and values split across range partitions. */
class RankOpsSpec extends SparkSpec {

  private def windowRanks(colName: String) = {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col(colName).cast("double").as(colName))
    df.withColumn("r_win",
      rank().over(Window.orderBy(col(colName))) +
        (count(lit(1)).over(Window.partitionBy(col(colName))) - 1) / 2.0)
  }

  test("avgRankTable matches rank()+count() window exactly (ties included)") {
    for (c <- Seq("l_quantity", "l_extendedprice")) {
      val win = windowRanks(c).select(col(c), col("r_win")).distinct()
      val dist = RankOps.avgRankTable(
        spark.read.parquet(s"$sf/lineitem.parquet")
          .select(col(c).cast("double").as(c)), c, "r_dist", parts = 7)
      val diff = win.join(dist, Seq(c))
        .filter(col("r_win") =!= col("r_dist")).count()
      assert(diff == 0, s"rank mismatch on $c")
      assert(win.count() == dist.count(), s"distinct-value count mismatch on $c")
    }
  }

  test("withAvgRanks preserves row count and covers every row") {
    val base = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_quantity").cast("double").as("l_quantity"),
        col("l_discount").cast("double").as("l_discount"))
    val ranked = RankOps.withAvgRanks(base, Seq("l_quantity", "l_discount"))
    assert(ranked.count() == base.count())
    assert(ranked.filter(col("r_l_quantity").isNull ||
      col("r_l_discount").isNull).count() == 0)
    // ranks of n rows must sum to n(n+1)/2 (fractional ranking invariant)
    val n = base.count().toDouble
    val s = ranked.agg(sum(col("r_l_quantity"))).head().getDouble(0)
    assert(math.abs(s - n * (n + 1) / 2.0) < 1e-6)
  }

  test("rowNumberWithin matches the per-stratum window formulation") {
    val df = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_orderstatus"))
    val dist = RankOps.rowNumberWithin(df, "o_orderstatus", "o_orderkey",
      "rn_dist", parts = 5)
    val win = df.withColumn("rn_win", row_number().over(
      Window.partitionBy(col("o_orderstatus")).orderBy(col("o_orderkey"))))
    val joined = dist.join(win, Seq("o_orderkey", "o_orderstatus"))
    assert(joined.count() == df.count())
    assert(joined.filter(col("rn_dist") =!= col("rn_win")).count() == 0)
  }

  test("no single-partition global sort of the full table in the plan") {
    val base = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_quantity").cast("double").as("l_quantity"))
    val p = RankOps.avgRankTable(base, "l_quantity", "r")
      .queryExecution.executedPlan.toString
    // the only window runs partitioned by __pid; nothing exchanges to a
    // single partition except the #partitions-row offsets table
    assert(!p.contains("Window [rank("), "global rank window crept back in")
  }
}
