package graft

import org.apache.spark.sql.functions._
import graft.sources.Sources

/** Partition pruning: a filter on the partition column must be resolved
  * at planning time (PartitionFilters), scanning only matching
  * directories — the coarse-axis layout lever for 100 TB tables. */
class PartitioningSpec extends SparkSpec {

  test("filter on partition column prunes to one directory at plan time") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_part_").toString + "/events_by_type"
    Sources.writePartitioned(
      spark.read.parquet(s"$sf/events.parquet"), out, Seq("event_type"))

    val scan = spark.read.parquet(out)
      .filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"))
    val plan = scan.queryExecution.executedPlan.toString

    // the predicate must appear as a PartitionFilter, NOT a data filter
    assert(plan.contains("PartitionFilters:") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("event_type"), plan)
    // and the pushed data filters must NOT need the partition column
    assert(!plan.replaceAll("(?s).*PushedFilters: \\[([^\\]]*)\\].*", "$1")
      .contains("event_type"), plan)
    val counts = scan.count()
    val expected = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("event_type") === "click").count()
    assert(counts == expected, s"$counts vs $expected")

    // round-trip fidelity: partition column is restored on read
    val back = spark.read.parquet(out)
    assert(back.columns.contains("event_type"))
    assert(back.count() ==
      spark.read.parquet(s"$sf/events.parquet").count())
  }

  test("partitioned write + bucket-style pruning composes with projection") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_part2_").toString + "/ev"
    Sources.writePartitioned(
      spark.read.parquet(s"$sf/events.parquet"), out, Seq("event_type"))
    val q = spark.read.parquet(out)
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:"), plan)
    val rows = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("view", "purchase"))
    assert(rows.values.forall(_ > 0))
  }
}
