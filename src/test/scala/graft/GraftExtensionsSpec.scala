package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.Sample
import org.apache.spark.sql.functions._
import graft.spark.{GraftExtensions, InteractiveSampleRule}

/** Interactive-sampling optimizer rule (reference sql/table.py:577-631
  * LARGE_TABLE policy): aggregate scans over large relations get a
  * seeded Sample when the session opts in; exact queries are untouched. */
class GraftExtensionsSpec extends SparkSpec {

  private def aggPlan(s: SparkSession) = {
    val df = s.read.parquet(s"$sf/lineitem.parquet")
      .groupBy(col("l_returnflag")).agg(avg(col("l_quantity")))
    df.queryExecution.optimizedPlan
  }

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally pairs.foreach { case (k, _) => spark.conf.unset(k) }
  }

  test("disabled (default): plan unchanged, no Sample injected") {
    val rule = new InteractiveSampleRule(spark)
    val out = rule(aggPlan(spark))
    assert(out.collectFirst { case s: Sample => s }.isEmpty)
  }

  test("enabled: aggregate scan over a large relation gets a seeded Sample") {
    withConfs(
      InteractiveSampleRule.EnabledKey -> "true",
      InteractiveSampleRule.MinBytesKey -> "1024", // sf0.01 lineitem > 1 KiB
      InteractiveSampleRule.FractionKey -> "0.25") {
      val rule = new InteractiveSampleRule(spark)
      val out = rule(aggPlan(spark))
      val sample = out.collectFirst { case s: Sample => s }
      assert(sample.isDefined, out.treeString)
      assert(sample.get.upperBound == 0.25 && sample.get.seed == 42L)
      // idempotent under the optimizer's fixpoint: second application
      // must not double-wrap
      val again = rule(out)
      assert(again.collect { case s: Sample => s }.size == 1)
    }
  }

  test("enabled: small relations and non-aggregate plans stay exact") {
    withConfs(
      InteractiveSampleRule.EnabledKey -> "true",
      InteractiveSampleRule.MinBytesKey -> (1L << 40).toString) {
      val rule = new InteractiveSampleRule(spark)
      // relation below threshold → untouched
      assert(rule(aggPlan(spark)).collectFirst { case s: Sample => s }.isEmpty)
    }
    withConfs(
      InteractiveSampleRule.EnabledKey -> "true",
      InteractiveSampleRule.MinBytesKey -> "1024") {
      val rule = new InteractiveSampleRule(spark)
      // plain filter+project (no Aggregate) → never sampled
      val plan = spark.read.parquet(s"$sf/lineitem.parquet")
        .filter(col("l_quantity") > 25).select(col("l_orderkey"))
        .queryExecution.optimizedPlan
      assert(rule(plan).collectFirst { case s: Sample => s }.isEmpty)
    }
  }

  test("end-to-end: session built with GraftExtensions runs the rule") {
    val sc = spark.sparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master(sc.master)
        .withExtensions(new GraftExtensions()(_))
        .getOrCreate()
      s2.conf.set(InteractiveSampleRule.EnabledKey, "true")
      s2.conf.set(InteractiveSampleRule.MinBytesKey, "1024")
      s2.conf.set(InteractiveSampleRule.FractionKey, "0.2")
      val out = aggPlan(s2)
      assert(out.collectFirst { case s: Sample => s }.isDefined, out.treeString)
      // sampled aggregate returns a plausible subset average
      val rows = s2.read.parquet(s"$sf/lineitem.parquet")
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n")).collect()
      assert(rows.nonEmpty && rows.forall(_.getLong(1) > 0))
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }
}
