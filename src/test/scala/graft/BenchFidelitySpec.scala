package graft

import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.functions._

/** Bench-integrity audit, closing the r13 count-only join-elimination
  * hazard as a CLASS. Bench used to time `df.count()`, and Catalyst may
  * legally eliminate operators from a count-only plan that the full
  * result needs — r13 found `dedup_exact_substring`'s final left join
  * dropped (provably unique right ⇒ non-duplicating ⇒ unreferenced ⇒
  * eliminated), timing a 0.2 s scan as the ~35 s operator. The r14
  * whole-deck audit below found the same hazard strips EVERY join from
  * `pipeline_corpus_curation` and `dedup_incremental_batch` and prunes
  * aggregate branches across the score_* family — so Bench now times a
  * `noop`-sink write ([[Bench.consume]]): the v2 noop table accepts all
  * columns, nothing is prunable or eliminable, and the timing covers
  * the operator set the user's query actually runs.
  */
class BenchFidelitySpec extends SparkSpec {

  private def joins(plan: LogicalPlan): Int =
    plan.collect { case j: Join => j }.size

  /** The r13 phantom shape: docs ⟕ (aggregate on the join key). */
  private def canary = {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val agg = docs.groupBy(col("doc_id")).agg(count(lit(1)).as("c"))
    docs.join(agg, Seq("doc_id"), "left")
  }

  test("count() consumer provably eliminates the canary join") {
    val joined = canary
    assert(joins(joined.queryExecution.optimizedPlan) == 1,
      "full plan must contain the join")
    assert(joins(joined.groupBy().count().queryExecution.optimizedPlan) == 0,
      "the hazard this spec documents: Catalyst drops an eliminable " +
        "join under a count-only consumer — a bench timing count() " +
        "here times a scan, not the join")
  }

  test("Bench.consume executes the join count() eliminates") {
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[LogicalPlan]
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit =
        plans.add(qe.optimizedPlan)
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      Bench.consume(canary)
      // listener events are delivered asynchronously
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      import scala.jdk.CollectionConverters._
      while (System.nanoTime() < deadline &&
        !plans.asScala.exists(joins(_) >= 1)) Thread.sleep(50)
      assert(plans.asScala.exists(joins(_) >= 1),
        "Bench.consume's executed plan lost the canary join — the " +
          "bench consumer is eliminating operators again")
    } finally spark.listenerManager.unregister(listener)
  }

  test("whole-deck inventory: known count()-hazard queries are detected") {
    // evidence for why Bench cannot use count(): these queries lose
    // JOIN nodes outright under a count consumer (timing would cover a
    // fraction of the operator). Harmless for Bench since consume() is
    // a noop write, but the inventory documents the class.
    val lossy = SparkEntry.queries.keys.toSeq.sorted.filter { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      joins(df.groupBy().count().queryExecution.optimizedPlan) <
        joins(df.queryExecution.optimizedPlan)
    }
    info(s"queries losing joins under count(): ${lossy.mkString(", ")}")
    val known = Set("dedup_incremental_batch", "pipeline_corpus_curation",
      "score_chi2")
    assert(known.subsetOf(lossy.toSet),
      s"the documented hazard set changed: now $lossy — re-audit " +
        "BASELINE's bench-basis notes if Catalyst stopped eliminating")
  }
}
