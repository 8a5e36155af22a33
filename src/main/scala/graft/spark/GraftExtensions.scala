package graft.spark

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Sample}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** The reference's interactive-sampling policy as a Catalyst optimizer
  * rule (Orange/data/sql/table.py:20-22, 339-340, 577-631: statistics on
  * tables above LARGE_TABLE = 100 000 rows are computed over a
  * `TABLESAMPLE system_time(1s)` instead of the full table, so a GUI
  * stays responsive on arbitrarily large backends).
  *
  * Spark translation: when `spark.graft.interactive.enabled` is true,
  * every scan feeding an [[Aggregate]] whose relation exceeds
  * `spark.graft.interactive.minBytes` is wrapped in a seeded [[Sample]].
  * Opt-in and aggregate-only, exactly like the reference (row filters and
  * projections are never sampled — only the stats/distribution/
  * contingency family, which tolerates approximation in interactive
  * use). Default off: the oracle-verified query surface is bit-exact and
  * never runs with this rule active.
  *
  * This is the (c)-tier custom-Catalyst path from the design notes: a
  * `Rule[LogicalPlan]` registered through [[SparkSessionExtensions]]
  * (`.config("spark.sql.extensions", "graft.spark.GraftExtensions")`),
  * not a behavior reachable by composing DataFrame operators — the
  * policy must see the whole logical plan to know a scan feeds an
  * aggregation. */
class InteractiveSampleRule(session: SparkSession) extends Rule[LogicalPlan] {

  import InteractiveSampleRule._

  private def flag(key: String, dflt: String): String =
    session.conf.getOption(key).getOrElse(dflt)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!flag(EnabledKey, "false").toBoolean) return plan
    val minBytes = flag(MinBytesKey, (128L * 1024 * 1024).toString).toLong
    val fraction = flag(FractionKey, "0.01").toDouble
    val seed = flag(SeedKey, "42").toLong
    plan.transformDown {
      case agg: Aggregate =>
        agg.transformDown {
          case rel: LogicalRelation
              if rel.getTagValue(SampledTag).isEmpty &&
                rel.computeStats().sizeInBytes > minBytes =>
            // Tag survives on the child instance across fixpoint
            // iterations → the rule is idempotent.
            rel.setTagValue(SampledTag, true)
            Sample(0.0, fraction, withReplacement = false, seed, rel)
        }
    }
  }
}

object InteractiveSampleRule {
  val EnabledKey = "spark.graft.interactive.enabled"
  val MinBytesKey = "spark.graft.interactive.minBytes"
  val FractionKey = "spark.graft.interactive.fraction"
  val SeedKey = "spark.graft.interactive.seed"
  private[spark] val SampledTag =
    TreeNodeTag[Boolean]("graft.interactive.sampled")
}

/** Session-extensions entry point:
  * `--conf spark.sql.extensions=graft.spark.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(new InteractiveSampleRule(_))
}
