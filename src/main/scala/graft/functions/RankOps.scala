package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed fractional (average) ranking — the rank kernel behind
  * Spearman correlation/distance (reference Orange/distance/distance.py:586-714
  * `_spearmanr2`, which ranks via scipy.stats.rankdata "average").
  *
  * A naive `rank().over(Window.orderBy(c))` funnels the WHOLE table through
  * one task — the canonical single-partition scale killer. This helper is the
  * 100 TB shape: rank the *distinct values* with a two-pass prefix-sum over a
  * range-partitioned frequency table, then map ranks back with an equi-join.
  *
  *  1. `groupBy(value)` → (value, cnt): one keyed shuffle, map-side combined;
  *     output is ≤ #distinct rows (≪ rows for categorical-ish columns, ≈ rows
  *     worst case — still fully parallel).
  *  2. `repartitionByRange(value)` the frequency table; per-partition totals
  *     roll into global offsets via a window over #partitions rows (tiny);
  *     within-partition prefix sums run as a parallel window keyed by the
  *     range-partition id. No stage ever holds more than 1/parts of the data.
  *  3. Join (value → avg_rank) back on the value column — broadcast when the
  *     distinct count is small, shuffle hash otherwise (AQE decides).
  *
  * avg_rank(v) = #rows_before(v) + (cnt(v) + 1) / 2 — identical to
  * `RANK() + (COUNT() OVER (PARTITION BY v) − 1)/2`, so results are
  * bit-identical to the window formulation the DuckDB oracles use.
  * NULL values get no rank (dropped by the equi-join), matching the
  * reference's masked-NaN handling.
  */
object RankOps {

  /** (value → average rank) map for column `c` of `df`; output columns are
    * (`c`, `rankOut`). `parts` bounds the per-task slice of the distinct-value
    * table. */
  /** Rank maps at or below this many distinct values ship back to the
    * fact table as a broadcast hash join (zero shuffle of the data);
    * bigger maps — continuous columns at real scale — keep the shuffle
    * join. */
  private val BroadcastRankCap = 1L << 20

  def avgRankTable(df: DataFrame, c: String, rankOut: String,
                   parts: Int = 32): DataFrame = {
    val counts = df.select(col(c).as("__v"))
      .groupBy(col("__v")).agg(count(lit(1)).as("__cnt"))
    // Checkpoint AFTER stamping partition ids: both consumers below (offsets
    // and prefix sums) must see the SAME range boundaries.
    val ranged = counts.repartitionByRange(parts, col("__v").asc)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(eager = true)
    val offW = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy(col("__pid"))
      .agg(sum(col("__cnt")).as("__ptot"))
      .withColumn("__off", coalesce(sum(col("__ptot")).over(offW), lit(0L)))
      .select(col("__pid"), col("__off"))
    val localW = Window.partitionBy(col("__pid")).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val table = ranged
      .withColumn("__before", coalesce(sum(col("__cnt")).over(localW), lit(0L)))
      .join(broadcast(offsets), "__pid")
      .select(col("__v").as(c),
        (col("__off") + col("__before") + (col("__cnt") + lit(1L)) / 2.0)
          .as(rankOut))
    // the checkpoint makes this count free; values are unchanged either way
    if (ranged.count() <= BroadcastRankCap) broadcast(table) else table
  }

  /** Distributed EXCLUSIVE prefix sum of `valueCol` (long) ordered by the
    * unique key `ord`, appended as `out`: out(r) = Σ value over rows
    * strictly before r. The naive `sum().over(Window.orderBy(ord))` is
    * the single-partition funnel; this is the [[avgRankTable]] two-pass
    * shape — range-partition on the key, per-partition totals roll into
    * broadcast offsets, within-partition prefix windows run keyed by
    * partition id. Integer sums ⇒ bit-identical to the window form the
    * oracles use. Basis for sequence-packing plans. */
  def exclusiveCumsum(df: DataFrame, ord: String, valueCol: String,
                      out: String, parts: Int = 32): DataFrame = {
    val spark = df.sparkSession
    val ranged = df.repartitionByRange(parts, col(ord).asc)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(eager = true)
    // global offsets: the per-partition totals table is ≤ `parts` rows —
    // fold it on the driver (exact integer sums) instead of a
    // single-partition window, and ship the map back as a broadcast join
    // coalesce: a range partition whose values are all NULL sums to NULL,
    // which must contribute 0 to the offsets (matching the window pass,
    // whose per-row prefix is coalesced below)
    val ptots = ranged.groupBy(col("__pid"))
      .agg(coalesce(sum(col(valueCol)), lit(0L)).as("__ptot"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offs = ptots.scanLeft((0, 0L)) { case ((_, acc), (pid, tot)) =>
      (pid, acc + tot) }
    val offsets = spark.createDataFrame(
      ptots.map(_._1).zip(offs.map(_._2)).toSeq).toDF("__pid", "__off")
    val localW = Window.partitionBy(col("__pid")).orderBy(col(ord).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged
      .withColumn("__before", coalesce(sum(col(valueCol)).over(localW), lit(0L)))
      .join(broadcast(offsets), "__pid")
      .withColumn(out, col("__off") + col("__before"))
      .drop("__pid", "__before", "__off")
  }

  /** Distributed row_number within stratum `strat`, ordered by `ord`
    * (unique per row — a key column), appended as `out` (1-based). The
    * naive `Window.partitionBy(strat).orderBy(ord)` funnels each stratum
    * through ONE task — fatal when a stratum holds most of the table
    * (e.g. class labels). Same two-pass shape as [[avgRankTable]]:
    * range-partition by (strat, ord), per-(partition, stratum) counts
    * roll into broadcastable offsets, the within-partition window runs
    * keyed by (partition id, stratum) — parallelism ≥ #partitions at any
    * stratum skew. Basis for stratified k-fold assignment
    * (reference Orange/evaluation/testing.py CrossValidation stratified). */
  def rowNumberWithin(df: DataFrame, strat: String, ord: String,
                      out: String, parts: Int = 32): DataFrame =
    rowNumberWithin(df, strat, Seq(ord), out, parts)

  /** Composite-order variant: `ords` together must uniquely order rows
    * within a stratum (e.g. (ts, event_id)). */
  def rowNumberWithin(df: DataFrame, strat: String, ords: Seq[String],
                      out: String, parts: Int): DataFrame = {
    val ranged = df.repartitionByRange(parts,
        col(strat).asc +: ords.map(col(_).asc): _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(eager = true)
    val offW = Window.partitionBy(col("__ostrat")).orderBy(col("__opid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy(col("__pid").as("__opid"),
        col(strat).as("__ostrat"))
      .agg(count(lit(1)).as("__pn"))
      .withColumn("__off", coalesce(sum(col("__pn")).over(offW), lit(0L)))
      .select(col("__opid"), col("__ostrat"), col("__off"))
    val localW = Window.partitionBy(col("__pid"), col(strat))
      .orderBy(ords.map(col(_).asc): _*)
    ranged
      .withColumn("__lrn", row_number().over(localW))
      .join(broadcast(offsets),
        col("__pid") === col("__opid") && col(strat) === col("__ostrat"))
      .withColumn(out, col("__off") + col("__lrn"))
      .drop("__pid", "__opid", "__ostrat", "__off", "__lrn")
  }

  /** Distributed global row_number over the composite order `ord`
    * (ascending), appended as `out` (1-based) — the scale-safe twin of
    * `row_number().over(Window.orderBy(ord))`, which funnels the WHOLE
    * table through one task. Two-pass: range-partition by `ord`, roll
    * per-partition counts into broadcast offsets (a #partitions-row
    * window), run the within-partition row_number keyed by partition id.
    * When `ord` is a unique total order the result is bit-identical to
    * the global window; with ties, equal keys land in one range
    * partition, so the output multiset matches (same contract as the
    * global window, whose tie order is equally unspecified). */
  def rowNumber(df: DataFrame, ord: Seq[org.apache.spark.sql.Column],
                out: String, parts: Int = 32): DataFrame = {
    val ranged = df.repartitionByRange(parts, ord.map(_.asc): _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(eager = true)
    // per-partition counts are ≤ `parts` rows — fold them into offsets on
    // the driver (the accepted tiny-aggregate pattern) and inline as a
    // literal pid→offset decode, so the final plan carries NO
    // single-partition exchange at all (a window over the offsets frame
    // would, even though that frame is tiny)
    val cnts = ranged.groupBy(col("__pid")).agg(count(lit(1)).as("__pn"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offs = cnts.map { case (pid, n) => val o = acc; acc += n; (pid, o) }
    val offCol = offs.foldLeft(lit(0L): org.apache.spark.sql.Column) {
      case (e, (pid, o)) => when(col("__pid") === pid, lit(o)).otherwise(e)
    }
    val localW = Window.partitionBy(col("__pid")).orderBy(ord.map(_.asc): _*)
    ranged.withColumn("__lrn", row_number().over(localW))
      .withColumn(out, offCol + col("__lrn"))
      .drop("__pid", "__lrn")
  }

  /** Append an average-rank column `r_<c>` per column in `cols` (each joined
    * from its own value→rank map). */
  def withAvgRanks(df: DataFrame, cols: Seq[String],
                   parts: Int = 32): DataFrame = {
    // the per-column rank-table builds (groupBy + range exchange + eager
    // checkpoint) are independent — submit them concurrently so their
    // jobs interleave instead of paying 3× sequential latency
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val tables = cols.map(c =>
      c -> Future(avgRankTable(df, c, s"r_$c", parts)))
    tables.foldLeft(df) { case (acc, (c, fut)) =>
      acc.join(Await.result(fut, Duration.Inf), Seq(c))
    }
  }
}
