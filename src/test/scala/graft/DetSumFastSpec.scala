package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.core.Tables

/** Pins the r16 detSumFast opt-in path (split-radix long digit sums)
  * as BIT-IDENTICAL to the decimal formulation
  * `sum(round(t,12)::DECIMAL(38,14))::double` — the oracle-visible value of its
  * audited call sites (pre-scaled moment scans) must not move by even
  * one ulp. The general detSum stays decimal: terms beyond the
  * |t|·10¹² < 2⁵¹ contract (raw LOF reach distances) saturate the long
  * grid — ScoringSpec's grouped-LOF fixture caught exactly that. */
class DetSumFastSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-r16 formulation, verbatim. */
  private def detSumDec(term: Column): Column =
    sum(round(term, 12).cast(DecimalType(38, 14))).cast(DoubleType)

  private def compareOn(vals: Seq[java.lang.Double], groups: Int = 1): Unit = {
    val df = vals.zipWithIndex
      .map { case (v, i) => (i % groups, v) }
      .toDF("g", "t")
    val both = df.groupBy(col("g"))
      .agg(Tables.detSumFast(col("t")).as("fast"), detSumDec(col("t")).as("dec"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val f = if (r.isNullAt(1)) null else java.lang.Double.valueOf(r.getDouble(1))
      val d = if (r.isNullAt(2)) null else java.lang.Double.valueOf(r.getDouble(2))
      assert(f == d || (f != null && d != null &&
               java.lang.Double.doubleToRawLongBits(f) ==
               java.lang.Double.doubleToRawLongBits(d)),
        s"group ${r.get(0)}: fast=$f dec=$d")
    }
  }

  test("random terms across magnitudes match bit-for-bit") {
    val rnd = new scala.util.Random(42)
    // magnitudes from 1e-13 (below the grid) up to ~2e3 (the documented
    // |t|·1e12 < 2^51 contract edge), both signs
    val vals: Seq[java.lang.Double] = (1 to 4000).map { _ =>
      val mag = math.pow(10.0, rnd.nextDouble() * 16 - 13)
      java.lang.Double.valueOf((if (rnd.nextBoolean()) 1 else -1) * mag * rnd.nextDouble())
    }
    compareOn(vals, groups = 7)
  }

  test("half-up ties at the 13th decimal round identically") {
    // values whose shortest repr ends in 5 at the 13th decimal — the
    // HALF_UP edge the fast path must inherit from round(), not re-derive
    val vals: Seq[java.lang.Double] = Seq(
      0.0000000000005, 1.0000000000015, -0.0000000000025,
      123.4567890123455, -123.4567890123465, 2047.0000000000005,
      0.12345678901235, -0.9999999999995)
      .map(java.lang.Double.valueOf)
    compareOn(vals)
  }

  test("nulls skip and all-null groups stay null in both paths") {
    val vals: Seq[java.lang.Double] = Seq[java.lang.Double](
      java.lang.Double.valueOf(1.25), null, java.lang.Double.valueOf(-2.5),
      null, java.lang.Double.valueOf(0.0))
    compareOn(vals)
    // all-null group
    val df = Seq[(Int, java.lang.Double)]((0, null), (0, null)).toDF("g", "t")
    val r = df.groupBy(col("g"))
      .agg(Tables.detSumFast(col("t")).as("fast"), detSumDec(col("t")).as("dec"))
      .collect().head
    assert(r.isNullAt(1) && r.isNullAt(2))
  }

  test("NaN terms contribute nothing in either path") {
    val vals: Seq[java.lang.Double] = Seq(
      1.5, Double.NaN, -0.25, Double.NaN, 3.75).map(java.lang.Double.valueOf)
    compareOn(vals)
  }

  test("contract-edge magnitudes (|t|·1e12 near 2^51) still agree") {
    // 2^51 / 1e12 = 2251.79...; stay just inside
    val vals: Seq[java.lang.Double] = Seq(
      2251.0, -2251.0, 2250.999999999999, -2250.999999999999,
      1125.5, -1125.5, 2000.000000000001).map(java.lang.Double.valueOf)
    compareOn(vals)
  }
}
