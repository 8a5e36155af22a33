package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.core.Tables

/** Pins the r17 scale-6 fast sum as BIT-IDENTICAL to its decimal
  * formulation:
  *
  *   exactSumFast ≡ sum(c::DECIMAL(38,6))::double   while |c| < 2.25e9
  *
  * Spark's double→DECIMAL cast is HALF_UP at scale 6 of the double's
  * SHORTEST decimal repr (BigDecimal(Double.toString)); round(c, 6)
  * applies the same operation, and the long recovery k =
  * floor(round(c,6)·1e6 + 0.5) is exact while |k| < 2⁵¹ — the proven
  * detSumFast device at scale 6. NOT widenable by an integer-part
  * split: subtracting the integer part changes the shortest-repr
  * digits the cast sees (1.0000025 − 1 = 2.4999999999…e-6 — a
  * different half-up image; this spec's tie cases catch exactly that).
  * Money-scale SQUARES (extendedprice² ≈ 1.3e10) exceed the envelope,
  * so the mixed-moment helpers route that single sum through the
  * decimal path — also pinned here. Also pins the non-finite guard:
  * NaN/±Inf rows are skipped exactly like the decimal casts'
  * NULL-on-overflow (the r16 ADVICE Infinity finding).
  */
class ExactSumFastSpec extends SparkSpec {
  import spark.implicits._

  /** Decimal formulations, verbatim from the pre-r17 helpers. */
  private def exactSumDec(c: Column): Column =
    sum(c.cast(DecimalType(38, 6))).cast(DoubleType)
  private def detSumDec(term: Column): Column =
    sum(round(term, 12).cast(DecimalType(38, 14))).cast(DoubleType)
  private def exactVarSampDec(c: Column): Column = {
    val s  = exactSumDec(c)
    val ss = exactSumDec(c * c)
    val n  = count(c)
    (ss - s * s / n) / (n - lit(1))
  }
  private def exactCorrDec(x: Column, y: Column): Column = {
    val n   = count(x).cast(DoubleType)
    val sx  = exactSumDec(x);       val sy  = exactSumDec(y)
    val sxx = exactSumDec(x * x);   val syy = exactSumDec(y * y)
    val sxy = exactSumDec(x * y)
    (n * sxy - sx * sy) /
      (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
  }

  private def assertBitEqual(rows: Array[org.apache.spark.sql.Row]): Unit = {
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val f = if (r.isNullAt(1)) null else java.lang.Double.valueOf(r.getDouble(1))
      val d = if (r.isNullAt(2)) null else java.lang.Double.valueOf(r.getDouble(2))
      assert(f == d || (f != null && d != null &&
               java.lang.Double.doubleToRawLongBits(f) ==
               java.lang.Double.doubleToRawLongBits(d)),
        s"group ${r.get(0)}: fast=$f dec=$d")
    }
  }

  private def compareExact(vals: Seq[java.lang.Double], groups: Int = 1): Unit = {
    val df = vals.zipWithIndex.map { case (v, i) => (i % groups, v) }.toDF("g", "t")
    assertBitEqual(df.groupBy(col("g"))
      .agg(Tables.exactSumFast(col("t")).as("fast"), exactSumDec(col("t")).as("dec"))
      .collect())
  }

  test("random magnitudes up to the 2.25e9 envelope match bit-for-bit") {
    val rnd = new scala.util.Random(17)
    // 1e-8 (below the scale-6 grid) through ~2.2e9 (just inside), both signs
    val vals: Seq[java.lang.Double] = (1 to 4000).map { _ =>
      val mag = math.pow(10.0, rnd.nextDouble() * 17 - 8)
      java.lang.Double.valueOf(
        (if (rnd.nextBoolean()) 1 else -1) * math.min(mag, 2.2e9) * rnd.nextDouble())
    }
    compareExact(vals, groups = 7)
  }

  test("half-up ties at the 7th decimal round identically") {
    val vals: Seq[java.lang.Double] = Seq(
      0.0000005, -0.0000015, 1.0000025, -1.0000035,
      12345.6789995, -12345.6789985, 0.9999995, -0.9999995,
      2251799813.6852485, -2251799813.6852475)
      .map(java.lang.Double.valueOf)
    compareExact(vals)
  }

  test("nulls skip, all-null groups stay null") {
    val vals: Seq[java.lang.Double] = Seq[java.lang.Double](
      java.lang.Double.valueOf(1.25), null,
      java.lang.Double.valueOf(-2.5), null)
    compareExact(vals)
    val df = Seq[(Int, java.lang.Double)]((0, null), (0, null)).toDF("g", "t")
    val r = df.groupBy(col("g"))
      .agg(Tables.exactSumFast(col("t")).as("fast"), exactSumDec(col("t")).as("dec"))
      .collect().head
    assert(r.isNullAt(1) && r.isNullAt(2))
  }

  test("NaN and ±Inf are skipped like the decimal cast") {
    // non-finite terms land 0 (additive identity) = the decimal path's
    // NULL-skip whenever the group holds a finite term — the audited
    // call sites' case. (An ALL-non-finite group yields 0 where decimal
    // yields NULL: documented deviation, same as detSumFast.)
    val vals: Seq[java.lang.Double] = Seq(
      1.5, Double.NaN, Double.PositiveInfinity, -0.25,
      Double.NegativeInfinity, 3.75).map(java.lang.Double.valueOf)
    compareExact(vals)
  }

  test("detSumFast: ±Inf now skips like the decimal path (ADVICE r16)") {
    // branch-free guard: non-finite terms land 0 (additive identity) —
    // same sum as the decimal NULL-skip whenever the group has a finite
    // term (an ALL-non-finite group yields 0 vs decimal NULL: the
    // documented deviation, unreachable at the audited sites)
    val df = Seq((0, 1.5), (0, Double.PositiveInfinity), (0, -0.25),
        (0, Double.NegativeInfinity), (0, Double.NaN))
      .toDF("g", "t")
    val r = df.groupBy(col("g"))
      .agg(Tables.detSumFast(col("t")).as("fast"), detSumDec(col("t")).as("dec"))
      .collect().head
    assertBitEqual(Array(r))
  }

  test("mixed-moment variance/corr on money-scale columns match the decimal twins") {
    val rnd = new scala.util.Random(99)
    val df = (1 to 3000).map { i =>
      val x = 1.0 + rnd.nextInt(50).toDouble
      val y = 900.0 + rnd.nextDouble() * 113000.0 // y² ≈ 1.3e10 > envelope
      (i, x, y)
    }.toDF("id", "x", "y")
    val r = df.agg(
      Tables.exactCorrFast(col("x"), col("y"), yyFast = false).as("cf"),
      exactCorrDec(col("x"), col("y")).as("cd"),
      Tables.exactVarSampFast(col("y"), sqFast = false).as("vf"),
      exactVarSampDec(col("y")).as("vd"),
      Tables.exactCovarSampFast(col("x"), col("y")).as("sf"),
      Tables.exactCovarSamp(col("x"), col("y")).as("sd"),
      Tables.exactMeanFast(col("y")).as("mf"),
      Tables.exactMean(col("y")).as("md"),
      Tables.exactVarSampFast(col("x")).as("xf"),
      exactVarSampDec(col("x")).as("xd")).collect().head
    Seq((0, 1), (2, 3), (4, 5), (6, 7), (8, 9)).foreach { case (a, b) =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(a)) ==
             java.lang.Double.doubleToRawLongBits(r.getDouble(b)),
        s"cols $a/$b: ${r.getDouble(a)} vs ${r.getDouble(b)}")
    }
  }
}
