package graft

import org.apache.spark.sql.functions._
import graft.sources.TabReader

/** Pins the r16 gated timeProbe (structural pre-checks before each
  * try_to_timestamp) as semantically identical to the ungated
  * first-match probe chain: a gate may only skip parses that were
  * guaranteed to fail, so the chosen format — and hence the parsed
  * epoch — must never change. */
class TimeProbeSpec extends SparkSpec {
  import spark.implicits._

  private def ungated(c: org.apache.spark.sql.Column, locale: Boolean) = {
    val fmts = TabReader.TimeFormats ++
      (if (locale) TabReader.LocaleTimeFormats else Nil)
    coalesce(fmts.map(f => try_to_timestamp(c, lit(f))): _*)
  }

  private val samples = Seq(
    // one of each rendered family the benched query emits
    "1992-03-04 05:06:07", "1992-03-04T05:06:07", "1992-03-04",
    "19920304050607", "19920304", "1992-064", "05:06:07",
    "1992-03-04 05:06:07.123456+0100",
    // short fractions: Spark parses S-runs flexibly (1-9 digits)
    "1992-03-04 05:06:07.5", "1992-03-04T05:06:07.12",
    "1992-03-04 05:06:07.5+0100", "05:06:07.1", "050607.12",
    // other formats in the chain
    "1992-03-04 05:06", "1992-03-04 05:06:07+0100",
    "1992-03-04T05:06:07+0100", "1992-03-04 05:06:07.123456",
    "1992-03-04T05:06:07.123456", "19920304T050607+0100",
    "19920304050607+0100", "05:06:07.123456", "05:06",
    "19920304T050607", "1992064", "1992", "050607.123456", "1992-03",
    // adversarial near-misses: wrong separators, wrong widths, junk
    "1992-3-4 05:06:07", "12345-01-02 03:04:05", " 1992-03-04",
    "1992-03-04 ", "1992:03:04", "199203", "", "abc",
    "1992-03-04X05:06:07", "1992-03-04 05-06-07",
    "9992-13-44 99:99:99", // gate passes, parse fails — must stay NULL
    null)

  test("gated probe chain picks the same format/epoch as ungated") {
    for (locale <- Seq(false, true)) {
      val df = samples.toDF("s").select(
        col("s"),
        TabReader.timeProbe(col("s"), locale).cast("double").as("gated"),
        ungated(col("s"), locale).cast("double").as("plain"))
      val bad = df.filter(!(col("gated") <=> col("plain"))).collect()
      assert(bad.isEmpty, s"locale=$locale diverged: ${bad.mkString(", ")}")
    }
  }

  test("'+'-prefixed 5+-digit years are a documented non-goal of the gates") {
    // java.time's strict parser (SignStyle.EXCEEDS_PAD) would accept a
    // '+'-signed year of 5+ digits in the UNGATED chain, but the length
    // gate pins yyyy to exactly 4 chars and rejects it (ADVICE r16).
    // The fixture generators never emit signed years; pin the gated
    // choice so the divergence stays deliberate.
    for (locale <- Seq(false, true)) {
      val r = Seq("+12345-01-02 03:04:05").toDF("s")
        .select(TabReader.timeProbe(col("s"), locale).as("gated"))
        .collect().head
      assert(r.isNullAt(0), s"locale=$locale: gate unexpectedly widened")
    }
  }

  test("gates are derivable exactly for every fixed-width TimeFormat") {
    // every non-locale format is fixed-width → a gate must exist
    TabReader.TimeFormats.foreach { f =>
      assert(TabReader.probeGate(col("s"), f).isDefined, f)
    }
    // variable-width locale patterns stay ungated
    assert(TabReader.probeGate(col("s"), "d.M.yyyy").isEmpty)
    assert(TabReader.probeGate(col("s"), "d. M. yy H:mm").isEmpty)
  }
}
