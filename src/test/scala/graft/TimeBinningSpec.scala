package graft

import java.time.{LocalDateTime, ZoneOffset}
import graft.preprocess.PreprocessOps

/** time_binnings calendar ladder (discretize.py:523-635). */
class TimeBinningSpec extends SparkSpec {
  import spark.implicits._

  private def epoch(s: String): Long =
    LocalDateTime.parse(s).toEpochSecond(ZoneOffset.UTC)

  test("minute-scale span offers second and minute widths") {
    // 2½ minutes: 5 s → 31 bins … 30 s → 6 bins, 1 min → 3-ish bins
    val cands = PreprocessOps.timeBinnings(
      epoch("2024-03-01T10:00:05"), epoch("2024-03-01T10:02:35"))
    val byLabel = cands.map(c => c._1 -> (c._2.size - 1)).toMap
    assert(byLabel.contains("5 seconds") && byLabel("5 seconds") == 31)
    assert(byLabel.contains("30 seconds") && byLabel("30 seconds") == 6)
    assert(byLabel.contains("1 minute") && byLabel("1 minute") == 3)
    // thresholds snap down to the width grid
    val thirty = cands.find(_._1 == "30 seconds").get._2
    assert(thirty.head == epoch("2024-03-01T10:00:00"))
  }

  test("month-scale span: weeks snap to Monday, labels format") {
    val cands = PreprocessOps.timeBinnings(
      epoch("2024-01-01T00:00:07"), epoch("2024-01-30T23:57:12"))
    val week = cands.find(_._1 == "1 week").get
    // Jan 1 2024 is a Monday: thresholds at Jan 1,8,15,22,29 + Feb 5
    assert(week._2 == Seq("2024-01-01T00:00:00", "2024-01-08T00:00:00",
      "2024-01-15T00:00:00", "2024-01-22T00:00:00", "2024-01-29T00:00:00",
      "2024-02-05T00:00:00").map(epoch))
    assert(week._3.head == "24 Jan 01")
    val twoWeeks = cands.find(_._1 == "2 weeks").get
    assert(twoWeeks._2.size - 1 == 3)
    // months: only 2 points fit (< min_pts 3) → absent
    assert(!cands.exists(_._1.contains("month")))
  }

  test("exact-boundary max still gets a containing bin") {
    // max exactly on a day boundary: day walk must go one past
    val cands = PreprocessOps.timeBinnings(
      epoch("2024-05-01T00:00:00"), epoch("2024-05-05T00:00:00"))
    val day = cands.find(_._1 == "1 day").get
    assert(day._2.last == epoch("2024-05-06T00:00:00"))
    assert(day._2.size - 1 == 5)
  }

  test("niceTimeBinning selects closest-to-n with more-bins tie-break") {
    val df = Seq.tabulate(200)(i =>
      java.sql.Timestamp.valueOf(LocalDateTime.parse("2024-01-01T00:00:07")
        .plusMinutes(i * 215L).toString.replace('T', ' ')))
      .toDF("ts")
    val (label, ts, binned) = PreprocessOps.niceTimeBinning(df, "ts", 4)
    // ~30-day span: candidates 30/5/3 bins → week wins the |4−k| tie
    assert(label == "1 week" && ts.size - 1 == 5)
    assert(binned.select("bin").distinct().count() == 5)
  }

  test("unique-values path: one bin per distinct timestamp") {
    val df = Seq("2024-01-01 00:00:00", "2024-01-02 00:00:00",
      "2024-01-03 00:00:00").map(java.sql.Timestamp.valueOf).toDF("ts")
    val (label, ts, binned) = PreprocessOps.niceTimeBinning(df, "ts", 4)
    assert(label == "unique" && ts.size == 4)
    assert(binned.select("bin").distinct().count() == 3)
  }
}
