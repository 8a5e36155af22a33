package graft

import org.apache.spark.sql.functions._
import graft.preprocess.PreprocessOps
import graft.preprocess.PreprocessOps.{MultinomialTreatment => MT}

/** DomainContinuizer treatment semantics (continuize.py:11-100). */
class ContinuizeSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, "red", "yes"), (2L, "red", "no"), (3L, "green", "yes"),
    (4L, "blue", "yes"), (5L, "red", "yes")
  ).toDF("id", "color", "flag")
  private val vars = Seq(
    ("color", Seq("blue", "green", "red")), ("flag", Seq("no", "yes")))

  test("FrequentAsBase drops the modus indicator") {
    val out = PreprocessOps.continuize(df, vars, MT.FrequentAsBase)
    // modus(color)=red (3×), modus(flag)=yes (4×)
    assert(out.columns.toSeq ==
      Seq("id", "color=blue", "color=green", "flag=no"))
    val r = out.filter(col("id") === 3).head()
    assert(r.getDouble(1) == 0.0 && r.getDouble(2) == 1.0 &&
      r.getDouble(3) == 0.0)
  }

  test("FirstAsBase skips index 0; Indicators keeps all values") {
    assert(PreprocessOps.continuize(df, vars, MT.FirstAsBase)
      .columns.toSeq == Seq("id", "color=green", "color=red", "flag=yes"))
    assert(PreprocessOps.continuize(df, vars, MT.Indicators)
      .columns.toSeq == Seq("id", "color=blue", "color=green", "color=red",
        "flag=no", "flag=yes"))
  }

  test("Remove / RemoveMultinomial / Leave column sets") {
    assert(PreprocessOps.continuize(df, vars, MT.Remove)
      .columns.toSeq == Seq("id"))
    // color (3 values) dropped; flag (binary) → FirstAsBase indicator
    assert(PreprocessOps.continuize(df, vars, MT.RemoveMultinomial)
      .columns.toSeq == Seq("id", "flag=yes"))
    assert(PreprocessOps.continuize(df, vars, MT.Leave)
      .columns.toSeq == Seq("id", "color", "flag"))
  }

  test("ReportError rejects multinomial variables, accepts binary") {
    intercept[IllegalArgumentException] {
      PreprocessOps.continuize(df, vars, MT.ReportError)
    }
    val ok = PreprocessOps.continuize(
      df, Seq(("flag", Seq("no", "yes"))), MT.ReportError)
    assert(ok.columns.toSeq == Seq("id", "color", "flag=yes"))
  }

  test("AsNormalizedOrdinal: zero-based and centered variants") {
    val zb = PreprocessOps.continuize(df, vars, MT.AsNormalizedOrdinal)
      .filter(col("id") === 3).head()
    assert(zb.getDouble(1) == 0.5 && zb.getDouble(2) == 1.0) // green, yes
    val cc = PreprocessOps.continuize(df, vars, MT.AsNormalizedOrdinal,
      zeroBased = false).filter(col("id") === 3).head()
    // (idx − (n−1)/2)·2/(n−1): green idx1 of 3 → 0; yes idx1 of 2 → 1
    assert(cc.getDouble(1) == 0.0 && cc.getDouble(2) == 1.0)
  }

  test("non-zero-based indicators are −1/1") {
    val out = PreprocessOps.continuize(df, vars, MT.Indicators,
      zeroBased = false).filter(col("id") === 2).head()
    // row 2: red, no → color=blue −1, color=green −1, color=red 1
    assert(out.getDouble(1) == -1.0 && out.getDouble(2) == -1.0 &&
      out.getDouble(3) == 1.0)
  }
}
