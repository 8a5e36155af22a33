package graft

import org.apache.spark.sql.functions._
import graft.ml.Fitter

/** Problem-type dispatch (modelling/base.py Fitter). */
class FitterSpec extends SparkSpec {
  import spark.implicits._

  private def table = Seq(
    (1L, "a", 1.0, 0.1), (2L, "b", 2.0, 0.2), (3L, "a", 3.0, 0.3),
    (4L, "a", 4.0, 0.4), (5L, "b", 5.0, 0.5)
  ).toDF("id", "cls", "y", "x")

  test("problemOf: string target → classification, numeric → regression") {
    val f = Fitter.Constant
    assert(f.problemOf(table, "cls") == Fitter.Classification)
    assert(f.problemOf(table, "y") == Fitter.Regression)
    val withTs = table.withColumn("t", current_timestamp())
    assert(f.problemOf(withTs, "t") == Fitter.Regression)
  }

  test("Constant fitter dispatches to Majority vs MeanRegressor") {
    val cls = Fitter.Constant.fit(table, "cls").predict(table.limit(1))
      .select("prediction").head().getString(0)
    assert(cls == "a") // 3 a vs 2 b
    val reg = Fitter.Constant.fit(table, "y").predict(table.limit(1))
      .select("prediction").head().getDouble(0)
    assert(math.abs(reg - 3.0) < 1e-9)
  }

  test("sgdLinear fitter picks hinge for discrete, squared for continuous") {
    val pm1 = table.withColumn("lbl", when(col("cls") === "a", 1.0)
      .otherwise(-1.0))
    val f = Fitter.sgdLinear(Seq(("x", col("x"))))
    // discrete-kind target (string) → hinge; feed the ±1 encoding via a
    // view named like the label
    val hinge = f.learnerFor(table, "cls")
    assert(hinge != null)
    // continuous target → squared loss; the fitted row carries "mse"
    val reg = f.fit(pm1.withColumnRenamed("y", "target_y"), "target_y")
      .predict(table.limit(1))
    assert(reg.columns.contains("mse"))
  }
}
