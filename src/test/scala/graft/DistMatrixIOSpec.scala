package graft

import org.apache.spark.sql.functions._
import graft.sources.{DistMatrixIO, Sources}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** .dst distance-matrix file semantics (reference misc/distmatrix.py:
  * _from_dst/save): header flags, lower-triangle symmetric storage,
  * zero padding, row/col labels, round-trip. */
class DistMatrixIOSpec extends SparkSpec {

  private def write(body: String): String = {
    val f = Files.createTempFile("graft_dst_", ".dst")
    Files.write(f, body.getBytes(StandardCharsets.UTF_8))
    f.toString
  }

  test("symmetric lower triangle expands to both triangles, zero-padded") {
    // distmatrix.py:241 doc example shape: dimension, then lower triangle
    val p = write("3 symmetric\n\n1\n2\t3\n")
    val df = DistMatrixIO.readDst(spark, p)
    assert(df.count() == 9)
    def at(i: Int, j: Int): Double =
      df.filter(col("i") === i && col("j") === j).head().getDouble(2)
    assert(at(0, 0) == 0.0 && at(1, 0) == 1.0 && at(0, 1) == 1.0)
    assert(at(2, 0) == 2.0 && at(0, 2) == 2.0 && at(2, 1) == 3.0)
    assert(at(2, 2) == 0.0) // padded
  }

  test("asymmetric with row and col labels") {
    val p = write(
      "2\tasymmetric\trow_labels\tcol_labels\n" +
        "cx\tcy\n" +
        "ra\t1\t2\n" +
        "rb\t3\t4\n")
    val df = DistMatrixIO.readDst(spark, p)
    val r = df.filter(col("i") === 0 && col("j") === 1).head()
    assert(r.getDouble(2) == 2.0)
    assert(r.getString(3) == "ra" && r.getString(4) == "cy")
    // asymmetric: (1,0) keeps its own value
    assert(df.filter(col("i") === 1 && col("j") === 0)
      .head().getDouble(2) == 3.0)
  }

  test("obsolete 'labelled' alias and axis flag parse; bad flag rejected") {
    val p = write("1\tlabelled\taxis=0\nrowx\t5\n")
    val df = DistMatrixIO.readDst(spark, p)
    assert(df.head().getString(3) == "rowx")
    val bad = write("1\tbogus\n0\n")
    intercept[IllegalArgumentException](DistMatrixIO.readDst(spark, bad))
  }

  test("symmetric write from upper-triangle-only input keeps all values") {
    import spark.implicits._
    // the engine's pairwise queries emit only i < j — the writer must
    // mirror into the stored lower triangle, not silently write zeros
    val upper = Seq((0, 1, 2.5), (0, 2, 4.0), (1, 2, 1.5))
      .toDF("i", "j", "d")
    val f = Files.createTempFile("graft_dst_ut_", ".dst").toString
    DistMatrixIO.writeDst(upper, 3, f, symmetric = true)
    val back = DistMatrixIO.readDst(spark, f)
    def at(i: Int, j: Int): Double =
      back.filter(col("i") === i && col("j") === j).head().getDouble(2)
    assert(at(1, 0) == 2.5 && at(0, 1) == 2.5)
    assert(at(2, 0) == 4.0 && at(2, 1) == 1.5)
  }

  test("writeDst rejects n over the cap and out-of-range cells") {
    import spark.implicits._
    val tiny = Seq((0, 1, 1.0)).toDF("i", "j", "d")
    // driver-materialized single-file export: the n cap must hold
    val e1 = intercept[IllegalArgumentException](
      DistMatrixIO.writeDst(tiny, 20001, "/tmp/graft_dst_never.dst"))
    assert(e1.getMessage.contains("20000"))
    // a cell outside the declared matrix must fail loudly, not write a
    // truncated file
    val oob = Seq((0, 1, 1.0), (5, 1, 2.0)).toDF("i", "j", "d")
    val f = Files.createTempFile("graft_dst_oob_", ".dst").toString
    intercept[IllegalArgumentException](
      DistMatrixIO.writeDst(oob, 3, f, symmetric = true))
    val neg = Seq((-1, 1, 1.0)).toDF("i", "j", "d")
    intercept[IllegalArgumentException](
      DistMatrixIO.writeDst(neg, 3, f, symmetric = true))
  }

  test("writeDst streams a larger matrix without collecting it") {
    import spark.implicits._
    // n = 300 (90k cells — would already be uncomfortable as boxed Rows
    // at the old cap's density): upper-triangle input, round-trip exact
    val n = 300
    val upper = spark.range(n.toLong * n).select(
      (col("id") / n).cast("int").as("i"),
      pmod(col("id"), lit(n)).cast("int").as("j"),
      ((col("id") % 7) + 1).cast("double").as("d"))
      .filter(col("i") < col("j"))
    val f = Files.createTempFile("graft_dst_big_", ".dst").toString
    DistMatrixIO.writeDst(upper, n, f, symmetric = true)
    val back = DistMatrixIO.readDst(spark, f)
    assert(back.count() == n.toLong * n)
    val mism = back.as("b")
      .join(upper.as("u"), Seq("i", "j"))
      .filter(col("b.d") =!= col("u.d")).count()
    assert(mism == 0)
  }

  test("write → read round-trips values and labels (symmetric)") {
    import spark.implicits._
    val long = (for (i <- 0 until 3; j <- 0 until 3) yield
      (i, j, math.abs(i - j) * 1.5, s"r$i", s"c$j"))
      .toDF("i", "j", "d", "row_label", "col_label")
    val f = Files.createTempFile("graft_dst_rt_", ".dst").toString
    DistMatrixIO.writeDst(long, 3, f, symmetric = true)
    val back = Sources.fromFile(spark, f) // .dst dispatch
    assert(back.count() == 9)
    val diffs = back.alias("b").join(long.alias("l"), Seq("i", "j"))
      .filter(col("b.d") =!= col("l.d"))
      .count()
    assert(diffs == 0)
    assert(back.filter(col("i") === 2 && col("j") === 1)
      .head().getString(3) == "r2")
  }
}
