package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Orange distance-matrix file format (.dst) — reference
  * Orange/misc/distmatrix.py:115-239 (`DistMatrix.from_file` /
  * `_from_dst`) and `save` (distmatrix.py:332-378).
  *
  * Header line: `<n> [axis=<k>] [symmetric|asymmetric] [row_labels]
  * [col_labels]` (plus the obsolete `labelled`/`labeled` aliases).
  * Optional column-label line, then tab-separated rows, each optionally
  * prefixed with its row label. Symmetric files store the lower
  * triangle; short rows are zero-padded; anything above the diagonal of
  * a symmetric file is ignored.
  *
  * Spark representation: the engine's native distance shape is the LONG
  * format `(i, j, d [, row_label, col_label])` that every §2.9 pairwise
  * query emits — an n×n dense matrix literal is a driver-side artifact
  * in the reference too (np.ndarray), so parsing is driver-side and the
  * result becomes a DataFrame; at scale distances never materialize as
  * .dst files, they stay as long-format parquet. */
object DistMatrixIO {

  private val schema = StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("d", DoubleType, nullable = false),
    StructField("row_label", StringType, nullable = true),
    StructField("col_label", StringType, nullable = true)))

  /** Parse a .dst file into long format: one row per (i, j) cell with
    * 0-based indexes; symmetric files are expanded to both triangles
    * exactly as `_from_dst` fills `matrix[j, i] = matrix[i, j]`. */
  def readDst(spark: SparkSession, path: String): DataFrame = {
    val lines = Files.readAllLines(Paths.get(path), StandardCharsets.UTF_8)
      .asScala.toVector
    require(lines.nonEmpty, "empty file")
    val head = lines.head.trim.split("\\s+").toVector
    require(head.nonEmpty && head.head.forall(_.isDigit),
      "distance file must begin with dimension")
    val n = head.head.toInt
    var symmetric = true
    var axis = 1
    var rowLab = false
    var colLab = false
    head.tail.foreach {
      case "labelled" | "labeled" | "row_labels" => rowLab = true
      case "col_labels" => colLab = true
      case "symmetric" => symmetric = true
      case "asymmetric" => symmetric = false
      case f if f.startsWith("axis=") && f.drop(5).forall(_.isDigit) =>
        axis = f.drop(5).toInt
      case f => throw new IllegalArgumentException(s"invalid flag '$f'")
    }
    var body = lines.tail
    val colLabels: Option[Vector[String]] = if (colLab) {
      val ls = body.head.trim.split("\t").map(_.trim).toVector
      require(ls.length == n,
        s"mismatching number of column labels, ${ls.length} != $n")
      body = body.tail
      Some(ls)
    } else None

    val m = Array.ofDim[Double](n, n)
    val rowLabels = Vector.newBuilder[String]
    // A blank line IS a row (all values zero-padded — row 0 of a
    // symmetric matrix has no sub-diagonal cells); only trailing blank
    // lines are ignorable.
    val dataRows = body.reverse.dropWhile(_.trim.isEmpty).reverse
    require(dataRows.length <= n, "too many rows")
    dataRows.zipWithIndex.foreach { case (line, i) =>
      val raw = line.trim
      var cells =
        if (raw.isEmpty) Vector.empty[String] else raw.split("\t").toVector
      if (rowLab) {
        rowLabels += (if (cells.isEmpty) "" else cells.head.trim)
        cells = if (cells.isEmpty) cells else cells.tail
      }
      require(cells.length <= n, s"too many columns in matrix row ${i + 1}")
      val upTo = math.min(cells.length, if (symmetric) i + 1 else n)
      (0 until upTo).foreach { j =>
        m(i)(j) = cells(j).trim.toDouble
        if (symmetric) m(j)(i) = m(i)(j)
      }
    }
    val rls = rowLabels.result()
    val rows = for (i <- 0 until n; j <- 0 until n) yield Row(
      i, j, m(i)(j),
      if (rowLab && i < rls.length) rls(i) else null,
      colLabels.map(_(j)).orNull)
    spark.createDataFrame(rows.asJava, schema)
  }

  /** Write long-format distances `(i, j, d [, row_label, col_label])`
    * back to .dst (distmatrix.py save: lower triangle for symmetric
    * matrices, labels flagged in the header). `n` cells absent from the
    * input write as 0, mirroring the reference's zero-padding. */
  def writeDst(df: DataFrame, n: Int, path: String,
               symmetric: Boolean = true): Unit = {
    val cols = df.columns.toSet
    // .dst is a single-file interchange format materialized on the driver
    // (an n×n dense text matrix); bound n so a user pointing this at a
    // fact-table-sized distance set fails loudly instead of OOMing the
    // driver. 20000² doubles ≈ 3.2 GB — already generous for a format the
    // reference uses for widget-sized matrices (distmatrix.py).
    require(n <= 20000,
      s"DistMatrixIO.writeDst: n=$n exceeds the 20000-row cap for " +
        "driver-materialized .dst export; persist large distance sets as " +
        "long-format parquet instead")
    val rows = df.limit(n * n + 1).collect()
    require(rows.length <= n * n,
      s"writeDst: input has more rows than the ${n}x$n matrix has cells")
    val m = Array.ofDim[Double](n, n)
    val rowLabels = Array.fill[String](n)(null)
    val colLabels = Array.fill[String](n)(null)
    rows.foreach { r =>
      val i = r.getAs[Number]("i").intValue()
      val j = r.getAs[Number]("j").intValue()
      require(i >= 0 && i < n && j >= 0 && j < n,
        s"cell ($i,$j) outside ${n}x$n matrix")
      m(i)(j) = r.getAs[Number]("d").doubleValue()
      // mirror so upper-triangle-only inputs (the engine's pairwise
      // queries emit i < j) still fill the written lower triangle
      if (symmetric) m(j)(i) = m(i)(j)
      if (cols("row_label") && !r.isNullAt(r.fieldIndex("row_label")))
        rowLabels(i) = r.getAs[String]("row_label")
      if (cols("col_label") && !r.isNullAt(r.fieldIndex("col_label")))
        colLabels(j) = r.getAs[String]("col_label")
    }
    val hasRow = rowLabels.exists(_ != null)
    val hasCol = colLabels.exists(_ != null)
    val sb = new StringBuilder
    sb.append(n)
    if (!symmetric) sb.append("\tasymmetric")
    if (hasRow) sb.append("\trow_labels")
    if (hasCol) sb.append("\tcol_labels")
    sb.append('\n')
    if (hasCol) sb.append(colLabels.map(l => if (l == null) "" else l)
      .mkString("", "\t", "\n"))
    (0 until n).foreach { i =>
      val cells = (0 until (if (symmetric) i + 1 else n)).map(j => fmt(m(i)(j)))
      val prefix = if (hasRow) {
        (if (rowLabels(i) == null) "" else rowLabels(i)) +
          (if (cells.nonEmpty) "\t" else "")
      } else ""
      sb.append(prefix).append(cells.mkString("\t")).append('\n')
    }
    Files.write(Paths.get(path), sb.toString.getBytes(StandardCharsets.UTF_8))
  }

  /** Integral doubles print without the trailing .0 (the reference saves
    * via `"\t".join(map(str, ...))` on Python floats; we keep files
    * round-trippable rather than byte-identical to CPython repr). */
  private def fmt(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
    else d.toString
}
