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
    import org.apache.spark.sql.functions._
    val cols = df.columns.toSet
    // .dst is a single-file interchange format; the matrix body STREAMS
    // through toLocalIterator over a range-partitioned (row, col) sort,
    // so driver memory is O(n + one partition of cells), never the n²
    // boxed-Row collect a 16 g driver cannot afford at this cap (the
    // earlier form's limit(n²+1).collect() admitted ~60-80 GB of Rows
    // at n = 20000 — the cap reasoned in raw doubles). n stays bounded
    // because the written FILE is still an n×n dense text matrix a
    // widget-sized format has no business exceeding (distmatrix.py).
    require(n <= 20000,
      s"DistMatrixIO.writeDst: n=$n exceeds the 20000-row cap for " +
        ".dst export; persist large distance sets as long-format " +
        "parquet instead")
    // canonicalize each cell to its WRITTEN position: symmetric files
    // store the lower triangle, and the engine's pairwise queries emit
    // i < j, so mirror to (max, min); duplicate sources for one target
    // cell resolve deterministically to the smallest original (i, j)
    val li = if (symmetric) greatest(col("i"), col("j")) else col("i")
    val lj = if (symmetric) least(col("i"), col("j")) else col("j")
    val cells = df
      .select(li.cast("int").as("li"), lj.cast("int").as("lj"),
        struct(col("i").cast("int").as("i"), col("j").cast("int").as("j"),
          col("d").cast("double").as("d")).as("c"))
      .groupBy(col("li"), col("lj"))
      .agg(min(col("c")).as("c"))
      .select(col("li"), col("lj"), col("c.d").as("d"))
    // labels: O(n) driver arrays from two tiny keyed aggregations
    def labels(idx: String, lab: String): Array[String] = {
      val out = Array.fill[String](n)(null)
      if (cols(lab)) df.filter(col(lab).isNotNull)
        .groupBy(col(idx).cast("int").as("k"))
        .agg(min(col(lab)).as("l"))
        .collect().foreach { r =>
          val k = r.getInt(0)
          require(k >= 0 && k < n, s"label index $k outside ${n}x$n matrix")
          out(k) = r.getString(1)
        }
      out
    }
    val rowLabels = labels("i", "row_label")
    val colLabels = labels("j", "col_label")
    val hasRow = rowLabels.exists(_ != null)
    val hasCol = colLabels.exists(_ != null)
    // global (li, lj) order with bounded partitions: toLocalIterator
    // pulls ONE partition at a time, so ≤ ~1M cells are ever resident
    val nParts = math.max(1, math.min(2048,
      (n.toLong * n / 1000000L).toInt + 1))
    val it = cells
      .repartitionByRange(nParts, col("li"), col("lj"))
      .sortWithinPartitions(col("li"), col("lj"))
      .toLocalIterator()
    val w = Files.newBufferedWriter(Paths.get(path), StandardCharsets.UTF_8)
    try {
      w.write(n.toString)
      if (!symmetric) w.write("\tasymmetric")
      if (hasRow) w.write("\trow_labels")
      if (hasCol) w.write("\tcol_labels")
      w.write("\n")
      if (hasCol) w.write(colLabels.map(l => if (l == null) "" else l)
        .mkString("", "\t", "\n"))
      var cur: Row = if (it.hasNext) it.next() else null
      (0 until n).foreach { i =>
        val width = if (symmetric) i + 1 else n
        val line = Array.fill[Double](width)(0.0)
        while (cur != null && cur.getInt(0) == i) {
          val j = cur.getInt(1)
          require(j >= 0 && j < width && i < n,
            s"cell ($i,$j) outside the written ${n}x$n ${
              if (symmetric) "lower triangle" else "matrix"}")
          line(j) = cur.getDouble(2)
          cur = if (it.hasNext) it.next() else null
        }
        require(cur == null || cur.getInt(0) > i,
          s"cell (${cur.getInt(0)},${cur.getInt(1)}) outside ${n}x$n matrix")
        val prefix = if (hasRow) {
          (if (rowLabels(i) == null) "" else rowLabels(i)) +
            (if (width > 0) "\t" else "")
        } else ""
        w.write(prefix)
        w.write(line.map(fmt).mkString("\t"))
        w.write("\n")
      }
      require(cur == null,
        s"cell (${if (cur != null) cur.getInt(0) else -1},_) outside " +
          s"${n}x$n matrix")
    } finally w.close()
  }

  /** Integral doubles print without the trailing .0 (the reference saves
    * via `"\t".join(map(str, ...))` on Python floats; we keep files
    * round-trippable rather than byte-identical to CPython repr). */
  private def fmt(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
    else d.toString
}
