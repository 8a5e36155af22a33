package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable

/** `.xlsx` reader (reference Orange/data/io.py:246-388 ExcelReader):
  * cells are extracted as strings and funneled through the SAME header
  * pipeline as the `.tab` reader (3-row header / prefixed / plain —
  * io_base.py:400-502), exactly as the reference routes Excel cells into
  * its common `data_table` parser. Excel error cells ("#VALUE!" etc.,
  * io.py:275) become empty; blank rows are dropped.
  *
  * Implementation is dependency-free: java.util.zip for the OPC
  * container and JDK StAX for the sheet/sharedStrings XML. The parse is
  * driver-side by design — xlsx is Orange's small-data interchange
  * format (a single workbook, not a splittable container); parquet is
  * the engine's scale format. The resulting body still becomes a normal
  * distributed DataFrame.
  */
object ExcelReader {

  private val Errors = Set("#VALUE!", "#DIV/0!", "#REF!", "#NUM!",
    "#NULL!", "#NAME?", "#N/A")

  /** Sheet names in workbook order. */
  def sheets(path: String): Seq[String] = {
    val zip = new java.util.zip.ZipFile(path)
    try workbookSheets(zip).map(_._1)
    finally zip.close()
  }

  /** String grid of the given (or first) sheet; error cells → "",
    * all-empty rows dropped (io.py:299-310). */
  def cells(path: String, sheet: Option[String] = None): Seq[Seq[String]] = {
    val zip = new java.util.zip.ZipFile(path)
    try {
      val sheetList = workbookSheets(zip)
      require(sheetList.nonEmpty, s"no sheets in $path")
      val (_, target) = sheet match {
        case Some(s) => sheetList.find(_._1 == s)
          .getOrElse(throw new IllegalArgumentException(s"no sheet '$s'"))
        case None => sheetList.head
      }
      val shared = sharedStrings(zip)
      val rows = parseSheet(zip, target, shared)
      if (rows.isEmpty) return Seq.empty
      val width = rows.map(_.size).max
      rows.map(_.padTo(width, "")).filter(_.exists(_.nonEmpty))
    } finally zip.close()
  }

  /** Read a workbook into a typed DataFrame using the .tab header
    * conventions (3-row type/role header supported, like the
    * reference's OPTIONAL_TYPE_ANNOTATIONS). */
  def read(spark: SparkSession, path: String,
           sheet: Option[String] = None): DataFrame = {
    val grid = cells(path, sheet)
    require(grid.nonEmpty, s"empty spreadsheet: $path")
    // funnel through the .tab pipeline — single source of truth for
    // header classification and typing (cells with tabs are blanked to
    // spaces, as in TSV interchange)
    val tmp = java.io.File.createTempFile("graft_xlsx_", ".tab")
    tmp.deleteOnExit()
    val w = new java.io.PrintWriter(tmp, "UTF-8")
    try grid.foreach(r =>
      w.println(r.map(_.replace("\t", " ").replace("\n", " ")).mkString("\t")))
    finally w.close()
    TabReader.read(spark, tmp.getAbsolutePath)
  }

  // --- OPC plumbing ------------------------------------------------------

  private def open(zip: java.util.zip.ZipFile, name: String)
      : Option[java.io.InputStream] =
    Option(zip.getEntry(name)).map(zip.getInputStream)

  private def stax(in: java.io.InputStream) = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    f.createXMLStreamReader(in)
  }

  /** (sheet name, worksheet zip path) in workbook order, resolving the
    * relationship ids from xl/_rels/workbook.xml.rels. */
  private def workbookSheets(zip: java.util.zip.ZipFile)
      : Seq[(String, String)] = {
    val rels = mutable.Map.empty[String, String]
    open(zip, "xl/_rels/workbook.xml.rels").foreach { in =>
      val r = stax(in)
      try while (r.hasNext) {
        if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "Relationship") {
          val id = r.getAttributeValue(null, "Id")
          val tgt = r.getAttributeValue(null, "Target")
          if (id != null && tgt != null)
            rels(id) = if (tgt.startsWith("/")) tgt.drop(1)
                       else if (tgt.startsWith("xl/")) tgt
                       else "xl/" + tgt
        }
      } finally r.close()
    }
    val out = mutable.ArrayBuffer.empty[(String, String)]
    open(zip, "xl/workbook.xml").foreach { in =>
      val r = stax(in)
      try while (r.hasNext) {
        if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "sheet") {
          val name = r.getAttributeValue(null, "name")
          val rid = (0 until r.getAttributeCount)
            .find(i => r.getAttributeLocalName(i) == "id")
            .map(r.getAttributeValue)
          rid.flatMap(rels.get).foreach(t => out += ((name, t)))
        }
      } finally r.close()
    }
    out.toSeq
  }

  /** The shared-string table (each <si> = concatenated <t> runs). */
  private def sharedStrings(zip: java.util.zip.ZipFile): IndexedSeq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    open(zip, "xl/sharedStrings.xml").foreach { in =>
      val r = stax(in)
      val sb = new StringBuilder
      var inT = false
      try while (r.hasNext) r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => sb.clear()
            case "t"  => inT = true
            case _    =>
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS if inT =>
          sb.append(r.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "si" => out += sb.toString
            case "t"  => inT = false
            case _    =>
          }
        case _ =>
      } finally r.close()
    }
    out.toIndexedSeq
  }

  /** "B3" → 0-based column index 1. */
  private def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((a, ch) =>
      a * 26 + (ch.toUpper - 'A' + 1)) - 1

  /** Parse one worksheet into rows of cell strings (sparse cells filled
    * with ""). Cell types per ECMA-376: s=shared, str=formula string,
    * inlineStr, b=boolean, e=error, default=number (raw decimal text,
    * which the typing pass casts — no float round-trip). */
  private def parseSheet(zip: java.util.zip.ZipFile, target: String,
                         shared: IndexedSeq[String]): Seq[Seq[String]] = {
    val in = open(zip, target).getOrElse(
      throw new IllegalArgumentException(s"missing $target"))
    val r = stax(in)
    val rows = mutable.ArrayBuffer.empty[Seq[String]]
    val cur = mutable.ArrayBuffer.empty[String]
    var cellType = ""
    var cellCol = -1
    var inV = false
    var inIs = false
    val v = new StringBuilder
    def flushCell(): Unit = if (cellCol >= 0) {
      while (cur.size <= cellCol) cur += ""
      val raw = v.toString
      cur(cellCol) = cellType match {
        case "s" => raw.trim.toIntOption.flatMap(shared.lift).getOrElse("")
        case "b" => if (raw.trim == "1") "True" else "False"
        case "e" => ""
        case _   => if (Errors.contains(raw)) "" else raw
      }
      cellCol = -1; v.clear()
    }
    try {
      while (r.hasNext) r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => cur.clear()
            case "c" =>
              val ref = r.getAttributeValue(null, "r")
              cellCol = if (ref != null) colIndex(ref) else cur.size
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
              v.clear()
            case "v" => inV = true
            case "is" => inIs = true
            case "t" if inIs => inV = true
            case _ =>
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS if inV =>
          v.append(r.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "row" => rows += cur.toSeq
            case "c"   => flushCell()
            case "v"   => inV = false
            case "is"  => inIs = false
            case "t" if inIs => inV = false
            case _ =>
          }
        case _ =>
      }
    } finally { r.close(); in.close() }
    rows.toSeq
  }
}
