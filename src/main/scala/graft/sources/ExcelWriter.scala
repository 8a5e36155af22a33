package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{DoubleType, FloatType, IntegerType, LongType, ShortType, ByteType, DecimalType}

/** `.xlsx` writer (reference Orange/data/io.py:246-388 ExcelReader's
  * write side via openpyxl). Dependency-free: the OPC container is a
  * plain zip (java.util.zip), the single worksheet uses inline strings
  * (no sharedStrings part) and raw decimal text for numeric cells — the
  * exact shapes [[ExcelReader]] parses back, so write→read round-trips.
  *
  * Driver-side by design, like the reader: xlsx is Orange's small-data
  * interchange format (one workbook, not a splittable container);
  * parquet is the engine's scale format. A header row of column names is
  * emitted first, matching the reference's writer.
  */
object ExcelWriter {

  private def colRef(i: Int): String = {
    var n = i + 1; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"; case '<' => "&lt;"; case '>' => "&gt;"
      case '"' => "&quot;"; case c => c.toString
    }

  def write(df: DataFrame, path: String, sheetName: String = "Sheet1"): Unit = {
    val schema = df.schema
    val numeric = schema.fields.map(_.dataType match {
      case DoubleType | FloatType | IntegerType | LongType | ShortType |
           ByteType | _: DecimalType => true
      case _ => false
    })
    // Single-file .xlsx export is inherently driver-materialized; bound it
    // so pointing this at a fact table fails loudly instead of OOMing the
    // driver. 1,048,575 data rows (+1 header) is the xlsx format's own
    // per-sheet row limit, so anything larger could not round-trip anyway.
    val maxRows = 1048575
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"ExcelWriter.write: input exceeds $maxRows rows (the xlsx per-sheet " +
        "limit and this writer's driver-memory cap); aggregate or sample " +
        "before exporting, or use a distributed sink (parquet/csv)")

    val sheet = new StringBuilder
    sheet.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    sheet.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    def cell(ref: String, value: Any, isNum: Boolean): String = value match {
      case null => ""
      case v if isNum => s"""<c r="$ref"><v>$v</v></c>"""
      case v => s"""<c r="$ref" t="inlineStr"><is><t>${xmlEscape(v.toString)}</t></is></c>"""
    }
    sheet.append("<row r=\"1\">")
    schema.fieldNames.zipWithIndex.foreach { case (n, i) =>
      sheet.append(cell(s"${colRef(i)}1", n, isNum = false))
    }
    sheet.append("</row>")
    rows.zipWithIndex.foreach { case (row, ri) =>
      sheet.append(s"""<row r="${ri + 2}">""")
      schema.fields.indices.foreach { i =>
        sheet.append(cell(s"${colRef(i)}${ri + 2}", row.get(i), numeric(i)))
      }
      sheet.append("</row>")
    }
    sheet.append("</sheetData></worksheet>")

    val workbook =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |<sheets><sheet name="${xmlEscape(sheetName)}" sheetId="1" r:id="rId1"/></sheets>
         |</workbook>""".stripMargin
    val wbRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |</Types>""".stripMargin

    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(path))
    try {
      def entry(name: String, content: String): Unit = {
        zos.putNextEntry(new java.util.zip.ZipEntry(name))
        zos.write(content.getBytes("UTF-8"))
        zos.closeEntry()
      }
      entry("[Content_Types].xml", contentTypes)
      entry("_rels/.rels", rootRels)
      entry("xl/workbook.xml", workbook)
      entry("xl/_rels/workbook.xml.rels", wbRels)
      entry("xl/worksheets/sheet1.xml", sheet.toString)
    } finally zos.close()
  }
}
