package graft

import java.util.zip.{ZipEntry, ZipOutputStream}
import graft.sources.ExcelReader

/** xlsx reading (io.py:246-320 ExcelReader semantics) against a
  * fixture workbook built from raw OPC parts — no Excel libs anywhere. */
class ExcelReaderSpec extends SparkSpec {

  private def buildFixture(): String = {
    val f = java.io.File.createTempFile("graft_fixture_", ".xlsx")
    f.deleteOnExit()
    val z = new ZipOutputStream(new java.io.FileOutputStream(f))
    def put(name: String, content: String): Unit = {
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    put("xl/workbook.xml",
      """<?xml version="1.0"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        |          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets>
        |  <sheet name="data" sheetId="1" r:id="rId1"/>
        |  <sheet name="extra" sheetId="2" r:id="rId2"/>
        |</sheets></workbook>""".stripMargin)
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |  <Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |  <Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
        |</Relationships>""".stripMargin)
    put("xl/sharedStrings.xml",
      """<?xml version="1.0"?>
        |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="9" uniqueCount="9">
        |<si><t>id</t></si><si><t>color</t></si><si><t>score</t></si><si><t>note</t></si>
        |<si><t>c</t></si><si><t>d</t></si><si><t>s</t></si>
        |<si><r><t>re</t></r><r><t>d</t></r></si>
        |<si><t>?</t></si>
        |</sst>""".stripMargin)
    // 3-row header: names / types (c d c s) / roles (- - class meta)
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1">
        |  <c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c>
        |  <c r="C1" t="s"><v>2</v></c><c r="D1" t="s"><v>3</v></c>
        |</row>
        |<row r="2">
        |  <c r="A2" t="s"><v>4</v></c><c r="B2" t="s"><v>5</v></c>
        |  <c r="C2" t="s"><v>4</v></c><c r="D2" t="s"><v>6</v></c>
        |</row>
        |<row r="3">
        |  <c r="C3" t="inlineStr"><is><t>class</t></is></c>
        |  <c r="D3" t="inlineStr"><is><t>meta</t></is></c>
        |</row>
        |<row r="4">
        |  <c r="A4"><v>1</v></c><c r="B4" t="s"><v>7</v></c>
        |  <c r="C4"><v>3.5</v></c><c r="D4" t="inlineStr"><is><t>first note</t></is></c>
        |</row>
        |<row r="5">
        |  <c r="A5"><v>2</v></c><c r="B5" t="str"><v>blue</v></c>
        |  <c r="C5" t="e"><v>#DIV/0!</v></c><c r="D5" t="s"><v>8</v></c>
        |</row>
        |<row r="6"/>
        |<row r="7">
        |  <c r="A7"><v>3</v></c><c r="B7" t="s"><v>7</v></c>
        |  <c r="C7"><v>-0.25</v></c>
        |</row>
        |</sheetData></worksheet>""".stripMargin)
    put("xl/worksheets/sheet2.xml",
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>x</t></is></c></row>
        |<row r="2"><c r="A1"><v>42</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    z.close()
    f.getAbsolutePath
  }

  test("sheet list follows workbook order") {
    assert(ExcelReader.sheets(buildFixture()) == Seq("data", "extra"))
  }

  test("cell extraction: shared strings, runs, inline, errors, gaps") {
    val grid = ExcelReader.cells(buildFixture())
    assert(grid.head == Seq("id", "color", "score", "note"))
    assert(grid(1) == Seq("c", "d", "c", "s"))          // "red" runs join
    assert(grid(2) == Seq("", "", "class", "meta"))
    assert(grid(3) == Seq("1", "red", "3.5", "first note"))
    assert(grid(4) == Seq("2", "blue", "", "?"))        // error cell → ""
    assert(grid(5) == Seq("3", "red", "-0.25", ""))     // blank row dropped
    assert(grid.size == 6)
  }

  test("read: 3-row header typing round-trips through the tab pipeline") {
    val df = ExcelReader.read(spark, buildFixture())
    assert(df.columns.toSeq == Seq("id", "color", "score", "note"))
    val rows = df.orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows(0).getDouble(0) == 1.0 && rows(0).getString(1) == "red" &&
      rows(0).getDouble(2) == 3.5 && rows(0).getString(3) == "first note")
    assert(rows(1).isNullAt(2))            // error cell → missing
    assert(rows(1).isNullAt(3))            // "?" missing token → NULL
    assert(rows(2).getDouble(2) == -0.25)
  }

  test("named sheet selection") {
    val df = ExcelReader.read(spark, buildFixture(), Some("extra"))
    assert(df.columns.toSeq == Seq("x"))
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(42.0))
  }
}
