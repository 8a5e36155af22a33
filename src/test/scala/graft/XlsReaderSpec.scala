package graft

import graft.sources.{ExcelReader, Sources, XlsReader}

/** BIFF8 .xls reader vs the .xlsx reader on the reference repo's paired
  * test workbooks (same content saved in both formats) — a full
  * differential over CFB parsing, SST reassembly, RK/NUMBER/LABELSST
  * decoding, and the shared typing pipeline. */
class XlsReaderSpec extends SparkSpec {

  private val fixtureDir = "/root/reference/Orange/tests/xlsx_files"
  private def have(name: String): Boolean =
    new java.io.File(s"$fixtureDir/$name").exists()

  private val pairs = Seq("header_0", "header_0_sheet", "header_1_no_flags",
    "header_1_flags", "header_3", "missing")

  test(".xls cell grids equal the .xlsx twins") {
    assume(have("header_3.xls") && have("header_3.xlsx"))
    for (base <- pairs if have(s"$base.xls") && have(s"$base.xlsx")) {
      val xls = XlsReader.cells(s"$fixtureDir/$base.xls")
      val xlsx = ExcelReader.cells(s"$fixtureDir/$base.xlsx")
      assert(xls == xlsx, s"$base: \n xls=$xls\n xlsx=$xlsx")
    }
  }

  test(".xls sheet registry parses") {
    assume(have("header_0_sheet.xls"))
    val names = XlsReader.sheets(s"$fixtureDir/header_0_sheet.xls")
    assert(names.nonEmpty)
    // named-sheet selection matches the xlsx reader's
    val viaName = XlsReader.cells(s"$fixtureDir/header_0_sheet.xls",
      Some(names.head))
    assert(viaName == XlsReader.cells(s"$fixtureDir/header_0_sheet.xls"))
  }

  test(".xls dispatches through Sources.fromFile and types like .xlsx") {
    assume(have("header_3.xls") && have("header_3.xlsx"))
    val a = Sources.fromFile(spark, s"$fixtureDir/header_3.xls")
    val b = Sources.fromFile(spark, s"$fixtureDir/header_3.xlsx")
    assert(a.schema == b.schema)
    assert(a.collect().map(_.toString).sorted.toSeq
      == b.collect().map(_.toString).sorted.toSeq)
  }
}
