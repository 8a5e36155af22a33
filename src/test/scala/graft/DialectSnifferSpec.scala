package graft

import graft.sources.{DialectSniffer, Sources}
import graft.sources.DialectSniffer.Dialect

/** CSV dialect sniffing (owcsvimport.py:1386-1441 sniff_csv /
  * HeaderSniffer semantics) + the sniffed read dispatch. */
class DialectSnifferSpec extends SparkSpec {

  private def tmpWith(ext: String, content: String): String = {
    val f = java.io.File.createTempFile("graft_sniff_", ext)
    f.deleteOnExit()
    val w = new java.io.PrintWriter(f, "UTF-8")
    try w.print(content) finally w.close()
    f.getAbsolutePath
  }

  test("delimiter sniffing: comma / semicolon / tab / pipe") {
    assert(DialectSniffer.sniff("a,b,c\n1,2,3\n4,5,6\n").delimiter == ',')
    assert(DialectSniffer.sniff("a;b;c\n1;2;3\n4;5;6\n").delimiter == ';')
    assert(DialectSniffer.sniff("a\tb\tc\n1\t2\t3\n").delimiter == '\t')
    assert(DialectSniffer.sniff("a|b|c\n1|2|3\n4|5|6\n").delimiter == '|')
  }

  test("consistency beats raw frequency: commas inside quoted fields") {
    // every row has ONE semicolon but a varying number of quoted commas
    val d = DialectSniffer.sniff(
      "\"x, y, z\";1\n\"a,b\";2\n\"q, r, s, t\";3\n")
    assert(d.delimiter == ';')
    assert(d.quote == "\"")
  }

  test("quote detection: double and single") {
    assert(DialectSniffer.sniff("\"a\",b\n\"c\",d\n1,2\n").quote == "\"")
    assert(DialectSniffer.sniff("'a',b\n'c',d\n1,2\n").quote == "'")
    assert(DialectSniffer.sniff("a,b\n1,2\n3,4\n").quote == "")
  }

  test("header vote: numeric body + non-numeric first row = header") {
    assert(DialectSniffer.sniff("age,height\n31,180.5\n42,175.0\n").hasHeader)
    assert(!DialectSniffer.sniff("1,2\n3,4\n5,6\n").hasHeader)
  }

  test("splitQuoted: embedded delimiters and doubled quotes") {
    assert(DialectSniffer.splitQuoted("\"a,b\",c", ',', '"') == Seq("a,b", "c"))
    assert(DialectSniffer.splitQuoted("\"he said \"\"hi\"\"\",x", ',', '"') ==
      Seq("he said \"hi\"", "x"))
    assert(DialectSniffer.splitQuoted("a,,b", ',', '"') == Seq("a", "", "b"))
  }

  test(".txt dispatch sniffs the dialect and parses quoted fields") {
    val p = tmpWith(".txt",
      "name;score\n\"Smith; John\";1.5\n\"Lee; Ada\";2.5\n")
    val df = Sources.fromFile(spark, p)
    assert(df.columns.toSeq == Seq("name", "score"))
    val rows = df.orderBy("score").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("Smith; John", "Lee; Ada"))
    assert(rows.map(_.getDouble(1)).toSeq == Seq(1.5, 2.5))
  }

  test("sniffFile reads gzip samples through the Hadoop codec") {
    val f = java.io.File.createTempFile("graft_sniff_", ".csv.gz")
    f.deleteOnExit()
    val out = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(f))
    out.write("a;b\n1;2\n3;4\n".getBytes("UTF-8")); out.close()
    assert(DialectSniffer.sniffFile(spark, f.getAbsolutePath) ==
      Dialect(';', "", hasHeader = true))
  }

  test("TabReader quote='' path is unchanged by the new parameter") {
    val p = tmpWith(".csv", "a,b\nc,d\n,\n1.5,x\n2.5,y\n")
    val df = Sources.fromFile(spark, p) // dispatch still quote-free
    assert(df.count() == 2 && df.columns.toSeq == Seq("a", "b"))
  }

  test("headerless sniff keeps line 1 as DATA with synthesized names") {
    // all-numeric first row → sniffed hasHeader = false; before the
    // fix the first data row was consumed as column names and dropped
    // from the body (along with its duplicates) — silent data loss
    val p = tmpWith(".txt", "1,10\n2,20\n3,30\n1,10\n")
    val df = Sources.fromFile(spark, p)
    assert(df.columns.toSeq == Seq("_c0", "_c1"))
    // 4 rows including BOTH copies of the duplicate first line
    val rows = df.orderBy("_c0", "_c1").collect()
    assert(rows.length == 4)
    assert(rows.map(r => (r.getDouble(0), r.getDouble(1))).toSeq ==
      Seq((1.0, 10.0), (1.0, 10.0), (2.0, 20.0), (3.0, 30.0)))
  }

  test("headerless type guessing includes line 1 in the sample") {
    // mixed column: first line's value participates in the kind vote
    val p = tmpWith(".txt", "x,1\ny,2\nz,3\n")
    val df = Sources.fromFile(spark, p)
    assert(df.count() == 3)
    // col 0 is strings (x/y/z), col 1 numeric
    val sch = df.schema
    assert(sch("_c0").dataType == org.apache.spark.sql.types.StringType)
    assert(sch("_c1").dataType == org.apache.spark.sql.types.DoubleType)
  }
}
