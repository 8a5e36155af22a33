package graft

import graft.sources.Sources

/** from_file dispatch + UrlReader (io_base.py:28-60, io.py:409-460). */
class SourcesSpec extends SparkSpec {

  private def tmpWith(ext: String, content: String): String = {
    val f = java.io.File.createTempFile("graft_src_", ext)
    f.deleteOnExit()
    val w = new java.io.PrintWriter(f, "UTF-8")
    try w.print(content) finally w.close()
    f.getAbsolutePath
  }

  test("dispatch: parquet") {
    val df = Sources.fromFile(spark, s"$sf/region.parquet")
    assert(df.count() > 0)
  }

  test("dispatch: csv uses the tab header pipeline with comma delimiter") {
    val p = tmpWith(".csv", "a,b\nc,d\n,\n1.5,x\n2.5,y\n")
    val df = Sources.fromFile(spark, p)
    assert(df.columns.toSeq == Seq("a", "b"))
    assert(df.count() == 2)
    assert(df.schema("a").dataType.typeName == "double")
  }

  test("dispatch: tab") {
    val p = tmpWith(".tab", "v\nc\n\n3.25\n")
    val df = Sources.fromFile(spark, p)
    assert(df.columns.toSeq == Seq("v"))
    assert(df.collect().head.getDouble(0) == 3.25)
  }

  test("dispatch: basket") {
    val p = tmpWith(".basket", "x=2,y\nz=0.5\n")
    val df = Sources.fromFile(spark, p)
    assert(df.columns.toSeq == Seq("row_id", "feature", "value"))
    assert(df.count() == 3)
  }

  test("dispatch: unknown extension rejected") {
    intercept[IllegalArgumentException] {
      Sources.fromFile(spark, "/tmp/whatever.xyz")
    }
  }

  test("fromUrl: file:// URL dispatches by extension") {
    val p = tmpWith(".tab", "v\nc\n\n7.5\n")
    val df = Sources.fromUrl(spark, s"file://$p")
    assert(df.collect().head.getDouble(0) == 7.5)
  }
}
