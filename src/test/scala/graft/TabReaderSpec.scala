package graft

import org.apache.spark.sql.functions._
import graft.sources.TabReader
import graft.core.Schema
import graft.core.Schema._

class TabReaderSpec extends SparkSpec {

  val datasets = "/root/reference/Orange/datasets"

  test("iris.tab: 3-row header, 150 rows, class role") {
    val df = TabReader.read(spark, s"$datasets/iris.tab")
    assert(df.columns.toSeq ==
      Seq("sepal length", "sepal width", "petal length", "petal width", "iris"))
    assert(df.count() == 150)
    val dom = Schema.domainOf(df)
    assert(dom.classVars.map(_.name) == Seq("iris"))
    assert(dom.attributes.size == 4)
    assert(dom("sepal length").kind == VarKind.Continuous)
    // value sanity
    val m = df.agg(avg(col("sepal length"))).head.getDouble(0)
    assert(math.abs(m - 5.8433) < 0.001)
  }

  test("zoo.tab: string meta column") {
    val df = TabReader.read(spark, s"$datasets/zoo.tab")
    val dom = Schema.domainOf(df)
    assert(dom.metas.map(_.name) == Seq("name"))
    assert(dom.classVars.map(_.name) == Seq("type"))
    assert(df.count() == 101)
  }

  test("adult_sample_missing.tab: declared value lists + missing tokens") {
    val df = TabReader.read(spark,
      "/root/reference/Orange/tests/datasets/adult_sample_missing.tab")
    val dom = Schema.domainOf(df)
    assert(dom("workclass").kind == VarKind.Discrete)
    assert(dom("workclass").values.contains("Private"))
    // '?' tokens must become NULL
    assert(df.filter(col("workclass").isNull).count() > 0)
    assert(dom("age").kind == VarKind.Continuous)
  }

  test("round-trip write/read preserves schema and rows") {
    val df = TabReader.read(spark, s"$datasets/iris.tab")
    val out = "/tmp/graft_test_iris.tab"
    TabReader.write(df, out)
    val back = TabReader.read(spark, out)
    assert(back.count() == 150)
    assert(Schema.domainOf(back).classVars.map(_.name) == Seq("iris"))
  }
}
