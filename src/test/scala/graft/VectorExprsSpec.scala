package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorExprs

/** Native vector kernels: bit-identical to the explicit element_at
  * chains / higher-order lambdas they replaced, null-safe, codegen'd. */
class VectorExprsSpec extends SparkSpec {
  import spark.implicits._

  private def chainDot(a: org.apache.spark.sql.Column,
                       b: org.apache.spark.sql.Column, dim: Int) =
    (1 to dim).map(i =>
      element_at(a, i).cast("double") * element_at(b, i).cast("double"))
      .reduce(_ + _)

  test("dotF is bit-identical to the element_at chain on fixture embeddings") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val pairs = e.select(col("vec_id").as("ia"), col("embedding").as("ea"))
      .join(e.select(col("vec_id").as("ib"), col("embedding").as("eb")),
        col("ia") === col("ib") - 7)
    val diff = pairs.select(
        VectorExprs.dotF(col("ea"), col("eb")).as("native"),
        chainDot(col("ea"), col("eb"), 64).as("chain"))
      .filter(col("native") =!= col("chain")).count()
    assert(diff == 0)
  }

  test("norm2F matches sqrt of the squared chain; dotD/norm2D match on doubles") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet").limit(100)
    val chainNorm = sqrt((1 to 64).map { i =>
      val x = element_at(col("embedding"), i).cast("double"); x * x
    }.reduce(_ + _))
    assert(e.select(VectorExprs.norm2F(col("embedding")).as("n"),
        chainNorm.as("c")).filter(col("n") =!= col("c")).count() == 0)
    val d = e.select(col("embedding").cast("array<double>").as("v"))
    val aggDot = aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
      lit(0.0), (a, x) => a + x)
    assert(d.select(VectorExprs.dotD(col("v"), col("v")).as("n"),
        aggDot.as("c")).filter(col("n") =!= col("c")).count() == 0)
    assert(d.select(VectorExprs.norm2D(col("v")).as("n"),
        sqrt(aggDot).as("c")).filter(col("n") =!= col("c")).count() == 0)
  }

  test("null array yields null, not a crash") {
    val df = Seq((1, Some(Seq(1.0f, 2.0f))), (2, None))
      .toDF("id", "v")
    val out = df.select(col("id"),
        VectorExprs.dotF(col("v"), col("v")).as("d"),
        VectorExprs.norm2F(col("v")).as("n"))
      .orderBy("id").collect()
    assert(out(0).getDouble(1) == 5.0)
    assert(out(1).isNullAt(1) && out(1).isNullAt(2))
  }

  test("kernels run inside whole-stage codegen (no fallback)") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val plan = e.select(VectorExprs.dotF(col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix IS the whole-stage-codegen marker in treeString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project.*graft_dot_f.*"))
    // force the codegen path explicitly: evaluation must not throw
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val r = e.limit(5).select(
        VectorExprs.cosineF(col("embedding"), col("embedding")).as("c"))
        .collect()
      assert(r.forall(x => math.abs(x.getDouble(0) - 1.0) < 1e-9))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
