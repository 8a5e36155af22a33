package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: verifies the custom kernels stay inside whole-stage
  * codegen (a Janino rejection would fall back silently). */
object CgProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.execution.debug._
    val df = graft.core.Tables.load(spark, args(0), "lineitem")
    val scored = graft.ml.IsolationForest.scoreColumn(
      df, Seq("l_quantity", "l_extendedprice"),
      Seq("l_orderkey", "l_linenumber"), "s", nTrees = 5)
    val cg = scored.queryExecution.executedPlan
    println("IFOREST_WSCG=" + cg.toString.linesIterator
      .count(_.contains("WholeStageCodegen")))
    scored.debugCodegen() // throws/prints compile failures
    val sig = graft.text.DedupOps.minhashSignaturesFast(
      graft.core.Tables.load(spark, args(0), "documents"), "doc_id", "text", 3)
    sig.debugCodegen()
    println("CGPROBE_OK")
    spark.stop()
  }
}
