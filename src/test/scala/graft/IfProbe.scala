package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: dumps the isolation-forest sample and tree-0 node table for
  * differential debugging against the IsolationForestSql oracle replay. */
object IfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.core.Tables.load(spark, sfDir, "lineitem")
    val features = Seq("l_quantity", "l_extendedprice")
    val keys = Seq("l_orderkey", "l_linenumber")
    val keyConcat = concat(
      lit("ifs_") +: keys.zipWithIndex.flatMap { case (k, i) =>
        (if (i == 0) Nil else Seq(lit("_"))) :+ col(k).cast("string")
      }: _*)
    val sample = df
      .select(graft.core.Tables.hashVal32(keyConcat).as("__h") +:
        (keys.map(col) ++ features.map(f => col(f).cast("double"))): _*)
      .orderBy(col("__h") +: keys.map(col): _*).limit(512)
      .drop("__h").drop(keys: _*)
      .collect().map(r => features.indices.map(r.getDouble).toArray)
    println(s"SAMPLE n=${sample.length}")
    sample.take(5).foreach(a => println("SAMPLE " + a.mkString(",")))
    val m = graft.ml.IsolationForest.fit(sample, nTrees = 50, 256, "ifs")
    val t0 = m.trees(0)
    // walk with explicit paths for printing
    def walk(i: Int, path: String, depth: Int): Unit = {
      val n = t0(i)
      println(s"NODE t0 path='$path' att=${n.att} split=${n.split} size=${n.size} leaf=${n.left < 0}")
      if (n.left >= 0 && depth < 3) {
        walk(n.left, path + "0", depth + 1)
        walk(n.right, path + "1", depth + 1)
      }
    }
    walk(0, "", 0)
    spark.stop()
  }
}
