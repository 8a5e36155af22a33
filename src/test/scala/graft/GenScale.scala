package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-rehearsal data generator (test scope, not part of the library):
  * replicates an existing sf directory K times with key offsets into a
  * new directory, preserving distributions while growing join
  * cardinalities — an sf1-equivalent from sf0.1 without touching the
  * read-only driver data. Usage:
  *   Test/runMain graft.GenScale /root/testdata/sf0.1 /tmp/sf1 10
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val src = args(0); val dst = args(1); val k = args(2).toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val OFF = 100000000L

    // which columns shift per replica (keys only; values keep their
    // distributions so plans and selectivities stay comparable)
    val keyCols: Map[String, Seq[String]] = Map(
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "customer" -> Seq("c_custkey"),
      "supplier" -> Seq("s_suppkey"),
      "part" -> Seq("p_partkey"),
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"),
      "nation" -> Nil, "region" -> Nil)

    keyCols.foreach { case (t, keys) =>
      val base = spark.read.parquet(s"$src/$t.parquet")
      val out: DataFrame =
        if (keys.isEmpty) base // dimension tables stay single-copy
        else (0 until k).map { i =>
          keys.foldLeft(base) { (df, c) =>
            df.withColumn(c, col(c) + lit(i * OFF)) }
        }.reduce(_.unionByName(_))
      if (t == "events" || t == "documents") {
        // StreamOps sources readStream from the sf DIR with
        // pathGlobFilter "<table>.parquet" — a FILE name, matching the
        // driver's single-file layout. A directory-style write here made
        // every stream_* query see zero files at the replica, so emit
        // the streamed tables as one literal file like the fixture.
        val tmp = s"$dst/_${t}_tmp"
        out.coalesce(1).write.mode("overwrite").parquet(tmp)
        import org.apache.hadoop.fs.Path
        val fs = new Path(dst).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        val part = fs.globStatus(new Path(s"$tmp/part-*.parquet"))(0).getPath
        val target = new Path(s"$dst/$t.parquet")
        fs.delete(target, true)
        fs.rename(part, target)
        fs.delete(new Path(tmp), true)
      } else {
        out.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      }
      println(s"[genscale] $t: ${out.count()} rows")
    }
    spark.stop()
  }
}
