package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for Spark datetime-pattern equivalents of the reference
  * TimeVariable._ISO_FORMATS (variable.py:937-972). */
object TimeFmtProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val cases = Seq(
      ("2021-11-25 13:35:20+0100", "yyyy-MM-dd HH:mm:ssZ"),
      ("2021-11-25 13:35:20", "yyyy-MM-dd HH:mm:ss"),
      ("2021-11-25 13:35", "yyyy-MM-dd HH:mm"),
      ("2021-11-25T13:35:20+0100", "yyyy-MM-dd'T'HH:mm:ssZ"),
      ("2021-11-25T13:35:20", "yyyy-MM-dd'T'HH:mm:ss"),
      ("2021-11-25", "yyyy-MM-dd"),
      ("2021-11-25 13:35:20.5", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
      ("2021-11-25 13:35:20.123456", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
      ("2021-11-25T13:35:20.123456", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"),
      ("2021-11-25 13:35:20.123+0100", "yyyy-MM-dd HH:mm:ss.SSSSSSZ"),
      ("2021-11-25T13:35:20.123+0100", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSZ"),
      ("20211125T133520+0100", "yyyyMMdd'T'HHmmssZ"),
      ("20211125133520+0100", "yyyyMMddHHmmssZ"),
      ("13:35:20.123456", "HH:mm:ss.SSSSSS"),
      ("13:35:20", "HH:mm:ss"),
      ("13:35", "HH:mm"),
      ("20211125T133520", "yyyyMMdd'T'HHmmss"),
      ("20211125133520", "yyyyMMddHHmmss"),
      ("20211125", "yyyyMMdd"),
      ("2021329", "yyyyDDD"),
      ("2021", "yyyy"),
      ("133520.123456", "HHmmss.SSSSSS"),
      ("2021-11", "yyyy-MM"),
      ("2021-329", "yyyy-DDD"),
      // cross-checks: these MUST fail for the given pattern
      ("20211125", "yyyy"),          // expect year 20211125?? see output
      ("2021-134", "yyyy-MM"),       // expect null
      ("2021", "yyyyDDD"),           // expect null
      ("2021-11-25 10:00:00", "yyyy-MM-dd HH:mm:ssZ")) // expect null
    val df = cases.toDF("s", "fmt")
    df.select(col("s"), col("fmt"),
        try_to_timestamp(col("s"), col("fmt")).as("ts"))
      .collect().foreach(r => println(s"${r.get(0)}\t${r.get(1)}\t${r.get(2)}"))
    spark.stop()
  }
}
