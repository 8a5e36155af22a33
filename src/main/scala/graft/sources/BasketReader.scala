package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Orange sparse basket format (reference Orange/data/io.py:221-244):
  * one line per row, comma-separated `name=value` (or bare `name` ⇒ 1.0)
  * entries. Long (row_id, feature, value) output — the scalable sparse
  * representation; pivot to wide/MLlib vectors when the vocabulary is
  * known.
  */
object BasketReader {

  def read(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.read.text(path)
      .select(col("value").as("line"))
      .filter(length(trim(col("line"))) > 0)
    // row id from a deterministic hash of line + position-free content is
    // not possible without order; basket files are row-ordered, so use
    // the file-order index (zipWithIndex is deterministic per file).
    val rdd = lines.select("line").rdd.map(_.getString(0)).zipWithIndex()
    val rowDf = spark.createDataFrame(
      rdd.map { case (l, i) => org.apache.spark.sql.Row(i, l) },
      StructType(Seq(StructField("row_id", LongType), StructField("line", StringType))))
    rowDf
      .select(col("row_id"), explode(split(col("line"), ",")).as("entry"))
      .select(col("row_id"), trim(col("entry")).as("entry"))
      .filter(length(col("entry")) > 0)
      .select(
        col("row_id"),
        when(col("entry").contains("="),
          trim(substring_index(col("entry"), "=", 1)))
          .otherwise(col("entry")).as("feature"),
        when(col("entry").contains("="),
          trim(substring_index(col("entry"), "=", -1)).cast(DoubleType))
          .otherwise(lit(1.0)).as("value"))
  }
}
