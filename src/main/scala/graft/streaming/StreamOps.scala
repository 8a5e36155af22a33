package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables._

/** Structured Streaming versions of the engine's aggregation operators
  * (SURVEY §2.12 — additive over the reference, which has no streaming).
  *
  * The batch fixtures drive the streams: readStream over the same parquet
  * with a memory sink + processAllAvailable gives a synchronous, testable
  * run whose result must equal the batch query — that equivalence IS the
  * correctness argument, and the oracle SQL checks the batch semantics.
  *
  * At scale the same plan runs with a real source (Kafka/files), a real
  * sink, and the watermark bounds state: tumbling windows keyed by
  * (window, event_type) shuffle once per trigger, state evicted past the
  * watermark.
  */
object StreamOps {

  /** Tumbling-window counts/sums over the events stream. Returns the
    * materialized result after draining all available input. */
  def tumblingWindowAgg(spark: SparkSession, sfDir: String,
                        windowDur: String, sinkName: String): DataFrame = {
    val path = s"$sfDir/events.parquet"
    val schema = spark.read.parquet(path).schema
    // File streams need a directory source; point at the sf dir and
    // glob-filter to the events file.
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sfDir)
      // ts arrives as int64 nanos (nanosAsLong conf): exact integer
      // division to µs, then a proper TimestampType for the watermark.
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n"), exactSum(col("value")).as("total_value"))
      .select(unix_timestamp(col("window.start")).as("bucket_start"),
              col("event_type"), col("n"), col("total_value"))
    val q = stream.writeStream
      .format("memory").queryName(sinkName).outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    spark.table(sinkName)
  }
}
