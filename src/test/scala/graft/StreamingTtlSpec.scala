package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.StreamOps

/** Watermark-TTL'd band-dedup state (the r11 carried ask): the
  * (band, sig) bucket state must be EVICTED once the watermark passes
  * last-seen + TTL — bounding state by the TTL window instead of the
  * full ingest history — while dedup inside the window stays exact.
  *
  * Differential device: two micro-batches (maxFilesPerTrigger-style
  * sequential file feed). Batch 1 carries document A (event time 100 s)
  * and a watermark-pusher W (event time 10⁶ s); batch 2 replays A's
  * text at event time 10⁶+100 s.
  *  - TTL = 10 s  → after batch 1 the watermark (10⁶−10) is past A's
  *    expiry (110): A's buckets are evicted, the replay is re-admitted,
  *    n_buckets per band = 3. Eviction is thus OBSERVED, not assumed.
  *  - TTL = 3650 days → watermark never reaches any expiry: the replay
  *    dedups exactly as the unbounded r10 state did, n_buckets = 2 —
  *    in-window results unchanged.
  * The oracle-compared fixtures drain in one micro-batch (single
  * parquet file), where the watermark only moves after the batch, so
  * their global-dedup results are unchanged at ANY TTL. */
class StreamingTtlSpec extends SparkSpec {
  import spark.implicits._

  private val textA = "alpha beta gamma delta epsilon zeta"
  private val textW = "one two three four five six seven"

  private def writeBatch(dir: String, name: String,
                         rowsIn: Seq[(Long, String)]): Unit = {
    val stage = Files.createTempDirectory(s"graft_ttl_$name").toString
    rowsIn.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(stage)
    val f = Files.list(java.nio.file.Paths.get(stage)).toArray
      .map(_.toString).filter(_.endsWith(".parquet")).head
    Files.copy(java.nio.file.Paths.get(f),
      java.nio.file.Paths.get(dir, s"$name.parquet"))
  }

  /** Run the band-dedup core over two sequential micro-batches and
    * return (per-band bucket counts, final dedup-state row count). */
  private def run(ttl: String, tag: String): (Map[Int, Long], Long) = {
    val inDir = Files.createTempDirectory(s"graft_ttl_in_$tag").toString
    writeBatch(inDir, "b1", Seq((100L, textA), (1000000L, textW)))
    val schema = spark.read.parquet(inDir).schema
    val docs = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
    val dedup = StreamOps.minhashBandDedupStream(docs, bands = 4, rows = 2,
      fastHash = true, stateTtl = ttl,
      eventTime = timestamp_seconds(col("doc_id")))
    val sink = s"ttl_sink_$tag"
    val q = dedup.writeStream.format("memory").queryName(sink)
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      writeBatch(inDir, "b2", Seq((1000100L, textA)))
      q.processAllAvailable()
      val counts = spark.table(sink).collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val stateRows = Option(q.lastProgress).toSeq
        .flatMap(_.stateOperators.toSeq)
        .filter(_.operatorName.toLowerCase.contains("dedupe"))
        .map(_.numRowsTotal).sum
      (counts, stateRows)
    } finally q.stop()
  }

  test("expired (band,sig) keys are evicted and re-admitted past the TTL") {
    val (counts, stateRows) = run("10 seconds", "small")
    assert(counts.keySet == Set(0, 1, 2, 3))
    assert(counts.values.forall(_ == 3L),
      s"expected the replayed doc re-admitted after eviction (3/band), got $counts")
    // A and W both expired by the final watermark — only the replay's
    // 4 band keys may remain
    assert(stateRows <= 4L, s"dedup state not bounded by the TTL: $stateRows rows")
  }

  test("inside the TTL window the dedup result is unchanged (exact)") {
    val (counts, stateRows) = run("3650 days", "large")
    assert(counts.keySet == Set(0, 1, 2, 3))
    assert(counts.values.forall(_ == 2L),
      s"expected in-window dedup to drop the replay (2/band), got $counts")
    // nothing expires: both originals' keys are retained
    assert(stateRows == 8L, s"expected 8 retained state rows, got $stateRows")
  }
}
