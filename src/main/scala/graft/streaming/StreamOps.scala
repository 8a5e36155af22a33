package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.core.Tables._

/** Row/state types for StreamOps.statefulUserStats — top-level (not
  * nested private) so Catalyst's generated encoders can reach them. */
case class Ev(event_id: Long, user_id: Long, tsec: Long, value: Double)
/** Per-key state: counts, exact decimal total (scale 6, mirroring
  * Tables.exactSum), max gap, and the last event time so gaps span
  * micro-batch boundaries. */
case class UserState(n: Long, total: BigDecimal, maxGap: Long, lastT: Long)
case class UserAgg(user_id: Long, n_events: Long, total_value: Double,
                   max_gap_s: Long)

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

  /** State partitions for the fixture-driven runs. Streaming stateful
    * operators create one state store per shuffle partition per
    * operator, and store open/commit latency dominates small
    * single-trigger drains (the batch default of 32 spends more wall
    * time on store lifecycle than on rows). Real deployments size state
    * partitions to load; these drives do the same. Results are
    * partition-count-invariant. */
  private[graft] val StatePartitions = 8

  /** Start a streaming query with [[StatePartitions]] state partitions
    * (the conf is captured by the query's cloned session at start, then
    * restored), drain it, and stop it. */
  private def runDrained(spark: SparkSession)(
      start: => org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val key = "spark.sql.shuffle.partitions"
    val old = spark.conf.get(key)
    spark.conf.set(key, StatePartitions.toString)
    val q = try start finally spark.conf.set(key, old)
    try q.processAllAvailable() finally q.stop()
  }


  /** Normalize events.ts to the int64-nanos form all downstream window
    * arithmetic assumes (see Tables.load — the fixture has carried both
    * int64-nanos and µs-timestamp encodings; exact integer division
    * beats double epoch() above 2^53 ns). Works on streaming frames. */
  private def tsNanos(df: DataFrame): DataFrame =
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType) df
    else df.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * 1000L)

  /** Tumbling-window counts/sums over the events stream. Returns the
    * materialized result after draining all available input. */
  def tumblingWindowAgg(spark: SparkSession, sfDir: String,
                        windowDur: String, sinkName: String): DataFrame = {
    val path = s"$sfDir/events.parquet"
    val schema = spark.read.parquet(path).schema
    // File streams need a directory source; point at the sf dir and
    // glob-filter to the events file.
    val stream = tsNanos(spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sfDir))
      // ts normalized to int64 nanos: exact integer
      // division to µs, then a proper TimestampType for the watermark.
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n"), exactSum(col("value")).as("total_value"))
      .select(unix_timestamp(col("window.start")).as("bucket_start"),
              col("event_type"), col("n"), col("total_value"))
    runDrained(spark)(stream.writeStream
      .format("memory").queryName(sinkName).outputMode("complete").start())
    spark.table(sinkName)
  }

  /** Native session windows (gap-merged) per user — the streaming twin
    * of the batch lag-gap sessionizer. Timestamps are truncated to
    * whole seconds first so gap comparisons match the batch rule's
    * integer arithmetic. session_window merges a successor up to AND
    * INCLUDING `gap` after the last event (closed boundary, verified
    * differentially: an exactly-1801 s gap merged under gap+1), which
    * is the batch rule "diff > gap breaks" (ties merge) verbatim.
    *
    * Session aggregations only support APPEND output: a session emits
    * when the watermark passes its close. The drive therefore streams
    * from a temp copy of the fixture, then appends one far-future
    * SENTINEL row (user −1) as a second micro-batch — the watermark
    * advances past every real session and flushes them all, exactly how
    * a production stream finalizes sessions as fresh events arrive. */
  def sessionWindowAgg(spark: SparkSession, sfDir: String,
                       gapSeconds: Int, minEvents: Int,
                       sinkName: String): DataFrame = {
    val src = s"$sfDir/events.parquet"
    val schema = spark.read.parquet(src).schema
    val dir = java.nio.file.Files.createTempDirectory("graft_sess_")
    dir.toFile.deleteOnExit()
    java.nio.file.Files.copy(java.nio.file.Paths.get(src),
      dir.resolve("batch0.parquet"))
    val stream = tsNanos(spark.readStream.schema(schema)
      .option("pathGlobFilter", "*.parquet").parquet(dir.toString))
      .withColumn("ts", timestamp_seconds(expr("ts div 1000000000")))
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapSeconds seconds"))
      .agg(count(lit(1)).as("n_events"),
        unix_timestamp(min(col("ts"))).as("start_s"),
        unix_timestamp(max(col("ts"))).as("end_s"))
      .select(col("user_id"), col("n_events"), col("start_s"), col("end_s"))
    val q = {
      val key = "spark.sql.shuffle.partitions"
      val oldParts = spark.conf.get(key)
      spark.conf.set(key, StatePartitions.toString)
      try stream.writeStream
        .format("memory").queryName(sinkName).outputMode("append").start()
      finally spark.conf.set(key, oldParts)
    }
    try {
      q.processAllAvailable()
      // sentinel micro-batch: 2030-01-01 (typed to match the source
      // schema — int64 nanos or µs timestamp), impossible user id
      val sentinelTs =
        if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
          lit(1893456000000000000L)
        else lit("2030-01-01 00:00:00").cast(schema("ts").dataType)
      val sentinel = spark.range(1).select(
        lit(-1L).as("event_id"), sentinelTs.as("ts"),
        lit(-1L).as("user_id"), lit("__sentinel").as("event_type"),
        lit(0.0).as("value"), lit("{}").as("props"))
      spark.createDataFrame(sentinel.collectAsList(), schema)
        .write.mode("append").parquet(dir.toString)
      q.processAllAvailable()
    } finally q.stop()
    spark.table(sinkName)
      .filter(col("user_id") =!= -1 && col("n_events") >= minEvents)
  }

  /** Overlapping sliding windows (size > slide ⇒ each event lands in
    * size/slide windows). Same drain-to-memory harness as above; the
    * oracle checks the equivalent batch explode. */
  def slidingWindowAgg(spark: SparkSession, sfDir: String,
                       size: String, slide: String,
                       sinkName: String): DataFrame = {
    val path = s"$sfDir/events.parquet"
    val schema = spark.read.parquet(path).schema
    val stream = tsNanos(spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sfDir))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), size, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), exactSum(col("value")).as("total_value"))
      .select(unix_timestamp(col("window.start")).as("bucket_start"),
              col("event_type"), col("n"), col("total_value"))
    runDrained(spark)(stream.writeStream
      .format("memory").queryName(sinkName).outputMode("complete").start())
    spark.table(sinkName)
  }


  /** Streaming exact deduplication (dropDuplicates keyed state) feeding a
    * per-type distinct-user count. At scale the dedup state is bounded by
    * `withWatermark` + key expiry; the fixture drain keeps all state. */
  def streamingDedupCounts(spark: SparkSession, sfDir: String,
                           sinkName: String): DataFrame = {
    val path = s"$sfDir/events.parquet"
    val schema = spark.read.parquet(path).schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sfDir)
      .select(col("user_id"), col("event_type"))
      .dropDuplicates("user_id", "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_distinct_users"))
    runDrained(spark)(stream.writeStream
      .format("memory").queryName(sinkName).outputMode("complete").start())
    spark.table(sinkName)
  }

  /** Streaming content-fingerprint deduplication — the streaming form of
    * the training-data near-dup filter: fingerprint each arriving
    * document (canonical rolling hash, a pure column expression), keep
    * the first per (lang, fingerprint) via dropDuplicates keyed state,
    * count survivors per language. Deterministic regardless of arrival
    * order because the OUTPUT is the distinct (lang, fp) set, not the
    * surviving doc ids. At scale the dedup state is RocksDB-backed and
    * bounded by withWatermark + key expiry; the fixture drain keeps all
    * state. */
  def streamingFingerprintDedup(spark: SparkSession, sfDir: String,
                                sinkName: String): DataFrame = {
    val path = s"$sfDir/documents.parquet"
    val schema = spark.read.parquet(path).schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(sfDir)
      .select(col("lang"),
        graft.text.TextOps.canonicalFingerprint(col("text")).as("fp"))
      .dropDuplicates("lang", "fp")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_unique_docs"))
    runDrained(spark)(stream.writeStream
      .format("memory").queryName(sinkName).outputMode("complete").start())
    spark.table(sinkName)
  }

  /** Streaming MinHash-LSH band dedup — the near-dup ingest filter a
    * training-data pipeline runs at the front door: each arriving
    * document's MinHash signature is computed PER ROW with array
    * expressions (shingle array → one hash pass → 16 permuted mins), so
    * signature construction needs NO aggregation and the only stateful
    * operators are the LSH-bucket dedup state and the final per-band
    * count. A new document is a near-dup candidate exactly when one of
    * its (band, sig) keys is already in state — dropDuplicates keyed by
    * the band bucket IS that filter. Output (distinct buckets per band)
    * is arrival-order independent, which makes the stream comparable to
    * the batch/DuckDB twin. At scale: bucket state is RocksDB-backed,
    * bounded by watermark expiry; the per-row signature path trades the
    * batch variant's shuffle for interpreted-lambda CPU, the right trade
    * when the stream is the bottleneck, not the cores. */
  /** Streaming ingest quality gate: the C4/Gopher composed keep
    * decision (TextOps.keepDecision — the quality_filter_decision rule
    * set) evaluated per arriving document as a STATELESS projection,
    * rolled into per-(lang, keep) counts. The filter itself carries no
    * state at any rate; the only stateful operator is the few-group
    * audit rollup. */
  def streamingQualityFilter(spark: SparkSession, sfDir: String,
                             sinkName: String): DataFrame = {
    val path = s"$sfDir/documents.parquet"
    val schema = spark.read.parquet(path).schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(sfDir)
      .select(col("lang"),
        graft.text.TextOps.keepDecision(col("text")).cast("int").as("keep"))
      .groupBy(col("lang"), col("keep"))
      .agg(count(lit(1)).as("n"))
    runDrained(spark)(stream.writeStream
      .format("memory").queryName(sinkName).outputMode("complete").start())
    spark.table(sinkName)
  }

  /** Core of the streaming band dedup over any (streaming) document
    * DataFrame: MinHash signatures per row → (band, sig) keys →
    * watermark-TTL'd dedup state → distinct-bucket counts per band.
    *
    * State bound (the 100 TB guarantee): the bucket state is keyed by
    * (band, sig) and evicted by `dropDuplicatesWithinWatermark` once
    * the watermark on `eventTime` passes a key's last-seen time +
    * `stateTtl` — so state size is ∝ distinct buckets seen within one
    * TTL window of the stream head, NOT ∝ all documents ever ingested.
    * A duplicate arriving more than `stateTtl` of event time after its
    * twin is re-admitted (the standard within-watermark dedup
    * contract); inside the window the dedup is exact.
    * StreamingTtlSpec pins both halves differentially; the drained
    * single-batch fixtures dedup globally (watermark only advances
    * between micro-batches), so the oracle twins are unchanged. */
  def minhashBandDedupStream(docs: DataFrame, bands: Int, rows: Int,
                             fastHash: Boolean, stateTtl: String,
                             eventTime: Column): DataFrame = {
    import graft.text.{DedupOps, TextOps}
    require(bands * rows <= DedupOps.MinhashParams.length,
      s"bands*rows = ${bands * rows} exceeds the " +
        s"${DedupOps.MinhashParams.length} fixed permutations")
    val withSig = docs
      .withColumn("__et", eventTime.cast("timestamp"))
      // materialize the token array BEFORE the shingle lambda (the
      // shinglesFromTokens O(tokens²) pitfall), then hash once per
      // shingle; each permutation re-scans only the small hash array
      .withColumn("__ts", TextOps.tokens(col("text")))
      .filter(size(col("__ts")) >= 3)
      // shingle assembly + hashing + all band·row permutation minima in
      // ONE per-row kernel (MinhashSigs) — replaces the interpreted
      // shingle/hash/array_min lambda passes, which profiled as the
      // dominant per-document ingest cost at the sf1 replica
      .withColumn("__mins", graft.functions.MinhashExpr.minhashSigs(
        col("__ts"), 3, DedupOps.MinhashParams.take(bands * rows),
        DedupOps.MinhashP, xx = fastHash))
    val bandStructs = (0 until bands).map { b =>
      val mins = (0 until rows).map { r =>
        element_at(col("__mins"), b * rows + r + 1)
      }
      struct(lit(b).as("band"), concat_ws("_", mins: _*).as("sig"))
    }
    withSig
      .select(col("__et"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("__et"), col("bs.band").as("band"), col("bs.sig").as("sig"))
      .withWatermark("__et", stateTtl)
      .dropDuplicatesWithinWatermark("band", "sig")
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_buckets"))
  }

  def streamingMinhashBandDedup(spark: SparkSession, sfDir: String,
                                sinkName: String, bands: Int = 8,
                                rows: Int = 2,
                                fastHash: Boolean = false,
                                stateTtl: String = "30 days"): DataFrame = {
    val path = s"$sfDir/documents.parquet"
    val schema = spark.read.parquet(path).schema
    val docs = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(sfDir)
    // the fixture carries no arrival time — derive a deterministic one
    // from doc_id (1 doc/second, +1 so doc 0 lands ABOVE the initial
    // watermark of epoch 0: an event time equal to the watermark is
    // "late" and would silently drop the doc); any real ingest passes
    // its own column
    val stream = minhashBandDedupStream(docs, bands, rows, fastHash,
      stateTtl, timestamp_seconds(col("doc_id") + 1))
    runDrained(spark)(stream.writeStream
      .format("memory").queryName(sinkName).outputMode("complete").start())
    spark.table(sinkName)
  }

  /** Arbitrary stateful aggregation via mapGroupsWithState (SURVEY §2.12,
    * KeyValueGroupedDataset custom state): per-user running event count,
    * value total, and max inter-event gap. State is one small record per
    * key — at scale it lives in the state store, partitioned by user_id,
    * evicted by timeout; the batch fixture drains in one trigger so each
    * key emits exactly one final row. The oracle is the batch SQL twin
    * (stream-batch equivalence). Values are summed in event-time order
    * inside each group (sorted in-memory per key per batch), so the
    * double total is deterministic; gaps are exact integer seconds. */
  def statefulUserStats(spark: SparkSession, sfDir: String,
                        sinkName: String): DataFrame = {
    import spark.implicits._
    val path = s"$sfDir/events.parquet"
    val schema = spark.read.parquet(path).schema
    val events = tsNanos(spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sfDir))
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000000000").as("tsec"), col("value"))
      .as[Ev]

    val updated = events.groupByKey(_.user_id)
      .mapGroupsWithState[UserState, UserAgg](GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[UserState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.tsec, e.event_id))
          val prev = state.getOption
            .getOrElse(UserState(0L, BigDecimal(0), 0L, -1L))
          var n = prev.n
          var tot = prev.total
          var maxGap = prev.maxGap
          var lastT = prev.lastT
          sorted.foreach { e =>
            if (lastT >= 0 && e.tsec - lastT > maxGap) maxGap = e.tsec - lastT
            lastT = e.tsec
            n += 1
            // per-event DECIMAL(38,6) rounding = exactSum's semantics
            tot += BigDecimal(e.value)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP)
          }
          state.update(UserState(n, tot, maxGap, lastT))
          UserAgg(uid, n, tot.toDouble, maxGap)
      }

    runDrained(spark)(updated.toDF().writeStream
      .format("memory").queryName(sinkName).outputMode(OutputMode.Update())
      .start())
    spark.table(sinkName)
  }

  /** Stream-static enrichment join: the events stream joined to a STATIC
    * dimension (customer segments) before a windowed aggregation — the
    * canonical streaming-enrichment shape. The static side is broadcast,
    * so enrichment adds ZERO shuffle and no join state (unlike
    * stream-stream joins, a static side needs no watermark/eviction);
    * at scale the same plan re-broadcasts the dim per trigger while the
    * stream side only shuffles once, into the windowed aggregation. */
  def staticEnrichedWindowAgg(spark: SparkSession, sfDir: String,
                              windowDur: String,
                              sinkName: String): DataFrame = {
    val path = s"$sfDir/events.parquet"
    val schema = spark.read.parquet(path).schema
    val stream = tsNanos(spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sfDir))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "1 hour")
    val dim = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    val joined = stream.join(broadcast(dim),
      col("user_id") === col("c_custkey"), "left")
    val agg = joined
      .groupBy(window(col("ts"), windowDur),
        coalesce(col("c_mktsegment"), lit("unknown")).as("segment"))
      .agg(count(lit(1)).as("n"), exactSum(col("value")).as("total_value"))
      .select(unix_timestamp(col("window.start")).as("bucket_start"),
        col("segment"), col("n"), col("total_value"))
    runDrained(spark)(agg.writeStream
      .format("memory").queryName(sinkName).outputMode("complete").start())
    spark.table(sinkName)
  }

  /** Stream-stream interval join (the remaining core Structured
    * Streaming operator beside windows/state/dedup): views joined to
    * the same user's purchases that land within `gapSec` seconds AFTER
    * the view. Both sides carry watermarks and the join condition is an
    * event-time range, so each side's buffered state is evicted once
    * the other side's watermark passes — bounded state at any scale,
    * the canonical funnel/attribution shape. Append output; the caller
    * aggregates the materialized result (batch-side) to keep the
    * streaming plan single-stateful-operator. */
  def viewPurchaseJoin(spark: SparkSession, sfDir: String, gapSec: Int,
                       sinkName: String): DataFrame = {
    val path = s"$sfDir/events.parquet"
    val schema = spark.read.parquet(path).schema
    def src = tsNanos(spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sfDir))
      .withColumn("tsm", timestamp_micros(expr("ts div 1000")))
    val views = src.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("tsm").as("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", "1 hour")
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("tsm").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("p_ts", "1 hour")
    val joined = views.join(purchases,
      col("v_user") === col("p_user") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr(s"INTERVAL $gapSec SECONDS"))
    runDrained(spark)(joined.writeStream
      .format("memory").queryName(sinkName).outputMode("append").start())
    spark.table(sinkName)
  }

  /** Above this row count the trailing-zscore window chunks the
    * timeline; below it the plain per-type window is cheaper (the rank
    * pass + tail copies cost ~1.5× the small-input window, measured
    * 3.0 → 4.3 s at sf0.1). The cutover is a plan choice only — both
    * shapes produce bit-identical rows (OperatorSpec pins it). */
  private[graft] val ZScoreChunkCutover = 50000000L

  /** Trailing-window z-score anomalies over `(event_type, event_id,
    * tsec, value, ts)` rows: each event's value against the mean/σ of
    * its type's previous 50 events (frame −50..−1, ≥ 30 filled), |z| ≥ 3
    * emitted with 6-decimal rounding.
    *
    * Scale shape: a window keyed by event_type alone caps parallelism
    * at the number of types — 4 tasks at ANY data size. Above
    * [[ZScoreChunkCutover]] (or when `forceChunked`), the skew-safe
    * two-pass rank assigns within-type sequence numbers, rows chunk by
    * ⌈seq/8192⌉, and every chunk imports a COPY of its predecessor's
    * last 50 rows, so each trailing frame evaluates over exactly the
    * ordered multiset the global window would — values bit-identical,
    * parallelism ∝ rows/8192. Moment sums run through the per-term-
    * rounded DECIMAL device so both engines' frame evaluations agree,
    * and z uses one fixed operation order. */
  def trailingZScore(base: DataFrame, forceChunked: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // plan-statistics cutover, NOT an eager count(): a counting action here
    // was a full extra scan of the input before the real job — at 100 TB a
    // non-trivial pre-pass for a monitoring query. Catalyst's estimate is
    // free (parquet footers / catalog stats). When only sizeInBytes is
    // known it is usually the COMPRESSED file size (parquet relations),
    // often well under 40 B/row for these 5 narrow columns — so the
    // fallback divides by a compressed estimate (8 B/row), biasing toward
    // the chunked path: a false "chunk" costs one extra narrow shuffle,
    // while a false "don't chunk" silently reinstates the 4-task
    // parallelism cliff the chunked path exists to avoid. Both plan
    // shapes are bit-identical (OperatorSpec pins it), so a wrong
    // estimate is a parallelism choice, never a correctness one.
    val chunked = forceChunked || {
      val st = base.queryExecution.optimizedPlan.stats
      st.rowCount.map(_ > BigInt(ZScoreChunkCutover))
        .getOrElse(st.sizeInBytes > BigInt(ZScoreChunkCutover) * 8)
    }
    val staged =
      if (!chunked) {
        base.withColumn("__chunk", lit(0L)).withColumn("__copy", lit(0))
      } else {
        val C = 8192L
        val seqd = graft.functions.RankOps.rowNumberWithin(
          base, "event_type", Seq("ts", "event_id"), "__seq", 32)
        val real = seqd
          .withColumn("__chunk", ((col("__seq") - 1) / C).cast("long"))
          .withColumn("__copy", lit(0))
        val tail = real
          .filter(((col("__seq") - 1) % C) >= C - 50)
          .withColumn("__chunk", col("__chunk") + 1)
          .withColumn("__copy", lit(1))
        real.unionByName(tail).drop("__seq")
      }
    val ord = Window.partitionBy(col("event_type"), col("__chunk"))
      .orderBy(col("ts"), col("event_id"))
    // Trailing −50..−1 aggregates as DIFFERENCES OF GROWING frames:
    // Spark has no aggregate retraction, so a bounded sliding frame is
    // re-aggregated from scratch for EVERY row (~50 decimal adds per
    // row per measure), while (unboundedPreceding, k) frames advance
    // incrementally at O(1)/row. Decimal sums are exact, so
    // cum(−1) − cum(−51) is bit-identical to the −50..−1 frame sum
    // (a NULL cum(−51) means those rows contributed nothing — fall
    // back to cum(−1), which then equals the frame sum), and the frame
    // count is min(row_number−1, 50) with no value-null exception
    // because the original counted lit(1). Same values, same doubles,
    // ~10× less window CPU.
    val upto1 = ord.rowsBetween(Window.unboundedPreceding, -1)
    val upto51 = ord.rowsBetween(Window.unboundedPreceding, -51)
    val vDec = col("value").cast("decimal(38,6)")
    val v2Dec = round(col("value") * col("value"), 6).cast("decimal(38,6)")
    val cnt = least(row_number().over(ord) - 1, lit(50)).cast("long")
    def trailSum(c: Column): Column = {
      val a = sum(c).over(upto1)
      val b = sum(c).over(upto51)
      when(b.isNull, a).otherwise(a - b)
    }
    // MATERIALIZE the window values once before deriving mean/var/z:
    // Column composition re-expands on every reference, and Spark's
    // window extraction emits a separate window expression per
    // OCCURRENCE (no CSE) — the previous withColumn form evaluated
    // ~26 copies of the frame sums per row, which is what actually
    // dominated this query at every scale, not the frame width.
    val pre = staged.select(col("*"), cnt.as("__cnt"),
      trailSum(vDec).cast("double").as("__s1"),
      trailSum(v2Dec).cast("double").as("__s2"))
    val mean = col("__s1") / col("__cnt")
    val varS = (col("__s2") - col("__s1") * col("__s1") / col("__cnt")) /
      (col("__cnt") - 1)
    // zero-variance frames (50 identical trailing values — real streams
    // have them, and the sf10 100-replica fixture is full of them) have
    // no defined z; guard EXPLICITLY because ANSI mode throws
    // DIVIDE_BY_ZERO even for double x/0 instead of yielding NaN. NULL z
    // fails the |z| ≥ 3 filter exactly like the NaN the IEEE form
    // produced — the oracle carries the same CASE so neither engine
    // leans on NaN-ordering quirks (DuckDB sorts NaN above everything,
    // so its NaN would PASS the filter where Spark's drops).
    val z = when(varS > lit(0.0), (col("value") - mean) / sqrt(varS))
    pre
      .withColumn("n_win", col("__cnt")).withColumn("z", z)
      .filter(col("__copy") === 0 &&
        col("n_win") >= 30 && abs(round(col("z"), 6)) >= 3.0)
      .select(col("event_type"), col("event_id"), col("tsec"),
        round(col("value"), 6).as("value"), round(col("z"), 6).as("z"))
  }
}
