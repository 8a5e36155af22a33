package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.core.Tables._
import graft.preprocess.PreprocessOps
import graft.queries.SqlGen._

/** Events-table queries: JSON extraction, batch time windows, and the
  * Structured Streaming twin of the tumbling-window aggregation (SURVEY
  * §2.12 — additive over the reference). The streaming query's oracle is
  * the equivalent *batch* SQL: stream-batch equivalence is the
  * correctness argument. */
object StreamingQueries {

  /** events.ts arrives as int64 NANOSECONDS (see the nanosAsLong session
    * conf); `ts div 1e9` is exact integer floor-division to epoch seconds
    * — double math would lose precision above 2^53 ns. */
  private val tsSec = expr("ts div 1000000000")

  private def ev(s: SparkSession, d: String) = Tables.load(s, d, "events")

  val all: Seq[Q] = Seq(

    Q("events_json_extract", // semi-structured props column → typed value
      (s, d) => ev(s, d)
        .withColumn("k", regexp_extract(col("props"), "\"k\": ([0-9]+)", 1)
          .cast("int"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          exactMean(col("k")).as("mean_k"),
          max(col("k")).as("max_k"))
        .orderBy(col("event_type")),
      Some(s"""SELECT event_type, COUNT(*) AS n,
              |  ${sqlMean("CAST(regexp_extract(props, '\"k\": ([0-9]+)', 1) AS INT)")} AS mean_k,
              |  MAX(CAST(regexp_extract(props, '\"k\": ([0-9]+)', 1) AS INT)) AS max_k
              |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    Q("events_tumbling_batch", // 5-minute tumbling buckets, batch plan
      (s, d) => ev(s, d)
        .groupBy((tsSec.cast("long") - pmod(tsSec, lit(300L))).as("bucket_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), exactSum(col("value")).as("total_value"))
        .orderBy(col("bucket_start"), col("event_type")),
      Some(s"""SELECT CAST(FLOOR(FLOOR(epoch(ts)) / 300) * 300 AS BIGINT) AS bucket_start,
              |  event_type, COUNT(*) AS n, ${sqlSum("value")} AS total_value
              |FROM events GROUP BY 1, 2
              |ORDER BY bucket_start, event_type""".stripMargin)),

    Q("events_anomaly_zscore", // trailing-window anomaly scoring: each
      // event's value against the mean/σ of its type's previous 50
      // events (frame −50..−1, ≥ 30 filled) — the monitoring/outlier
      // shape for event streams (StreamOps.trailingZScore). A window
      // keyed by event_type alone caps parallelism at the #types, so
      // above the cutover the timeline chunks with copied 50-row tails
      // (bit-identical frames, parallelism ∝ volume); below it the
      // plain keyed window wins. Emits |z| ≥ 3 rows.
      (s, d) => graft.streaming.StreamOps.trailingZScore(
          ev(s, d).select(col("event_type"), col("event_id"),
            expr("ts div 1000000000").as("tsec"), col("value"), col("ts")))
        .orderBy(col("event_type"), col("event_id")),
      Some("""SELECT event_type, event_id, tsec,
             |  ROUND(value, 6) AS value, ROUND(z, 6) AS z
             |FROM (
             |  SELECT event_type, event_id, tsec, value, n_win,
             |    -- zero-variance frames have no defined z (lockstep
             |    -- with the Spark side's when-guard; without the CASE,
             |    -- DuckDB's NaN — which sorts ABOVE everything — would
             |    -- PASS the |z| filter where Spark's NULL drops)
             |    CASE WHEN var_s > 0
             |      THEN (value - mean_v) / SQRT(var_s) END AS z
             |  FROM (
             |    SELECT event_type, event_id,
             |      CAST(FLOOR(epoch(ts)) AS BIGINT) AS tsec, value,
             |      COUNT(*) OVER w AS n_win,
             |      CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w
             |          AS DOUBLE) / COUNT(*) OVER w AS mean_v,
             |      (CAST(SUM(CAST(ROUND(value * value, 6)
             |            AS DECIMAL(38,6))) OVER w AS DOUBLE)
             |          - CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w
             |              AS DOUBLE)
             |            * CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w
             |              AS DOUBLE) / COUNT(*) OVER w)
             |        / (COUNT(*) OVER w - 1) AS var_s
             |    FROM events
             |    WINDOW w AS (PARTITION BY event_type
             |      ORDER BY epoch_ns(ts), event_id
             |      ROWS BETWEEN 50 PRECEDING AND 1 PRECEDING)))
             |WHERE n_win >= 30 AND ABS(ROUND(z, 6)) >= 3.0
             |ORDER BY event_type, event_id""".stripMargin)),

    Q("events_asof_nearest", // pandas merge_asof(direction='nearest',
      // tolerance=1800s): each purchase takes the user's CLOSEST view
      // value within ±30 min (ties → the earlier view; equal times →
      // largest event id). MergeOps.asofJoinNearest — one key shuffle,
      // two per-key window sorts, no range-join explosion; the oracle
      // IS the range join + argmin (fine at oracle scale).
      (s, d) => {
        val e = ev(s, d).select(col("user_id"), col("event_id"),
          expr("ts div 1000000000").as("tsec"), col("event_type"),
          col("value"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("tsec"))
        val views = e.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id"), col("tsec"), col("value"))
        graft.operators.MergeOps.asofJoinNearest(
            purchases, views, key = "user_id", time = "tsec",
            value = "value", tiebreak = "event_id", tolerance = 1800L)
          .select(col("user_id"), col("event_id"), col("tsec"),
            coalesce(round(col("nearest_value"), 6), lit(-1.0))
              .as("nearest_value"),
            coalesce(col("nearest_dt"), lit(-999999L)).as("nearest_dt"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id,
             |         CAST(FLOOR(epoch(ts)) AS BIGINT) AS tsec,
             |         event_type, value
             |  FROM events),
             |p AS (SELECT user_id, event_id, tsec FROM e
             |      WHERE event_type = 'purchase'),
             |v AS (SELECT user_id, event_id, tsec, value FROM e
             |      WHERE event_type = 'view'),
             |cand AS (
             |  SELECT p.user_id, p.event_id, p.tsec,
             |    v.value AS vv, v.tsec - p.tsec AS dt,
             |    ROW_NUMBER() OVER (PARTITION BY p.event_id
             |      ORDER BY ABS(v.tsec - p.tsec) ASC, v.tsec ASC,
             |               v.event_id DESC) AS rn
             |  FROM p JOIN v ON v.user_id = p.user_id
             |    AND ABS(v.tsec - p.tsec) <= 1800)
             |SELECT p.user_id, p.event_id, p.tsec,
             |  COALESCE(ROUND(c.vv, 6), -1.0) AS nearest_value,
             |  COALESCE(c.dt, -999999) AS nearest_dt
             |FROM p LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c
             |  ON c.event_id = p.event_id
             |ORDER BY p.user_id, p.event_id""".stripMargin)),

    Q("events_asof_join", // as-of join (operators Spark lacks natively,
      // composed from existing ops — MergeOps.asofJoin): each purchase
      // picks up the value of the user's most recent view at-or-before
      // its time. One key shuffle + per-key sort, no range explosion.
      (s, d) => {
        val e = ev(s, d).select(col("user_id"), col("event_id"),
          expr("ts div 1000000000").as("tsec"), col("event_type"),
          col("value"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("tsec"))
        val views = e.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id"), col("tsec"), col("value"))
        graft.operators.MergeOps.asofJoin(
            purchases, views, key = "user_id", time = "tsec",
            value = "value", tiebreak = "event_id")
          .select(col("user_id"), col("event_id"), col("tsec"),
            col("asof_value"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id,
             |         CAST(FLOOR(epoch(ts)) AS BIGINT) AS tsec,
             |         event_type, value
             |  FROM events),
             |u AS (
             |  SELECT user_id, event_id, tsec, 1 AS side,
             |         CAST(NULL AS DOUBLE) AS v
             |  FROM e WHERE event_type = 'purchase'
             |  UNION ALL
             |  SELECT user_id, event_id, tsec, 0, value
             |  FROM e WHERE event_type = 'view'),
             |w AS (
             |  SELECT user_id, event_id, tsec, side,
             |    LAST_VALUE(v IGNORE NULLS) OVER (
             |      PARTITION BY user_id ORDER BY tsec, side, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS asof_value
             |  FROM u)
             |SELECT user_id, event_id, tsec, asof_value
             |FROM w WHERE side = 1 ORDER BY user_id, event_id""".stripMargin)),

    Q("events_funnel_steps", // ordered funnel view → click → purchase:
      // step k's earliest time must follow step k−1's. Three user-keyed
      // conditional aggregations chained by equi-joins — every stage is
      // hash-partitioned on user_id, so the shuffle happens once and the
      // chain reuses it; no per-user sorting or window over the raw feed.
      (s, d) => {
        val e = ev(s, d).select(col("user_id"), col("event_type"),
          expr("ts div 1000000000").as("tsec"))
        val s1 = e.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("tsec")).as("t1"))
        val s2 = e.filter(col("event_type") === "click")
          .join(s1, Seq("user_id"))
          .filter(col("tsec") > col("t1"))
          .groupBy(col("user_id")).agg(min(col("tsec")).as("t2"))
        val s3 = e.filter(col("event_type") === "purchase")
          .join(s2, Seq("user_id"))
          .filter(col("tsec") > col("t2"))
          .groupBy(col("user_id")).agg(min(col("tsec")).as("t3"))
        val n1 = s1.agg(count(lit(1)).as("n")).select(
          lit(1).as("step"), lit("view").as("event_type"), col("n"))
        val n2 = s2.agg(count(lit(1)).as("n")).select(
          lit(2).as("step"), lit("click").as("event_type"), col("n"))
        val n3 = s3.agg(count(lit(1)).as("n")).select(
          lit(3).as("step"), lit("purchase").as("event_type"), col("n"))
        n1.unionByName(n2).unionByName(n3).orderBy(col("step"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_type,
             |         CAST(FLOOR(epoch(ts)) AS BIGINT) AS tsec
             |  FROM events),
             |s1 AS (SELECT user_id, MIN(tsec) AS t1 FROM e
             |       WHERE event_type = 'view' GROUP BY user_id),
             |s2 AS (SELECT e.user_id, MIN(tsec) AS t2 FROM e JOIN s1 USING (user_id)
             |       WHERE event_type = 'click' AND tsec > t1 GROUP BY e.user_id),
             |s3 AS (SELECT e.user_id, MIN(tsec) AS t3 FROM e JOIN s2 USING (user_id)
             |       WHERE event_type = 'purchase' AND tsec > t2 GROUP BY e.user_id)
             |SELECT 1 AS step, 'view' AS event_type, (SELECT COUNT(*) FROM s1) AS n
             |UNION ALL
             |SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
             |UNION ALL
             |SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)
             |ORDER BY step""".stripMargin)),

    Q("events_cohort_retention", // cohort/retention matrix: users bucket
      // by first-seen day, activity counts by (cohort, day offset).
      // Two user-keyed aggregations + one user-keyed equi-join — both
      // sides arrive hash-partitioned on user_id, so the join reuses the
      // shuffle; all date math is exact integer division on epoch nanos.
      (s, d) => {
        val day = expr("(ts div 1000000000) div 86400")
        val days = ev(s, d).select(col("user_id"), day.as("day")).distinct()
        val cohort = days.groupBy(col("user_id"))
          .agg(min(col("day")).as("cohort_day"))
        days.join(cohort, Seq("user_id"))
          .groupBy(col("cohort_day"),
            (col("day") - col("cohort_day")).as("day_offset"))
          .agg(countDistinct(col("user_id")).as("n_active"))
          .orderBy(col("cohort_day"), col("day_offset"))
      },
      Some("""WITH d AS (
             |  SELECT DISTINCT user_id,
             |    CAST(FLOOR(FLOOR(epoch(ts)) / 86400) AS BIGINT) AS day
             |  FROM events),
             |c AS (SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY user_id)
             |SELECT c.cohort_day, d.day - c.cohort_day AS day_offset,
             |       COUNT(DISTINCT d.user_id) AS n_active
             |FROM d JOIN c USING (user_id)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("events_sessionize", // session windows via lag-gap > 30 min per user
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
        ev(s, d)
          .withColumn("tsec", tsSec)
          .withColumn("prev_sec", lag(col("tsec"), 1).over(w))
          .withColumn("new_sess",
            when(col("prev_sec").isNull ||
              col("tsec") - col("prev_sec") > 1800, 1)
              .otherwise(0))
          .withColumn("session_id", sum(col("new_sess"))
            .over(w.rowsBetween(Long.MinValue, 0)))
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"),
            min(col("tsec")).as("start_s"),
            max(col("tsec")).as("end_s"))
          .filter(col("n_events") >= 5)
          .orderBy(col("user_id"), col("session_id"))
      },
      Some("""WITH marked AS (
             |  SELECT user_id, event_id, ts,
             |    CASE WHEN LAG(ts) OVER w IS NULL
             |      OR CAST(FLOOR(epoch(ts)) AS BIGINT)
             |         - CAST(FLOOR(epoch(LAG(ts) OVER w)) AS BIGINT) > 1800
             |      THEN 1 ELSE 0 END AS new_sess
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
             |sess AS (
             |  SELECT user_id, ts,
             |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
             |  FROM marked)
             |SELECT user_id, session_id, COUNT(*) AS n_events,
             |  MIN(CAST(FLOOR(epoch(ts)) AS BIGINT)) AS start_s,
             |  MAX(CAST(FLOOR(epoch(ts)) AS BIGINT)) AS end_s
             |FROM sess GROUP BY user_id, session_id
             |HAVING COUNT(*) >= 5
             |ORDER BY user_id, session_id""".stripMargin)),

    Q("stream_sessionize", // native session_window streaming twin of
      // events_sessionize: same 30-min gap rule (ties merge — see
      // StreamOps.sessionWindowAgg's boundary note), ≥2-event filter so
      // the gate exercises real merged sessions at sf0.01;
      // oracle is the batch lag-gap CTE without the running session id
      // (session identity = its start time).
      (s, d) => graft.streaming.StreamOps
        .sessionWindowAgg(s, d, gapSeconds = 1800, minEvents = 2,
          "stream_sessionize_sink")
        .orderBy(col("user_id"), col("start_s")),
      Some("""WITH marked AS (
             |  SELECT user_id, event_id, ts,
             |    CASE WHEN LAG(ts) OVER w IS NULL
             |      OR CAST(FLOOR(epoch(ts)) AS BIGINT)
             |         - CAST(FLOOR(epoch(LAG(ts) OVER w)) AS BIGINT) > 1800
             |      THEN 1 ELSE 0 END AS new_sess
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
             |sess AS (
             |  SELECT user_id, ts,
             |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
             |  FROM marked)
             |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
             |  MIN(CAST(FLOOR(epoch(ts)) AS BIGINT)) AS start_s,
             |  MAX(CAST(FLOOR(epoch(ts)) AS BIGINT)) AS end_s
             |FROM sess GROUP BY user_id, session_id
             |HAVING COUNT(*) >= 2
             |ORDER BY user_id, start_s""".stripMargin)),

    Q("stream_tumbling_window", // Structured Streaming twin of the above
      (s, d) => graft.streaming.StreamOps
        .tumblingWindowAgg(s, d, "1 hour", "stream_tumbling_sink")
        .orderBy(col("bucket_start"), col("event_type")),
      Some(s"""SELECT CAST(FLOOR(FLOOR(epoch(ts)) / 3600) * 3600 AS BIGINT) AS bucket_start,
              |  event_type, COUNT(*) AS n, ${sqlSum("value")} AS total_value
              |FROM events GROUP BY 1, 2
              |ORDER BY bucket_start, event_type""".stripMargin)),

    Q("events_sliding_batch", // 10-min windows sliding by 5 min, batch
      // plan: each event explodes into its size/slide = 2 windows.
      (s, d) => {
        val b = tsSec.cast("long") - pmod(tsSec, lit(300L))
        ev(s, d).select(b.as("b"), col("event_type"), col("value"))
          .withColumn("off", explode(array(lit(0L), lit(300L))))
          .groupBy((col("b") - col("off")).as("bucket_start"),
            col("event_type"))
          .agg(count(lit(1)).as("n"), exactSum(col("value")).as("total_value"))
          .orderBy(col("bucket_start"), col("event_type"))
      },
      Some(s"""SELECT CAST(FLOOR(FLOOR(epoch(ts)) / 300) * 300 AS BIGINT) - s.off AS bucket_start,
              |  event_type, COUNT(*) AS n, ${sqlSum("value")} AS total_value
              |FROM events CROSS JOIN (VALUES (0), (300)) s(off)
              |GROUP BY 1, 2
              |ORDER BY bucket_start, event_type""".stripMargin)),

    Q("stream_sliding_window", // Structured Streaming sliding window —
      // same overlapping-window semantics via window(ts, size, slide).
      (s, d) => graft.streaming.StreamOps
        .slidingWindowAgg(s, d, "10 minutes", "5 minutes",
          "stream_sliding_sink")
        .orderBy(col("bucket_start"), col("event_type")),
      Some(s"""SELECT CAST(FLOOR(FLOOR(epoch(ts)) / 300) * 300 AS BIGINT) - s.off AS bucket_start,
              |  event_type, COUNT(*) AS n, ${sqlSum("value")} AS total_value
              |FROM events CROSS JOIN (VALUES (0), (300)) s(off)
              |GROUP BY 1, 2
              |ORDER BY bucket_start, event_type""".stripMargin)),

    Q("stream_dedup_distinct", // streaming dropDuplicates state →
      // distinct users per event type; oracle = batch COUNT(DISTINCT).
      (s, d) => graft.streaming.StreamOps
        .streamingDedupCounts(s, d, "stream_dedup_sink")
        .orderBy(col("event_type")),
      Some("""SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct_users
             |FROM events GROUP BY event_type
             |ORDER BY event_type""".stripMargin)),

    Q("stream_dedup_fingerprint", // streaming near-dup filter for a
      // document feed: canonical content fingerprint (lowercased,
      // whitespace-collapsed rolling hash) → dropDuplicates keyed state
      // → unique-doc counts per language. Oracle = batch distinct count
      // over the same fingerprint expression.
      (s, d) => graft.streaming.StreamOps
        .streamingFingerprintDedup(s, d, "stream_fp_dedup_sink")
        .orderBy(col("lang")),
      Some(s"""SELECT lang, COUNT(DISTINCT
             |    ${SqlGen.sqlHash32("trim(regexp_replace(lower(text), ' +', ' ', 'g'))")}) AS n_unique_docs
             |FROM documents GROUP BY lang
             |ORDER BY lang""".stripMargin)),

    Q("stream_stateful_user_stats", // mapGroupsWithState custom state:
      // per-user running count / exact total / max inter-event gap.
      // Oracle = batch SQL twin (stream-batch equivalence).
      (s, d) => graft.streaming.StreamOps
        .statefulUserStats(s, d, "stream_stateful_sink")
        .orderBy(col("user_id")),
      Some("""WITH e AS (
             |  SELECT user_id, event_id, value,
             |         CAST(FLOOR(epoch(ts)) AS BIGINT) AS tsec
             |  FROM events),
             |w AS (
             |  SELECT user_id, value,
             |    tsec - LAG(tsec) OVER (PARTITION BY user_id
             |      ORDER BY tsec ASC, event_id ASC) AS gap
             |  FROM e)
             |SELECT user_id, COUNT(*) AS n_events,
             |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value,
             |  COALESCE(MAX(gap), 0) AS max_gap_s
             |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin)),

    Q("stream_static_enrich", // stream-static broadcast enrichment join
      // (events ⋈ customer segment) feeding a tumbling-window agg —
      // zero shuffle on the join, no join state. Oracle = batch twin.
      (s, d) => graft.streaming.StreamOps
        .staticEnrichedWindowAgg(s, d, "6 hours", "stream_enrich_sink")
        .orderBy(col("bucket_start"), col("segment")),
      Some(s"""SELECT CAST(FLOOR(FLOOR(epoch(e.ts)) / 21600) * 21600 AS BIGINT) AS bucket_start,
              |  COALESCE(c.c_mktsegment, 'unknown') AS segment,
              |  COUNT(*) AS n, ${sqlSum("e.value")} AS total_value
              |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
              |GROUP BY 1, 2
              |ORDER BY bucket_start, segment""".stripMargin)),

    Q("stream_stream_join", // watermarked stream-stream interval join:
      // views ⋈ same-user purchases within 1 hour AFTER the view —
      // the funnel/attribution shape. Event-time range condition bounds
      // both sides' join state; the per-user rollup happens on the
      // materialized append output. Oracle = the equivalent batch join.
      (s, d) => graft.streaming.StreamOps
        .viewPurchaseJoin(s, d, gapSec = 3600, "stream_ss_join_sink")
        .groupBy(col("v_user").as("user_id"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("view_id")).as("n_views_converted"),
          exactSum(col("value")).as("attributed_value"))
        .orderBy(col("user_id")),
      Some("""SELECT v.user_id AS user_id, COUNT(*) AS n_pairs,
             |  COUNT(DISTINCT v.event_id) AS n_views_converted,
             |  CAST(SUM(CAST(p.value AS DECIMAL(38,6))) AS DOUBLE)
             |    AS attributed_value
             |FROM events v JOIN events p
             |  ON p.user_id = v.user_id
             |  AND v.event_type = 'view' AND p.event_type = 'purchase'
             |  AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 3600 SECONDS
             |GROUP BY v.user_id ORDER BY user_id""".stripMargin)),

    Q("stream_quality_filter", // streaming ingest quality gate: the
      // C4/Gopher composed keep decision per arriving document
      // (stateless projection — zero state at any ingest rate) with a
      // per-(lang, keep) audit rollup. Oracle = the batch decision
      // aggregated the same way.
      (s, d) => graft.streaming.StreamOps
        .streamingQualityFilter(s, d, "stream_quality_sink")
        .orderBy(col("lang"), col("keep")),
      Some {
        val enList = graft.text.TextOps.StopwordsEn
          .map(w => s"'$w'").mkString(", ")
        s"""WITH sig AS (
           |  SELECT lang,
           |    len(string_split(text, ' ')) AS ntok,
           |    CAST(length(replace(text, ' ', '')) AS DOUBLE)
           |      / len(string_split(text, ' ')) AS mtl,
           |    CAST(len(list_filter(string_split(text, ' '),
           |        t -> t IN ($enList))) AS DOUBLE)
           |      / len(string_split(text, ' ')) AS stopr,
           |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           |      / len(string_split(text, ' ')) AS ttr
           |  FROM documents)
           |SELECT lang,
           |  CASE WHEN ntok BETWEEN 20 AND 2000 AND mtl BETWEEN 3.0 AND 12.0
           |        AND stopr >= 0.05 AND ttr >= 0.2 THEN 1 ELSE 0 END AS keep,
           |  COUNT(*) AS n
           |FROM sig GROUP BY 1, 2 ORDER BY lang, keep""".stripMargin
      })
  )
}
