package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Det
import graft.io.Tables

/** Time-window operators in their batch form (SURVEY.md §2.I).
  *
  * These use the *streaming* grouping primitives (`window`,
  * `session_window`) on a batch DataFrame — the expressions are
  * identical under `readStream`, which is Structured Streaming's core
  * batch/stream parity guarantee. The true streaming twins (watermarks,
  * `dropDuplicatesWithinWatermark`, stateful FSM validation) live in
  * [[graft.streaming]] and are exercised by MemoryStream tests, since
  * their semantics (late data, state eviction) have no batch oracle.
  *
  * Reference analog: PgQ tick batching = fixed-interval (tumbling)
  * windows; relay batch summaries = per-window aggregation.
  *
  * Scale notes: windowed aggregation shuffles once on (window, key) with
  * map-side partials; in true streaming the same plan runs incrementally
  * against the state store (RocksDB at scale) and the watermark bounds
  * state size.
  */
object StreamingOps {
  type Q = (SparkSession, String) => DataFrame

  private def stream(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).withColumn("ts", Det.ets(col("ts")))

  /** Tumbling 1-hour windows: counts + sums per event type. */
  private val tumbling: Q = (s, d) =>
    stream(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy(col("win_start").asc, col("event_type").asc)

  /** Sliding 1-hour windows every 30 minutes: each event lands in two
    * windows (start = floor30(ts) and floor30(ts) − 30min). */
  private val sliding: Q = (s, d) =>
    stream(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy(col("win_start").asc, col("event_type").asc)

  /** Session windows: per-user activity bursts split at ≥10-minute gaps.
    * Output derives start/duration from min/max event times so the
    * values are engine-neutral; the *grouping* follows Spark's
    * session-window merge rule (a gap of exactly 10 minutes starts a new
    * session), mirrored in the oracle's gaps-and-islands flag. */
  private val session: Q = (s, d) =>
    stream(s, d)
      .groupBy(session_window(col("ts"), "10 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
      .select(col("user_id"), Det.outTs(col("first_ts")).as("session_start"),
        col("n_events"),
        (unix_millis(col("last_ts")) - unix_millis(col("first_ts")))
          .as("dur_ms"))
      .orderBy(col("user_id").asc, col("session_start").asc)

  /** Stream-stream join in batch form: click→purchase attribution —
    * each purchase matched to same-user clicks in the preceding 2 h.
    * The equi-key (user_id) makes this a hash join with the time bound
    * as a post-filter; under `readStream` the identical expression runs
    * as a watermarked stream-stream join where the time-range bound is
    * what lets Spark evict buffered rows from join state
    * ([[graft.streaming.Streams.clickAttribution]] is the true
    * streaming twin; parity asserted in StreamsSpec). */
  private val streamStreamJoin: Q = (s, d) => {
    val e = stream(s, d)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("ts").as("purchase_ts"))
    clicks.join(purchases,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") < col("click_ts") + expr("INTERVAL 2 HOURS"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (unix_millis(col("purchase_ts")) - unix_millis(col("click_ts")))
          .as("delay_ms"))
      .orderBy(col("user_id").asc, col("click_id").asc,
        col("purchase_id").asc)
  }

  /** Watermark late-data accounting, §2.I's semantics put under the
    * DuckDB oracle (round-8 verdict stretch ask): the `events` table is
    * replayed as an arrival-ordered stream (arrival order = event_id,
    * which IS sorted in this fixture — it models the ingest sequence),
    * each event's EVENT time is its arrival time minus a deterministic
    * md5-keyed network delay (0–150 min in 10-min steps — the fixture
    * is otherwise perfectly ordered, so the jitter supplies the
    * out-of-orderness watermarks exist for), and arrival micro-batches
    * are fixed [[LateBatchRows]]-row chunks of the sequence.
    *
    * Structured Streaming's contract, in batch form: the watermark for
    * batch b is max(event time seen in batches < b) − delay, updated
    * only at batch boundaries; a row is LATE (dropped by a stateful
    * windowed aggregation) when its tumbling window has already closed:
    * window_end ≤ watermark. Output: per-window totals, late counts
    * and surviving counts — exactly what the streaming job's windowed
    * state would emit plus the drop accounting its metrics report.
    *
    * Scale shape — the sequential running max becomes a TWO-LEVEL
    * exclusive prefix max, nothing global on one partition:
    * per-batch maxima (keyed agg, |batches| = |events|/50 rows), then
    * (a) intra-chunk exclusive prefix via a chunk-keyed window
    * ([[LateChunk]] batches per chunk) and (b) chunk-level maxima
    * prefixed by a tiny triangle self-join (|batches|/64 rows; at
    * 100 TB the batch-stats table is micro-batch-count-sized — time-
    * bounded, not data-bounded — and a third level can be nested if a
    * deployment ever needs it). Everything else is epoch-ms integer
    * arithmetic, identical in both engines. */
  private[graft] val LateJitterChoices = 16
  private[graft] val LateJitterUnitMs = 600000L  // 10 min
  private[graft] val LateBatchRows = 50L         // arrival rows per micro-batch
  private[graft] val LateDelayMs = 1800000L      // 30 min watermark delay
  private[graft] val LateWindowMs = 3600000L     // 1 h tumbling window
  private[graft] val LateChunk = 64L             // batches per prefix chunk

  /** `(event_id, bid, ems)` — arrival batch id and jittered event-time
    * epoch-ms; shared by the declared query and the replay spec. */
  private[graft] def lateArrivals(s: SparkSession, d: String): DataFrame =
    stream(s, d).select(col("event_id"),
      expr(s"event_id div $LateBatchRows").as("bid"),
      (unix_millis(col("ts")) -
        pmod(conv(substring(md5(col("event_id").cast("string")
          .cast("binary")), 1, 2), 16, 10).cast("long"),
          lit(LateJitterChoices.toLong)) * lit(LateJitterUnitMs)).as("ems"))

  /** Exclusive prefix max of per-batch event-time maxima, minus the
    * delay: `(bid, wm)` — wm is NULL for the first batch (no watermark
    * yet), exactly the streaming engine's initial state. */
  private[graft] def lateWatermarks(arrivals: DataFrame): DataFrame = {
    val bs = arrivals.groupBy(col("bid")).agg(max(col("ems")).as("mx"))
      .withColumn("cg", expr(s"bid div $LateChunk"))
    val intra = bs.withColumn("pmx", max(col("mx")).over(
      Window.partitionBy(col("cg")).orderBy(col("bid").asc)
        .rowsBetween(Window.unboundedPreceding, -1)))
    val cs = bs.groupBy(col("cg")).agg(max(col("mx")).as("cmx"))
    val cpre = cs.as("a")
      .join(cs.as("b"), col("b.cg") < col("a.cg"), "left")
      .groupBy(col("a.cg").as("cg")).agg(max(col("b.cmx")).as("cpmx"))
    // Spark's greatest skips NULLs: wm is NULL only when BOTH prefix
    // terms are (the global first batch).
    intra.join(broadcast(cpre), "cg")
      .select(col("bid"),
        (greatest(col("pmx"), col("cpmx")) - lit(LateDelayMs)).as("wm"))
  }

  private val lateEvents: Q = (s, d) => {
    val arrivals = lateArrivals(s, d)
    arrivals.join(lateWatermarks(arrivals), Seq("bid"), "left")
      .withColumn("win_ms", expr(s"(ems div $LateWindowMs) * $LateWindowMs"))
      .withColumn("late",
        col("wm").isNotNull && col("win_ms") + lit(LateWindowMs) <= col("wm"))
      .groupBy(col("win_ms"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("late"), 1L).otherwise(0L)).as("n_late"))
      .withColumn("n_ontime", col("n_events") - col("n_late"))
      .orderBy(col("win_ms").asc)
  }

  val queries: Map[String, Q] = Map(
    "q_stream_tumbling" -> tumbling,
    "q_stream_sliding"  -> sliding,
    "q_stream_session"  -> session,
    "q_stream_stream_join" -> streamStreamJoin,
    "q_stream_late_events" -> lateEvents,
  )

  private val sqlStream =
    s"SELECT event_id, user_id, event_type, value, ${Det.sqlEts("ts")} AS ts FROM events"

  val oracle: Map[String, String] = Map(
    // the oracle states the sequential watermark contract directly
    // (one running-max window); the Spark side implements it as the
    // two-level distributed prefix — the hash match proves them equal
    "q_stream_late_events" ->
      s"""WITH s AS (
         |  SELECT event_id,
         |         epoch_ms(${Det.sqlEts("ts")}) AS ams
         |  FROM events),
         |j AS (
         |  SELECT event_id, event_id // $LateBatchRows AS bid,
         |         ams - (CAST('0x' || SUBSTRING(md5(CAST(event_id AS VARCHAR)), 1, 2)
         |                    AS INT) % $LateJitterChoices) * $LateJitterUnitMs AS ems
         |  FROM s),
         |bs AS (SELECT bid, max(ems) AS mx FROM j GROUP BY bid),
         |wm AS (
         |  SELECT bid,
         |         max(mx) OVER (ORDER BY bid ASC
         |                       ROWS BETWEEN UNBOUNDED PRECEDING
         |                       AND 1 PRECEDING) - $LateDelayMs AS wm
         |  FROM bs),
         |f AS (
         |  SELECT (j.ems // $LateWindowMs) * $LateWindowMs AS win_ms,
         |         CASE WHEN wm.wm IS NOT NULL
         |               AND (j.ems // $LateWindowMs) * $LateWindowMs
         |                   + $LateWindowMs <= wm.wm
         |              THEN 1 ELSE 0 END AS late
         |  FROM j JOIN wm USING (bid))
         |SELECT win_ms, COUNT(*) AS n_events,
         |       CAST(SUM(late) AS BIGINT) AS n_late,
         |       CAST(COUNT(*) - SUM(late) AS BIGINT) AS n_ontime
         |FROM f
         |GROUP BY win_ms
         |ORDER BY win_ms ASC""".stripMargin,
    "q_stream_stream_join" ->
      s"""WITH s AS ($sqlStream),
         |c AS (SELECT event_id AS click_id, user_id, ts
         |      FROM s WHERE event_type = 'click'),
         |p AS (SELECT event_id AS purchase_id, user_id, ts AS pts
         |      FROM s WHERE event_type = 'purchase')
         |SELECT c.user_id, click_id, purchase_id,
         |       epoch_ms(p.pts) - epoch_ms(c.ts) AS delay_ms
         |FROM c JOIN p ON c.user_id = p.user_id
         |             AND p.pts >= c.ts AND p.pts < c.ts + INTERVAL 2 HOURS
         |ORDER BY c.user_id ASC, click_id ASC, purchase_id ASC""".stripMargin,
    "q_stream_tumbling" ->
      s"""WITH s AS ($sqlStream)
         |SELECT date_trunc('hour', ts) AS win_start, event_type,
         |       COUNT(*) AS n, ${Det.sqlDsum("value")} AS sum_value
         |FROM s
         |GROUP BY 1, 2
         |ORDER BY win_start ASC, event_type ASC""".stripMargin,
    "q_stream_sliding" ->
      s"""WITH s AS ($sqlStream),
         |x AS (SELECT time_bucket(INTERVAL 30 MINUTES, ts) AS win_start,
         |             event_type, value FROM s
         |      UNION ALL
         |      SELECT time_bucket(INTERVAL 30 MINUTES, ts) - INTERVAL 30 MINUTES,
         |             event_type, value FROM s)
         |SELECT win_start, event_type,
         |       COUNT(*) AS n, ${Det.sqlDsum("value")} AS sum_value
         |FROM x
         |GROUP BY 1, 2
         |ORDER BY win_start ASC, event_type ASC""".stripMargin,
    "q_stream_session" ->
      s"""WITH s AS ($sqlStream),
         |f AS (SELECT user_id, event_id, ts,
         |             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
         |                       >= INTERVAL 10 MINUTES
         |                  THEN 1 ELSE 0 END AS new_session
         |      FROM s),
         |g AS (SELECT user_id, ts,
         |             SUM(new_session) OVER (PARTITION BY user_id
         |                                    ORDER BY ts ASC, event_id ASC
         |                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |               AS session_id
         |      FROM f)
         |SELECT user_id,
         |       ${Det.sqlOutTs("MIN(ts)")} AS session_start,
         |       COUNT(*) AS n_events,
         |       epoch_ms(MAX(ts)) - epoch_ms(MIN(ts)) AS dur_ms
         |FROM g
         |GROUP BY user_id, session_id
         |ORDER BY user_id ASC, session_start ASC""".stripMargin,
  )
}
