package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  val queries: Map[String, Q] = Map(
    "q_stream_tumbling" -> tumbling,
    "q_stream_sliding"  -> sliding,
    "q_stream_session"  -> session,
    "q_stream_stream_join" -> streamStreamJoin,
  )

  private val sqlStream =
    s"SELECT event_id, user_id, event_type, value, ${Det.sqlEts("ts")} AS ts FROM events"

  val oracle: Map[String, String] = Map(
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
