package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.Det

/** One event of the mutation stream (typed twin of the events table). */
case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
  event_type: String, value: Double)

/** Structured-Streaming builders — the true streaming twins of the
  * batch-declared §2.I queries (SURVEY.md). Each takes a (possibly
  * streaming) DataFrame so the identical plan runs under `readStream`
  * in production and under MemoryStream in tests; batch/stream parity
  * is asserted in StreamsSpec.
  *
  * Reference analogs: tumbling windows = PgQ tick batching; watermarked
  * dedup = relay at-least-once redelivery tolerance; stream-static join
  * = consumers enriching mutations with target/config state.
  *
  * Scale notes: watermarks bound state (late data past the watermark is
  * dropped, state evicted); at 100 TB use the RocksDB state store and an
  * idempotent `foreachBatch` sink — the checkpoint WAL plays the role of
  * PgQ's `finish_batch` acknowledgment.
  */
object Streams {

  /** Tumbling 1-hour counts/sums per event type, 10-minute watermark. */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Session windows per user (10-minute gap), watermarked. */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "10 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"))

  /** Exactly-once view of an at-least-once feed: watermarked dedup
    * keeps one state entry per event_id only within the watermark
    * horizon — bounded state, unlike global dropDuplicates. */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Enrich a mutation stream with a static dimension (broadcast —
    * the stream side never shuffles). */
  def enrichWithDim(events: DataFrame, customer: DataFrame): DataFrame =
    events.join(broadcast(customer),
      events("user_id") === customer("c_custkey"), "left")

  /** Stream-stream join: purchases attributed to same-user clicks in
    * the preceding 2 h — the true streaming twin of
    * q_stream_stream_join. Both sides carry a watermark and the join
    * condition bounds purchase_ts relative to click_ts; together these
    * let Spark compute how long each buffered row can still match and
    * evict it from join state afterwards. Without the time-range bound
    * the state grows without limit — on an unbounded CDC feed that is
    * the difference between O(watermark-window) and O(stream) state.
    *
    * Expected input schemas (renamed so the join condition is
    * unambiguous): clicks(click_id, user_id, click_ts),
    * purchases(purchase_id, p_user_id, purchase_ts). */
  def clickAttribution(clicks: DataFrame, purchases: DataFrame): DataFrame =
    clicks.withWatermark("click_ts", "1 hour")
      .join(purchases.withWatermark("purchase_ts", "1 hour"),
        expr("user_id = p_user_id AND purchase_ts >= click_ts" +
          " AND purchase_ts < click_ts + INTERVAL 2 HOURS"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (unix_millis(col("purchase_ts")) - unix_millis(col("click_ts")))
          .as("delay_ms"))

  /** Continuously-maintained last-write-wins snapshot — the streaming
    * twin of q_cdc_latest_state (the reference's consumer loop: fold
    * each keyed mutation into current row state). One state entry per
    * key holds the winning event; each micro-batch emits the keys it
    * updated (Update mode), i.e. a changelog of the snapshot. State is
    * O(live keys) in the state store (RocksDB at scale). */
  def compactStream(events: Dataset[Event]): Dataset[Event] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[Event, Event](
        GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[Event], state: GroupState[Event]) =>
          val candidates = state.getOption.iterator ++ it
          val winner = candidates.maxBy(e => (e.ts.getTime, e.event_id))
          state.update(winner)
          winner
      }
  }
}
