package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Det
import graft.io.Tables

/** Event-analytics operators over the `events` stream — the product
  * analytics a CDC/event pipeline feeds downstream: ordered funnels,
  * cohort retention, time-spine resampling with gap-fill, and value
  * histograms.
  *
  * All four are single-pass-per-stage relational plans: the only
  * corpus-sized shuffles are keyed by `user_id` (funnel steps,
  * cohort assignment) or by the grouping key (day, bin); everything
  * derived (day spine, funnel summary, bin bounds) is a tiny
  * time-/spec-bounded table that composes via `broadcast` joins — a
  * decade of days is 3 652 rows no matter how many trillion events
  * flow through them, so the plan shape is identical at 100 TB.
  *
  * Cross-engine determinism follows the house rules ([[graft.Det]]):
  * event times are millisecond-truncated before any comparison, every
  * float crossing an accumulation boundary is qi4-quantized first
  * (exact long sums, order-free), and emitted doubles are r4-rounded
  * IEEE-pure forms.
  */
object Events {
  type Q = (SparkSession, String) => DataFrame

  /** events with engine-neutral millisecond event times. */
  private def ev(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).withColumn("ts", Det.ets(col("ts")))

  /** Funnel step window: each step must follow the previous within
    * this bound (strictly later — an equal ms-truncated timestamp does
    * NOT advance the funnel; both engines apply the identical rule). */
  private[graft] val FunnelWindowHours = 24

  /** Ordered 3-step funnel signup → view → purchase, each step within
    * [[FunnelWindowHours]] of the previous step's completion time.
    *
    * The classic formulation sorts each user's events and runs a state
    * machine; the relational decomposition is three chained
    * filter→join→min aggregations: step k's table is (user, t_k) with
    * t_k = min event time of step k strictly inside (t_{k-1},
    * t_{k-1} + window]. Each stage is one fact-side filter (pushed to
    * the scan — only that step's event type is read), one user-keyed
    * join against the previous step's users-sized table, and one
    * user-keyed min — all partial-aggregated, no window function, no
    * per-user event sort. The summary is a cross join of three 1-row
    * counts unpivoted to step rows, so nothing bigger than a scalar
    * crosses the final stage. */
  private val funnel: Q = (s, d) => {
    val e = ev(s, d).select(col("user_id"), col("event_type"), col("ts"))
    val w = expr(s"INTERVAL $FunnelWindowHours HOURS")
    val s1 = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = e.filter(col("event_type") === "view")
      .join(s1, Seq("user_id"))
      .filter(col("ts") > col("t1") && col("ts") <= col("t1") + w)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = e.filter(col("event_type") === "purchase")
      .join(s2, Seq("user_id"))
      .filter(col("ts") > col("t2") && col("ts") <= col("t2") + w)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    val one = s1.agg(count(lit(1)).as("n1"))
      .crossJoin(s2.agg(count(lit(1)).as("n2")))
      .crossJoin(s3.agg(count(lit(1)).as("n3")))
    one.selectExpr(
        "stack(3, 1, 'signup', n1, n1," +
          " 2, 'view', n2, n1," +
          " 3, 'purchase', n3, n2)" +
          " AS (step, step_name, n_users, n_prev)")
      .select(col("step").cast("int").as("step"), col("step_name"),
        col("n_users"),
        Det.r4(when(col("n_prev") > 0,
          col("n_users").cast("double") / col("n_prev")))
          .as("conv_prev"))
      .orderBy(col("step").asc)
  }

  /** Weekly cohort retention: cohort = ISO week of a user's FIRST
    * event (any type), activity = a purchase in a given later week;
    * retention(cohort, offset) = active users / cohort size.
    *
    * Plan: one user-keyed min (first event) → cohort week map-side;
    * activity joins the purchase slice back on user_id (fact ⊗
    * users-sized — shuffles once on the key), distincts per
    * (user, cohort, offset), then aggregates to the tiny
    * weeks × offsets grid; cohort sizes are a weeks-sized table
    * broadcast into the rate division. */
  private val retention: Q = (s, d) => {
    val e = ev(s, d)
    val f = e.groupBy(col("user_id")).agg(min(col("ts")).as("first_ts"))
      .select(col("user_id"),
        to_date(date_trunc("week", col("first_ts"))).as("cohort_week"))
    val act = e.filter(col("event_type") === "purchase")
      .select(col("user_id"),
        to_date(date_trunc("week", col("ts"))).as("wk"))
      .join(f, Seq("user_id"))
      .select(col("user_id"), col("cohort_week"),
        expr("CAST(datediff(wk, cohort_week) div 7 AS BIGINT)")
          .as("week_offset"))
      .distinct()
    val grid = act.groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_active"))
    val sizes = f.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_users"))
    grid.join(broadcast(sizes), Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        col("cohort_users"),
        Det.r4(col("n_active").cast("double") / col("cohort_users"))
          .as("retention"))
      .orderBy(col("cohort_week").asc, col("week_offset").asc)
  }

  /** Daily resample with gap-fill and a 7-day trailing moving average.
    *
    * Per-day totals are one keyed agg (the only corpus-sized shuffle);
    * the day spine is `sequence(min_day, max_day)` exploded from a
    * 1-row bound agg, left-joined to zero-fill missing days. The
    * trailing window is a spine ⊗ spine band join (g.day ∈
    * [day−6, day]) instead of a global range-frame window — the spine
    * is time-bounded (3 652 rows per decade), so the self-join is a
    * broadcast with NO single-partition WindowExec at any data scale.
    * Daily sums are qi4-quantized longs BEFORE the window sum, so the
    * 7-term accumulation is exact integer arithmetic in both engines. */
  /** Gap-filled day spine with per-day counts and qi4-quantized value
    * sums — the shared base of [[resample]] and [[anomaly]]. One
    * corpus-sized keyed agg; the spine itself is `sequence()` exploded
    * from a 1-row bounds agg (time-bounded at any data scale). */
  private def filledSpine(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d)
      .select(to_date(date_trunc("day", col("ts"))).as("day"), col("value"))
    val daily = e.groupBy(col("day"))
      .agg(count(lit(1)).as("n_events"),
        Det.qi4(Det.dsum(col("value"))).as("sv_q"))
    val bounds = e.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val spine = bounds.select(
      explode(sequence(col("d0"), col("d1"), expr("INTERVAL 1 DAY")))
        .as("day"))
    spine.join(broadcast(daily), Seq("day"), "left")
      .select(col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("sv_q"), lit(0L)).as("sv_q"))
  }

  private val resample: Q = (s, d) => {
    val filled = filledSpine(s, d)
    val g = filled.select(col("day").as("g_day"), col("sv_q").as("g_sv_q"))
    filled.join(broadcast(g),
        col("g_day") >= date_sub(col("day"), 6) && col("g_day") <= col("day"))
      .groupBy(col("day"), col("n_events"), col("sv_q"))
      .agg(sum(col("g_sv_q")).as("win_q"), count(lit(1)).as("win_days"))
      .select(col("day"), col("n_events"),
        Det.r4(col("sv_q") / lit(10000.0)).as("sum_value"),
        Det.r4(col("win_q") / lit(10000.0) / col("win_days")).as("ma7"))
      .orderBy(col("day").asc)
  }

  /** Anomaly flag threshold: |z| > 2 trailing standard deviations. */
  private[graft] val AnomalyZ = 2.0

  /** Daily-volume anomaly detection: each day's value total scored
    * against the 7 PRECEDING days (current day excluded — the
    * baseline must not contain the observation it judges):
    * z = (x − mean7) / sd7, flagged at |z| > [[AnomalyZ]].
    *
    * Exact-arithmetic windowed variance, two spine-sized band joins:
    * pass 1 sums the trailing qi4 day totals (exact longs) into the
    * baseline mean; pass 2 re-joins the trailing days and sums each
    * day's SQUARED deviation, itself qi4-quantized before the
    * cross-day sum — so both moments cross their accumulation
    * boundaries as order-free integers, and z is a final two-operand
    * IEEE expression on engine-identical values. The deviation square
    * is an explicit multiplication, NOT `pow(x, 2)` — libm pow is not
    * guaranteed exactly-rounded, multiplication is. Days with zero
    * trailing variance emit z = NULL, never a division blow-up; the
    * first spine day has no trailing baseline at all, so the inner
    * band join OMITS it from the result entirely (both engines —
    * EventsSpec asserts rows == spine − 1). */
  private val anomaly: Q = (s, d) => {
    val filled = filledSpine(s, d)
    val g = filled.select(col("day").as("g_day"), col("sv_q").as("g_sv_q"))
    val trailing = col("g_day") >= date_sub(col("day"), 7) &&
      col("g_day") < col("day")
    val m = filled.join(broadcast(g), trailing)
      .groupBy(col("day"), col("sv_q"))
      .agg(sum(col("g_sv_q")).as("wq"), count(lit(1)).as("wn"))
      .withColumn("mean7", col("wq") / lit(10000.0) / col("wn"))
    val dev = col("g_sv_q") / lit(10000.0) - col("mean7")
    val v = m.join(broadcast(g), trailing)
      .groupBy(col("day"), col("sv_q"), col("mean7"), col("wn"))
      .agg(sum(Det.qi4(dev * dev)).as("ssd_q"))
    val z = when(col("ssd_q") > 0,
      (col("sv_q") / lit(10000.0) - col("mean7"))
        / sqrt(col("ssd_q") / lit(10000.0) / col("wn")))
    v.select(col("day"),
        Det.r4(col("sv_q") / lit(10000.0)).as("sum_value"),
        Det.r4(col("mean7")).as("mean7"),
        Det.r4(sqrt(col("ssd_q") / lit(10000.0) / col("wn"))).as("sd7"),
        Det.r4(z).as("z"),
        coalesce(abs(z) > AnomalyZ, lit(false)).as("is_anomaly"))
      .orderBy(col("day").asc)
  }

  /** Last-touch attribution: each purchase credited to the user's most
    * recent click in the preceding 2 hours (the argmax refinement of
    * [[StreamingOps.streamStreamJoin]]'s all-matches form).
    *
    * The candidate join is the same user-keyed equi-join with the time
    * band as residual; the argmax then runs as max(click_ts) per
    * purchase + an equality join back for the click id (with a max
    * tie-break on id for same-millisecond clicks) — all keyed by
    * purchase_id, partial-aggregated, no per-user window sort. */
  /** Event-type transition matrix: P(next type | current type) over
    * each user's time-ordered event sequence — the first-order Markov
    * model behind behavioral segmentation and anomaly scoring on an
    * event stream.
    *
    * Plan: one user-keyed window (`lead` over the user timeline — the
    * high-cardinality partitioning that scales; never a global
    * ordering), then the corpus collapses into a ≤|types|² transition
    * agg; row totals attach to that tiny frame via a from-keyed window
    * (spec-bounded rows, not corpus). Probabilities are exact-count
    * ratios r4-rounded at the edge. */
  private val markov: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    ev(s, d)
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .withColumn("n_from",
        sum(col("n_transitions")).over(Window.partitionBy(col("from_type"))))
      .select(col("from_type"), col("to_type"), col("n_transitions"),
        Det.r4(col("n_transitions").cast("double") / col("n_from")).as("p"))
      .orderBy(col("from_type").asc, col("to_type").asc)
  }

  private val attribution: Q = (s, d) => {
    val e = ev(s, d)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("ts").as("purchase_ts"))
    val cand = clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") < col("click_ts") + expr("INTERVAL 2 HOURS"))
    val best = cand.groupBy(col("purchase_id"))
      .agg(max(col("click_ts")).as("click_ts"))
    cand.join(best, Seq("purchase_id", "click_ts"))
      .groupBy(col("purchase_id"), col("user_id"),
        col("purchase_ts"), col("click_ts"))
      .agg(max(col("click_id")).as("click_id"))
      .select(col("purchase_id"), col("user_id"), col("click_id"),
        (unix_millis(col("purchase_ts")) - unix_millis(col("click_ts")))
          .as("delay_ms"))
      .orderBy(col("purchase_id").asc)
  }

  /** Rolling active-user counts: daily actives (DAU), trailing-7-day
    * actives (WAU), and the DAU/WAU stickiness ratio.
    *
    * A sliding distinct count does NOT partial-aggregate (distinct
    * sets don't merge by addition), so the scale plan materializes the
    * (user, day) activity grid once — one corpus-sized distinct — and
    * fans each activity row out to the ≤7 spine days whose trailing
    * window contains it (map-side date arithmetic against a broadcast
    * time-bounded spine), then distinct-counts per day. Volume is
    * bounded by 7 × |activity grid|, keyed end to end. */
  private val dauWau: Q = (s, d) => {
    val ud = ev(s, d)
      .select(col("user_id"), to_date(date_trunc("day", col("ts"))).as("day"))
      .distinct()
    val bounds = ud.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val spine = bounds.select(
      explode(sequence(col("d0"), col("d1"), expr("INTERVAL 1 DAY")))
        .as("day"))
    val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = ud.select(col("user_id"), col("day").as("a_day"))
      .join(broadcast(spine),
        col("a_day") >= date_sub(col("day"), 6) && col("a_day") <= col("day"))
      .select(col("day"), col("user_id")).distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("wau"))
    spine.join(broadcast(dau), Seq("day"), "left")
      .join(broadcast(wau), Seq("day"), "left")
      .select(col("day"),
        coalesce(col("dau"), lit(0L)).as("dau"),
        coalesce(col("wau"), lit(0L)).as("wau"))
      .withColumn("stickiness",
        when(col("wau") > 0,
          Det.r4(col("dau").cast("double") / col("wau"))))
      .orderBy(col("day").asc)
  }

  /** CUSUM drift allowance and decision threshold, in global-sd units. */
  private[graft] val CusumK = 0.25
  private[graft] val CusumH = 2.5

  /** CUSUM changepoint detection over daily value totals — the
    * sequential drift monitor (Page 1954) that flags a sustained level
    * shift long before any single day trips a z-score:
    * S⁺ᵢ = max(0, S⁺ᵢ₋₁ + (xᵢ − μ − k)), S⁻ mirrored, alarm at h·σ.
    *
    * The recurrence looks inherently sequential, but the clamped form
    * has a closed prefix identity: Sᵢ = Pᵢ − min(0, min_{j≤i} Pⱼ)
    * where P is the plain prefix sum of the drift-adjusted deviations.
    * So the whole statistic is two prefix aggregates over the day
    * spine — computed here as spine triangle joins (days² pairs is
    * time-bounded: a decade is ~6.7 M — data-scale-invariant), while
    * the ORACLE states the textbook running window form, making the
    * driver hash-compare the identity's proof. All deviations are qi4
    * longs (μ and k quantized once), so prefix sums and the min/clamp
    * are exact integer arithmetic in both engines. */
  private val cusum: Q = (s, d) => {
    val filled = filledSpine(s, d)
    // global mean and sd of the daily totals (exact two-pass moments)
    val g1 = filled.agg(sum(col("sv_q")).as("tq"), count(lit(1)).as("nd"))
      .withColumn("mu", col("tq") / lit(10000.0) / col("nd"))
    val dev = col("sv_q") / lit(10000.0) - col("mu")
    val g2 = filled.crossJoin(broadcast(g1))
      .agg(sum(Det.qi4(dev * dev)).as("ssd_q"),
        first(col("mu")).as("mu"), first(col("nd")).as("nd"))
      .withColumn("sd", sqrt(col("ssd_q") / lit(10000.0) / col("nd")))
      .withColumn("mu_q", Det.qi4(col("mu")))
      .withColumn("k_q", Det.qi4(col("sd") * CusumK))
      .withColumn("h_q", Det.qi4(col("sd") * CusumH))
      .select(col("mu_q"), col("k_q"), col("h_q"))
    val z = filled.crossJoin(broadcast(g2))
      .select(col("day"), col("sv_q"),
        (col("sv_q") - col("mu_q") - col("k_q")).as("z_hi_q"),
        (col("mu_q") - col("sv_q") - col("k_q")).as("z_lo_q"),
        col("h_q"))
    // prefix sums via spine triangle join (g.day <= day)
    val zg = z.select(col("day").as("g_day"),
      col("z_hi_q").as("g_hi"), col("z_lo_q").as("g_lo"))
    val p = z.join(broadcast(zg), col("g_day") <= col("day"))
      .groupBy(col("day"), col("sv_q"), col("h_q"))
      .agg(sum(col("g_hi")).as("p_hi"), sum(col("g_lo")).as("p_lo"))
    // prefix mins of P via a second triangle pass
    val pg = p.select(col("day").as("g_day"),
      col("p_hi").as("g_phi"), col("p_lo").as("g_plo"))
    p.join(broadcast(pg), col("g_day") <= col("day"))
      .groupBy(col("day"), col("sv_q"), col("h_q"),
        col("p_hi"), col("p_lo"))
      .agg(min(col("g_phi")).as("m_hi"), min(col("g_plo")).as("m_lo"))
      .select(col("day"),
        Det.r4(col("sv_q") / lit(10000.0)).as("sum_value"),
        (col("p_hi") - least(lit(0L), col("m_hi"))).as("s_hi_q"),
        (col("p_lo") - least(lit(0L), col("m_lo"))).as("s_lo_q"),
        col("h_q"))
      .select(col("day"), col("sum_value"),
        Det.r4(col("s_hi_q") / lit(10000.0)).as("s_hi"),
        Det.r4(col("s_lo_q") / lit(10000.0)).as("s_lo"),
        (col("s_hi_q") > col("h_q")).as("shift_up"),
        (col("s_lo_q") > col("h_q")).as("shift_down"))
      .orderBy(col("day").asc)
  }

  /** Histogram bin count over `events.value`. */
  private[graft] val HistBins = 20

  /** Equal-width histogram of `events.value`: 20 bins over the
    * observed [min, max], top edge clamped into the last bin.
    *
    * Two passes over the fact by necessity (exact global bounds, then
    * binning — a fixed-spec or approx-quantile variant would be one);
    * the bounds row broadcasts into a map-side bin assignment, so the
    * only shuffle is the 20-row bin aggregation. Bin math is pure IEEE
    * double arithmetic in the identical textual form in both engines
    * (subtract, scale, divide, floor) — bit-identical results with no
    * rounding hazard. */
  private val histogram: Q = (s, d) => {
    val e = Tables.events(s, d).select(col("value"))
    val b = e.agg(min(col("value")).as("v0"), max(col("value")).as("v1"),
      count(lit(1)).as("n_total"))
    e.crossJoin(broadcast(b))
      .select(least(lit(HistBins - 1),
          floor(((col("value") - col("v0")) * HistBins) / (col("v1") - col("v0"))))
          .cast("long").as("bin"),
        col("v0"), col("v1"), col("n_total"))
      .groupBy(col("bin"), col("v0"), col("v1"), col("n_total"))
      .agg(count(lit(1)).as("n"))
      .select(col("bin"),
        Det.r4(col("v0") + (col("bin") * (col("v1") - col("v0"))) / HistBins)
          .as("bin_lo"),
        Det.r4(col("v0") + ((col("bin") + 1) * (col("v1") - col("v0"))) / HistBins)
          .as("bin_hi"),
        col("n"),
        Det.r4(col("n").cast("double") / col("n_total")).as("share"))
      .orderBy(col("bin").asc)
  }

  val queries: Map[String, Q] = Map(
    "q_events_funnel" -> funnel,
    "q_events_retention" -> retention,
    "q_events_resample" -> resample,
    "q_events_anomaly" -> anomaly,
    "q_events_attribution" -> attribution,
    "q_events_dau_wau" -> dauWau,
    "q_events_cusum" -> cusum,
    "q_events_markov" -> markov,
    "q_agg_histogram" -> histogram,
  )

  val oracle: Map[String, String] = Map(
    "q_events_funnel" ->
      s"""WITH e AS (
         |  SELECT user_id, event_type,
         |         ${Det.sqlEts("ts")} AS ts
         |  FROM events),
         |s1 AS (SELECT user_id, MIN(ts) AS t1 FROM e
         |       WHERE event_type = 'signup' GROUP BY 1),
         |s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM e
         |       JOIN s1 USING (user_id)
         |       WHERE e.event_type = 'view' AND e.ts > s1.t1
         |         AND e.ts <= s1.t1 + INTERVAL $FunnelWindowHours HOUR
         |       GROUP BY 1),
         |s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM e
         |       JOIN s2 USING (user_id)
         |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2
         |         AND e.ts <= s2.t2 + INTERVAL $FunnelWindowHours HOUR
         |       GROUP BY 1),
         |c AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n1,
         |             (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS n2,
         |             (SELECT CAST(COUNT(*) AS BIGINT) FROM s3) AS n3),
         |u AS (
         |  SELECT 1 AS step, 'signup' AS step_name, n1 AS n_users, n1 AS n_prev FROM c
         |  UNION ALL
         |  SELECT 2, 'view', n2, n1 FROM c
         |  UNION ALL
         |  SELECT 3, 'purchase', n3, n2 FROM c)
         |SELECT step, step_name, n_users,
         |       CASE WHEN n_prev > 0 THEN
         |         ${Det.sqlR4("CAST(n_users AS DOUBLE) / n_prev")}
         |       END AS conv_prev
         |FROM u ORDER BY step ASC""".stripMargin,
    "q_events_retention" ->
      s"""WITH e AS (
         |  SELECT user_id, event_type, ${Det.sqlEts("ts")} AS ts
         |  FROM events),
         |f AS (SELECT user_id,
         |             CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
         |      FROM e GROUP BY 1),
         |act AS (
         |  SELECT DISTINCT e.user_id, f.cohort_week,
         |         CAST(date_diff('day', f.cohort_week,
         |             CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS BIGINT)
         |           AS week_offset
         |  FROM e JOIN f USING (user_id)
         |  WHERE e.event_type = 'purchase'),
         |grid AS (SELECT cohort_week, week_offset,
         |                CAST(COUNT(*) AS BIGINT) AS n_active
         |         FROM act GROUP BY 1, 2),
         |sizes AS (SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_users
         |          FROM f GROUP BY 1)
         |SELECT cohort_week, week_offset, n_active, cohort_users,
         |       ${Det.sqlR4("CAST(n_active AS DOUBLE) / cohort_users")}
         |         AS retention
         |FROM grid JOIN sizes USING (cohort_week)
         |ORDER BY cohort_week ASC, week_offset ASC""".stripMargin,
    "q_events_resample" ->
      s"""WITH e AS (
         |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, value
         |  FROM events),
         |daily AS (
         |  SELECT day, CAST(COUNT(*) AS BIGINT) AS n_events,
         |         ${Det.sqlQi4(Det.sqlDsum("value"))} AS sv_q
         |  FROM e GROUP BY 1),
         |b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM e),
         |spine AS (
         |  SELECT CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
         |           AS day
         |  FROM b),
         |filled AS (
         |  SELECT s.day, COALESCE(daily.n_events, 0) AS n_events,
         |         COALESCE(daily.sv_q, 0) AS sv_q
         |  FROM spine s LEFT JOIN daily USING (day)),
         |m AS (
         |  SELECT f.day, f.n_events, f.sv_q,
         |         CAST(SUM(g.sv_q) AS BIGINT) AS win_q,
         |         CAST(COUNT(*) AS BIGINT) AS win_days
         |  FROM filled f JOIN filled g
         |    ON g.day >= f.day - 6 AND g.day <= f.day
         |  GROUP BY 1, 2, 3)
         |SELECT day, n_events,
         |       ${Det.sqlR4("sv_q / 10000.0")} AS sum_value,
         |       ${Det.sqlR4("win_q / 10000.0 / win_days")} AS ma7
         |FROM m ORDER BY day ASC""".stripMargin,
    "q_events_anomaly" ->
      s"""WITH e AS (
         |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, value
         |  FROM events),
         |daily AS (
         |  SELECT day, ${Det.sqlQi4(Det.sqlDsum("value"))} AS sv_q
         |  FROM e GROUP BY 1),
         |b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM e),
         |spine AS (
         |  SELECT CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
         |           AS day
         |  FROM b),
         |f AS (
         |  SELECT s.day, COALESCE(daily.sv_q, 0) AS sv_q
         |  FROM spine s LEFT JOIN daily USING (day)),
         |m AS (
         |  SELECT f.day, f.sv_q,
         |         CAST(SUM(g.sv_q) AS BIGINT) AS wq,
         |         CAST(COUNT(*) AS BIGINT) AS wn
         |  FROM f JOIN f g ON g.day >= f.day - 7 AND g.day < f.day
         |  GROUP BY 1, 2),
         |mm AS (SELECT day, sv_q, wq / 10000.0 / wn AS mean7, wn FROM m),
         |v AS (
         |  SELECT mm.day, mm.sv_q, mm.mean7, mm.wn,
         |         CAST(SUM(${Det.sqlQi4(
               "(g.sv_q / 10000.0 - mm.mean7) * (g.sv_q / 10000.0 - mm.mean7)")})
         |           AS BIGINT) AS ssd_q
         |  FROM mm JOIN f g ON g.day >= mm.day - 7 AND g.day < mm.day
         |  GROUP BY 1, 2, 3, 4),
         |zz AS (
         |  SELECT day, sv_q, mean7, wn, ssd_q,
         |         CASE WHEN ssd_q > 0 THEN
         |           (sv_q / 10000.0 - mean7) / SQRT(ssd_q / 10000.0 / wn)
         |         END AS z
         |  FROM v)
         |SELECT day,
         |       ${Det.sqlR4("sv_q / 10000.0")} AS sum_value,
         |       ${Det.sqlR4("mean7")} AS mean7,
         |       ${Det.sqlR4("SQRT(ssd_q / 10000.0 / wn)")} AS sd7,
         |       ${Det.sqlR4("z")} AS z,
         |       COALESCE(ABS(z) > $AnomalyZ, FALSE) AS is_anomaly
         |FROM zz ORDER BY day ASC""".stripMargin,
    "q_events_markov" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, event_type, ${Det.sqlEts("ts")} AS ts
         |  FROM events),
         |p AS (
         |  SELECT event_type AS from_type,
         |         LEAD(event_type, 1) OVER (PARTITION BY user_id
         |           ORDER BY ts ASC, event_id ASC) AS to_type
         |  FROM e),
         |t AS (
         |  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_transitions
         |  FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2),
         |f AS (
         |  SELECT *, CAST(SUM(n_transitions) OVER (PARTITION BY from_type)
         |           AS BIGINT) AS n_from
         |  FROM t)
         |SELECT from_type, to_type, n_transitions,
         |       ${Det.sqlR4("CAST(n_transitions AS DOUBLE) / n_from")} AS p
         |FROM f
         |ORDER BY from_type ASC, to_type ASC""".stripMargin,
    "q_events_attribution" ->
      s"""WITH e AS (
         |  SELECT event_id, user_id, event_type, ${Det.sqlEts("ts")} AS ts
         |  FROM events),
         |c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
         |      FROM e WHERE event_type = 'click'),
         |p AS (SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
         |      FROM e WHERE event_type = 'purchase'),
         |cand AS (
         |  SELECT p.purchase_id, p.user_id, p.purchase_ts,
         |         c.click_id, c.click_ts
         |  FROM c JOIN p ON c.user_id = p.user_id
         |    AND p.purchase_ts >= c.click_ts
         |    AND p.purchase_ts < c.click_ts + INTERVAL 2 HOUR),
         |best AS (
         |  SELECT purchase_id, MAX(click_ts) AS click_ts
         |  FROM cand GROUP BY 1)
         |SELECT cand.purchase_id, cand.user_id,
         |       CAST(MAX(cand.click_id) AS BIGINT) AS click_id,
         |       CAST(epoch_ms(cand.purchase_ts) - epoch_ms(cand.click_ts)
         |         AS BIGINT) AS delay_ms
         |FROM cand JOIN best
         |  ON cand.purchase_id = best.purchase_id
         | AND cand.click_ts = best.click_ts
         |GROUP BY cand.purchase_id, cand.user_id,
         |         cand.purchase_ts, cand.click_ts
         |ORDER BY cand.purchase_id ASC""".stripMargin,
    "q_events_dau_wau" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        |  FROM events),
        |b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ud),
        |spine AS (
        |  SELECT CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
        |           AS day
        |  FROM b),
        |dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY 1),
        |wau AS (
        |  SELECT s.day, CAST(COUNT(DISTINCT ud.user_id) AS BIGINT) AS wau
        |  FROM spine s JOIN ud
        |    ON ud.day >= s.day - 6 AND ud.day <= s.day
        |  GROUP BY 1)
        |SELECT s.day, COALESCE(dau.dau, 0) AS dau, COALESCE(wau.wau, 0) AS wau,
        |       CASE WHEN COALESCE(wau.wau, 0) > 0 THEN
        |         FLOOR(CAST(COALESCE(dau.dau, 0) AS DOUBLE) / wau.wau * 10000 + 0.5) / 10000
        |       END AS stickiness
        |FROM spine s LEFT JOIN dau ON dau.day = s.day
        |LEFT JOIN wau ON wau.day = s.day
        |ORDER BY s.day ASC""".stripMargin,
    "q_events_cusum" ->
      s"""WITH e AS (
         |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, value
         |  FROM events),
         |daily AS (
         |  SELECT day, ${Det.sqlQi4(Det.sqlDsum("value"))} AS sv_q
         |  FROM e GROUP BY 1),
         |b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM e),
         |spine AS (
         |  SELECT CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
         |           AS day
         |  FROM b),
         |f AS (
         |  SELECT s.day, COALESCE(daily.sv_q, 0) AS sv_q
         |  FROM spine s LEFT JOIN daily USING (day)),
         |g1 AS (
         |  SELECT CAST(SUM(sv_q) AS BIGINT) AS tq,
         |         CAST(COUNT(*) AS BIGINT) AS nd
         |  FROM f),
         |g1m AS (SELECT tq, nd, tq / 10000.0 / nd AS mu FROM g1),
         |g2 AS (
         |  SELECT ${Det.sqlQi4("mu")} AS mu_q,
         |         ${Det.sqlQi4(
               "SQRT(CAST(SUM(" + Det.sqlQi4(
                 "(sv_q / 10000.0 - mu) * (sv_q / 10000.0 - mu)") +
               ") AS BIGINT) / 10000.0 / nd) * " + CusumK)} AS k_q,
         |         ${Det.sqlQi4(
               "SQRT(CAST(SUM(" + Det.sqlQi4(
                 "(sv_q / 10000.0 - mu) * (sv_q / 10000.0 - mu)") +
               ") AS BIGINT) / 10000.0 / nd) * " + CusumH)} AS h_q
         |  FROM f CROSS JOIN g1m
         |  GROUP BY mu, nd),
         |z AS (
         |  SELECT f.day, f.sv_q,
         |         f.sv_q - g2.mu_q - g2.k_q AS z_hi_q,
         |         g2.mu_q - f.sv_q - g2.k_q AS z_lo_q,
         |         g2.h_q
         |  FROM f CROSS JOIN g2),
         |p AS (
         |  SELECT day, sv_q, h_q,
         |         CAST(SUM(z_hi_q) OVER w AS BIGINT) AS p_hi,
         |         CAST(SUM(z_lo_q) OVER w AS BIGINT) AS p_lo
         |  FROM z
         |  WINDOW w AS (ORDER BY day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |m AS (
         |  SELECT day, sv_q, h_q, p_hi, p_lo,
         |         CAST(MIN(p_hi) OVER w AS BIGINT) AS m_hi,
         |         CAST(MIN(p_lo) OVER w AS BIGINT) AS m_lo
         |  FROM p
         |  WINDOW w AS (ORDER BY day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |SELECT day,
         |       ${Det.sqlR4("sv_q / 10000.0")} AS sum_value,
         |       ${Det.sqlR4("(p_hi - LEAST(0, m_hi)) / 10000.0")} AS s_hi,
         |       ${Det.sqlR4("(p_lo - LEAST(0, m_lo)) / 10000.0")} AS s_lo,
         |       (p_hi - LEAST(0, m_hi)) > h_q AS shift_up,
         |       (p_lo - LEAST(0, m_lo)) > h_q AS shift_down
         |FROM m ORDER BY day ASC""".stripMargin,
    "q_agg_histogram" ->
      s"""WITH b AS (
         |  SELECT MIN(value) AS v0, MAX(value) AS v1,
         |         CAST(COUNT(*) AS BIGINT) AS n_total
         |  FROM events),
         |h AS (
         |  SELECT CAST(LEAST(${HistBins - 1},
         |           FLOOR(((value - v0) * $HistBins) / (v1 - v0))) AS BIGINT)
         |           AS bin,
         |         v0, v1, n_total
         |  FROM events CROSS JOIN b)
         |SELECT bin,
         |       ${Det.sqlR4(s"v0 + (bin * (v1 - v0)) / $HistBins")} AS bin_lo,
         |       ${Det.sqlR4(s"v0 + ((bin + 1) * (v1 - v0)) / $HistBins")} AS bin_hi,
         |       CAST(COUNT(*) AS BIGINT) AS n,
         |       ${Det.sqlR4("CAST(COUNT(*) AS DOUBLE) / n_total")} AS share
         |FROM h GROUP BY bin, v0, v1, n_total
         |ORDER BY bin ASC""".stripMargin,
  )
}
