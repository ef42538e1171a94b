package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Event-analytics operators ([[graft.ops.Events]]): structural
  * invariants plus independent driver-side recomputations over the
  * sf0.001 fixture (1 000 events — trivially collectable in a test;
  * the declared queries themselves never collect). */
class EventsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("funnel: monotone steps, bounded conversions, FSM-replay identity") {
    val rows = SparkEntry.queries("q_events_funnel")(spark, sf)
      .collect().sortBy(_.getAs[Int]("step"))
    assert(rows.length == 3)
    val n = rows.map(_.getAs[Long]("n_users"))
    assert(n(0) >= n(1) && n(1) >= n(2), s"funnel widened: ${n.toSeq}")
    rows.foreach { r =>
      val c = r.getAs[Double]("conv_prev")
      assert(c >= 0.0 && c <= 1.0, s"conv_prev $c out of [0,1]")
    }
    assert(rows(0).getAs[Double]("conv_prev") == 1.0)

    // Independent replay: per-user sequential state machine over the
    // raw events, same strictly-later-within-24h rule.
    val winMs = graft.ops.Events.FunnelWindowHours * 3600L * 1000L
    val ev = graft.io.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        unix_millis(Det.ets(col("ts"))).as("ms"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("ms")))
    val byUser = ev.groupBy(_._1)
    def minAfter(es: Array[(Long, String, Long)], t: String,
        lo: Long, hi: Long): Option[Long] = {
      val c = es.collect { case (_, et, ms) if et == t && ms > lo && ms <= hi => ms }
      if (c.isEmpty) None else Some(c.min)
    }
    var (c1, c2, c3) = (0L, 0L, 0L)
    byUser.values.foreach { es =>
      val sign = es.collect { case (_, "signup", ms) => ms }
      if (sign.nonEmpty) {
        c1 += 1
        val t1 = sign.min
        minAfter(es, "view", t1, t1 + winMs).foreach { t2 =>
          c2 += 1
          if (minAfter(es, "purchase", t2, t2 + winMs).nonEmpty) c3 += 1
        }
      }
    }
    assert(n.toSeq == Seq(c1, c2, c3),
      s"relational funnel ${n.toSeq} != FSM replay ${Seq(c1, c2, c3)}")
  }

  test("retention: rates bounded, cohorts partition the user base") {
    val r = SparkEntry.queries("q_events_retention")(spark, sf).cache()
    try {
      assert(r.count() > 0)
      assert(r.filter(col("n_active") > col("cohort_users") ||
        col("week_offset") < 0 || col("retention") > 1.0 ||
        col("retention") <= 0.0).count() == 0)
      // cohort sizes count every user exactly once
      val users = graft.io.Tables.events(spark, sf)
        .select(col("user_id")).distinct().count()
      val cohortSum = r.select(col("cohort_week"), col("cohort_users"))
        .distinct().agg(sum("cohort_users")).head().getLong(0)
      assert(cohortSum == users,
        s"cohort sizes $cohortSum != distinct users $users")
    } finally r.unpersist()
  }

  test("resample: gapless spine, mass conservation, exact trailing window") {
    val rows = SparkEntry.queries("q_events_resample")(spark, sf)
      .collect()
    val days = rows.map(_.getAs[java.sql.Date]("day").toLocalDate)
    // gapless: consecutive calendar days from min to max
    days.sliding(2).foreach { case Array(a, b) =>
      assert(b == a.plusDays(1), s"spine gap between $a and $b")
    case _ => }
    val total = graft.io.Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == total)
    // trailing 7-day mean recomputed sequentially from the daily sums
    val sums = rows.map(_.getAs[Double]("sum_value"))
    rows.zipWithIndex.foreach { case (r, i) =>
      val w = sums.slice(math.max(0, i - 6), i + 1)
      val expect = math.floor(w.sum / w.length * 10000 + 0.5) / 10000
      val got = r.getAs[Double]("ma7")
      assert(math.abs(got - expect) < 2e-4,
        s"day ${days(i)}: ma7 $got != rolling $expect")
    }
  }

  test("anomaly: trailing baseline excludes the observation it judges") {
    val a = SparkEntry.queries("q_events_anomaly")(spark, sf).collect()
    assert(a.nonEmpty)
    // z agrees with a sequential recomputation from the emitted series
    val xs = a.map(_.getAs[Double]("sum_value"))
    // Row i is spine day i+1 (day 0 has no trailing baseline and is
    // dropped), so its baseline is xs[max(0, i-7) .. i) plus, while the
    // window still reaches back to it (i < 7), the dropped day-0 total —
    // recovered from the resample series.
    val r0 = SparkEntry.queries("q_events_resample")(spark, sf)
      .orderBy(col("day")).select(col("sum_value")).head().getDouble(0)
    a.zipWithIndex.foreach { case (r, i) =>
      val base = (if (i < 7) Seq(r0) else Nil) ++
        xs.slice(math.max(0, i - 7), i)
      val mean = base.sum / base.length
      val sd = math.sqrt(base.map(x => (x - mean) * (x - mean)).sum / base.length)
      val z = r.getAs[java.lang.Double]("z")
      if (sd > 1e-9) {
        assert(z != null, s"row $i: null z with positive trailing sd")
        val expect = (xs(i) - mean) / sd
        assert(math.abs(z - expect) < 0.02,
          s"row $i: z $z != sequential $expect")
        assert(r.getAs[Boolean]("is_anomaly") == (math.abs(z) > 2.0))
      } else assert(z == null && !r.getAs[Boolean]("is_anomaly"))
    }
    // the emitted series must itself skip the first spine day
    val resample = SparkEntry.queries("q_events_resample")(spark, sf).count()
    assert(a.length == resample - 1,
      "anomaly must emit exactly the spine minus the baseline-less first day")
  }

  test("attribution: one credit per purchase, argmax of the all-matches join") {
    val a = SparkEntry.queries("q_events_attribution")(spark, sf).collect()
    assert(a.nonEmpty)
    val ids = a.map(_.getAs[Long]("purchase_id"))
    assert(ids.distinct.length == ids.length, "a purchase credited twice")
    a.foreach { r =>
      val ms = r.getAs[Long]("delay_ms")
      assert(ms >= 0 && ms < 2 * 3600 * 1000L)
    }
    // must be exactly the per-purchase argmax (latest click, max id on
    // ties) of the declared all-matches join
    val all = SparkEntry.queries("q_stream_stream_join")(spark, sf).collect()
      .map(r => (r.getAs[Long]("purchase_id"),
        (r.getAs[Long]("delay_ms"), r.getAs[Long]("click_id"))))
    val expect = all.groupBy(_._1).view.mapValues { g =>
      val minDelay = g.map(_._2._1).min    // latest click = smallest delay
      g.collect { case (_, (d, c)) if d == minDelay => c }.max
    }.toMap
    assert(a.length == expect.size)
    a.foreach { r =>
      val p = r.getAs[Long]("purchase_id")
      assert(r.getAs[Long]("click_id") == expect(p),
        s"purchase $p credited to ${r.getAs[Long]("click_id")}, expected ${expect(p)}")
    }
  }

  test("dau/wau: window dominance and set-union identity") {
    val r = SparkEntry.queries("q_events_dau_wau")(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("dau") <= row.getAs[Long]("wau"))
      val st = row.getAs[java.lang.Double]("stickiness")
      if (st != null) assert(st >= 0.0 && st <= 1.0)
    }
    // wau(day) must equal |∪ trailing-7 daily active sets| — recompute
    // from the raw (user, day) grid
    val grid = graft.io.Tables.events(spark, sf)
      .select(col("user_id"), to_date(date_trunc("day", col("ts"))).as("day"))
      .distinct().collect()
      .map(x => (x.getAs[Long]("user_id"), x.getAs[java.sql.Date]("day").toLocalDate))
    r.foreach { row =>
      val day = row.getAs[java.sql.Date]("day").toLocalDate
      val win = grid.collect {
        case (u, d0) if !d0.isAfter(day) && d0.isAfter(day.minusDays(7)) => u
      }.toSet
      assert(row.getAs[Long]("wau") == win.size,
        s"$day: wau ${row.getAs[Long]("wau")} != union ${win.size}")
    }
  }

  test("cusum: triangle-join prefix form equals the clamped recurrence") {
    val r = SparkEntry.queries("q_events_cusum")(spark, sf).collect()
    assert(r.nonEmpty)
    def qi4(x: Double): Long = math.floor(x * 10000 + 0.5).toLong
    // exact integer replay of S⁺/S⁻ with the SAME quantized μ, k
    val svq = r.map(row => qi4(row.getAs[Double]("sum_value")))
    val nd = svq.length
    val mu = svq.sum.toDouble / 10000.0 / nd
    val ssdQ = svq.map { q =>
      val dev = q / 10000.0 - mu; qi4(dev * dev)
    }.sum
    val sd = math.sqrt(ssdQ / 10000.0 / nd)
    val (muQ, kQ, hQ) =
      (qi4(mu), qi4(sd * graft.ops.Events.CusumK), qi4(sd * graft.ops.Events.CusumH))
    var (sHi, sLo) = (0L, 0L)
    r.zipWithIndex.foreach { case (row, i) =>
      sHi = math.max(0L, sHi + (svq(i) - muQ - kQ))
      sLo = math.max(0L, sLo + (muQ - svq(i) - kQ))
      assert(qi4(row.getAs[Double]("s_hi")) == sHi,
        s"day $i: s_hi ${row.getAs[Double]("s_hi")} != recurrence ${sHi / 10000.0}")
      assert(qi4(row.getAs[Double]("s_lo")) == sLo)
      assert(row.getAs[Boolean]("shift_up") == (sHi > hQ))
      assert(row.getAs[Boolean]("shift_down") == (sLo > hQ))
    }
  }

  test("markov: rows sum to 1 per from-type, counts replay sequentially") {
    val r = SparkEntry.queries("q_events_markov")(spark, sf).collect()
    assert(r.nonEmpty)
    // each row of the transition matrix is a probability distribution
    r.groupBy(_.getAs[String]("from_type")).foreach { case (ft, rows) =>
      val mass = rows.map(_.getAs[Double]("p")).sum
      assert(math.abs(mass - 1.0) < 1e-3 * rows.length,
        s"$ft: row mass $mass")
    }
    // sequential replay: order every user's events on the driver and
    // count adjacent pairs with the same (ts, event_id) tie order
    val evs = graft.io.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(graft.Det.ets(col("ts"))).as("tsm"))
      .collect()
      .map(x => (x.getAs[Long]("user_id"), x.getAs[Long]("event_id"),
        x.getAs[String]("event_type"), x.getLong(3)))
    val want = evs.groupBy(_._1).values.flatMap { g =>
      val types = g.sortBy(e => (e._4, e._2)).map(_._3)
      types.zip(types.drop(1))
    }.toSeq.groupBy(x => x).view.mapValues(_.size.toLong).toMap
    assert(r.length == want.size)
    r.foreach { row =>
      val k = (row.getAs[String]("from_type"), row.getAs[String]("to_type"))
      assert(row.getAs[Long]("n_transitions") == want(k),
        s"$k: ${row.getAs[Long]("n_transitions")} != replay ${want(k)}")
    }
  }

  test("histogram: total mass, bin bounds, every value inside its bin") {
    val h = SparkEntry.queries("q_agg_histogram")(spark, sf).collect()
    val total = graft.io.Tables.events(spark, sf).count()
    assert(h.map(_.getAs[Long]("n")).sum == total)
    val bins = h.map(_.getAs[Long]("bin"))
    assert(bins.forall(b => b >= 0 && b < graft.ops.Events.HistBins))
    assert(bins.distinct.length == bins.length)
    h.foreach { r =>
      assert(r.getAs[Double]("bin_lo") < r.getAs[Double]("bin_hi"))
      val s = r.getAs[Double]("share")
      assert(s > 0.0 && s <= 1.0)
    }
  }
}
