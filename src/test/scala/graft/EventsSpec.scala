package graft

import graft.operators.{Dedup, Events, Relational}
import org.apache.spark.sql.functions._

/** Property checks for the event-analytics and decontamination operators —
  * each invariant is recomputed independently of the operator under test.
  */
class EventsSpec extends SparkSpec {

  private lazy val events = Tables.events(spark, sfDir).cache()

  test("evt_sessionize: partitions events exactly, respects the gap rule") {
    val sessions = Events.sessionize(spark, sfDir).collect()
    val nEvents = events.count()
    assert(sessions.map(_.getAs[Long]("n_events")).sum === nEvents,
      "sessions must partition the event set")
    assert(sessions.forall(_.getAs[Long]("duration_s") >= 0L))
    // independent recomputation: walking each user's sorted timestamps
    // with the same 4 h gap rule yields the same session count
    // ts is raw epoch-nanos int64 (parquet timestamp[ns])
    val byUser = events.select("user_id", "ts").collect()
      .map(r => (r.getLong(0), Math.floorDiv(r.getLong(1), 1000000000L)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val expectedSessions = byUser.values.map { ts =>
      1 + ts.sliding(2).count(w => w.length == 2 && w(1) - w(0) > 14400)
    }.sum
    assert(sessions.length === expectedSessions)
    // session_idx runs 1..k per user
    sessions.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rows) =>
      val idxs = rows.map(_.getAs[Long]("session_idx")).sorted
      assert(idxs === (1L to idxs.length).toArray)
    }
  }

  test("evt_paths: trigram paths respect session boundaries and user isolation") {
    import spark.implicits._
    val gapNs = 14400L * 1000000000L
    val secNs = 1000000000L
    val t0 = 1700000000L * secNs
    // user 1: A B C D (one session), >4 h break, E F G (second session);
    // user 2: interleaved timestamps, A B only — no trigram of its own
    // and none crossing users
    val rows = Seq(
      (1L, t0 + 0 * secNs, 1L, "A"), (2L, t0 + 1 * secNs, 1L, "B"),
      (3L, t0 + 2 * secNs, 1L, "C"), (4L, t0 + 3 * secNs, 1L, "D"),
      (5L, t0 + 3 * secNs + gapNs + secNs, 1L, "E"),
      (6L, t0 + 3 * secNs + gapNs + 2 * secNs, 1L, "F"),
      (7L, t0 + 3 * secNs + gapNs + 3 * secNs, 1L, "G"),
      (8L, t0 + 0 * secNs, 2L, "A"), (9L, t0 + 1 * secNs, 2L, "B"))
      .map { case (id, ts, u, t) => (id, ts, u, t, 1.0, "{}") }
    val dir = java.nio.file.Files.createTempDirectory("paths").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = Events.paths(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      (1, "A > B > C", 1L), (2, "B > C > D", 1L), (3, "E > F > G", 1L)),
      s"got ${got.toSeq}")
    // sf corpus: at most 10 dense ranks, counts non-increasing
    val sf = Events.paths(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(2))).sortBy(_._1)
    assert(sf.nonEmpty && sf.length <= 10)
    assert(sf.map(_._1).toSeq === (1 to sf.length))
    assert(sf.sliding(2).forall(w => w.length < 2 || w(1)._2 <= w(0)._2))
  }

  test("evt_funnel: stage survivor sets shrink monotonically") {
    val stages = Events.funnel(spark, sfDir).collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_users")).toMap
    assert(stages.keySet === Set("stage1_signup", "stage2_view", "stage3_purchase"))
    assert(stages("stage1_signup") >= stages("stage2_view"))
    assert(stages("stage2_view") >= stages("stage3_purchase"))
    val nUsersWithSignup = events.filter(col("event_type") === "signup")
      .select("user_id").distinct().count()
    assert(stages("stage1_signup") === nUsersWithSignup)
  }

  test("evt_retention: week-0 row covers every cohort member once") {
    val ret = Events.retention(spark, sfDir).collect()
    assert(ret.forall(_.getAs[Long]("week_offset") >= 0L))
    val nUsers = events.select("user_id").distinct().count()
    // every user is active in their own cohort week, so the offset-0 rows
    // across cohorts must sum to the full user count
    val week0 = ret.filter(_.getAs[Long]("week_offset") == 0L)
      .map(_.getAs[Long]("n_users")).sum
    assert(week0 === nUsers)
  }

  test("evt_lifecycle denseWeeks: gap weeks carry their own churn row") {
    import spark.implicits._
    // users 1,2 active week 0; NOBODY active week 1; user 1 returns
    // week 2 (resurrected)
    val wk = 604800000000L * 1000L // one week in epoch-nanos
    val ev = Seq((1L, 0L), (2L, 0L), (1L, 2L))
      .map { case (u, w) => (u, w * wk) }
      .toDF("user_id", "ts")
    def rows(dense: Boolean) =
      Events.lifecycleOf(ev, denseWeeks = dense).orderBy("week").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
    // default (observed weeks only): week 0's churn lands on week 2 —
    // the documented attribution shift on gapped calendars
    assert(rows(dense = false).toSeq === Seq(
      (0L, 2L, 2L, 0L, 0L, 0L),
      (2L, 1L, 0L, 0L, 1L, 2L)))
    // dense: the empty week 1 carries the churn (= week 0's actives) and
    // week 2 correctly shows zero churn
    assert(rows(dense = true).toSeq === Seq(
      (0L, 2L, 2L, 0L, 0L, 0L),
      (1L, 0L, 0L, 0L, 0L, 2L),
      (2L, 1L, 0L, 0L, 1L, 0L)))
  }

  test("evt_json: extracted sums match an independent JSON parse") {
    val got = Events.jsonExtract(spark, sfDir).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("k_sum"), r.getAs[Long]("n_events"), r.getAs[Double]("k_avg")))).toMap
    val expect = events.select("event_type", "props").collect()
      .map { r =>
        val k = """"k":\s*(\d+)""".r.findFirstMatchIn(r.getString(1)).get.group(1).toLong
        (r.getString(0), k)
      }
      .groupBy(_._1).view.mapValues(ks => (ks.map(_._2).sum, ks.length.toLong)).toMap
    assert(got.keySet === expect.keySet)
    got.foreach { case (t, (sum, n, avg)) =>
      assert((sum, n) === expect(t))
      assert(avg === sum.toDouble / n)
    }
  }

  test("q14_anti_join: complement of the urgent-order customer set") {
    val anti = Relational.q14AntiJoin(spark, sfDir).collect()
      .map(_.getAs[Long]("c_custkey")).toSet
    val withUrgent = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    val all = Tables.customer(spark, sfDir)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(anti.intersect(withUrgent).isEmpty)
    assert(anti.union(withUrgent) === all)
  }

  test("dedup_decontaminate: flags exactly the docs sharing a benchmark trigram") {
    val got = Dedup.dedupDecontaminate(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_gram_hits")).toMap
    def grams(text: String): Set[String] =
      text.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val benchGrams = docs.filter(_._1 % 101 == 0).flatMap(d => grams(d._2)).toSet
    val expect = docs.filter(_._1 % 101 != 0)
      .map { case (id, t) => id -> grams(t).count(benchGrams.contains).toLong }
      .filter(_._2 > 0L).toMap
    assert(got === expect)
    assert(got.nonEmpty, "sf0.001 corpus should contain at least one contaminated doc")
  }

  test("evt_window: hourly buckets partition the event set and conserve cents") {
    val win = Events.tumblingWindow(spark, sfDir).collect()
    val nEvents = events.count()
    assert(win.map(_.getAs[Long]("n_events")).sum === nEvents,
      "windows must partition the event set")
    // independent recomputation: hour floor of epoch-µs, per (hour, type)
    val raw = events.select("ts", "event_type", "value", "user_id").collect()
      .map(r => (Math.floorDiv(r.getLong(0) / 1000L, 3600000000L),
        r.getString(1), Math.round(r.getDouble(2) * 100), r.getLong(3)))
    val expect = raw.groupBy(t => (t._1, t._2)).view.mapValues { rows =>
      (rows.length.toLong, rows.map(_._3).sum, rows.map(_._4).distinct.length.toLong)
    }.toMap
    val got = win.map { r =>
      val hour = Math.floorDiv(
        r.getAs[java.sql.Timestamp]("w_start").getTime, 3600000L)
      ((hour, r.getAs[String]("event_type")),
        (r.getAs[Long]("n_events"), r.getAs[Long]("value_cents"),
          r.getAs[Long]("n_users")))
    }.toMap
    assert(got === expect)
  }

  test("evt_attribution: replays the last-preceding-click walk per user") {
    val got = Events.attribution(spark, sfDir).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("click_s"), r.getAs[Boolean]("attributed"))).toMap
    // independent recomputation: per user, walk events in (ts, event_id)
    // order carrying the last click's floor-second
    val raw = events.select("event_id", "user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val expect = raw.groupBy(_._2).values.flatMap { evs =>
      var lastClick = Option.empty[Long]
      evs.sortBy(e => (e._4, e._1)).flatMap { case (id, _, typ, ts) =>
        val out = if (typ == "purchase") {
          val tsS = Math.floorDiv(ts, 1000000000L)
          val attributed = lastClick.exists(c => tsS - c <= 86400L)
          Some(id -> (if (attributed) lastClick.get else -1L, attributed))
        } else None
        if (typ == "click") lastClick = Some(Math.floorDiv(ts, 1000000000L))
        out
      }
    }.toMap
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("evt_transitions: matrix replays the per-user lag walk, probs sum to ~1") {
    val got = Events.transitions(spark, sfDir).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("row_total"), r.getAs[Long]("p6"))).toMap
    val raw = events.select("user_id", "event_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val pairs = raw.groupBy(_._1).values.flatMap { evs =>
      evs.sortBy(e => (e._3, e._2)).sliding(2).collect {
        case Array(a, b)
          if Math.floorDiv(b._3, 1000000000L) - Math.floorDiv(a._3, 1000000000L) <= 14400L =>
          (a._4, b._4)
      }
    }.toSeq
    val expectN = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got.view.mapValues(_._1).toMap === expectN)
    // fixed-point rows sum to 1e6 minus the floor losses (< |types| per row)
    got.groupBy(_._1._1).foreach { case (from, cells) =>
      val s = cells.values.map(_._3).sum
      assert(s <= 1000000L && s > 1000000L - 5 * cells.size,
        s"row $from fixed-point probs sum $s")
      val tot = cells.values.head._2
      assert(cells.values.map(_._1).sum === tot, s"row_total mismatch for $from")
    }
  }

  test("evt_anomaly: integer z-rule agrees with the float computation off the boundary") {
    val got = Events.anomaly(spark, sfDir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("hour")) ->
        (r.getAs[Long]("n_events"), r.getAs[Boolean]("is_spike"))).toMap
    val raw = events.select("event_type", "ts").collect()
      .map(r => (r.getString(0), Math.floorDiv(r.getLong(1), 3600000000000L)))
    val counts = raw.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got.view.mapValues(_._1).toMap === counts)
    // float replay: mean + 2*stddev (population) per type
    counts.keys.groupBy(_._1).foreach { case (t, keys) =>
      val xs = keys.toSeq.map(counts)
      val n = xs.length.toDouble
      val mean = xs.sum / n
      val sd = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / n)
      keys.foreach { k =>
        val x = counts(k).toDouble
        val z = if (sd == 0) 0.0 else (x - mean) / sd
        // stay off the exact boundary: integer and float rules may only
        // disagree within one ulp of z = 2
        if (math.abs(z - 2.0) > 1e-9)
          assert(got(k)._2 === (z > 2.0),
            s"$k z=$z flagged=${got(k)._2}")
      }
    }
  }

  test("evt_dau: trailing-7-day distinct replays; stickiness bounded by 1000") {
    val got = Events.dau(spark, sfDir).collect()
      .map(r => r.getAs[Long]("day") ->
        (r.getAs[Long]("dau"), r.getAs[Long]("wau"), r.getAs[Long]("stickiness_pm")))
      .toMap
    val pd = events.select("ts", "user_id").collect()
      .map(r => (Math.floorDiv(r.getLong(0), 86400000000000L), r.getLong(1)))
      .distinct
    val byDay = pd.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expect = byDay.map { case (d, us) =>
      val wau = (d - 6 to d).flatMap(byDay.get).flatten.toSet.size.toLong
      d -> (us.size.toLong, wau, 1000L * us.size / wau)
    }
    assert(got === expect.toMap)
    got.values.foreach { case (dau, wau, pm) =>
      assert(dau <= wau && pm <= 1000L, "DAU within WAU, stickiness <= 1")
    }
  }

  test("evt_concurrency: two-level prefix sum equals the single global sweep") {
    // independent replay: ONE totally-ordered driver-side sweep over all
    // session boundaries — the formulation the operator decomposes — then
    // per-hour maxima including the carried-in level at each hour's open
    val sess = Events.concurrency(spark, sfDir) // operator under test
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // rebuild sessions directly from raw events (independent code path)
    val raw = events.select("user_id", "event_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2) / 1000000000L))
    // .toSeq before flatMap: flatMapping a Map of tuple results would
    // rebuild a Map and silently drop same-start sessions across users
    val bySess = raw.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._3, e._2)).map(_._3)
      val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      var start = sorted.head; var last = sorted.head
      sorted.tail.foreach { t =>
        if (t - last > 14400L) { out += ((start, last)); start = t }
        last = t
      }
      out += ((start, last)); out
    }.toSeq
    // global sweep
    val deltas = bySess.flatMap { case (st, en) => Seq((st, 1L), (en + 1, -1L)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    var level = 0L
    var carried = Map.empty[Long, Long].withDefaultValue(0L) // hour -> open level
    val maxByHour = scala.collection.mutable.Map[Long, Long]()
    val seenHours = scala.collection.mutable.Set[Long]()
    var prevLevel = 0L
    deltas.foreach { case (t, d) =>
      val hour = t / 3600L
      if (!seenHours.contains(hour)) { seenHours += hour; carried += hour -> prevLevel }
      level += d
      maxByHour(hour) = math.max(maxByHour.getOrElse(hour, carried(hour)), level)
      prevLevel = level
    }
    val expect = maxByHour.map { case (h, m) =>
      h -> (math.max(m, carried(h)), deltas.count(_._1 / 3600L == h).toLong)
    }.toMap
    assert(sess.nonEmpty)
    assert(sess.map(r => r._1 -> ((r._2, r._3))).toMap === expect)
  }

  test("q15_cube: every grouping set is consistent with the base aggregate") {
    val rows = Relational.q15Cube(spark, sfDir).collect()
      .map(r => (r.getAs[String]("status"), r.getAs[String]("priority"),
        r.getAs[Long]("gid"), r.getAs[Long]("sum_price"), r.getAs[Long]("n")))
    val base = rows.filter(_._3 == 0L)
    assert(base.nonEmpty)
    val grand = rows.filter(_._3 == 3L)
    assert(grand.length === 1)
    assert(grand.head._5 === base.map(_._5).sum, "grand total n")
    assert(grand.head._4 === base.map(_._4).sum, "grand total cents")
    // each one-dimension subtotal equals the sum of its base cells
    rows.filter(_._3 == 1L).foreach { case (st, _, _, sp, n) =>
      val cells = base.filter(_._1 == st)
      assert(n === cells.map(_._5).sum && sp === cells.map(_._4).sum,
        s"status subtotal $st")
    }
    rows.filter(_._3 == 2L).foreach { case (_, pr, _, sp, n) =>
      val cells = base.filter(_._2 == pr)
      assert(n === cells.map(_._5).sum && sp === cells.map(_._4).sum,
        s"priority subtotal $pr")
    }
  }

  test("interval-join sweep-line equals the brute pair join on the real table") {
    import org.apache.spark.sql.functions._
    // independent path: the r13 bucketized pair join, recomputed in-test
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("ts div 1000000000").as("ts_s"))
    val inc = Tables.events(spark, sfDir)
      .filter(col("event_type") === "error")
      .select(col("event_id").as("inc_id"), expr("ts div 1000000000").as("t0"))
    val brute = ev.crossJoin(inc)
      .where(col("ts_s") >= col("t0") && col("ts_s") < col("t0") + 600L)
      .groupBy("inc_id")
      .agg(count(lit(1)).as("n_events"), countDistinct("user_id").as("n_users"))
      .orderBy(desc("n_events"), asc("inc_id")).limit(25)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val sweep = operators.Events.intervalJoin(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(sweep === brute, "sweep-line must equal the pair join row for row")
  }

  test("markov: stationary mass is conserved up to floor loss, rows = from-types") {
    val rows = operators.Events.markov(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.nonEmpty && rows.forall(_._2 >= 0L))
    val mass = rows.map(_._2).sum
    // each of the 8 rounds floors once per (to_type) plus the row-norm
    // and uniform-init floors — mass can only leak DOWN, boundedly
    assert(mass <= 1000000L, s"mass grew: $mass")
    assert(mass >= 1000000L - 9L * rows.length * 1000L, s"mass collapsed: $mass")
  }

  test("ffill: -1 before any purchase, carries the latest purchase after") {
    import org.apache.spark.sql.functions._
    val got = operators.Events.ffill(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    // independent single-pass replay in the window's own (ts, id) order
    val byId = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4)))
      .sortBy(t => (t._1, t._2, t._3))
    var lastUser = -1L; var lastPurchase = -1L
    byId.foreach { case (u, _, id, tpe, cents) =>
      if (u != lastUser) { lastUser = u; lastPurchase = -1L }
      if (tpe == "purchase") lastPurchase = cents
      assert(got(id) === lastPurchase, s"event $id (user $u)")
    }
    assert(got.size === byId.length)
  }

  test("evt_survival: KM curve replays a driver-side fold over gap sessions") {
    val rows = Events.survival(spark, sfDir).collect()
    // independent sessions: walk each user's sorted seconds with the gap rule
    val byUser = events.select("user_id", "ts").collect()
      .map(r => (r.getLong(0), Math.floorDiv(r.getLong(1), 1000000000L)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val sessions = byUser.values.flatMap { ts =>
      val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      var t0 = ts.head; var t1 = ts.head
      ts.tail.foreach { t =>
        if (t - t1 > 14400L) { out += ((t0, t1)); t0 = t }
        t1 = t
      }
      out += ((t0, t1))
      out
    }.toSeq
    val dend = sessions.map(_._2).max
    val frame = sessions
      .map { case (t0, t1) => ((t1 - t0) / 60, t1 <= dend - 14400L) }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (t, xs) =>
        (t, xs.count(_._2).toLong, xs.count(!_._2).toLong)
      }
    // reverse-cumulative risk, then the per-mille product recurrence
    var risk = frame.map { case (_, d, c) => d + c }.sum
    var s = 1000L
    val expected = frame.map { case (t, d, c) =>
      if (d > 0) s = s * (risk - d) / risk
      val row = (t, risk, d, c, s)
      risk -= d + c
      row
    }
    assert(rows.length === expected.length)
    rows.sortBy(_.getAs[Long]("t")).zip(expected).foreach { case (r, e) =>
      assert((r.getAs[Long]("t"), r.getAs[Long]("n_risk"),
        r.getAs[Long]("d_ended"), r.getAs[Long]("c_censored"),
        r.getAs[Long]("surv_pm")) === e)
    }
    // the curve is a survival function: non-increasing from ≤1000
    val sv = rows.sortBy(_.getAs[Long]("t")).map(_.getAs[Long]("surv_pm"))
    assert(sv.head <= 1000L && sv.sliding(2).forall(w =>
      w.length < 2 || w(0) >= w(1)))
  }
}
