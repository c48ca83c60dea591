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
}
