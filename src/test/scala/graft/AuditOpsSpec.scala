package graft

import org.apache.spark.sql.functions._
import graft.operators.{Relational, Sampling, TextOps}

/** Independent-path checks for the audit/planning keys added in round 12:
  * q35_mad (robust dispersion), q36_benford (first-digit audit),
  * sample_holdout (leakage-safe group split), pipe_mix (token-budget
  * mixture planner). Each test recomputes the claimed property by a
  * DIFFERENT path than the operator's plan, so a plan refactor can't
  * silently agree with its own bug.
  */
class AuditOpsSpec extends SparkSpec {

  test("q35_mad equals a driver-side exact sort median / MAD") {
    val rows = Relational.q35Mad(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val cents = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("bigint").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    // lower median: smallest v with 2·(#values ≤ v) ≥ n
    def med(xs: Array[Long]): Long = xs((xs.length - 1) / 2)
    assert(rows.nonEmpty)
    for ((flag, n, medC, madC) <- rows) {
      val xs = cents(flag)
      assert(n === xs.length.toLong, s"$flag row count")
      assert(medC === med(xs), s"$flag median")
      assert(madC === med(xs.map(x => math.abs(x - medC)).sorted), s"$flag MAD")
    }
  }

  test("q36_benford: digit counts partition the orders table; expected table sums to ~1000") {
    val out = Relational.q36Benford(spark, sfDir).collect()
    val total = Tables.orders(spark, sfDir).count()
    assert(out.map(_.getLong(1)).sum === total, "digit histogram must partition all orders")
    assert(out.map(r => r.getLong(0)).toSet.subsetOf((1L to 9L).toSet))
    assert(out.map(_.getLong(3)).sum === 1000L, "Benford expected shares sum to 1000 pm")
    assert(out.forall(r => r.getLong(4) === math.abs(r.getLong(2) - r.getLong(3))))
  }

  test("sample_holdout is leakage-free: every user lands in exactly one split") {
    // independent path: reassign per event, then count distinct (user, split)
    val ev = Tables.events(spark, sfDir)
      .withColumn("b", conv(substring(
        md5(concat(lit("split|"), col("user_id").cast("string"))), 1, 6),
        16, 10).cast("bigint") % 100)
      .withColumn("split", when(col("b") < 80, "train")
        .when(col("b") < 90, "valid").otherwise("test"))
    val users = ev.select("user_id").distinct().count()
    val pairs = ev.select("user_id", "split").distinct().count()
    assert(pairs === users, "a user spanning two splits would leak train into eval")
    val rep = Sampling.sampleHoldout(spark, sfDir).collect()
    assert(rep.map(_.getLong(2)).sum === ev.count(), "splits partition the events")
    assert(rep.map(_.getLong(1)).sum === users, "group-pure split: user counts add up")
  }

  test("pipe_mix arithmetic is self-consistent with its own budget") {
    val rows = TextOps.pipeMix(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val totalKept = rows.map(_.getLong(2)).sum
    val budget = totalKept / 2
    for (r <- rows) {
      val (kept, part, need, rate, epochs, deficit) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
      assert(need === budget * part / 200, s"${r.getString(0)} need_toks")
      if (deficit > 0) {
        assert(rate === 1000000L, "an undersupplied source keeps everything")
        assert(epochs > 100L, "an undersupplied source needs >1 epoch")
        assert(deficit === need - kept)
      } else {
        assert(epochs <= 100L, "an oversupplied source fits in one epoch")
        assert(rate === math.min(1000000L, need * 1000000L / kept))
      }
    }
    // Σ floor-rounded needs never exceeds the budget (parts sum to 200)
    assert(rows.map(_.getLong(4)).sum <= budget)
  }

  test("dedup_bucket_stats: every doc contributes exactly one row per band") {
    val docs = Tables.documents(spark, sfDir).count()
    val rows = operators.Dedup.dedupBucketStats(spark, sfDir).collect()
    assert(rows.length === operators.Dedup.Bands)
    for (r <- rows) {
      assert(r.getLong(2) === docs, s"band ${r.getInt(0)} row mass must equal doc count")
      assert(r.getLong(1) <= docs && r.getLong(1) >= 1, "bucket count bounded by rows")
      assert(r.getLong(3) >= 1, "max bucket at least 1")
      assert(r.getLong(4) <= r.getLong(1), "singletons are buckets")
    }
  }

  test("ann_cell_stats: cells partition the base vectors; shares sum to ~1000") {
    val base = Tables.embeddings(spark, sfDir).filter(col("vec_id") >= 8).count()
    val rows = operators.Ann.annCellStats(spark, sfDir).collect()
    assert(rows.map(_.getLong(1)).sum === base, "cells must partition the base set")
    assert(rows.forall(r => r.getLong(0) >= 8 && r.getLong(0) <= 15), "cells are centroid ids")
    val shares = rows.map(_.getLong(2)).sum
    assert(shares <= 1000 && shares >= 1000 - rows.length, "floor-share accounting")
    assert(rows.forall(r => r.getBoolean(4) === (r.getLong(2) >= 250)))
  }

  test("text_dedup_report: identities hold against independent distinct counts") {
    val docs = Tables.documents(spark, sfDir)
    val r = operators.Dedup.textDedupReport(spark, sfDir).collect().head
    assert(r.getLong(0) === docs.count(), "n_docs")
    assert(r.getLong(1) === docs.select(md5(col("text"))).distinct().count(), "n_distinct")
    assert(r.getLong(2) === r.getLong(0) - r.getLong(1), "n_dup_docs identity")
    assert(r.getLong(5) >= 2 * r.getLong(4), "dup_mass covers every ≥2 cluster twice over")
    assert(r.getLong(6) === 1000 * r.getLong(2) / r.getLong(0), "dup_pm floor arithmetic")
  }

  test("evt_schema_audit: presence bounded by the type totals it reports") {
    val ev = Tables.events(spark, sfDir)
    val totals = ev.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = operators.Events.schemaAudit(spark, sfDir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getLong(3) === totals(r.getString(0)), "n_events matches the raw count")
      assert(r.getLong(2) <= r.getLong(3), "a key cannot be present more often than events exist")
      assert(r.getLong(4) === 1000 * r.getLong(2) / r.getLong(3))
    }
  }

  test("geo_grid_audit: bands partition the occupied cells and the point mass") {
    val n = Tables.events(spark, sfDir).count()
    val rows = operators.Geometry.geoGridAudit(spark, sfDir).collect()
    assert(rows.map(_.getLong(2)).sum === n, "point mass conserved across bands")
    assert(rows.forall(r => r.getLong(1) <= r.getLong(2)), "cells ≤ points per band")
    assert(rows.forall(r => r.getLong(3) >= 1))
  }

  test("evt_freshness: totals, watermark, and last-day counts agree with raw scans") {
    val ev = Tables.events(spark, sfDir).withColumn("us", expr("ts div 1000"))
    val maxUs = ev.agg(max("us")).head.getLong(0)
    val maxDay = maxUs / 86400000000L
    val rows = operators.Events.freshness(spark, sfDir).collect()
    assert(rows.map(_.getLong(1)).sum === ev.count())
    for (r <- rows) {
      val t = r.getString(0)
      assert(r.getLong(3) <= maxUs, "no type is fresher than the corpus watermark")
      assert(r.getLong(4) === maxDay * 86400000000L + 86400000000L - 1 - r.getLong(3),
        s"$t staleness identity")
      val lastDay = ev.filter(col("event_type") === t &&
        expr("us div 86400000000") === maxDay).count()
      assert(r.getLong(5) === lastDay, s"$t last-day count")
    }
  }

  test("evt_lifecycle: growth-accounting identities hold") {
    val rows = operators.Events.lifecycle(spark, sfDir).collect()
      .sortBy(_.getLong(0))
    assert(rows.nonEmpty)
    // states partition the active set each week
    for (r <- rows)
      assert(r.getLong(1) === r.getLong(2) + r.getLong(3) + r.getLong(4),
        s"week ${r.getLong(0)}: active = new + retained + resurrected")
    // first week is all-new, churn identity vs the prior week's actives
    assert(rows.head.getLong(2) === rows.head.getLong(1))
    for (Array(a, b) <- rows.sliding(2))
      assert(b.getLong(5) === a.getLong(1) - b.getLong(3),
        "churned(w) = active(w-1) - retained(w)")
    // total 'new' across weeks = distinct users ever seen
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum === users)
  }

  test("text_novelty: first doc is fully novel; credits sum to the gram vocabulary") {
    val rows = operators.TextOps.textNovelty(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val first = rows.minBy(_._1)
    if (first._2 > 0)
      assert(first._4 === 1000L, "the lowest doc_id's grams are all first-seen")
    for ((id, g, nv, pm) <- rows) {
      assert(nv <= g, s"doc $id: novel ≤ grams")
      assert(pm === (if (g == 0) 0L else 1000L * nv / g))
    }
    // Σ novel credits = |distinct grams in the corpus| (each gram first-seen once)
    val vocab = Tables.documents(spark, sfDir)
      .select(explode(call_function("wgrams3", col("text"))).as("g"))
      .distinct().count()
    assert(rows.map(_._3).sum === vocab)
  }

  test("geo_antimeridian: arc equals a driver-side circular-gap recompute") {
    val pts = Tables.events(spark, sfDir)
      .selectExpr("user_id", "(event_id * 7919) % 36000 AS xi")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted.toArray).toMap
    val rows = operators.Geometry.geoAntimeridian(spark, sfDir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val ls = pts(r.getLong(0))
      val gmax =
        if (ls.length == 1) 36000L
        else math.max(
          ls.sliding(2).map(p => p(1) - p(0)).max,
          36000L - (ls.last - ls.head))
      assert(r.getLong(2) === ls.length.toLong, "n_lons")
      assert(r.getLong(3) === ls.last - ls.head, "naive span")
      assert(r.getLong(4) === 36000L - gmax, "true covering arc")
      assert(r.getBoolean(5) === (r.getLong(3) > 18000L && r.getLong(4) <= 18000L))
      assert(r.getLong(4) <= 36000L && r.getLong(4) >= 0L)
    }
  }

  test("text_len_profile: buckets partition the corpus; masses add up") {
    val docs = Tables.documents(spark, sfDir)
    val rows = operators.TextOps.textLenProfile(spark, sfDir).collect()
    assert(rows.map(_.getLong(2)).sum === docs.count())
    val toks = docs.select(sum(size(expr(
      "filter(split(text, ' '), t -> t <> '')")).cast("bigint"))).head.getLong(0)
    assert(rows.map(_.getLong(3)).sum === toks, "token mass conserved across buckets")
    // per-lang floor shares sum to ≤1000 with bounded slack
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      val s = rs.map(_.getLong(4)).sum
      assert(s <= 1000 && s >= 1000 - rs.length, s"$lang share accounting")
    }
  }
}
