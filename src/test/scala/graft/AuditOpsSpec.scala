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
}
