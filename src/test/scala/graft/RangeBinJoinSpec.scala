package graft

import org.apache.spark.sql.functions._

/** The RangeBinJoin optimizer rule (graft.plans.RangeBinJoin): a
  * literal-width half-open range join must rewrite to a binned hash
  * equi-join — identical results, no nested loop in the plan.
  */
class RangeBinJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points = Seq(
    (1L, 100L), (2L, 599L), (3L, 600L), (4L, 601L), (5L, 1199L),
    (6L, 1200L), (7L, 0L), (8L, 50L)).toDF("p_id", "x")
  private def intervals = Seq(
    (10L, 0L), (11L, 600L), (12L, 550L), (13L, 5000L)).toDF("i_id", "lo")

  private def joined =
    points.join(intervals, col("x") >= col("lo") && col("x") < col("lo") + 600L)

  test("rewrites the literal-width range join to a binned equi-join") {
    val opt = joined.queryExecution.optimizedPlan.toString
    assert(opt.contains("__graft_bin"), s"rule did not fire:\n$opt")
    assert(opt.contains("Generate"), s"no interval explode:\n$opt")
    val phys = joined.queryExecution.sparkPlan.toString
    assert(!phys.contains("BroadcastNestedLoopJoin") &&
      !phys.contains("CartesianProduct"),
      s"range join still plans as a nested loop:\n$phys")
  }

  test("rewritten results equal the nested-loop results, row for row") {
    // intervals: 10=[0,600) 11=[600,1200) 12=[550,1150) 13=[5000,5600)
    val expected = Seq(
      (1L, 10L), (2L, 10L), (7L, 10L), (8L, 10L),
      (3L, 11L), (4L, 11L), (5L, 11L),
      (2L, 12L), (3L, 12L), (4L, 12L)).sorted
    val got = joined.select("p_id", "i_id").as[(Long, Long)].collect().toSeq.sorted
    assert(got == expected)
    spark.conf.set("spark.graft.rangeBinJoin.enabled", "false")
    try {
      val naive = joined.select("p_id", "i_id").as[(Long, Long)]
        .collect().toSeq.sorted
      assert(naive == expected)
      assert(joined.queryExecution.sparkPlan.toString
        .contains("BroadcastNestedLoopJoin"),
        "disable flag must restore the naive plan")
    } finally spark.conf.set("spark.graft.rangeBinJoin.enabled", "true")
  }

  test("null endpoints drop out exactly like the range predicate") {
    val p = Seq((1L, Some(100L)), (2L, None)).toDF("p_id", "x")
    val i = Seq((10L, Some(0L)), (11L, None)).toDF("i_id", "lo")
    val out = p.join(i, col("x") >= col("lo") && col("x") < col("lo") + 600L)
      .select("p_id", "i_id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 10L)))
  }

  test("does not fire when an equi key exists or the width is not literal") {
    val withEqui = points.withColumn("k", col("p_id") % 2)
      .join(intervals.withColumn("k", col("i_id") % 2), Seq("k"))
    assert(!withEqui.queryExecution.optimizedPlan.toString
      .contains("__graft_bin"))
    val dynWidth = points.join(intervals,
      col("x") >= col("lo") && col("x") < col("lo") + col("i_id"))
    assert(!dynWidth.queryExecution.optimizedPlan.toString
      .contains("__graft_bin"))
  }

  test("2D bbox-overlap join composes a composite bin key (both dims bbinned)") {
    val pts = Seq(
      (1L, 100L, 50L), (2L, 650L, 80L), (3L, 100L, 400L),
      (4L, 1199L, 359L), (5L, 0L, 0L)).toDF("p_id", "x", "y")
    val cells = Seq(
      (10L, 0L, 0L), (11L, 600L, 0L), (12L, 0L, 360L), (13L, 600L, 360L))
      .toDF("c_id", "cx", "cy")
    val box = pts.join(cells,
      col("x") >= col("cx") && col("x") < col("cx") + 600L &&
        col("y") >= col("cy") && col("y") < col("cy") + 360L)
    val opt = box.queryExecution.optimizedPlan.toString
    assert(opt.contains("__graft_bin_p0") && opt.contains("__graft_bin_p1"),
      s"both dimensions must bin:\n$opt")
    val phys = box.queryExecution.sparkPlan.toString
    assert(!phys.contains("BroadcastNestedLoopJoin") &&
      !phys.contains("CartesianProduct"),
      s"2D box join still a nested loop:\n$phys")
    val got = box.select("p_id", "c_id").as[(Long, Long)].collect().toSeq.sorted
    // hand check: (1:100,50)→10; (2:650,80)→11; (3:100,400)→12;
    // (4:1199,359)→11; (5:0,0)→10
    assert(got == Seq((1L, 10L), (2L, 11L), (3L, 12L), (4L, 11L), (5L, 10L)))
    spark.conf.set("spark.graft.rangeBinJoin.enabled", "false")
    try {
      val naive = box.select("p_id", "c_id").as[(Long, Long)]
        .collect().toSeq.sorted
      assert(naive == got, "rewritten 2D results must equal the naive join")
    } finally spark.conf.set("spark.graft.rangeBinJoin.enabled", "true")
  }

  test("fires with sides flipped (interval table on the left)") {
    val flipped = intervals.join(points,
      col("x") >= col("lo") && col("x") < col("lo") + 600L)
    assert(flipped.queryExecution.optimizedPlan.toString
      .contains("__graft_bin"))
    val got = flipped.select("p_id", "i_id").as[(Long, Long)]
      .collect().toSeq.sorted
    assert(got.size == 10 && got.contains((7L, 10L)))
  }
}
