package graft

/** Plan-quality regression guard: every SparkEntry query must keep the
  * plan shape the scale design promises — no cartesian products, no
  * accidental nested-loop joins (the brute-force ANN baseline is the one
  * intentional broadcast crossJoin), and no scan that fails to push its
  * filters.
  */
class PlanAuditSpec extends SparkSpec {

  private lazy val plans: Map[String, String] =
    SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    }

  test("no cartesian products anywhere") {
    for ((name, plan) <- plans)
      assert(!plan.contains("CartesianProduct"), s"$name has a cartesian product")
  }

  test("nested-loop joins only where intended (ann_topk brute-force baseline)") {
    for ((name, plan) <- plans if name != "ann_topk")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$name plans a nested-loop join")
  }

  test("every parquet scan pushes its filters") {
    for ((name, plan) <- plans)
      assert(!plan.contains("PushedFilters: []"),
        s"$name has a scan with unpushed filters")
  }

  test("no sort-merge joins at test scale (broadcast should win everywhere)") {
    // dedup_clusters joins two node-sized frames (labels ⨝ neighbor mins):
    // big-big at scale, where a shuffle join IS the intended plan — cached
    // intermediates have no stats for broadcast planning at test scale
    for ((name, plan) <- plans if name != "dedup_clusters")
      assert(!plan.contains("SortMergeJoin"), s"$name falls back to SMJ")
  }
}
