package graft

import org.apache.spark.sql.functions._

/** Proves the SURVEY §4 claim that bucketing removes the shuffle for
  * entity-keyed work: a table bucketed by `user_id` aggregates and
  * self-joins on that key with NO Exchange in the physical plan — at
  * 100 TB this is the difference between re-shuffling the fact table per
  * query and reading co-located buckets.
  */
class BucketingSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("bucketed groupBy and co-located self-join plan without Exchange") {
    spark.sql("DROP TABLE IF EXISTS ev_bucketed")
    // the in-memory catalog forgets tables across JVMs but files persist
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File("/tmp/graft-warehouse/ev_bucketed"))
    Tables.events(spark, sfDir)
      .write.bucketBy(8, "user_id").sortBy("user_id")
      .mode("overwrite").saveAsTable("ev_bucketed")

    val agg = spark.table("ev_bucketed").groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("value").as("v"))
    assert(!planOf(agg).contains("Exchange hashpartitioning"),
      s"bucketed groupBy must not shuffle:\n${planOf(agg)}")
    assert(agg.count() > 0)

    // unbucketed baseline DOES shuffle — the comparison that matters
    val plain = Tables.events(spark, sfDir).groupBy("user_id")
      .agg(count(lit(1)).as("n"))
    assert(planOf(plain).contains("Exchange hashpartitioning"))

    // co-located self-join: both sides bucket-partitioned on the join key
    val t = spark.table("ev_bucketed")
    val joined = t.join(t.groupBy("user_id").agg(count(lit(1)).as("n2")), "user_id")
    assert(!planOf(joined).contains("Exchange hashpartitioning"),
      s"co-located join must not shuffle:\n${planOf(joined)}")
    assert(joined.count() === t.count())

    spark.sql("DROP TABLE IF EXISTS ev_bucketed")
  }
}
