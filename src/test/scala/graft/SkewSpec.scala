package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted two-stage aggregation equals the direct groupBy") {
    import spark.implicits._
    // 90% of rows on one hot key
    val df = ((1 to 9000).map(i => (7L, i.toLong)) ++
      (1 to 1000).map(i => (i.toLong % 50, i.toLong)))
      .toDF("key", "v")
      .withColumn("v_dec", col("v").cast("decimal(18,2)"))

    val direct = df.groupBy("key")
      .agg(count(lit(1)).cast("bigint").as("n"), sum("v_dec").as("sum_v_dec"))
      .orderBy("key").collect()
    val salted = Skew.saltedSumCount(df, "key", 16, Seq("v_dec"))
      .orderBy("key").collect()

    assert(salted.map(_.toString).toSeq === direct.map(_.toString).toSeq)
  }

  test("salted partials actually fan out the hot key") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (7L, i.toLong)).toDF("key", "v")
      .withColumn("salt", pmod(hash(col("key"), col("v")), lit(16)))
    val fanout = df.groupBy("salt").count().count()
    assert(fanout > 8, s"hot key should spread across many salts, got $fanout")
  }
}
