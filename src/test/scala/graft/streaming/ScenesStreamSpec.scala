package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class ScenesStreamSpec extends SparkSpec {

  /** The corpus frame hashes — the stream's input rows, derived with the
    * same scan-side expressions as the batch operator.
    */
  private def frameHashes(): Array[FrameHash] = {
    graft.functions.GeoFunctions.register(spark)
    graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .withColumn("n_bytes", length(col("payload")))
      .withColumn("off",
        explode(expr("sequence(0, greatest(n_bytes - 1, 0), 256)")))
      .filter(least(lit(64), col("n_bytes") - col("off")) > 0)
      .select(col("doc_id"), col("off").cast("bigint").as("off"),
        call_function("ahash64", expr("substring(payload, off + 1, 64)"))
          .as("phash"))
      .collect()
      .map(r => FrameHash(r.getLong(0), r.getLong(1), r.getLong(2)))
  }

  test("drained stream equals the batch mm_scenes row for row") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = frameHashes()
    // split at a global offset boundary so batch 2 never carries a frame
    // below a payload's folded frontier
    val (first, second) = all.partition(_.off <= 256)

    val input = MemoryStream[FrameHash]
    val q = ScenesStream.cuts(input.toDS())
      .writeStream.format("memory").queryName("scenes_stream")
      .outputMode(ScenesStream.Mode).start()
    input.addData(first.toSeq)
    q.processAllAvailable()
    input.addData(second.toSeq)
    input.addData(first.toSeq) // redelivery: all at/below the frontier
    q.processAllAvailable()
    q.stop()

    val got = spark.table("scenes_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getBoolean(3)))
      .sortBy(t => (t._1, t._2))
    val want = graft.operators.Multimodal.mmScenes(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getBoolean(3)))
      .sortBy(t => (t._1, t._2))
    assert(got.nonEmpty)
    assert(got.toSeq === want.toSeq,
      "streaming cut chain must replay the batch comparison exactly")
  }
}
