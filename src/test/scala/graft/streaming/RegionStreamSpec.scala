package graft.streaming

import graft.SparkSpec
import graft.operators.Changesets
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Continuous region monitor: drained stream == batch csRegionJoin, and
  * mid-stream snapshots only ever grow (Complete-mode running totals).
  */
class RegionStreamSpec extends SparkSpec {

  private def batchRows(): Array[CsBoxRow] =
    Changesets.csBbox(spark, sfDir)
      .select("user_id", "cs_seq", "min_lon", "min_lat", "max_lon",
        "max_lat", "num_changes")
      .collect()
      .map(r => CsBoxRow(r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double]),
        Option(r.get(5)).map(_.asInstanceOf[Double]),
        r.getLong(6)))

  test("drained stream equals the batch region join, row for row") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = batchRows()
    assert(all.exists(_.min_lon.isEmpty),
      "fixture must include geometry-less changesets (the null-extent drop path)")

    val input = MemoryStream[CsBoxRow]
    val q = RegionStream(input.toDS(), Changesets.regionBoxes(spark, sfDir))
      .writeStream.format("memory").queryName("region_stream")
      .outputMode("complete").start()
    // three uneven chunks: totals must accumulate across micro-batches
    val chunks = all.grouped(all.length / 3 + 1).toSeq
    var midTotal = 0L
    chunks.zipWithIndex.foreach { case (c, i) =>
      input.addData(c.toSeq)
      q.processAllAvailable()
      val snap = spark.table("region_stream").collect()
        .map(r => r.getLong(1)).sum
      assert(snap >= midTotal, "running totals must never shrink")
      midTotal = snap
      if (i == 0) assert(snap > 0, "first chunk must already surface regions")
    }
    q.stop()

    val got = spark.table("region_stream").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val want = Changesets.csRegionJoin(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want, "drained stream must equal the batch region join")
  }
}
