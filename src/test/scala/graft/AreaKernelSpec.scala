package graft

import graft.operators.Contributions
import org.apache.spark.sql.functions._

/** Property check for the integer-exact area tail: the staged
  * DECIMAL(38,0) pipeline (div + subtract-remainder tricks) must equal a
  * straightforward BigInt evaluation of the same derivation for random
  * inputs across the full operating range — guarding both the exactness
  * claims and the intermediate-width bounds.
  */
class AreaKernelSpec extends SparkSpec {

  private def expected(interior9: Long, b09: Long, bk9: Long,
      ymin: Double, ymax: Double): Long = {
    val c9 = math.round(math.cos(math.toRadians((ymax + ymin) / 2)) * 1e9)
    val u = BigInt(10).pow(33) - BigInt(3352810664747L) * BigInt(c9) * BigInt(c9)
    val v = u / BigInt(10).pow(15)
    val w = BigInt(40680631590769L) * v
    val w2 = w / 1000000
    val x = (BigInt(interior9) + BigInt(b09) + BigInt(bk9)).abs * w2
    ((x + BigInt(10).pow(21)) / (BigInt(2) * BigInt(10).pow(21))).toLong
  }

  test("DECIMAL staged area pipeline equals the BigInt reference on random inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (1 to 300).map { i =>
      // ring terms up to ±5e9 (real bound ~1.3e10 total), poles included
      (i, 3,
        rnd.between(-5000000000L, 5000000000L),
        rnd.between(-5000000000L, 5000000000L),
        rnd.between(-5000000000L, 5000000000L),
        rnd.between(-90.0, 90.0), rnd.between(-90.0, 90.0))
    } ++ Seq(
      // extremes: max-magnitude ring at the equator (largest multiplier)
      (1001, 3, 13000000000L, 0L, 0L, 0.0, 0.0),
      (1002, 3, -13000000000L, 0L, 0L, 0.0, 0.0),
      // zero ring, and a pre-ring version (osm_version < 3 → 0)
      (1003, 3, 0L, 0L, 0L, 45.0, 45.0),
      (1004, 1, 999L, 0L, 0L, 45.0, 45.0))
    val df = rows
      .toDF("row_id", "osm_version", "interior9", "b0_9", "bk_9", "ymin_r", "ymax_r")
      .withColumn("ymin_c", least(col("ymin_r"), col("ymax_r")))
      .withColumn("ymax_c", greatest(col("ymin_r"), col("ymax_r")))
      .withColumn("area_w", expr(
        s"CAST(40680631590769 AS DECIMAL(38,0)) * CAST((${Contributions.areaVSql}) AS DECIMAL(38,0))"))
      .withColumn("area_w2", expr(Contributions.areaW2Sql))
      .withColumn("area_m2", expr(Contributions.areaM2SparkSql))
    val got = df.select("row_id", "osm_version", "interior9", "b0_9", "bk_9",
      "ymin_c", "ymax_c", "area_m2").collect()
    assert(got.length === rows.length)
    got.foreach { r =>
      val want =
        if (r.getInt(1) < 3) 0L
        else expected(r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6))
      assert(r.getLong(7) === want,
        s"row ${r.getInt(0)}: ring=(${r.getLong(2)},${r.getLong(3)},${r.getLong(4)}) " +
          s"lat=(${r.getDouble(5)},${r.getDouble(6)})")
    }
  }
}
