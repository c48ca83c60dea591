package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Parquet table loaders for the driver-generated test tables.
  *
  * At cluster scale these would be external catalog tables; the loader keeps
  * the scan declarative (plain `spark.read.parquet`) so Catalyst can push
  * filters and prune columns into the parquet reader.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** The operator contract for `events.ts` is epoch-nanos BIGINT (the shape
    * parquet TIMESTAMP(NANOS) takes under `nanosAsLong`, which the original
    * testdata carried). Regenerated testdata ships `timestamp[us]` instead,
    * which Spark surfaces as TIMESTAMP_NTZ — normalize that back to
    * epoch-nanos here so every downstream `ts div 1000` keeps its meaning.
    * With the session zone pinned to UTC the NTZ→LTZ cast is wall-clock
    * identity, so `ts div 1000` equals DuckDB's `epoch_us(ts)` exactly.
    * Scan-side projection only: codegen'd, no shuffle, prunes like the raw
    * column.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df
      case _ =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
