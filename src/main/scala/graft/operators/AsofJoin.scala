package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with
  * `right.ts <= left.ts` per key — the temporal lookup behind snapshot
  * enrichment (e.g. "which changeset/boundary/rate was in force at this
  * edit's timestamp").
  *
  * Spark has no native as-of join; the naive form is a range theta-join
  * (quadratic blowup per key). This operator uses the union + ordered
  * last_value pattern instead: tag both sides, union, ONE shuffle on the
  * key, one window sort, carry the right side's values forward, keep left
  * rows. Cost is sort-of-union — linear, skew-safe under AQE, and never
  * materializes a pair explosion.
  */
object AsofJoin {

  /** @param left      probe side
    * @param right     reference side (values carried forward in time)
    * @param key       equality key column (present on both sides)
    * @param leftTs    left timestamp column
    * @param rightTs   right timestamp column
    * @param valueCols right columns to attach to each left row
    */
  def asof(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, valueCols: Seq[String]): DataFrame = {
    val l = left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))
    // All matched right columns travel as ONE struct so the carry is
    // row-atomic: a right row whose value column is legitimately NULL must
    // yield NULL (not a back-fill from an older right row), and all value
    // columns must come from the SAME right row. The struct itself is
    // non-null for every right row, so last(ignoreNulls) picks whole rows.
    val rvals = struct(valueCols.map(col): _*).as("__rvals")
    val r = right.select(col(key), col(rightTs).as("__ts"), lit(0).as("__side"), rvals)
    // right rows sort before left rows at equal ts → "<=" semantics
    val w = Window.partitionBy(key).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val leftCols = left.columns
    val unioned = l.select(
      (col(key) +: col("__ts") +: col("__side") +:
        (leftCols.filter(_ != key).map(col) :+
          lit(null).cast(r.schema("__rvals").dataType).as("__rvals"))): _*)
      .unionByName(r.select(
        (col(key) +: col("__ts") +: col("__side") +:
          (leftCols.filter(_ != key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
            col("__rvals"))): _*))
    val carried = unioned
      .withColumn("__rvals", last(col("__rvals"), ignoreNulls = true).over(w))
    val unpacked = valueCols.foldLeft(carried) { (df, c) =>
      df.withColumn(c, col("__rvals").getField(c))
    }
    unpacked.filter(col("__side") === 1).drop("__ts", "__side", "__rvals")
  }
}
