package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Canary for driver-side testdata drift.
  *
  * Round 9 lost 18 driver keys and its whole bench to a silent re-encoding
  * of `events.ts` (TIMESTAMP(NANOS) → timestamp[us]) that nothing in
  * `sbt test` could see, because every spec builds its own fixtures. This
  * suite opens the real `/root/testdata` tables through the same `Tables`
  * loaders the operators use and asserts the POST-normalization schema the
  * operators assume — names, types, nullability-insensitive — plus one
  * smoke predicate per operator family. The next driver-side re-encoding
  * (a column rename, a type flip, a new ts encoding `Tables` doesn't
  * normalize) fails here, loudly, naming the table and column.
  */
class TablesContractSpec extends SparkSpec {

  /** Compare (name, type) pairs ignoring nullability and metadata. */
  private def assertSchema(table: String, df: DataFrame, expect: Seq[(String, DataType)]): Unit = {
    val got = df.schema.fields.map(f => (f.name, f.dataType)).toSeq
    assert(
      got == expect,
      s"testdata contract drift in `$table`: operators assume\n  ${expect.mkString(", ")}\nbut Tables.$table now yields\n  ${got.mkString(", ")}\n" +
        "— the driver regenerated /root/testdata with a different schema; update Tables normalization (see round-9 postmortem in SURVEY §2)."
    )
  }

  test("region/nation contract") {
    assertSchema("region", Tables.region(spark, sfDir),
      Seq("r_regionkey" -> IntegerType, "r_name" -> StringType))
    assertSchema("nation", Tables.nation(spark, sfDir),
      Seq("n_nationkey" -> IntegerType, "n_name" -> StringType, "n_regionkey" -> IntegerType))
    assert(Tables.region(spark, sfDir).count() == 5, "region must hold the 5 TPC-H regions")
    assert(Tables.nation(spark, sfDir).count() == 25, "nation must hold the 25 TPC-H nations")
  }

  test("customer/supplier/part contract") {
    assertSchema("customer", Tables.customer(spark, sfDir),
      Seq("c_custkey" -> LongType, "c_name" -> StringType, "c_nationkey" -> IntegerType,
        "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType))
    assertSchema("supplier", Tables.supplier(spark, sfDir),
      Seq("s_suppkey" -> LongType, "s_name" -> StringType, "s_nationkey" -> IntegerType,
        "s_acctbal" -> DoubleType))
    assertSchema("part", Tables.part(spark, sfDir),
      Seq("p_partkey" -> LongType, "p_name" -> StringType, "p_brand" -> StringType,
        "p_type" -> StringType, "p_size" -> IntegerType, "p_retailprice" -> DoubleType))
  }

  test("orders/lineitem contract") {
    assertSchema("orders", Tables.orders(spark, sfDir),
      Seq("o_orderkey" -> LongType, "o_custkey" -> LongType, "o_orderstatus" -> StringType,
        "o_totalprice" -> DoubleType, "o_orderdate" -> TimestampNTZType,
        "o_orderpriority" -> StringType))
    assertSchema("lineitem", Tables.lineitem(spark, sfDir),
      Seq("l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
        "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType,
        "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType, "l_tax" -> DoubleType,
        "l_returnflag" -> StringType, "l_linestatus" -> StringType,
        "l_shipdate" -> TimestampNTZType))
    assert(Tables.lineitem(spark, sfDir).count() > 1000, "lineitem smoke: rows present at sf0.001")
  }

  test("events contract: ts normalizes to epoch-nanos BIGINT") {
    val ev = Tables.events(spark, sfDir)
    // The operator contract: every `ts` consumer divides by 1000 for micros.
    // Tables.events must deliver LongType no matter what encoding the driver
    // writes (LongType raw, or any timestamp type normalized scan-side).
    assertSchema("events", ev,
      Seq("event_id" -> LongType, "ts" -> LongType, "user_id" -> LongType,
        "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType))
    val row = ev.selectExpr("min(ts)", "max(ts)").head()
    val (lo, hi) = (row.getLong(0), row.getLong(1))
    // epoch-nanos for any plausible event date (2000-01-01 .. 2100-01-01);
    // an un-normalized micros value would be 1000× too small and fail here.
    val nanos2000 = 946684800L * 1000000000L
    val nanos2100 = 4102444800L * 1000000000L
    assert(lo >= nanos2000 && hi <= nanos2100,
      s"events.ts out of epoch-nanos range [$lo, $hi] — the driver re-encoded ts " +
        "in a shape Tables.events does not normalize (round-9 failure mode)")
  }

  test("documents/embeddings contract") {
    assertSchema("documents", Tables.documents(spark, sfDir),
      Seq("doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
        "source" -> StringType, "n_chars" -> LongType))
    assertSchema("embeddings", Tables.embeddings(spark, sfDir),
      Seq("vec_id" -> LongType, "embedding" -> ArrayType(FloatType, containsNull = true),
        "label" -> IntegerType))
    val d = Tables.documents(spark, sfDir).selectExpr("count(*)", "min(length(text))").head()
    assert(d.getLong(0) > 0 && d.getInt(1) > 0, "documents smoke: non-empty text present")
    val e = Tables.embeddings(spark, sfDir).selectExpr("count(*)", "min(size(embedding))").head()
    assert(e.getLong(0) > 0 && e.getInt(1) > 0, "embeddings smoke: non-empty vectors present")
  }

  test("canary detects a deliberately drifted ts encoding") {
    // Negative proof: re-encode events.ts as epoch-MICROS bigint (the shape
    // a future driver change could ship) into a temp dir. Tables.events
    // passes LongType through untouched, so the only guard is the range
    // check — assert it actually fires on the drifted copy.
    val tmp = java.nio.file.Files.createTempDirectory("graft-drift").toString
    Tables.events(spark, sfDir)
      .withColumn("ts", org.apache.spark.sql.functions.expr("ts div 1000"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val drifted = Tables.events(spark, tmp)
    val row = drifted.selectExpr("min(ts)", "max(ts)").head()
    val nanos2000 = 946684800L * 1000000000L
    assert(row.getLong(0) < nanos2000,
      "drift fixture unexpectedly in-range; the canary range check would not fire")
  }

  test("all three scale factors carry the same contract") {
    // The driver regenerates all SFs together, but a partial regeneration
    // would leave bench (sf0.1) and correctness (sf0.01) on different
    // contracts — assert the events normalization holds on each.
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val dir = s"/root/testdata/sf$sf"
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts").dataType == LongType,
        s"events.ts at sf$sf did not normalize to LongType")
    }
  }
}
