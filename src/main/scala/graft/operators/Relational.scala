package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational analytic core — the DuckDB-query surface users run over
  * ohsome-planet parquet output (see /root/reference/docs/useful_queries.md),
  * expressed as Spark plans.
  *
  * Determinism rules (SURVEY.md §3): money/value columns are fixed-point
  * BIGINT end-to-end — `cast(round(x*100) as bigint)` cents / basis points —
  * so sums are exact, order-independent, and stringify identically in the
  * driver's Spark-parquet-vs-DuckDB compare (DECIMAL outputs do not: the
  * round-1 gate failed every DECIMAL column on trailing-zero
  * stringification). Source money columns are exactly 2-decimal, so the
  * *100 round is lossless; ties are impossible (1/200 is not dyadic, so no
  * double equals an exact .5 after scaling). Every query ends with a
  * deterministic ORDER BY; computed columns are aliased identically to the
  * DuckDB oracle.
  */
object Relational {

  /** Money column → exact cents (fixed-point 1e-2 BIGINT). */
  private def cents(c: Column): Column = round(c * 100).cast("bigint")

  /** TPC-H Q1 shape: pricing summary over lineitem. All aggregates are
    * BIGINT fixed-point: qty in units, base price in cents, discounted
    * price in cents*1e-2 (cents × (100 - discount_bp)).
    */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(round(col("l_quantity")).cast("bigint")).as("sum_qty"),
        sum(cents(col("l_extendedprice"))).as("sum_base_price"),
        sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))).as("sum_disc_price"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q3 shape: unshipped-order revenue, 3-way join + agg + top-k.
    * revenue is fixed-point 1e-4 (cents × (100 − bp)); the ORDER BY is the
    * same ordering as the real-valued revenue (monotonic ×1e4 scaling).
    */
  def q2JoinAgg(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-01-01").cast("timestamp")
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, dir).filter(col("o_orderdate") < cutoff)
    val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > cutoff)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), unix_millis(col("o_orderdate").cast("timestamp")).as("o_odate_ms"), col("o_orderpriority"))
      .agg(sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))).as("revenue"))
      .select("l_orderkey", "revenue", "o_odate_ms", "o_orderpriority")
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 shape: revenue per nation; dims broadcast so the fact table
    * never shuffles for the dimension lookups.
    */
  def q3BroadcastJoin(s: SparkSession, dir: String): DataFrame = {
    val rev = cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(sum(rev).as("revenue"), count(lit(1)).as("n_items"))
  }

  /** Window rank: top-3 orders per customer by totalprice. */
  def q4Window(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), cents(col("o_totalprice")).as("price"), col("rk"))
  }

  /** Left-semi join (EXISTS): orders with at least one late lineitem. */
  def q5SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val late = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
      .select("l_orderkey")
    Tables.orders(s, dir)
      .join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
  }

  /** TPC-H Q6 shape: selective scan — filter + projection pushdown showcase.
    * revenue is fixed-point 1e-4 (price cents × discount basis points).
    */
  def q6Filter(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount") >= 0.02 && col("l_discount") <= 0.04 &&
        col("l_quantity") < 24)
      .agg(sum(cents(col("l_extendedprice")) * cents(col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_rows"))

  /** Global top-k with deterministic tiebreak (TakeOrderedAndProject plan). */
  def q7TopK(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), cents(col("o_totalprice")).as("price"))
      .orderBy(desc("price"), asc("o_orderkey"))
      .limit(25)

  /** Count-distinct per group (partial-agg friendly). */
  def q8DistinctAgg(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"),
        sum(cents(col("value"))).as("sum_value"))

  /** Array/member unnesting (the docs' relation-member unnest shape):
    * posexplode the embedding vectors, per-dimension aggregates with
    * fixed-point exact sums.
    */
  def q9Unnest(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "e")))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"),
        sum(round(col("e").cast("double") * 1e9).cast("bigint")).as("sum_fixed"),
        min(col("e").cast("double")).as("min_e"),
        max(col("e").cast("double")).as("max_e"))

  /** ROLLUP hierarchy totals (returnflag → linestatus → grand total) —
    * null group keys coalesced to a sentinel so both engines stringify
    * identically.
    */
  def q10Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(sum(cents(col("l_extendedprice"))).as("sum_price"),
        count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
        coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
        col("sum_price"), col("n"))

  /** CUBE over (status, priority) — all four grouping sets in one pass
    * (Expand feeds a single hash aggregate, so the fact table is scanned
    * once, not 4×). `grouping_id` disambiguates the subtotal rows by the
    * standard SQL bitmask, identical to DuckDB's GROUPING(a, b).
    */
  def q15Cube(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(grouping_id().as("gid"),
        sum(cents(col("o_totalprice"))).as("sum_price"),
        count(lit(1)).as("n"))
      .select(coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
        col("gid"), col("sum_price"), col("n"))

  /** Pivot event types into columns (conditional-aggregation form in the
    * oracle); missing combinations filled with 0 so no nullable-BIGINT
    * column degrades to float in the compare.
    */
  def q11Pivot(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(s, dir)
      .withColumn("value_c", cents(col("value")))
      .groupBy("user_id")
      .pivot("event_type", types)
      .agg(sum("value_c"))
      .na.fill(0L, types)
  }

  /** Exact discrete quantiles per group: the element at rank
    * ceil(q·n) in value order — pure integer/rank logic, identical in both
    * engines (no interpolation, no float percentile hazards).
    */
  def q12Quantiles(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("value_c", "event_id")
    val ranked = Tables.events(s, dir)
      .withColumn("value_c", cents(col("value")))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
    def q(p: Double): Column =
      max(when(col("rn") === ceil(lit(p) * col("n")).cast("bigint"), col("value_c")))
    ranked.groupBy("event_type")
      .agg(q(0.25).as("q25"), q(0.5).as("q50"), q(0.75).as("q75"),
        max("n").cast("bigint").as("n"))
  }

  /** Anti join (NOT EXISTS): customers who never placed an urgent-priority
    * order. LeftAnti keeps the build side to the filtered orders subset —
    * the filter pushes to the parquet scan, and at scale the join is a
    * plain hash exchange on the key with no row-width amplification
    * (anti joins emit only left columns).
    */
  def q14AntiJoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")

  /** Set algebra (INTERSECT / EXCEPT — the one relational primitive the
    * q-set lacked): the 1995-vs-1996 customer cohorts partitioned into
    * both / only-1995 / only-1996 membership classes. Spark plans set
    * ops as dedup aggregates feeding left-semi/anti hash joins — the
    * distributed shape — and the year bounds are pushable timestamp
    * RANGE predicates (a `year()` call would reach the scan unpushed).
    */
  def q16SetOps(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    def keys(y: String, y1: String) = o
      .filter(col("o_orderdate") >= lit(y).cast("timestamp") &&
        col("o_orderdate") < lit(y1).cast("timestamp"))
      .select("o_custkey").distinct()
    val a = keys("1995-01-01", "1996-01-01")
    val b = keys("1996-01-01", "1997-01-01")
    a.intersect(b).withColumn("tag", lit("both"))
      .unionByName(a.except(b).withColumn("tag", lit("only_1995")))
      .unionByName(b.except(a).withColumn("tag", lit("only_1996")))
      .select(col("o_custkey").as("custkey"), col("tag"))
  }

  /** TPC-H Q17 shape — the CORRELATED SCALAR SUBQUERY primitive
    * (`l_quantity < 0.2 · avg(l_quantity) per part`), decorrelated the
    * way every engine actually executes it: one per-part aggregate
    * joined back onto the fact rows. The float threshold is cleared by
    * integer cross-multiplication (`5·qty·cnt < Σqty` ⇔
    * `qty < 0.2·avg`), so no division ever runs and the verdict cannot
    * flip cross-engine. Scale shape: the brand filter prunes the part
    * dim BEFORE both joins (broadcast — parts are the small side at any
    * corpus size after a brand cut), the per-part threshold table is
    * |brand parts|-bounded and broadcasts back onto the same fact
    * subset, so lineitem never shuffles: two scans, zero fact
    * exchanges until the final |parts|-bounded aggregate.
    */
  def q17Corr(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir).filter(col("p_brand") === "Brand#13")
      .select("p_partkey")
    val li = Tables.lineitem(s, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"),
        round(col("l_quantity")).cast("bigint").as("qty"),
        cents(col("l_extendedprice")).as("price_c"))
    val thr = li.groupBy("l_partkey")
      .agg(count(lit(1)).as("cnt"), sum("qty").as("sum_qty"))
    li.join(broadcast(thr), Seq("l_partkey"))
      .filter(col("qty") * col("cnt") * lit(5L) < col("sum_qty"))
      .groupBy(col("l_partkey").as("partkey"))
      .agg(count(lit(1)).as("n_below"), sum("price_c").as("cents_below"))
      .orderBy(desc("cents_below"), asc("partkey"))
      .limit(20)
  }

  /** TPC-H Q18 shape — aggregate-HAVING-rejoin (large-volume orders):
    * the per-group aggregate acts as a FILTER on its own grouping key,
    * then the surviving keys rejoin the wide rows. Scale shape: the
    * HAVING cut runs on the narrow (orderkey, qty) projection before
    * any wide row moves — the qualifying-key set is a small,
    * data-dependent fraction of orders, so its joins are left
    * UNHINTED: AQE sees the post-filter size at runtime and picks
    * broadcast when it fits, hash-exchange when it doesn't (a static
    * broadcast hint on a data-growing set is exactly the 100 TB trap
    * §4 warns about). The customer join runs after the orderkey cut,
    * so it rejoins only the surviving rows.
    */
  def q18Having(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), round(col("l_quantity")).cast("bigint").as("qty"))
      .groupBy("l_orderkey")
      .agg(sum("qty").as("sum_qty"))
      .filter(col("sum_qty") > 200L)
    Tables.orders(s, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey").as("custkey"), col("c_name"),
        col("o_orderkey").as("orderkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("odate_ms"),
        cents(col("o_totalprice")).as("price_c"), col("sum_qty"))
      .orderBy(desc("sum_qty"), asc("orderkey"))
      .limit(100)
  }

  /** TPC-H Q19 shape — DISJUNCTIVE predicate pushdown (OR of brand ×
    * size × quantity conjunctions). The planner can push only the
    * UNION-SUPERSET of the disjuncts to each scan: the part scan gets
    * `p_brand IN (…) AND p_size BETWEEN 1 AND 15`, the residual OR
    * evaluates post-join. The brand-cut part side is a fixed small
    * fraction of the dim at any corpus size (the q17 argument), so it
    * broadcasts; lineitem never shuffles — one scan into a single
    * partial-aggregated row.
    */
  def q19Disjunctive(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
      .filter(col("p_brand").isin("Brand#12", "Brand#23", "Brand#34") &&
        col("p_size").between(1, 15))
      .select("p_partkey", "p_brand", "p_size")
    val li = Tables.lineitem(s, dir)
      .select(col("l_partkey"), round(col("l_quantity")).cast("bigint").as("qty"),
        cents(col("l_extendedprice")).as("price_c"), cents(col("l_discount")).as("bp"))
    def arm(brand: String, maxSize: Int, qLo: Long, qHi: Long): Column =
      col("p_brand") === brand && col("p_size") <= maxSize &&
        col("qty").between(qLo, qHi)
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(arm("Brand#12", 5, 1L, 11L) ||
        arm("Brand#23", 10, 10L, 20L) ||
        arm("Brand#34", 15, 20L, 30L))
      .agg(sum(col("price_c") * (lit(100L) - col("bp"))).as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  /** TPC-H Q20 shape — NESTED aggregate-driven semi-join ("suppliers
    * with excess stock", adapted to the tables at hand as DOMINANT
    * SUPPLIERS: supplier ships ≥ 30% of a small part's total volume).
    * The nested correlated subquery decorrelates into two aggregate
    * LEVELS over the same narrow projection: per-(part, supp) volume,
    * then the per-part total as a window over the FIRST aggregate's
    * output — pair rows are |part×supp|-bounded, so the window's
    * part-keyed exchange moves collapsed rows, never fact rows. The
    * size-pruned part dim broadcasts ahead of the pair aggregate
    * (lineitem's only full-scale movement is its partial-agg
    * exchange); the dominance test is integer cross-mult
    * (pair·n_supps ≥ 2·total, i.e. ≥ 2× the part's AVERAGE supplier
    * share — no ratio, no float, and scale-INVARIANT: a fixed
    * percentage cut empties as supplier counts per part grow with the
    * corpus, a relative-to-average cut does not). The surviving
    * (supp, part) set is data-dependent → supplier join left
    * UNHINTED for AQE; nation is a fixed dim → broadcast.
    */
  def q20NestedAgg(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir).filter(col("p_size") < 10).select("p_partkey")
    val pairs = Tables.lineitem(s, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(round(col("l_quantity")).cast("bigint")).as("pair_qty"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("l_partkey")
    val dominant = pairs
      .withColumn("total_qty", sum("pair_qty").over(w))
      .withColumn("n_part_supps", count(lit(1)).over(w))
      .filter(col("pair_qty") * col("n_part_supps") >= col("total_qty") * 2L)
    dominant
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct("l_suppkey").as("n_supps"),
        sum("pair_qty").as("qty_sum"))
      .orderBy("n_name")
  }

  /** TPC-H Q21 shape — EXISTS + NOT EXISTS over the same fact table
    * ("suppliers who kept orders waiting"), decorrelated the way every
    * modern engine runs it: NOT as two self-joins but as conditional
    * aggregates per order. A line is LATE when it shipped > 60 days
    * after the order date; a supplier is blamed when it is the SOLE
    * late supplier on a multi-supplier finalized order.
    *
    * Scale shape — ONE fact-scale exchange total: the
    * lineitem⋈orders sort-merge join exchanges on orderkey, and both
    * aggregate levels above it — per-(order, supp) late flag, then
    * the per-order supplier/blame rollup — group on key sets that
    * CONTAIN orderkey, so HashPartitioning(orderkey) already
    * satisfies their distribution: no further exchange until the
    * final |supplier|-bounded blame count. The two-level rollup also
    * avoids the Expand ×2 plan a double count-DISTINCT would cost.
    */
  def q21SoleBlame(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("odate_ms"))
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        unix_millis(col("l_shipdate").cast("timestamp")).as("ship_ms"))
    val perPair = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("late",
        (col("ship_ms") - col("odate_ms") > lit(60L * 86400000L)).cast("bigint"))
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max("late").as("any_late"))
    val perOrder = perPair.groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_supps"), sum("any_late").as("late_supps"),
        max(when(col("any_late") === 1L, col("l_suppkey"))).as("blamed"))
      .filter(col("n_supps") > 1L && col("late_supps") === 1L)
    perOrder.groupBy(col("blamed").as("suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(Tables.supplier(s, dir), col("suppkey") === col("s_suppkey"))
      .select("suppkey", "s_name", "numwait")
      .orderBy(desc("numwait"), asc("suppkey"))
      .limit(20)
  }

  /** TPC-H Q22 shape — SCALAR-SUBQUERY threshold + anti join ("global
    * customer sales opportunity"): customers in target segments whose
    * balance beats the segment-population positive-balance average and
    * who have NO orders. The scalar subquery decorrelates to a 1-row
    * aggregate cross-joined in as a broadcast (BroadcastNestedLoopJoin
    * of one row — the literal-free way to thread a global statistic
    * through a distributed plan); the average compare is integer
    * cross-mult (bal_c·cnt > sum_c), so no float division can flip a
    * boundary customer cross-engine. The NOT EXISTS is a left-anti
    * join against big-ticket orders (totalprice > 3000 units — the
    * filter pushes to the orders scan before the anti join's key set
    * forms), UNHINTED: the anti side's distinct-key size is
    * data-dependent, AQE picks the strategy.
    */
  def q22AntiScalar(s: SparkSession, dir: String): DataFrame = {
    val segs = Seq("AUTOMOBILE", "HOUSEHOLD", "MACHINERY")
    val cust = Tables.customer(s, dir)
      .filter(col("c_mktsegment").isin(segs: _*))
      .select(col("c_custkey"), col("c_mktsegment"), cents(col("c_acctbal")).as("bal_c"))
    val thr = cust.filter(col("bal_c") > 0L)
      .agg(sum("bal_c").as("sum_c"), count(lit(1)).as("cnt"))
    cust.crossJoin(broadcast(thr))
      .filter(col("bal_c") * col("cnt") > col("sum_c"))
      .join(Tables.orders(s, dir).filter(col("o_totalprice") > 300000.0)
        .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_cust"), sum("bal_c").as("bal_sum"))
      .orderBy("segment")
  }

  /** Explicit GROUPING SETS — the third member of the multi-aggregation
    * family after rollup (q10) and cube (q15), and the one report
    * writers actually use: a HAND-PICKED set list ((status), (priority),
    * (status, priority), ()) rather than the full lattice. Spark plans
    * it as the same single Expand → ONE hash aggregate as cube — rows
    * ×|sets| map-side, every set's partials in one exchange —
    * `grouping_id()` disambiguates, so a cube that would expand 2ᵏ ways
    * costs only the sets asked for. Null group keys label as "(all)"
    * (the q15 discipline, so a NULL-valued key can't collide).
    */
  def q23GroupingSets(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")),
          Seq(col("o_orderstatus"), col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().as("gid"),
        sum(cents(col("o_totalprice"))).as("sum_price"),
        count(lit(1)).as("n"))
      .select(coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
        col("gid"), col("sum_price"), col("n"))
      .orderBy("gid", "status", "priority")
  }

  /** RANGE-frame window — the moving 30-day spend per customer: for
    * each order, the sum/count of that customer's orders in the
    * trailing 30 days INCLUSIVE, a value-range frame (`RANGE BETWEEN
    * 2 592 000 PRECEDING AND CURRENT ROW` over epoch seconds) — a
    * genuinely different executor path than every ROWS frame in the
    * suite (frame bounds move with the ORDER key's value, not the row
    * position). Peer rows (same timestamp) share one frame in both
    * engines by SQL semantics, so the sum is deterministic even under
    * ties. ONE customer-keyed exchange; the frame walk is a single
    * ordered pass per partition.
    */
  def q24RangeWindow(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy("ts_s")
      .rangeBetween(-2592000L, 0L)
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("ms"),
        cents(col("o_totalprice")).as("price_c"))
      .withColumn("ts_s", expr("ms div 1000")).drop("ms")
      .withColumn("roll_sum_c", sum("price_c").over(w))
      .withColumn("roll_n", count(lit(1)).over(w))
      .orderBy("o_orderkey")
  }

  /** Ordered STRING AGGREGATION — the `string_agg(x, ',' ORDER BY …)`
    * reporting primitive (per-customer chronological order-status
    * trail). Spark has no ordered string_agg aggregate; the portable
    * distributed form is collect → in-kernel sort → project → join:
    * `collect_list(struct(sort keys…, payload))` partial-aggregates
    * map-side like any aggregate, `array_sort` orders each group's
    * array by (date, orderkey) lexicographically IN the executor kernel
    * (struct compare — no per-group window, no second exchange), and
    * `transform`+`array_join` emit the CSV. Per-group state is bounded
    * by the customer's order count — never corpus-scale — so the
    * aggregate buffers stay small at any corpus size; ONE exchange
    * total on the group key.
    */
  def q25StringAgg(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_custkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("ms"),
        col("o_orderkey"), col("o_orderstatus"))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        expr("array_join(transform(array_sort(collect_list(" +
          "struct(ms, o_orderkey, o_orderstatus))), x -> x.o_orderstatus)" +
          ", ',')").as("status_seq"))
      .orderBy("o_custkey")

  /** GLOBAL NTILE decile profile — without the global-window trap. A
    * literal `ntile(10) OVER (ORDER BY price)` funnels the entire
    * corpus through ONE task (no PARTITION BY ⇒ single window
    * partition); instead the global rank is assembled two-level, the
    * evt_concurrency/text_pack prefix-sum discipline applied to VALUE
    * buckets: (1) histogram the rows into fixed 100-dollar price bins
    * (domain-bounded ⇒ the bin table is small at ANY corpus size),
    * (2) prefix-sum the bin counts in one bounded task + broadcast
    * back, (3) row_number WITHIN each bin (bin-partitioned window —
    * every task sees one bin's rows), global rank = bin prefix +
    * within-bin rank. Decile membership then replays SQL-standard
    * ntile remainder semantics (first `n mod 10` buckets take
    * `ceil(n/10)` rows) in exact integer arithmetic from a broadcast
    * 1-row count. Output: per-decile count/sum/min/max of price cents.
    */
  def q26Ntile(s: SparkSession, dir: String): DataFrame = {
    val b = Tables.orders(s, dir)
      .select(cents(col("o_totalprice")).as("pc"), col("o_orderkey").as("ok"))
      .withColumn("bkt", expr("pc div 10000"))
    val bc = b.groupBy("bkt").agg(count(lit(1)).as("bn"))
    val wPre = org.apache.spark.sql.expressions.Window.orderBy("bkt")
      .rowsBetween(Long.MinValue, -1)
    val pre = bc.withColumn("cum", coalesce(sum("bn").over(wPre), lit(0L)))
      .select("bkt", "cum")
    val n = b.agg(count(lit(1)).as("n"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy("bkt").orderBy("pc", "ok")
    b.withColumn("rn", row_number().over(wIn))
      .join(broadcast(pre), "bkt")
      .crossJoin(broadcast(n))
      .withColumn("rank", col("cum") + col("rn"))
      .withColumn("decile", expr(
        """CASE WHEN rank <= (n % 10) * ((n + 9) div 10)
          |     THEN (rank - 1) div ((n + 9) div 10) + 1
          |     ELSE (n % 10) + (rank - (n % 10) * ((n + 9) div 10) - 1)
          |            div (n div 10) + 1 END""".stripMargin))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_orders"), sum("pc").as("sum_pc"),
        min("pc").as("min_pc"), max("pc").as("max_pc"))
      .orderBy("decile")
  }

  /** RUNNING DISTINCT-COUNT per customer — `count(DISTINCT part) OVER
    * (ORDER BY order)` which NO engine supports directly (distinct isn't
    * decomposable over a running frame), via the standard first-
    * occurrence rewrite: mark each (customer, part)'s chronologically
    * first order with `row_number() = 1`, then the running sum of
    * first-occurrence marks over the customer's order sequence IS the
    * cumulative distinct-part count. Output per (customer, order):
    * in-order distinct parts, newly-seen parts, cumulative distinct.
    *
    * Scale shape: two keyed windows — (cust, part) for the marks,
    * (cust) for the running sum — each ONE hash exchange on its own
    * key; nothing quadratic, no distinct-state blowup: the rewrite is
    * exactly how a 100 TB engine decomposes windowed COUNT DISTINCT.
    */
  def q27RunDistinct(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey").as("ok"), col("o_custkey").as("ck"),
        col("o_orderdate").as("od"))
    val firstW = Window.partitionBy("ck", "pk").orderBy("od", "ok")
    val runW = Window.partitionBy("ck").orderBy("od", "ok")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    li.join(o, "ok")
      .withColumn("is_new",
        when(row_number().over(firstW) === 1, 1L).otherwise(0L))
      .groupBy("ck", "ok", "od")
      .agg(count(lit(1)).as("n_parts"), sum("is_new").as("n_new"))
      .withColumn("cum_distinct", sum("n_new").over(runW))
      .select("ck", "ok", "n_parts", "n_new", "cum_distinct")
  }

  /** GAPS-AND-ISLANDS interval coalescing — merge overlapping intervals
    * per key (the billing-period / maintenance-window / coverage-merge
    * shape every warehouse eventually needs): per supplier, line
    * shipments span `[shipdate, shipdate + quantity days]`; islands are
    * maximal unions of overlapping spans. The classic rewrite: running
    * `max(end)` over everything BEFORE the current row (ordered by
    * start) — a span starts a new island iff its start exceeds that
    * running max (so containment chains, not just pairwise overlap,
    * merge correctly); island id = running sum of start flags. All
    * arithmetic in integer days since epoch — both engines count date
    * boundaries identically, nothing floats.
    *
    * Scale shape: ONE hash exchange on `l_suppkey`; both window passes
    * and both aggregates reuse the supplier partitioning
    * (`groupBy(suppkey, island)` is satisfied by clustering on suppkey
    * alone, so EnsureRequirements inserts no second exchange). Per-key
    * work is the in-partition sort — the same bound as sessionize; no
    * self-join, no interval cross-product.
    */
  def q28Islands(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val epoch = to_date(lit("1970-01-01"))
    val iv = Tables.lineitem(s, dir).select(
      col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
      datediff(to_date(col("l_shipdate")), epoch).cast("bigint").as("d0"),
      (datediff(to_date(col("l_shipdate")), epoch).cast("bigint")
        + col("l_quantity").cast("bigint")).as("d1"))
    val order = Window.partitionBy("l_suppkey")
      .orderBy("d0", "d1", "l_orderkey", "l_linenumber")
    iv.withColumn("prev_end",
        max("d1").over(order.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("brk",
        when(col("prev_end").isNull || col("d0") > col("prev_end"), 1L)
          .otherwise(0L))
      .withColumn("isl",
        sum("brk").over(order.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("l_suppkey", "isl")
      .agg(count(lit(1)).as("n_iv"), min("d0").as("i0"), max("d1").as("i1"))
      .groupBy("l_suppkey")
      .agg(sum("n_iv").as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("i1") - col("i0") + 1).as("covered_days"),
        max(col("i1") - col("i0") + 1).as("max_island_days"))
      .orderBy("l_suppkey")
  }

  /** UNPIVOT — the wide→long reshape (the exact inverse of
    * [[q11Pivot]]): part's numeric attributes melt into (attribute,
    * value) rows via Spark's NATIVE `unpivot` (the Melt logical plan —
    * codegen'd Expand under the hood, one output row per (row, attr),
    * never a per-attribute rescan or a UNION of N scans), then the long
    * frame aggregates per attribute in exact integer fixed point.
    *
    * Scale shape: Expand emits k× rows map-side from ONE scan; the
    * aggregate partial-aggregates into the k-row attribute frame — at
    * any corpus size the exchange carries k rows per partition.
    */
  def q29Unpivot(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(col("p_partkey"),
        col("p_size").cast("bigint").as("size"),
        cents(col("p_retailprice")).as("retail_c"),
        length(col("p_name")).cast("bigint").as("name_len"))
      .unpivot(Array(col("p_partkey")),
        Array(col("size"), col("retail_c"), col("name_len")),
        "attribute", "value")
      .groupBy("attribute")
      .agg(count(lit(1)).as("n"), sum("value").as("sum_v"),
        min("value").as("min_v"), max("value").as("max_v"))
      .orderBy("attribute")

  /** SKYLINE (Pareto frontier) — the multi-criteria shortlist operator
    * (Börzsönyi et al. 2001): parts no other part beats on BOTH
    * dimensions (cheaper-or-equal price AND larger-or-equal size, with
    * one strict). A part is dominated iff `max(size | price < p) ≥ s`
    * OR `max(size | price ≤ p) > s` — two running maxima over the
    * price order, so the classic nested-loop/NOT-EXISTS formulation
    * (quadratic, and an inequality join no engine hashes) collapses to
    * cummax. The GLOBAL price order is the usual single-task trap, so
    * it decomposes exactly like evt_concurrency: fixed $100 price bins
    * → per-bin max partial-aggregates map-side, carry prefix-max over
    * the VALUE-bounded bin frame broadcasts back, and the within-bin
    * running maxima ride one bin-keyed exchange (RANGE frames on exact
    * cents give the strict/non-strict split). Ties on both dims don't
    * dominate each other — both survive, per the standard definition.
    */
  def q30Skyline(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val parts = Tables.part(s, dir)
      .select(col("p_partkey"), cents(col("p_retailprice")).as("price_c"),
        col("p_size").cast("bigint").as("size"))
      .withColumn("bin", expr("price_c div 10000"))
    val wCarry = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    val carry = parts.groupBy("bin").agg(max("size").as("bmax"))
      .select(col("bin"), max("bmax").over(wCarry).as("cmax"))
    val wLt = Window.partitionBy("bin").orderBy("price_c")
      .rangeBetween(Window.unboundedPreceding, -1)
    val wLe = Window.partitionBy("bin").orderBy("price_c")
      .rangeBetween(Window.unboundedPreceding, 0)
    parts.join(broadcast(carry), "bin")
      .withColumn("m_lt", greatest(coalesce(max("size").over(wLt), lit(-1L)),
        coalesce(col("cmax"), lit(-1L))))
      .withColumn("m_le", greatest(coalesce(max("size").over(wLe), lit(-1L)),
        coalesce(col("cmax"), lit(-1L))))
      .filter(!(col("m_lt") >= col("size") || col("m_le") > col("size")))
      .select("p_partkey", "price_c", "size")
      .orderBy("price_c", "p_partkey")
  }

  /** WEIGHTED MEDIAN per group — the robust-statistics order statistic
    * (median price weighted by quantity) that `percentile` built-ins
    * approximate and q12's rank-at-ceil can't weight. Definition:
    * smallest value v with `2·cumweight(≤v) ≥ total` (the lower
    * weighted median — exact, no interpolation, engine-portable).
    * The global per-group value order is the usual one-task trap, so
    * it decomposes like q26_ntile's two-level rank: duplicates collapse
    * map-side into (group, value) weights, $1000 VALUE bins partial-agg,
    * the carry prefix over the domain-bounded bin frame locates the ONE
    * median bin per group, and only THAT bin's rows take a within-bin
    * running sum — the corpus never sorts globally.
    */
  def q31WeightedMedian(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // spreadIfSmall: parallelizes the one-split histogram fold on the
    // group keys (q35_mad's measured 0.84 s serial stage, same shape)
    val li = Tables.spreadIfSmall(s, dir, "lineitem",
        Tables.lineitem(s, dir)
          .select(col("l_returnflag").as("flag"),
            cents(col("l_extendedprice")).as("cents"),
            col("l_quantity").cast("bigint").as("w")),
        Seq("flag", "cents"))
      .groupBy("flag", "cents").agg(sum("w").as("w"))
      .withColumn("bin", expr("cents div 100000"))
    val wCarry = Window.partitionBy("flag").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, -1)
    val medBin = li.groupBy("flag", "bin").agg(sum("w").as("bw"))
      .withColumn("cw", coalesce(sum("bw").over(wCarry), lit(0L)))
      .withColumn("tot", sum("bw").over(Window.partitionBy("flag")))
      .filter(col("cw") * 2 < col("tot") &&
        (col("cw") + col("bw")) * 2 >= col("tot"))
      .select("flag", "bin", "cw", "tot")
    val wIn = Window.partitionBy("flag").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    li.join(broadcast(medBin), Seq("flag", "bin"))
      .withColumn("run", col("cw") + sum("w").over(wIn))
      .filter(col("run") * 2 >= col("tot"))
      .groupBy("flag")
      .agg(min("cents").as("median_c"), max("tot").as("tot_w"))
      .orderBy("flag")
  }

  /** Z-ORDER layout profile — the data-skipping clustering every lake
    * engine offers (Delta/Iceberg `OPTIMIZE ZORDER BY`): interleave the
    * bits of two query dimensions (size, $100 price bucket) into one
    * sort key, bucket by `z div 64`, and report per-bucket row counts
    * plus min/max of BOTH dimensions — the zone-map ranges a scan
    * planner prunes against. Under doc-order layout a bucket's
    * (size × price) box spans the whole domain; under z-order each
    * bucket covers a tight box, so a 2-D range predicate skips most
    * buckets — the point of the operator. The interleave is 32 exact
    * bit terms (shift/mask/shift), identical integer arithmetic in
    * both engines; one scan, one bounded aggregate (the z-bucket space
    * is domain-, not corpus-, sized).
    */
  def q32Zorder(s: SparkSession, dir: String): DataFrame = {
    val zExpr = (0 until 16).map(i =>
      s"(shiftleft(shiftright(size, $i) & 1, ${2 * i}) + " +
        s"shiftleft(shiftright(pb, $i) & 1, ${2 * i + 1}))").mkString(" + ")
    Tables.part(s, dir)
      .select(col("p_partkey"), col("p_size").cast("bigint").as("size"),
        cents(col("p_retailprice")).as("pc"))
      .withColumn("pb", expr("pc div 10000"))
      .withColumn("z", expr(zExpr))
      .groupBy(expr("z div 64").as("zbucket"))
      .agg(count(lit(1)).as("n"),
        min("size").as("min_size"), max("size").as("max_size"),
        min("pb").as("min_pb"), max("pb").as("max_pb"))
      .orderBy("zbucket")
  }

  /** MODE per group (the SQL:2023 `MODE()` ordered-set aggregate Spark
    * lacks): the most frequent order priority per 30-day epoch period,
    * ties to the lexicographically smallest value — decomposed the way
    * a distributed engine must: a (group, value) partial count collapses
    * the corpus map-side, then the argmax is a WindowGroupLimit-pruned
    * rank over the GROUPED frame (domain-bounded: periods × 5
    * priorities), never a sort of raw rows; the share window rides the
    * same period partitioning. Epoch periods (`days div 30`), not
    * calendar months, so no engine's month arithmetic can disagree.
    */
  def q33Mode(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.orders(s, dir)
      .select(expr(
        "unix_millis(cast(o_orderdate as timestamp)) div 86400000 div 30")
        .as("period"), col("o_orderpriority").as("prio"))
      .groupBy("period", "prio").agg(count(lit(1)).as("cnt"))
    counts
      .withColumn("n_total", sum("cnt").over(Window.partitionBy("period")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("period").orderBy(desc("cnt"), asc("prio"))))
      .filter(col("rk") === 1)
      .select(col("period"), col("prio").as("mode_prio"), col("cnt"),
        col("n_total"), expr("(1000 * cnt) div n_total").as("share_pm"))
      .orderBy("period")
  }

  /** MEDIAN ABSOLUTE DEVIATION per return flag — the robust dispersion
    * statistic an outlier-tolerant data audit uses where stddev is
    * dominated by its tails. Both order statistics (the median and the
    * median of |x − med|) use q31's two-level decomposition: collapse
    * rows to a (flag, cents) VALUE HISTOGRAM first (corpus-scale rows →
    * domain-scale rows, map-side partial agg), locate the median's
    * $1000 bin from the bounded bin frame, and run the ordered
    * cumulative window only inside that one bin — the per-flag ordered
    * window never sees more than one bin's distinct values, so no
    * single-partition corpus-scale sort exists at any scale. The second
    * pass re-histograms |cents − med| (a broadcast 3-row join, pure
    * map) and repeats the same ladder. Median convention in both
    * passes and both engines: smallest value with 2·cum ≥ n.
    */
  def q35Mad(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    // one two-level order-statistic pass over a value histogram; the
    // 1-row-per-group result is collected (a driver-scale constant, the
    // k-means-centroid precedent) so the two sequential passes cost one
    // Spark job each instead of a chain of broadcast-subplan jobs
    def lowerMedian(hist: DataFrame, v: String): Array[(String, Long, Long)] = {
      val binned = hist.withColumn("bin", expr(s"$v div 100000"))
      val wCarry = Window.partitionBy("flag").orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, -1)
      val medBin = binned.groupBy("flag", "bin").agg(sum("n").as("bw"))
        .withColumn("cw", coalesce(sum("bw").over(wCarry), lit(0L)))
        .withColumn("tot", sum("bw").over(Window.partitionBy("flag")))
        .filter(col("cw") * 2 < col("tot") &&
          (col("cw") + col("bw")) * 2 >= col("tot"))
        .select("flag", "bin", "cw", "tot")
      val wIn = Window.partitionBy("flag").orderBy(v)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      binned.join(broadcast(medBin), Seq("flag", "bin"))
        .withColumn("run", col("cw") + sum("n").over(wIn))
        .filter(col("run") * 2 >= col("tot"))
        .groupBy("flag").agg(min(v).as("med"), max("tot").as("tot"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    }
    // the value histogram is consumed by both order-statistic passes —
    // cache it so the corpus scan runs once, not twice. spreadIfSmall:
    // at one-split scale the whole histogram fold otherwise runs on one
    // core (measured 0.84 s of the key's 2.9 s); keyed on the group
    // columns so the groupBy reuses the exchange
    val hist = Tables.spreadIfSmall(s, dir, "lineitem",
        Tables.lineitem(s, dir)
          .select(col("l_returnflag").as("flag"),
            cents(col("l_extendedprice")).as("cents")),
        Seq("flag", "cents"))
      .groupBy("flag", "cents").agg(count(lit(1)).as("n"))
      .cache()
    val med = lowerMedian(hist, "cents")
    val medDf = broadcast(med.toSeq.toDF("flag", "med_cents", "n_rows"))
    val devHist = hist.join(medDf, "flag")
      .withColumn("dev", abs(col("cents") - col("med_cents")))
      .groupBy("flag", "dev").agg(sum("n").as("n"))
    val mad = lowerMedian(devHist, "dev").map(t => (t._1, t._2))
    hist.unpersist(blocking = false)
    medDf.join(broadcast(mad.toSeq.toDF("flag", "mad_cents")), "flag")
      .select("flag", "n_rows", "med_cents", "mad_cents")
      .orderBy("flag")
  }

  /** BENFORD first-significant-digit audit over order totals — the
    * fraud / synthetic-data screen a warehouse runs on money columns.
    * Digit extraction is string-prefix on the exact cents value
    * (portable — no log10 float anywhere); the observed per-mille share
    * compares against Benford's expected table bound as a 9-row literal
    * relation. One fact scan folding map-side into a 9-row frame; the
    * expected-share join and the share window are free at any corpus
    * size.
    */
  def q36Benford(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val exp = Seq((1L, 301L), (2L, 176L), (3L, 125L), (4L, 97L), (5L, 79L),
      (6L, 67L), (7L, 58L), (8L, 51L), (9L, 46L))
      .toDF("digit", "exp_pm")
    Tables.orders(s, dir)
      .select(substring(cents(col("o_totalprice")).cast("string"), 1, 1)
        .cast("bigint").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
      .withColumn("obs_pm",
        expr("(1000 * n) div sum(n) over ()"))
      .join(broadcast(exp), "digit")
      .withColumn("dev_pm", abs(col("obs_pm") - col("exp_pm")))
      .select("digit", "n", "obs_pm", "exp_pm", "dev_pm")
      .orderBy("digit")
  }

  /** RECURSIVE HIERARCHY ROLLUP (`q37_bom`) — the bill-of-materials query
    * Spark has no WITH RECURSIVE for: over the derived part forest
    * (parent = key div 10, roots < 10), every part's subtree descendant
    * count, rolled-up cost in exact cents, and depth. Spark-first
    * recursion = POINTER-DOUBLING transitive closure: 3 rounds of
    * closure-with-itself self-joins reach depth 2^3 = 8 (part keys stay
    * < 10^8 at any published TPC-H scale, so the bound is data-complete),
    * turning an O(depth)-round sequential recursion into O(log depth)
    * node-scale joins — the distributed recursion shape. Tree paths are
    * unique, so the per-round distinct dedups split points exactly. The
    * DuckDB oracle runs the REAL `WITH RECURSIVE`, pinning the closure to
    * genuine recursion semantics.
    */
  def q37Bom(s: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(s, dir)
      .select(col("p_partkey").as("pk"), cents(col("p_retailprice")).as("pc"))
    // self pairs (dist 0) + parent edges (dist 1)
    val self = part.select(col("pk").as("d"), col("pk").as("a"),
      lit(0L).as("dist"))
    var clo = part.filter(col("pk") >= 10)
      .select(col("pk").as("d"), expr("pk div 10").as("a"), lit(1L).as("dist"))
    var round = 0
    while (round < 3) {
      val hop = clo.as("x")
        .join(clo.as("y"), col("x.a") === col("y.d"))
        .select(col("x.d").as("d"), col("y.a").as("a"),
          (col("x.dist") + col("y.dist")).as("dist"))
      clo = clo.unionByName(hop).distinct().localCheckpoint(true)
      round += 1
    }
    self.unionByName(clo)
      .join(part.withColumnRenamed("pk", "d"), "d")
      .groupBy(col("a").as("part"))
      .agg(count(lit(1)).as("n_desc"), sum("pc").as("subtree_cents"),
        max("dist").as("max_depth"))
  }

  /** MARKET-BASKET ASSOCIATION RULES (`q38_assoc`) — the support /
    * confidence / lift mining classic over order baskets: directed rules
    * a→b for every co-purchased pair with support ≥ 2, confidence =
    * c(ab)/n(a) in exact per-mille, lift = c(ab)·N / (n(a)·n(b)) in exact
    * ppm, top 20 by (lift, antecedent, consequent). Next to the
    * co-purchase GRAPH family this is the RULE view — direction matters
    * (conf(a→b) ≠ conf(b→a)), which the symmetric edge list cannot say.
    *
    * Scale shape: baskets bound the per-order pair fan-out (TPC-H ≤ 7
    * lines), so pairs are O(rows); item supports broadcast; the basket
    * total is a broadcast 1-row aggregate (scalar bind, not a pair
    * explosion); top-20 is TakeOrdered.
    */
  def q38Assoc(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val nRow = li.select("ok").distinct().agg(count(lit(1)).as("n_orders"))
    val itemN = li.groupBy("pk").agg(count(lit(1)).as("np"))
    val pairs = li.as("a").join(li.as("b").hint("shuffle_hash"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("pa"), col("b.pk").as("pb"))
      .agg(count(lit(1)).as("cab"))
      .filter(col("cab") >= 2)
    val rules = pairs.select(col("pa").as("ante"), col("pb").as("cons"), col("cab"))
      .unionByName(pairs.select(col("pb").as("ante"), col("pa").as("cons"), col("cab")))
    rules
      .join(broadcast(itemN.toDF("ante", "na")), "ante")
      .join(broadcast(itemN.toDF("cons", "nc")), "cons")
      .crossJoin(broadcast(nRow))
      .withColumn("conf_pm", expr("(1000 * cab) div na"))
      // DECIMAL(38,0) numerator/denominator (r14): 10⁶·cab·N overflows
      // BIGINT once cab·N > ~9.2·10¹²  — a few-billion-order corpus with
      // popular pairs gets there, where Spark (non-ANSI) would wrap
      // silently while DuckDB raises. IntegralDivide still emits BIGINT,
      // so the output schema and every in-range value are unchanged (the
      // emb_stats discipline); the quotient itself is ≤ 10⁶·N, in range.
      .withColumn("lift_ppm", expr(
        "(cast(1000000 as decimal(38,0)) * cab * n_orders)" +
          " div (cast(na as decimal(38,0)) * nc)"))
      .orderBy(desc("lift_ppm"), asc("ante"), asc("cons")).limit(20)
      .select("ante", "cons", "cab", "na", "nc", "conf_pm", "lift_ppm")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q38_assoc" -> (q38Assoc _),
    "q37_bom" -> (q37Bom _),
    "q35_mad" -> (q35Mad _),
    "q36_benford" -> (q36Benford _),
    "q33_mode" -> (q33Mode _),
    "q31_weighted_median" -> (q31WeightedMedian _),
    "q32_zorder" -> (q32Zorder _),
    "q30_skyline" -> (q30Skyline _),
    "q27_run_distinct" -> (q27RunDistinct _),
    "q25_string_agg" -> (q25StringAgg _),
    "q26_ntile" -> (q26Ntile _),
    "q28_islands" -> (q28Islands _),
    "q29_unpivot" -> (q29Unpivot _),
    "q23_grouping_sets" -> (q23GroupingSets _),
    "q24_range_window" -> (q24RangeWindow _),
    "q20_nested_agg" -> (q20NestedAgg _),
    "q21_sole_blame" -> (q21SoleBlame _),
    "q22_anti_scalar" -> (q22AntiScalar _),
    "q18_having" -> (q18Having _),
    "q19_disjunctive" -> (q19Disjunctive _),
    "q17_corr" -> (q17Corr _),
    "q16_setops" -> (q16SetOps _),
    "q14_anti_join" -> (q14AntiJoin _),
    "q15_cube" -> (q15Cube _),
    "q10_rollup" -> (q10Rollup _),
    "q11_pivot" -> (q11Pivot _),
    "q12_quantiles" -> (q12Quantiles _),
    "q9_unnest" -> (q9Unnest _),
    "q1_agg" -> (q1Agg _),
    "q2_join_agg" -> (q2JoinAgg _),
    "q3_broadcast_join" -> (q3BroadcastJoin _),
    "q4_window" -> (q4Window _),
    "q5_semi_join" -> (q5SemiJoin _),
    "q6_filter" -> (q6Filter _),
    "q7_topk" -> (q7TopK _),
    "q8_distinct_agg" -> (q8DistinctAgg _))

  // DuckDB fixed-point mirrors. CAST(round(x*100) AS BIGINT) is the shared
  // cents kernel; outer CAST(sum(..) AS BIGINT) collapses DuckDB's HUGEINT
  // sum to int64 so pandas dtypes match Spark's.
  private val lCents = "CAST(round(l_extendedprice * 100) AS BIGINT)"
  private val lBp = "CAST(round(l_discount * 100) AS BIGINT)"

  val oracles: Map[String, String] = Map(
    "q35_mad" ->
      """WITH h AS (SELECT l_returnflag AS flag,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM lineitem GROUP BY 1, 2),
        |t AS (SELECT flag, CAST(sum(n) AS BIGINT) AS n_rows FROM h GROUP BY 1),
        |r1 AS (SELECT flag, cents,
        |    sum(n) OVER (PARTITION BY flag ORDER BY cents) AS cum FROM h),
        |med AS (SELECT r1.flag, min(cents) AS med_cents
        |  FROM r1 JOIN t ON t.flag = r1.flag
        |  WHERE cum * 2 >= n_rows GROUP BY 1),
        |d AS (SELECT h.flag, abs(cents - med_cents) AS dev,
        |    CAST(sum(n) AS BIGINT) AS n
        |  FROM h JOIN med ON med.flag = h.flag GROUP BY 1, 2),
        |r2 AS (SELECT flag, dev,
        |    sum(n) OVER (PARTITION BY flag ORDER BY dev) AS cum FROM d),
        |mad AS (SELECT r2.flag, min(dev) AS mad_cents
        |  FROM r2 JOIN t ON t.flag = r2.flag
        |  WHERE cum * 2 >= n_rows GROUP BY 1)
        |SELECT t.flag, n_rows, med_cents, mad_cents
        |FROM t JOIN med ON med.flag = t.flag JOIN mad ON mad.flag = t.flag
        |ORDER BY t.flag""".stripMargin,
    "q38_assoc" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |n AS (SELECT count(DISTINCT ok) AS n_orders FROM li),
        |itemn AS (SELECT pk, CAST(count(*) AS BIGINT) AS np FROM li GROUP BY 1),
        |pairs AS (SELECT a.pk AS pa, b.pk AS pb, CAST(count(*) AS BIGINT) AS cab
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |rules AS (SELECT pa AS ante, pb AS cons, cab FROM pairs
        |          UNION ALL SELECT pb, pa, cab FROM pairs)
        |SELECT ante, cons, cab, na, nc,
        |  CAST((1000 * cab) // na AS BIGINT) AS conf_pm,
        |  CAST((CAST(1000000 AS HUGEINT) * cab * (SELECT n_orders FROM n))
        |    // (CAST(na AS HUGEINT) * nc) AS BIGINT) AS lift_ppm
        |FROM rules
        |  JOIN (SELECT pk AS ante, np AS na FROM itemn) USING (ante)
        |  JOIN (SELECT pk AS cons, np AS nc FROM itemn) USING (cons)
        |ORDER BY lift_ppm DESC, ante, cons LIMIT 20""".stripMargin,
    "q37_bom" ->
      """WITH RECURSIVE anc AS (
        |  SELECT p_partkey AS d, p_partkey AS a, CAST(0 AS BIGINT) AS dist
        |  FROM part
        |  UNION ALL
        |  SELECT d, a // 10, dist + 1 FROM anc WHERE a >= 10)
        |SELECT a AS part, count(*) AS n_desc,
        |  CAST(sum(p.pc) AS BIGINT) AS subtree_cents, max(dist) AS max_depth
        |FROM anc JOIN (SELECT p_partkey, CAST(round(p_retailprice * 100) AS BIGINT) AS pc
        |               FROM part) p ON p.p_partkey = anc.d
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q36_benford" ->
      """WITH c AS (SELECT CAST(substr(CAST(
        |      CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1)
        |      AS BIGINT) AS digit
        |  FROM orders),
        |g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM c GROUP BY 1),
        |o AS (SELECT digit, n,
        |    CAST((1000 * n) // (sum(n) OVER ()) AS BIGINT) AS obs_pm FROM g),
        |e(digit, exp_pm) AS (VALUES (1, CAST(301 AS BIGINT)), (2, 176),
        |    (3, 125), (4, 97), (5, 79), (6, 67), (7, 58), (8, 51), (9, 46))
        |SELECT o.digit, n, obs_pm, CAST(e.exp_pm AS BIGINT) AS exp_pm,
        |  abs(obs_pm - e.exp_pm) AS dev_pm
        |FROM o JOIN e ON e.digit = o.digit
        |ORDER BY o.digit""".stripMargin,
    "q33_mode" ->
      """WITH c AS (SELECT epoch_ms(o_orderdate) // 86400000 // 30 AS period,
        |    o_orderpriority AS prio, count(*) AS cnt
        |  FROM orders GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY period
        |      ORDER BY cnt DESC, prio) AS rk,
        |    sum(cnt) OVER (PARTITION BY period) AS n_total FROM c)
        |SELECT period, prio AS mode_prio, CAST(cnt AS BIGINT) AS cnt,
        |  CAST(n_total AS BIGINT) AS n_total,
        |  CAST((1000 * cnt) // n_total AS BIGINT) AS share_pm
        |FROM r WHERE rk = 1 ORDER BY period""".stripMargin,
    // the oracle replays the median scan as ONE global running sum —
    // correct at oracle scale; the Spark side's bin-carry + median-bin
    // refinement is the distributed equivalent (the q26_ntile precedent)
    "q31_weighted_median" ->
      """WITH g AS (SELECT l_returnflag AS flag,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (SELECT flag, cents,
        |    sum(w) OVER (PARTITION BY flag ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run,
        |    sum(w) OVER (PARTITION BY flag) AS tot
        |  FROM g)
        |SELECT flag, CAST(min(cents) AS BIGINT) AS median_c,
        |  CAST(max(tot) AS BIGINT) AS tot_w
        |FROM r WHERE run * 2 >= tot GROUP BY flag ORDER BY flag""".stripMargin,
    "q32_zorder" -> {
      val zSql = (0 until 16).map(i =>
        s"((((size >> $i) & 1) << ${2 * i}) + (((pb >> $i) & 1) << ${2 * i + 1}))")
        .mkString(" + ")
      s"""WITH p AS (SELECT p_partkey, CAST(p_size AS BIGINT) AS size,
         |    CAST(round(p_retailprice * 100) AS BIGINT) // 10000 AS pb
         |  FROM part),
         |z AS (SELECT p_partkey, size, pb, $zSql AS z FROM p)
         |SELECT z // 64 AS zbucket, count(*) AS n,
         |  min(size) AS min_size, max(size) AS max_size,
         |  min(pb) AS min_pb, max(pb) AS max_pb
         |FROM z GROUP BY 1 ORDER BY 1""".stripMargin
    },
    // the oracle replays the two running maxima as ONE global window —
    // correct at oracle scale; the Spark side's bin-and-broadcast prefix
    // max is the distributed equivalent (the text_pack precedent)
    "q30_skyline" ->
      """WITH p AS (SELECT p_partkey,
        |    CAST(round(p_retailprice * 100) AS BIGINT) AS price_c,
        |    CAST(p_size AS BIGINT) AS size FROM part),
        |m AS (SELECT p_partkey, price_c, size,
        |    coalesce(max(size) OVER (ORDER BY price_c
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) AS m_lt,
        |    coalesce(max(size) OVER (ORDER BY price_c
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1) AS m_le
        |  FROM p)
        |SELECT p_partkey, price_c, size FROM m
        |WHERE NOT (m_lt >= size OR m_le > size)
        |ORDER BY price_c, p_partkey""".stripMargin,
    "q29_unpivot" ->
      """WITH w AS (SELECT p_partkey, CAST(p_size AS BIGINT) AS size,
        |    CAST(round(p_retailprice * 100) AS BIGINT) AS retail_c,
        |    CAST(length(p_name) AS BIGINT) AS name_len FROM part),
        |l AS (SELECT 'size' AS attribute, size AS value FROM w
        |  UNION ALL SELECT 'retail_c', retail_c FROM w
        |  UNION ALL SELECT 'name_len', name_len FROM w)
        |SELECT attribute, count(*) AS n, CAST(sum(value) AS BIGINT) AS sum_v,
        |  min(value) AS min_v, max(value) AS max_v
        |FROM l GROUP BY 1 ORDER BY 1""".stripMargin,
    "q28_islands" ->
      """WITH iv AS (SELECT l_suppkey, l_orderkey, l_linenumber,
        |    date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS d0,
        |    date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
        |      + CAST(l_quantity AS BIGINT) AS d1
        |  FROM lineitem),
        |m AS (SELECT l_suppkey, l_orderkey, l_linenumber, d0, d1,
        |    max(d1) OVER (PARTITION BY l_suppkey
        |      ORDER BY d0, d1, l_orderkey, l_linenumber
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        |  FROM iv),
        |f AS (SELECT l_suppkey, l_orderkey, l_linenumber, d0, d1,
        |    CASE WHEN prev_end IS NULL OR d0 > prev_end THEN 1 ELSE 0 END AS brk
        |  FROM m),
        |g AS (SELECT l_suppkey, d0, d1,
        |    sum(brk) OVER (PARTITION BY l_suppkey
        |      ORDER BY d0, d1, l_orderkey, l_linenumber
        |      ROWS UNBOUNDED PRECEDING) AS isl
        |  FROM f),
        |i AS (SELECT l_suppkey, isl, count(*) AS n_iv,
        |    min(d0) AS i0, max(d1) AS i1
        |  FROM g GROUP BY 1, 2)
        |SELECT l_suppkey, CAST(sum(n_iv) AS BIGINT) AS n_intervals,
        |  count(*) AS n_islands,
        |  CAST(sum(i1 - i0 + 1) AS BIGINT) AS covered_days,
        |  CAST(max(i1 - i0 + 1) AS BIGINT) AS max_island_days
        |FROM i GROUP BY 1 ORDER BY 1""".stripMargin,
    "q27_run_distinct" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |opk AS (SELECT o_custkey AS ck, li.ok, o_orderdate AS od, pk
        |  FROM li JOIN orders o ON o.o_orderkey = li.ok),
        |m AS (SELECT ck, ok, od,
        |    CASE WHEN row_number() OVER (PARTITION BY ck, pk ORDER BY od, ok) = 1
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM opk),
        |per AS (SELECT ck, ok, od, count(*) AS n_parts,
        |    CAST(sum(is_new) AS BIGINT) AS n_new
        |  FROM m GROUP BY 1, 2, 3)
        |SELECT ck, ok, n_parts, n_new,
        |  CAST(sum(n_new) OVER (PARTITION BY ck ORDER BY od, ok
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_distinct
        |FROM per""".stripMargin,
    "q25_string_agg" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  string_agg(o_orderstatus, ','
        |    ORDER BY epoch_ms(o_orderdate::TIMESTAMP), o_orderkey) AS status_seq
        |FROM orders GROUP BY 1 ORDER BY o_custkey""".stripMargin,
    "q26_ntile" ->
      """WITH r AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS pc,
        |    o_orderkey AS ok FROM orders),
        |t AS (SELECT pc, ntile(10) OVER (ORDER BY pc, ok) AS decile FROM r)
        |SELECT CAST(decile AS BIGINT) AS decile, count(*) AS n_orders,
        |  CAST(sum(pc) AS BIGINT) AS sum_pc, min(pc) AS min_pc, max(pc) AS max_pc
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    "q23_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS status,
        |  coalesce(o_orderpriority, '(all)') AS priority,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price,
        |  count(*) AS n
        |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
        |  (o_orderstatus, o_orderpriority), ())
        |ORDER BY gid, status, priority""".stripMargin,
    "q24_range_window" ->
      """SELECT o_orderkey, o_custkey,
        |  epoch_ms(o_orderdate::TIMESTAMP) // 1000 AS ts_s,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w AS BIGINT) AS roll_sum_c,
        |  CAST(count(*) OVER w AS BIGINT) AS roll_n
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY epoch_ms(o_orderdate::TIMESTAMP) // 1000
        |  RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,
    "q20_nested_agg" ->
      """WITH pairs AS MATERIALIZED (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS pair_qty
        |  FROM lineitem JOIN part ON p_partkey = l_partkey AND p_size < 10
        |  GROUP BY 1, 2),
        |dom AS (
        |  SELECT * FROM (
        |    SELECT l_partkey, l_suppkey, pair_qty,
        |      CAST(sum(pair_qty) OVER (PARTITION BY l_partkey) AS BIGINT) AS total_qty,
        |      count(*) OVER (PARTITION BY l_partkey) AS n_part_supps
        |    FROM pairs) t
        |  WHERE pair_qty * n_part_supps >= total_qty * 2)
        |SELECT n_name, count(*) AS n_pairs,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  CAST(sum(pair_qty) AS BIGINT) AS qty_sum
        |FROM dom JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q21_sole_blame" ->
      """WITH pair AS (
        |  SELECT l_orderkey, l_suppkey,
        |    max(CASE WHEN epoch_ms(l_shipdate) - epoch_ms(o_orderdate)
        |             > 60 * 86400000::BIGINT THEN 1 ELSE 0 END) AS any_late
        |  FROM lineitem JOIN orders
        |    ON l_orderkey = o_orderkey AND o_orderstatus = 'F'
        |  GROUP BY 1, 2),
        |ord AS (
        |  SELECT l_orderkey, count(*) AS n_supps,
        |    CAST(sum(any_late) AS BIGINT) AS late_supps,
        |    max(CASE WHEN any_late = 1 THEN l_suppkey END) AS blamed
        |  FROM pair GROUP BY 1
        |  HAVING n_supps > 1 AND late_supps = 1)
        |SELECT blamed AS suppkey, s_name, count(*) AS numwait
        |FROM ord JOIN supplier ON blamed = s_suppkey
        |GROUP BY 1, 2 ORDER BY numwait DESC, suppkey LIMIT 20""".stripMargin,
    "q22_anti_scalar" ->
      """WITH cust AS MATERIALIZED (
        |  SELECT c_custkey, c_mktsegment,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
        |  FROM customer
        |  WHERE c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD', 'MACHINERY')),
        |thr AS (SELECT CAST(sum(bal_c) AS BIGINT) AS sum_c, count(*) AS cnt
        |        FROM cust WHERE bal_c > 0)
        |SELECT c_mktsegment AS segment, count(*) AS n_cust,
        |  CAST(sum(bal_c) AS BIGINT) AS bal_sum
        |FROM cust, thr
        |WHERE bal_c * cnt > sum_c
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q18_having" ->
      """WITH big AS (
        |  SELECT l_orderkey, CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
        |  FROM lineitem GROUP BY 1 HAVING sum_qty > 200)
        |SELECT c_custkey AS custkey, c_name, o_orderkey AS orderkey,
        |  epoch_ms(o_orderdate) AS odate_ms,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS price_c, sum_qty
        |FROM orders JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY sum_qty DESC, orderkey LIMIT 100""".stripMargin,
    "q19_disjunctive" ->
      s"""SELECT
         |  CAST(sum($lCents * (100 - $lBp)) AS BIGINT) AS revenue,
         |  count(*) AS n_rows
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
         |       AND CAST(round(l_quantity) AS BIGINT) BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
         |       AND CAST(round(l_quantity) AS BIGINT) BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
         |       AND CAST(round(l_quantity) AS BIGINT) BETWEEN 20 AND 30)""".stripMargin,
    "q17_corr" ->
      s"""WITH li AS MATERIALIZED (
         |  SELECT l_partkey, CAST(round(l_quantity) AS BIGINT) AS qty,
         |         $lCents AS price_c
         |  FROM lineitem JOIN part
         |    ON p_partkey = l_partkey AND p_brand = 'Brand#13'),
         |thr AS (SELECT l_partkey, count(*) AS cnt, sum(qty) AS sum_qty
         |        FROM li GROUP BY 1)
         |SELECT li.l_partkey AS partkey,
         |  count(*) AS n_below,
         |  CAST(sum(price_c) AS BIGINT) AS cents_below
         |FROM li JOIN thr USING (l_partkey)
         |WHERE qty * cnt * 5 < sum_qty
         |GROUP BY 1 ORDER BY cents_below DESC, partkey LIMIT 20""".stripMargin,
    "q16_setops" ->
      """WITH a AS (SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |    AND o_orderdate < TIMESTAMP '1996-01-01'),
        |b AS (SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1997-01-01')
        |SELECT o_custkey AS custkey, 'both' AS tag
        |  FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
        |UNION ALL
        |SELECT o_custkey, 'only_1995'
        |  FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
        |UNION ALL
        |SELECT o_custkey, 'only_1996'
        |  FROM (SELECT * FROM b EXCEPT SELECT * FROM a)
        |ORDER BY tag, custkey""".stripMargin,
    "q14_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')""".stripMargin,
    "q15_cube" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS status,
        |  coalesce(o_orderpriority, '(all)') AS priority,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price,
        |  count(*) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY 1, 2""".stripMargin,
    "q10_rollup" ->
      s"""SELECT coalesce(l_returnflag, '(all)') AS rf,
         |  coalesce(l_linestatus, '(all)') AS ls,
         |  CAST(sum($lCents) AS BIGINT) AS sum_price,
         |  count(*) AS n
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY 1, 2""".stripMargin,
    "q11_pivot" ->
      """SELECT user_id,
        |  CAST(coalesce(sum(CASE WHEN event_type = 'click' THEN vc END), 0) AS BIGINT) AS click,
        |  CAST(coalesce(sum(CASE WHEN event_type = 'error' THEN vc END), 0) AS BIGINT) AS error,
        |  CAST(coalesce(sum(CASE WHEN event_type = 'purchase' THEN vc END), 0) AS BIGINT) AS purchase,
        |  CAST(coalesce(sum(CASE WHEN event_type = 'signup' THEN vc END), 0) AS BIGINT) AS signup,
        |  CAST(coalesce(sum(CASE WHEN event_type = 'view' THEN vc END), 0) AS BIGINT) AS view
        |FROM (SELECT user_id, event_type, CAST(round(value * 100) AS BIGINT) AS vc FROM events) t
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q12_quantiles" ->
      """SELECT event_type,
        |  CAST(max(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN value_c END) AS BIGINT) AS q25,
        |  CAST(max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN value_c END) AS BIGINT) AS q50,
        |  CAST(max(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT) THEN value_c END) AS BIGINT) AS q75,
        |  CAST(max(n) AS BIGINT) AS n
        |FROM (SELECT event_type, value_c,
        |        row_number() OVER (PARTITION BY event_type ORDER BY value_c, event_id) AS rn,
        |        count(*) OVER (PARTITION BY event_type) AS n
        |      FROM (SELECT event_type, event_id, CAST(round(value * 100) AS BIGINT) AS value_c
        |            FROM events) a) b
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q9_unnest" ->
      """SELECT i - 1 AS dim, count(*) AS n,
        |  CAST(sum(CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000000.0) AS BIGINT)) AS BIGINT) AS sum_fixed,
        |  min(CAST(embedding[i] AS DOUBLE)) AS min_e,
        |  max(CAST(embedding[i] AS DOUBLE)) AS max_e
        |FROM embeddings, range(1, 65) r(i)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
         |  CAST(sum($lCents) AS BIGINT) AS sum_base_price,
         |  CAST(sum($lCents * (100 - $lBp)) AS BIGINT) AS sum_disc_price,
         |  count(*) AS count_order
         |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q2_join_agg" ->
      s"""SELECT l_orderkey,
         |  CAST(sum($lCents * (100 - $lBp)) AS BIGINT) AS revenue,
         |  epoch_ms(o_orderdate) AS o_odate_ms, o_orderpriority
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |  AND l_shipdate > TIMESTAMP '1998-01-01'
         |GROUP BY 1, 3, 4 ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,
    "q3_broadcast_join" ->
      s"""SELECT n_name,
         |  CAST(sum($lCents * (100 - $lBp)) AS BIGINT) AS revenue,
         |  count(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q4_window" ->
      """SELECT o_custkey, o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS price, rk
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |      FROM orders) t
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,
    "q5_semi_join" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q6_filter" ->
      s"""SELECT
         |  CAST(sum($lCents * $lBp) AS BIGINT) AS revenue,
         |  count(*) AS n_rows
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
         |  AND l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 24""".stripMargin,
    "q7_topk" ->
      """SELECT o_orderkey, o_custkey, CAST(round(o_totalprice * 100) AS BIGINT) AS price
        |FROM orders ORDER BY price DESC, o_orderkey ASC LIMIT 25""".stripMargin,
    "q8_distinct_agg" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)
}
