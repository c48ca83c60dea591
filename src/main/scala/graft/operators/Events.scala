package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table: sessionization,
  * funnel conversion, cohort retention, and JSON property extraction —
  * the product-analytics shapes a clickstream warehouse runs daily.
  *
  * Scale notes (the 100 TB question per operator):
  * - Sessionization is ONE hash exchange on `user_id` followed by a
  *   per-user sort inside the window; the session fold and the
  *   per-session aggregate reuse the same partitioning, so the whole
  *   operator is a single shuffle regardless of event volume. Skewed
  *   users (bots) are bounded by the per-user sort, not a cross-user
  *   product.
  * - Funnel stages chain equi-joins on `user_id`; every stage's left
  *   side shrinks monotonically (stage-2 users ⊆ stage-1 users), so
  *   AQE can flip later stages to broadcast once the survivor set
  *   fits. No stage ever rescans more than the filtered event type.
  * - Retention is groupBy(count distinct) — partial aggregation
  *   map-side, one exchange on (cohort_week, week_offset).
  * - JSON extraction (`get_json_object`) is scan-side and
  *   codegen-friendly; nothing shuffles until the final groupBy on the
  *   5-value event_type domain.
  */
object Events {

  /** Session gap: a new session starts after 4 h of inactivity. */
  private val SessionGapS = 14400L

  /** Funnel step window: each stage must follow within 24 h. */
  private val FunnelWindowS = 86400L

  /** `events.ts` is parquet `timestamp[ns]`, which Spark surfaces as raw
    * epoch-nanos int64 (nanos have no Spark logical type). Floor-seconds
    * here equals DuckDB's `date_diff('second', …)` boundary count on the
    * native timestamp, so second-granular arithmetic agrees between
    * engines; [[tsStamp]] rebuilds a µs timestamp where the OUTPUT needs
    * a real timestamp column.
    */
  private def tsS(name: String) = expr(s"$name div 1000000000")

  private def tsStamp(name: String) = expr(s"timestamp_micros($name div 1000)")

  /** Gap-based sessionization: per-user sessions split on >4 h silence,
    * with per-session event count and duration. Session index is the
    * running sum of break flags — deterministic under the (ts, event_id)
    * tiebreak even when two events share a timestamp.
    */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    val order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), tsS("ts").as("ts_s"))
      .withColumn("prev_s", lag(col("ts_s"), 1).over(order))
      .withColumn("brk",
        when(col("prev_s").isNull || col("ts_s") - col("prev_s") > SessionGapS,
          1L).otherwise(0L))
      .withColumn("session_idx", sum(col("brk")).over(run))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        (max(col("ts_s")) - min(col("ts_s"))).as("duration_s"))
  }

  /** Market-basket LIFT over sessions — association mining with the
    * session as the basket (the "users who did A in a session also did
    * B" co-occurrence analysis): for each unordered event-type pair,
    * `lift_pm = ⌊1000·S·n_ab / (n_a·n_b)⌋` where n_x counts sessions
    * containing the type and S is the session total — lift > 1000 means
    * positive association. All counts exact BIGINTs; the division is one
    * positive floor `div`, so both engines rank identically.
    *
    * Scale shape: sessions come from the shared sessionize window (one
    * user-keyed exchange); the distinct (session, type) frame is ≤
    * sessions×|types|; the co-occurrence self-join is keyed by SESSION
    * with ≤ |types|² rows emitted per session (types are enum-like — the
    * [[Sketches.sketchKmv]] domain argument), then everything aggregates
    * to the bounded |types|² pair frame and the |types|-row marginals
    * broadcast onto it.
    */
  def lift(s: SparkSession, dir: String): DataFrame = {
    val order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val st = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        tsS("ts").as("ts_s"), col("event_type"))
      .withColumn("prev_s", lag(col("ts_s"), 1).over(order))
      .withColumn("brk",
        when(col("prev_s").isNull || col("ts_s") - col("prev_s") > SessionGapS,
          1L).otherwise(0L))
      .withColumn("session_idx", sum(col("brk")).over(run))
      .select("user_id", "session_idx", "event_type")
      .distinct()
    val nSessions = st.select("user_id", "session_idx").distinct()
      .agg(count(lit(1)).as("n_sessions"))
    val marg = st.groupBy("event_type").agg(count(lit(1)).as("n_t"))
    st.select(col("user_id"), col("session_idx"), col("event_type").as("a"))
      .join(st.select(col("user_id"), col("session_idx"), col("event_type").as("b")),
        Seq("user_id", "session_idx"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
      .join(broadcast(marg.select(col("event_type").as("a"), col("n_t").as("n_a"))), "a")
      .join(broadcast(marg.select(col("event_type").as("b"), col("n_t").as("n_b"))), "b")
      .crossJoin(broadcast(nSessions))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        col("n_sessions"),
        expr("(1000L * n_sessions * n_ab) div (n_a * n_b)").as("lift_pm"))
      .orderBy(desc("lift_pm"), asc("a"), asc("b"))
  }

  /** Exact GINI concentration of per-user activity, per event type (the
    * inequality census a platform runs over contribution counts) — in
    * exact integer arithmetic via the two-level VALUE-bucket rank
    * assembly (the q26_ntile discipline applied to the Lorenz sum): a
    * literal rank-window Gini sorts every (type, user) row through
    * |types| window partitions, but users sharing a count x are
    * rank-interchangeable, so the ascending-rank cross sum Σ i·xᵢ
    * collapses per (type, x) block to `x·(m·cum + m(m+1)/2)` with m the
    * block size and cum the users below — the window then runs over the
    * ≤ |types|×|distinct counts| frame, never user-scale. `gini_pm =
    * ⌊1000·(2·Σi·xᵢ − (n+1)·Σx) / (n·Σx)⌋`, non-negative by the sorted
    * rearrangement inequality so floor ≡ trunc cross-engine.
    */
  def gini(s: SparkSession, dir: String): DataFrame = {
    val byTypeX = Window.partitionBy("event_type").orderBy("x")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, dir)
      .groupBy("event_type", "user_id").agg(count(lit(1)).as("x"))
      .groupBy("event_type", "x").agg(count(lit(1)).as("m"))
      .withColumn("cum", coalesce(sum("m").over(byTypeX), lit(0L)))
      .withColumn("six",
        col("x") * (col("m") * col("cum") + expr("(m * (m + 1)) div 2")))
      .groupBy("event_type")
      .agg(sum("m").as("n_users"), sum(col("x") * col("m")).as("total_events"),
        sum("six").as("s_ix"))
      .select(col("event_type"), col("n_users"), col("total_events"),
        expr("(1000L * (2L * s_ix - (n_users + 1L) * total_events))" +
          " div (n_users * total_events)").as("gini_pm"))
      .orderBy("event_type")
  }

  /** Ordered conversion funnel signup → view → purchase, each step
    * within 24 h of the previous one. Stage times are per-user minima,
    * so the result is order-insensitive and deterministic.
    */
  def funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"), tsS("ts").as("ts_s"))
    def stageAfter(evType: String, prev: DataFrame, prevTs: String, out: String) =
      ev.filter(col("event_type") === evType)
        .join(prev.select("user_id", prevTs), "user_id")
        .filter(col("ts") > col(prevTs) &&
          col("ts_s") - tsS(prevTs) <= FunnelWindowS)
        .groupBy("user_id").agg(min("ts").as(out))
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val s2 = stageAfter("view", s1, "t1", "t2")
    val s3 = stageAfter("purchase", s2, "t2", "t3")
    def counted(df: DataFrame, stage: String) =
      df.agg(count(lit(1)).as("n_users")).withColumn("stage", lit(stage))
    counted(s1, "stage1_signup")
      .unionByName(counted(s2, "stage2_view"))
      .unionByName(counted(s3, "stage3_purchase"))
      .select("stage", "n_users")
  }

  /** Weekly cohort retention: users grouped by the ISO week of their
    * first event; for each later week, how many came back. Week offsets
    * are exact multiples of 7 days (both endpoints are Monday-truncated)
    * so the integer division is lossless.
    */
  def retention(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), tsStamp("ts").as("tst"))
    val first = ev.groupBy("user_id")
      .agg(date_trunc("week", min("tst")).as("cohort_week"))
    ev.join(first, "user_id")
      .groupBy(col("cohort_week"),
        (datediff(date_trunc("week", col("tst")), col("cohort_week")) / 7)
          .cast("bigint").as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** Tumbling 1-hour windowed aggregate — the batch face of the
    * streaming WindowedStats operator, via Spark's native `window()`
    * (so the same grouping works under `readStream` with a watermark).
    * Window starts are epoch-aligned floors, identical to DuckDB's
    * `time_bucket`. The double `value` is aggregated as exact integer
    * cents (`round(value*100)`: one correctly-rounded double product +
    * round, bit-identical cross-engine) so the sum is order-independent.
    *
    * Scale shape: partial aggregation map-side, ONE exchange on
    * (window, event_type) — cardinality = hours × types, tiny at any
    * corpus size, so the reduce side never skews.
    */
  def tumblingWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(tsStamp("ts").as("tst"), col("event_type"),
        round(col("value") * 100).cast("bigint").as("cents"),
        col("user_id"))
      .groupBy(window(col("tst"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum("cents").as("value_cents"),
        countDistinct(col("user_id")).as("n_users"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n_events"), col("value_cents"), col("n_users"))

  /** Attribution lookback: a purchase converts its user's most recent
    * click if it happened within 24 h.
    */
  private val AttributionWindowS = 86400L

  /** Last-touch marketing attribution: each purchase is attributed to the
    * user's most recent preceding click within 24 h. The "most recent
    * preceding" is a conditional running max over the per-user event
    * order — ONE hash exchange on `user_id` (the same single-shuffle
    * shape as sessionization), no self-join of purchases against clicks
    * (the naive join is quadratic in events-per-user; bot users would
    * melt it). Unattributed purchases stay as rows with `click_s = -1`
    * rather than NULL so the BIGINT column never degrades to float in
    * the cross-engine compare.
    */
  def attribution(s: SparkSession, dir: String): DataFrame = {
    val prior = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"),
        tsS("ts").as("ts_s"),
        round(col("value") * 100).cast("bigint").as("value_cents"))
      .withColumn("last_click_s",
        max(when(col("event_type") === "click", col("ts_s"))).over(prior))
      .filter(col("event_type") === "purchase")
      .withColumn("attributed",
        col("last_click_s").isNotNull &&
          col("ts_s") - col("last_click_s") <= AttributionWindowS)
      .select(col("event_id"), col("user_id"), col("ts_s").as("purchase_s"),
        when(col("attributed"), col("last_click_s")).otherwise(lit(-1L)).as("click_s"),
        col("attributed"), col("value_cents"))
  }

  /** Markov path analysis: the event-type transition matrix within
    * sessions — for every consecutive event pair of a user separated by
    * at most the session gap, count (from_type → to_type) and derive the
    * transition probability as an integer fixed-point `(1e6·n) div
    * row_total`. The pairing is the same single user_id exchange as
    * [[sessionize]] (a lag window, never a self-join); the matrix is
    * |types|² rows, so the reduce side is constant-size at any corpus
    * scale and the row totals come from a tiny window over the matrix
    * itself.
    */
  def transitions(s: SparkSession, dir: String): DataFrame = {
    val order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val pairs = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"), tsS("ts").as("ts_s"))
      .withColumn("prev_type", lag("event_type", 1).over(order))
      .withColumn("prev_s", lag(col("ts_s"), 1).over(order))
      .filter(col("prev_type").isNotNull &&
        col("ts_s") - col("prev_s") <= SessionGapS)
    pairs.groupBy(col("prev_type").as("from_type"),
        col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("row_total",
        sum("n").over(Window.partitionBy("from_type")))
      .withColumn("p6", expr("(1000000 * n) div row_total"))
  }

  /** SEASONALITY profile — the day-of-week × hour-of-day traffic matrix
    * (the "when is the platform busy" heatmap behind capacity planning
    * and anomaly baselines; [[dau]] sees days, [[tumblingWindow]] sees
    * hours — neither sees the weekly cycle): per (dow, hod) cell the
    * event count, distinct users, exact cents sum, and per-mille share.
    * Day-of-week by pure epoch arithmetic — `((days + 4) % 7)`,
    * 1970-01-01 being a Thursday with Sunday = 0 — so no engine's
    * calendar/locale conventions (Spark 1=Sunday, DuckDB 0=Sunday, ISO
    * 1=Monday) can disagree.
    *
    * Scale shape: map-side partial aggregation into the FIXED 168-cell
    * frame (the distinct-user count is the only second exchange, still
    * keyed by the bounded cell); the share window runs over 168 rows.
    */
  def seasonality(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(tsS("ts").as("ts_s"), col("user_id"),
        round(col("value") * 100).cast("bigint").as("cents"))
      .withColumn("dow", expr("((ts_s div 86400) + 4) % 7"))
      .withColumn("hod", expr("(ts_s % 86400) div 3600"))
      .groupBy("dow", "hod")
      .agg(count(lit(1)).as("n_events"),
        countDistinct("user_id").as("n_users"),
        sum("cents").as("sum_cents"))
      .withColumn("share_pm",
        expr("(1000 * n_events) div sum(n_events) over ()"))
      .orderBy("dow", "hod")

  /** TIME-TO-CONVERT census — the activation-latency distribution next
    * to [[funnel]]'s fixed-window conversion count: per user, the gap
    * from their FIRST `signup` to the first `purchase` at-or-after it,
    * log₂-binned seconds (`length(bin(ttc_s + 1))`, the shared
    * libm-free integer log₂), with never-converted signups in bucket
    * −1 — the "how long does activation take, and who never activates"
    * question growth teams ask that the funnel's 24 h cut cannot
    * answer.
    *
    * Scale shape: ONE user-keyed exchange — the per-user first-signup
    * instant rides a window over the same partitioning the groupBy
    * then reuses (EnsureRequirements inserts no second shuffle), and
    * the conditional `min` folds the purchase-after-signup test into
    * the same pass, so there is no events self-join and no second
    * scan; the bucket rollup lands in a ≤ ~40-row frame.
    */
  def ttc(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), tsS("ts").as("ts_s"))
      .withColumn("s0",
        min(when(col("event_type") === "signup", col("ts_s"))).over(w))
      .filter(col("s0").isNotNull)
      .groupBy("user_id")
      .agg(min("s0").as("s0"),
        min(when(col("event_type") === "purchase" && col("ts_s") >= col("s0"),
          col("ts_s"))).as("p0"))
      .withColumn("ttc_s", col("p0") - col("s0"))
      .groupBy(when(col("p0").isNull, lit(-1L))
        .otherwise(length(bin(col("ttc_s") + 1)).cast("bigint")).as("bucket"))
      .agg(count(lit(1)).as("n_users"),
        min("ttc_s").as("min_s"), max("ttc_s").as("max_s"),
        sum("ttc_s").as("sum_s"))
      .orderBy("bucket")
  }

  /** STATIONARY DISTRIBUTION of the within-session event-type Markov
    * chain — [[transitions]] estimates the matrix; this answers "where
    * does the chain settle": 8 power-iteration rounds from the uniform
    * vector, all arithmetic exact fixed-point ppm (row-normalized
    * `p6 = 1e6·n div row_total`, each round `v' = Σ v·p6 div 1e6`) so
    * DuckDB replays the iteration bit-for-bit as 8 chained CTEs (the
    * dpLevelSql discipline — no float linear algebra to diverge in the
    * last ulp).
    *
    * Scale shape: the ONE corpus-scale pass is the lag-walk that counts
    * transitions (the evt_transitions shape, one user-keyed exchange
    * into the \|types\|²-bounded matrix); every iteration is a join of
    * \|types\|-row frames — driver-side-free, broadcast-scale, constant
    * at any corpus size.
    */
  def markov(s: SparkSession, dir: String): DataFrame = {
    val order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val m = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"), tsS("ts").as("ts_s"))
      .withColumn("prev_type", lag("event_type", 1).over(order))
      .withColumn("prev_s", lag(col("ts_s"), 1).over(order))
      .filter(col("prev_type").isNotNull &&
        col("ts_s") - col("prev_s") <= SessionGapS)
      .groupBy(col("prev_type").as("from_type"),
        col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p6", expr(
        "(1000000 * n) div sum(n) over (partition by from_type)"))
      .select("from_type", "to_type", "p6")
      // materialized once (r14): the matrix is referenced ~10× (types +
      // 8 iterations), and without a materialization point each
      // reference carries the corpus-scale lag-walk subtree into the
      // plan — AQE exchange reuse papered over most of the recompute
      // but the planner still planned it 10 times. |types|²-bounded.
      .localCheckpoint(true)
    val types = m.select(col("from_type").as("type")).distinct()
    var v = types.crossJoin(broadcast(types.agg(count(lit(1)).as("k"))))
      .select(col("type"), expr("1000000 div k").as("p"))
    for (_ <- 1 to 8)
      v = v.join(m, v("type") === m("from_type"))
        .groupBy(col("to_type"))
        .agg(sum(col("p") * col("p6")).as("num"))
        .select(col("to_type").as("type"), expr("num div 1000000").as("p"))
    v.select(col("type"), col("p").as("ppm")).orderBy("type")
  }

  /** LAST-OBSERVATION-CARRIED-FORWARD enrichment (forward fill): every
    * event annotated with the user's most recent purchase amount at
    * that instant (−1 before any purchase) — the state-propagation
    * join a feature store runs ("value of the customer at the moment
    * of each click") that naively plans as an events×purchases
    * BETWEEN-join but is exactly `last(…, ignoreNulls)` over the
    * per-user event order: ONE user-keyed exchange, corpus-scale
    * output, zero joins.
    */
  def ffill(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts"), tsS("ts").as("ts_s"),
        round(col("value") * 100).cast("bigint").as("cents"))
      .withColumn("last_purchase_c", coalesce(
        last(when(col("event_type") === "purchase", col("cents")),
          ignoreNulls = true).over(w), lit(-1L)))
      .select("event_id", "user_id", "event_type", "ts_s", "last_purchase_c")
  }

  /** AUTOCORRELATION FUNCTION (ACF) of the per-type hourly count series
    * at lags 1–24 — the periodicity diagnostic next to [[seasonality]]
    * (which assumes the weekly cycle; ACF measures which cycles exist)
    * and [[holt]] (whose trend model ACF validates). All moments are
    * exact integers via the cross-multiplied form: with n = hours,
    * S = Σx, `num(l) = n²Σx_t·x_{t−l} − nS(Σx_t + Σx_{t−l}) + cnt·S²`
    * and `den = n²Σx² − nS²`, so the only float is ONE final double
    * division (bit-identical cross-engine). Hours with zero events are
    * unobserved rows, the [[anomaly]] sparse-series convention.
    *
    * Scale shape: ONE corpus-scale pass (the (type, hour) partial
    * count); everything after runs on the TIME-bounded hourly frame —
    * the ×24 lag explode and the self-join on (type, hour−lag) touch
    * ≤ 24·8 760·|types| rows/year regardless of corpus size. (At 10⁹
    * events/hour the n²Σxy products need DECIMAL(38); the
    * cross-multiplied form ports unchanged.)
    */
  def acf(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .groupBy(col("event_type"), expr("ts div 3600000000000").as("hour"))
      .agg(count(lit(1)).as("x"))
    val mom = hourly.groupBy("event_type").agg(
      count(lit(1)).as("n"), sum("x").as("sx"),
      sum(expr("x * x")).as("qx"))
    val pairs = hourly
      .withColumn("lag", explode(expr("sequence(1L, 24L)")))
      .withColumn("h2", col("hour") - col("lag"))
      .join(hourly.select(col("event_type"), col("hour").as("h2"),
        col("x").as("y")), Seq("event_type", "h2"))
      .groupBy("event_type", "lag")
      .agg(count(lit(1)).as("n_pairs"), sum(expr("x * y")).as("sxy"),
        sum("x").as("sa"), sum("y").as("sb"))
    pairs.join(broadcast(mom), "event_type")
      .withColumn("num", expr(
        "n * n * sxy - n * sx * sa - n * sx * sb + n_pairs * sx * sx"))
      .withColumn("den", expr("n * n * qx - n * sx * sx"))
      .select(col("event_type"), col("lag"), col("n_pairs"),
        col("num"), col("den"),
        (col("num").cast("double") / col("den")).as("r"))
      .orderBy("event_type", "lag")
  }

  /** MULTI-TOUCH (U-shaped 40/20/40) ATTRIBUTION — the position-based
    * credit model next to [[attribution]]'s last-touch: each purchase
    * credits its user's clicks in the 24 h lookback — 40 % to the
    * first, 40 % to the last, 20 % split across the middles (n=1 →
    * 1000 ‰ to the single click; n=2 → 500/500; middles get
    * `200 div (n−2)` ‰ each, the floor convention, so every credit is
    * an exact integer both engines agree on; no clicks → 0 ‰ rows).
    *
    * Scale shape: the naive plan is a purchases×clicks self-join
    * (quadratic per bot user); here every lookback statistic —
    * conditional click count, first/last click instant — is a RANGE
    * frame `[−86 399 s, −1 s]` over the per-user event order, so the
    * whole operator is ONE user-keyed window exchange, zero joins,
    * purchase-scale output.
    */
  def multitouch(s: SparkSession, dir: String): DataFrame = {
    val look = Window.partitionBy("user_id").orderBy("ts_s")
      .rangeBetween(-86399L, -1L)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        tsS("ts").as("ts_s"))
      .withColumn("n_clicks24",
        count(when(col("event_type") === "click", 1)).over(look))
      .withColumn("first_s", coalesce(
        min(when(col("event_type") === "click", col("ts_s"))).over(look),
        lit(-1L)))
      .withColumn("last_s", coalesce(
        max(when(col("event_type") === "click", col("ts_s"))).over(look),
        lit(-1L)))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_s"),
        col("n_clicks24"), col("first_s"), col("last_s"),
        when(col("n_clicks24") === 0L, 0L)
          .when(col("n_clicks24") === 1L, 1000L)
          .when(col("n_clicks24") === 2L, 500L)
          .otherwise(400L).as("first_pm"),
        when(col("n_clicks24") <= 1L, 0L)
          .when(col("n_clicks24") === 2L, 500L)
          .otherwise(400L).as("last_pm"),
        when(col("n_clicks24") <= 2L, 0L)
          .otherwise(expr("200 div (n_clicks24 - 2)")).as("mid_each_pm"))
  }

  /** COHORT LTV matrix — the signup-cohort × account-age grid every
    * growth/finance team reads (cohort = the user's FIRST-event week,
    * age = weeks since): per cell, active distinct users, events, and
    * purchase revenue in exact cents. [[retention]] answers "did they
    * come back"; this prices the comeback. Weeks are pure epoch
    * arithmetic (`day div 7`) so no engine's week-of-year convention
    * (ISO vs US) can disagree.
    *
    * Scale shape: ONE user-keyed exchange — the per-user first-week
    * window — then the rollup lands in the (weeks × ages)-bounded frame
    * (a DECADE of weekly cohorts is a 522×522 triangle at any corpus
    * size); the distinct-user count makes the matrix agg two-phase.
    */
  def cohort(s: SparkSession, dir: String): DataFrame = {
    val wUser = Window.partitionBy("user_id")
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), tsS("ts").as("ts_s"),
        round(col("value") * 100).cast("bigint").as("cents"))
      .withColumn("week", expr("(ts_s div 86400) div 7"))
      .withColumn("cohort", min("week").over(wUser))
      .groupBy(col("cohort"), (col("week") - col("cohort")).as("age_w"))
      .agg(countDistinct("user_id").as("n_users"),
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", col("cents"))
          .otherwise(lit(0L))).as("rev_cents"))
      .orderBy("cohort", "age_w")
  }

  /** Volume-spike detection: flag (type, hour) buckets whose event count
    * sits more than two standard deviations above the type's hourly
    * mean. The z-test is evaluated WITHOUT floats by cross-multiplying
    * the variance identity — `x > μ + 2σ  ⇔  n·x − S > 0 ∧ (n·x − S)² >
    * 4·(n·SS − S²)` with S = Σx, SS = Σx² over the type's observed hours
    * — exact BIGINTs, so both engines flag the identical bucket set (a
    * float stddev differs in the last ulp between engines and can flip a
    * borderline bucket). Two keyed exchanges and ONE events scan: the
    * (type, hour) partial count, then the per-type moments as window
    * aggregates over the hours×types-row hourly frame — a separate
    * moments groupBy would rescan the fact table for a |types|-row
    * result. Hours with zero events are not observed rows and thus not
    * part of the baseline — the monitoring convention for sparse
    * streams. (At 1e10 events/hour the squares need DECIMAL(38); the
    * cross-multiplied form ports unchanged.)
    */
  /** CHANGEPOINT detection per event type — the offline form of the
    * CUSUM / Pettitt scan a monitoring pipeline runs to locate WHERE a
    * rate shifted, next to [[anomaly]]'s "did it spike" rule: over the
    * type's hourly count series (dense index i = 1..T by hour order,
    * prefix sum S_i, total N), the split maximizing the cross-multiplied
    * drift `dev_i = |T·S_i − N·i|` — the exact-integer form of
    * |S_i/N − i/T|·N·T, the empirical-CDF distance a changepoint
    * maximizes; ties break earliest. Output per type: `(n_hours,
    * n_events, cp_idx, cp_hour, max_dev)`.
    *
    * Scale shape: ONE events scan partial-aggregating map-side into the
    * ≤ |types| × hours hourly frame (the [[anomaly]] argument); the
    * index/prefix windows and the argmax run per-type over that bounded
    * frame — |types| partitions of ≤ 87,660 rows/decade, never the
    * corpus. (At 1e10 events/hour T·S needs DECIMAL(38); the
    * cross-multiplied form ports unchanged.)
    */
  def changepoint(s: SparkSession, dir: String): DataFrame = {
    val byType = Window.partitionBy("event_type")
    val byHour = byType.orderBy("hour")
    Tables.events(s, dir)
      .groupBy(col("event_type"), expr("ts div 3600000000000").as("hour"))
      .agg(count(lit(1)).as("x"))
      .withColumn("i", row_number().over(byHour).cast("long"))
      .withColumn("s", sum("x").over(byHour))
      .withColumn("n_hours", count(lit(1)).over(byType))
      .withColumn("n_events", sum("x").over(byType))
      .withColumn("dev", abs(col("n_hours") * col("s") - col("n_events") * col("i")))
      .withColumn("rn", row_number().over(byType.orderBy(desc("dev"), asc("i"))))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("n_hours"), col("n_events"),
        col("i").as("cp_idx"), col("hour").as("cp_hour"), col("dev").as("max_dev"))
  }

  def anomaly(s: SparkSession, dir: String): DataFrame = {
    val byType = Window.partitionBy("event_type")
    Tables.events(s, dir)
      .groupBy(col("event_type"), expr("ts div 3600000000000").as("hour"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("n_hours", count(lit(1)).over(byType))
      .withColumn("s1", sum("n_events").over(byType))
      .withColumn("s2", sum(col("n_events") * col("n_events")).over(byType))
      .withColumn("dev", col("n_hours") * col("n_events") - col("s1"))
      .withColumn("is_spike",
        col("dev") > 0 &&
          col("dev") * col("dev") >
            lit(4L) * (col("n_hours") * col("s2") - col("s1") * col("s1")))
      .select("event_type", "hour", "n_events", "is_spike")
  }

  /** EWMA-smoothed hourly event rates + burst flags — the classic
    * monitoring recurrence (α = 0.3) next to [[anomaly]]'s global-2σ
    * rule: s_1 = 10·x_1, s_t = (30·x_t + 7·s_{t-1}) div 10 in exact
    * integer TENTHS, burst when 100·x_t > 15·s_{t-1} (1.5× the trailing
    * baseline). An EWMA is a linear recurrence — inherently sequential
    * per series, the one shape no engine can partition away — so the
    * fold deliberately runs over the HOUR-FOLDED frame, never raw
    * events: the corpus collapses map-side into ≤ |types| × 87,660
    * hourly rows per decade (the [[concurrency]] bounded-domain
    * argument), each type's series folds in one `aggregate` HOF over
    * its sorted array, and results explode back to rows. The DuckDB
    * oracle replays the recurrence as a linear recursive CTE — floor
    * and truncating division agree because every term is positive.
    */
  def smooth(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .groupBy(col("event_type"), expr("ts div 3600000000000").as("hour"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy("event_type")
      .agg(array_sort(collect_list(struct(col("hour"), col("n_events")))).as("xs"))
      .withColumn("s_arr", expr(
        """aggregate(xs, cast(array() as array<bigint>),
          |  (acc, x) -> case when size(acc) = 0 then array(10 * x.n_events)
          |    else array_append(acc,
          |      (30 * x.n_events + 7 * element_at(acc, size(acc))) div 10) end)"""
          .stripMargin))
      .select(col("event_type"), posexplode(col("xs")).as(Seq("pos", "x")),
        col("s_arr"))
      .select(col("event_type"), col("x.hour").as("hour"),
        col("x.n_events").as("n_events"),
        expr("element_at(s_arr, pos + 1)").as("ewma10"),
        expr("pos > 0 AND 100 * x.n_events > 15 * element_at(s_arr, pos)")
          .as("is_burst"))
  }

  /** DAU / WAU / stickiness — the engagement dashboard every event
    * warehouse refreshes daily: distinct users per day, distinct users
    * over the trailing 7 days, and their ratio (as integer fixed-point
    * permille, one exact division). The trailing window EXPANDS instead
    * of range-joining: each (day, user) row is generated into the 7
    * trailing windows it serves (`sequence(day, day+6)` — map-side,
    * fanout exactly 7) and the rest is a plain count-distinct per day —
    * an equi-shuffle Spark partial-aggregates, where a range join
    * degenerates to a nested loop and a sliding count-distinct window
    * cannot partial-aggregate at all. At 100 TB the per-day user table
    * is the intermediate every engagement pipeline persists anyway.
    */
  /** RFM segmentation (recency / frequency / monetary) — the classic
    * CRM cohorting pass over the purchase log: each user scores 1–3 on
    * how recently, how often, and how much they bought, at EXACT
    * population terciles per dimension; output is the 27-cell segment
    * matrix with membership checksums.
    *
    * Scale shape — three exact global quantile cuts with NO global
    * sort (the text_lm_bucket discipline, ×3): each dimension's value
    * domain is bounded (recency in days, frequency a per-user count,
    * monetary folded to whole currency units), so its distribution is
    * a domain-bounded histogram that partial-aggregates map-side; the
    * tercile walk windows over the HISTOGRAM and the three (t1, t2)
    * cut pairs broadcast back as 1-row scalar binds for a map-only
    * score assignment. The purchase log itself exchanges exactly once,
    * on user_id, for the per-user rollup. Cuts are value-closed
    * (equal values share a bucket), the determinism the replay needs.
    */
  def rfm(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), tsS("ts").as("ts_s"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
    val anchor = p.agg(max("ts_s").as("anchor_s"))
    val perUser = p.groupBy("user_id")
      .agg(max("ts_s").as("last_s"), count(lit(1)).as("freq"),
        sum("cents").as("money_c"))
      .crossJoin(broadcast(anchor))
      .withColumn("recency_d", expr("(anchor_s - last_s) div 86400"))
      .withColumn("money_u", expr("money_c div 100"))
    def terciles(c: String, pfx: String): DataFrame =
      perUser.groupBy(col(c)).agg(count(lit(1)).as("nv"))
        .withColumn("cum", sum("nv").over(Window.orderBy(c)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n", sum("nv").over(Window.partitionBy()))
        .agg(min(when(col("cum") * 3L >= col("n"), col(c))).as(s"${pfx}_t1"),
          min(when(col("cum") * 3L >= col("n") * 2L, col(c))).as(s"${pfx}_t2"))
    def score(c: String, pfx: String): Column =
      lit(1L) +
        when(col(c) > col(s"${pfx}_t1"), 1L).otherwise(0L) +
        when(col(c) > col(s"${pfx}_t2"), 1L).otherwise(0L)
    perUser
      .crossJoin(broadcast(terciles("recency_d", "r")))
      .crossJoin(broadcast(terciles("freq", "f")))
      .crossJoin(broadcast(terciles("money_u", "m")))
      .withColumn("r_bucket", score("recency_d", "r"))
      .withColumn("f_bucket", score("freq", "f"))
      .withColumn("m_bucket", score("money_u", "m"))
      .groupBy("r_bucket", "f_bucket", "m_bucket")
      .agg(count(lit(1)).as("n_users"), sum("user_id").as("id_sum"),
        sum("money_c").as("money_sum"))
      .orderBy("r_bucket", "f_bucket", "m_bucket")
  }

  /** A/B cohort comparison — the experimentation readout every event
    * warehouse serves: users split into two cohorts by id parity (the
    * deterministic stand-in for a hash split), and per event type each
    * cohort's distinct-user conversion, rates and lift in basis points,
    * and a two-proportion z-test verdict at α = 0.05 evaluated EXACTLY:
    * z² ≥ 1.96² cross-multiplies into pure integer arithmetic —
    * `10⁴·(a₁n₂−a₂n₁)²·N ≥ 38416·n₁n₂·A·(N−A)` with A = a₁+a₂,
    * N = n₁+n₂ in DECIMAL(38,0) — so both engines flag the identical
    * verdict set (a float z at the threshold can flip cross-engine).
    * Exact through ~10⁸ users per cohort ((a₁n₂)²·N·10⁴ < 10³⁸); beyond
    * that, pre-scale the counts. Lift division truncates toward zero on
    * both engines (the oracle sign-splits DuckDB's flooring `//`).
    *
    * Scale shape: conversion is a distinct (type, user) count — ONE
    * exchange keyed on the distinct tuple, partial map-side; cohort
    * sizes are a 1-row aggregate broadcast-bound (the q22 scalar-bind
    * shape); everything after is |types|-bounded.
    */
  def abTest(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), expr("user_id % 2").as("cohort"))
    val sizes = ev.select("user_id", "cohort").distinct()
      .agg(sum(when(col("cohort") === 0L, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("cohort") === 1L, 1L).otherwise(0L)).as("n_b"))
    val conv = ev.distinct()
      .groupBy("event_type")
      .agg(sum(when(col("cohort") === 0L, 1L).otherwise(0L)).as("conv_a"),
        sum(when(col("cohort") === 1L, 1L).otherwise(0L)).as("conv_b"))
    val dec = "decimal(38,0)"
    conv.crossJoin(broadcast(sizes))
      .withColumn("rate_a_bp", expr("(10000 * conv_a) div n_a"))
      .withColumn("rate_b_bp", expr("(10000 * conv_b) div n_b"))
      .withColumn("lift_bp", expr(
        """case when conv_a * n_b = 0 then null
          |else (10000 * (conv_b * n_a - conv_a * n_b)) div (conv_a * n_b) end""".stripMargin))
      .withColumn("significant", expr(
        s"""cast(case when
           |    cast(10000 as $dec)
           |      * cast(conv_a * n_b - conv_b * n_a as $dec)
           |      * cast(conv_a * n_b - conv_b * n_a as $dec)
           |      * cast(n_a + n_b as $dec)
           |  >= cast(38416 as $dec) * cast(n_a as $dec) * cast(n_b as $dec)
           |      * cast(conv_a + conv_b as $dec)
           |      * cast(n_a + n_b - conv_a - conv_b as $dec)
           |  then 1 else 0 end as bigint)""".stripMargin))
      .select("event_type", "conv_a", "conv_b", "n_a", "n_b",
        "rate_a_bp", "rate_b_bp", "lift_bp", "significant")
      .orderBy("event_type")
  }

  /** Holt LINEAR-trend smoothing + one-step forecast per event type
    * (double exponential smoothing — the step past [[smooth]]'s EWMA a
    * capacity planner actually wants: level AND slope): α = β = 0.3 in
    * exact integer tenths, l₁ = 10·x₁, b₁ = 0, then
    * l_t = (30·x_t + 7·(l+b)) div 10, b_t = (3·(l_t−l) + 7·b) div 10,
    * dividing with TRUNCATION toward zero on both engines — the trend b
    * goes negative on decay, and Spark's `div` and DuckDB's `//` both
    * truncate there (verified: DuckDB `-7 // 10 = 0`), so the recurrence
    * replays bit-exact with no floor/trunc gymnastics. One-step forecast
    * error |10·x_t − (l+b)| accumulates per series.
    *
    * Scale shape — identical to evt_smooth: a linear recurrence is
    * inherently sequential per series, so the fold runs over the
    * BOUNDED hour-folded frame (≤ |types|·87 660 rows/decade), one
    * `aggregate` HOF per type's sorted series; the corpus collapses
    * map-side in the (type, hour) partial count. The oracle replays the
    * recurrence as a linear recursive CTE.
    */
  def holt(s: SparkSession, dir: String): DataFrame = {
    val lNew = "(30 * p.x + 7 * (acc.l + acc.b)) div 10"
    val bNew = s"(3 * (($lNew) - acc.l) + 7 * acc.b) div 10"
    val err = "abs(10 * p.x - (acc.l + acc.b))"
    Tables.events(s, dir)
      .groupBy(col("event_type"), expr("ts div 3600000000000").as("hour"))
      .agg(count(lit(1)).as("x"))
      .groupBy("event_type")
      .agg(array_sort(collect_list(struct(col("hour"), col("x")))).as("xs"))
      .withColumn("st", expr(
        s"""aggregate(xs,
           |  named_struct('l', 0L, 'b', 0L, 'serr', 0L, 'merr', 0L, 'n', 0L),
           |  (acc, p) -> case when acc.n = 0
           |    then named_struct('l', 10 * p.x, 'b', 0L, 'serr', 0L,
           |                      'merr', 0L, 'n', 1L)
           |    else named_struct('l', $lNew, 'b', $bNew,
           |                      'serr', acc.serr + $err,
           |                      'merr', greatest(acc.merr, $err),
           |                      'n', acc.n + 1L) end)""".stripMargin))
      .select(col("event_type"), col("st.n").as("n_hours"),
        col("st.l").as("level10"), col("st.b").as("trend10"),
        expr("st.l + st.b").as("forecast10"),
        col("st.serr").as("sum_abs_err"), col("st.merr").as("max_abs_err"))
      .orderBy("event_type")
  }

  /** ROLLING REGRESSION TREND (`evt_trend`): per event type and hour, the
    * ordinary-least-squares slope of the hourly event count over the
    * trailing 24 OBSERVED hours — the trend detector a capacity planner
    * reads next to [[holt]]'s recurrence (OLS over a window is
    * stateless: no recurrence, so it parallelizes as plain window
    * aggregates). Exact integer ppm: slope_ppm = 10⁶·(nΣxy − ΣxΣy) div
    * (nΣx² − (Σx)²) with x = epoch hour, y = count — every moment is a
    * BIGINT window sum, the division truncates toward zero on both
    * engines, and a degenerate window (n = 1) yields null.
    *
    * Scale shape: the corpus collapses map-side into the bounded
    * (type × hour) frame; five window sums ride ONE type-keyed sort.
    */
  def trend(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("hour")
      .rowsBetween(-23, 0)
    Tables.events(s, dir)
      .groupBy(col("event_type"), expr("ts div 3600000000000").as("hour"))
      .agg(count(lit(1)).as("y"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum("hour").over(w))
      .withColumn("sy", sum("y").over(w))
      .withColumn("sxy", sum(expr("hour * y")).over(w))
      .withColumn("sxx", sum(expr("hour * hour")).over(w))
      .withColumn("slope_ppm", expr(
        """case when n * sxx - sx * sx = 0 then null
          |else (1000000 * (n * sxy - sx * sy)) div (n * sxx - sx * sx)
          |end""".stripMargin))
      .select("event_type", "hour", "y", "n", "slope_ppm")
  }

  /** Kaplan–Meier SURVIVAL curve of session duration with
    * right-censoring — the duration statistic a product team reports
    * when plain averages lie because the corpus EDGE truncates the long
    * sessions (next to [[retention]]'s fixed cohort grid): the unit is a
    * session (the shared [[sessionize]] gap rule), t = duration in whole
    * minutes; sessions still open at the data edge (last event within
    * one session gap of the corpus max) are CENSORED — their duration is
    * a lower bound — everyone else's duration is fully observed. The KM
    * estimator multiplies per observed time: S(t) = Π_{t'≤t, d>0}
    * (n_{t'} − d_{t'}) / n_{t'} with risk set n_t = |{sessions with
    * duration ≥ t}| — kept EXACT in integer per-mille by the per-step
    * recurrence s ← (s·(n−d)) div n (all terms non-negative, so floor ≡
    * trunc and DuckDB replays it as a linear recursive CTE, the
    * evt_holt discipline).
    *
    * Scale shape: sessions come from the ONE user-keyed sessionize
    * exchange; everything after lives on the duration frame, bounded by
    * the session-length domain in minutes (the evt_concurrency
    * bounded-global argument covers the reverse risk cumsum and the
    * single-row KM fold).
    */
  def survival(s: SparkSession, dir: String): DataFrame = {
    import Dedup.releasing
    val order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), tsS("ts").as("ts_s"))
      .withColumn("prev_s", lag(col("ts_s"), 1).over(order))
      .withColumn("brk",
        when(col("prev_s").isNull || col("ts_s") - col("prev_s") > SessionGapS,
          1L).otherwise(0L))
      .withColumn("si", sum(col("brk")).over(run))
      .groupBy("user_id", "si")
      .agg(min("ts_s").as("t0"), max("ts_s").as("t1"))
      // referenced twice (censor anchor + duration frame): materialize the
      // one user-keyed session pass instead of running it per reference
      .cache()
    val end = sess.agg(max("t1").as("dend"))
    val frame = sess.crossJoin(broadcast(end))
      .select(expr("(t1 - t0) div 60").as("t"),
        when(col("t1") <= col("dend") - SessionGapS, 1L).otherwise(0L)
          .as("churn"))
      .groupBy("t")
      .agg(sum("churn").as("d"), sum(expr("1 - churn")).as("c"))
    // reverse cumulative risk set over the day-bounded lifetime frame
    val rev = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val step = "case when p.d > 0 then (acc.s * (p.n_risk - p.d)) div p.n_risk " +
      "else acc.s end"
    releasing(frame
      .withColumn("n_risk", sum(col("d") + col("c")).over(rev))
      .agg(array_sort(collect_list(struct(
        col("t"), col("d"), col("c"), col("n_risk")))).as("xs"))
      .select(explode(expr(
        s"""aggregate(xs,
           |  named_struct('s', 1000L, 'out',
           |    cast(array() as array<struct<t: bigint, n_risk: bigint,
           |      d_ended: bigint, c_censored: bigint, surv_pm: bigint>>)),
           |  (acc, p) -> named_struct('s', $step,
           |    'out', acc.out || array(named_struct('t', p.t,
           |      'n_risk', p.n_risk, 'd_ended', p.d, 'c_censored', p.c,
           |      'surv_pm', $step))),
           |  acc -> acc.out)""".stripMargin)).as("r"))
      .select(col("r.t"), col("r.n_risk"), col("r.d_ended"),
        col("r.c_censored"), col("r.surv_pm")),
      sess)
  }

  /** Longest consecutive-day activity STREAK census — the engagement
    * metric every product warehouse computes: per user the longest run
    * of consecutive active days, rolled up as a streak-length histogram
    * with membership checksums. Gaps-and-islands DISTRIBUTED: the
    * distinct (user, day) grid partial-aggregates map-side; the island
    * key `day − row_number()` computes inside the user partition (the
    * ONE entity-keyed exchange), and the run/max folds reuse that same
    * partitioning — user_id ⊂ every later grouping key, so no further
    * fact-scale exchange; the final histogram moves ≤ max-streak rows.
    */
  def streaks(s: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(s, dir)
      .select(col("user_id"), expr("ts div 86400000000000").as("day"))
      .distinct()
    days
      .withColumn("grp", col("day") - row_number().over(
        Window.partitionBy("user_id").orderBy("day")))
      .groupBy("user_id", "grp").agg(count(lit(1)).as("runlen"))
      .groupBy("user_id").agg(max("runlen").as("longest"))
      .groupBy("longest")
      .agg(count(lit(1)).as("n_users"), sum("user_id").as("id_sum"))
      .orderBy("longest")
  }

  def dau(s: SparkSession, dir: String): DataFrame = {
    val perDay = Tables.events(s, dir)
      .select(expr("ts div 86400000000000").as("day"), col("user_id"))
      .distinct()
    val dauDf = perDay.groupBy("day").agg(count(lit(1)).as("dau"))
    val wauDf = perDay
      .select(col("user_id"), explode(expr("sequence(day, day + 6)")).as("day"))
      .groupBy("day").agg(countDistinct("user_id").as("wau"))
    // inner join against real days drops the phantom day+1..day+6 tails
    dauDf.join(wauDf, "day")
      .withColumn("stickiness_pm", expr("(1000 * dau) div wau"))
      .select("day", "dau", "wau", "stickiness_pm")
  }

  /** JSON property extraction + aggregation: pull `$.k` out of the
    * props JSON string per event, aggregate per type. The average is
    * derived from the exact integer sum with ONE double division so
    * both engines produce bit-identical doubles.
    */
  def jsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("bigint"))
      .groupBy("event_type")
      .agg(sum(col("k")).as("k_sum"), count(lit(1)).as("n_events"))
      .withColumn("k_avg", col("k_sum").cast("double") / col("n_events"))

  /** Sweep-line session concurrency: how many sessions are live at once,
    * reported as the per-hour maximum. The classic formulation is a
    * GLOBAL running sum over +1/−1 boundaries — a single total order no
    * cluster can partition — so this decomposes it into the distributed
    * two-level prefix sum: (1) per-hour boundary deltas partial-aggregate
    * map-side into an hours×1 frame; (2) the carry-in at each hour's open
    * is a prefix sum over THAT tiny frame (single-task window over a
    * bounded domain — 10 years is 87 660 rows at any corpus size); (3)
    * the within-hour running sum re-partitions by hour, the same keyed
    * exchange shape as sessionize per-user. Nothing global ever sorts
    * more than the hour domain; a hotter grain (minute) is the same plan
    * with a bigger — still bounded — carry frame.
    *
    * A session counts as live on [start_s, end_s] inclusive (−1 lands at
    * end_s+1); the hour max includes the carried-in level, since the step
    * function holds it from the hour's open to the first boundary.
    * Reported hours are those containing ≥1 boundary (the step function
    * is constant — and known from the previous row — everywhere else).
    */
  def concurrency(s: SparkSession, dir: String): DataFrame = {
    val order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sessions = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), tsS("ts").as("ts_s"))
      .withColumn("prev_s", lag(col("ts_s"), 1).over(order))
      .withColumn("brk",
        when(col("prev_s").isNull || col("ts_s") - col("prev_s") > SessionGapS,
          1L).otherwise(0L))
      .withColumn("session_idx", sum(col("brk")).over(run))
      .groupBy("user_id", "session_idx")
      .agg(min("ts_s").as("start_s"), max("ts_s").as("end_s"))
    // explode, not union: a union of two selects would branch the session
    // lineage and recompute the sessionize exchange twice
    val bounds = sessions
      .select(explode(array(
        struct(col("start_s").as("t"), lit(1L).as("delta")),
        struct((col("end_s") + 1).as("t"), lit(-1L).as("delta")))).as("b"))
      .select(expr("b.t div 3600").as("hour"), col("b.t").as("t"),
        col("b.delta").as("delta"))
      .groupBy("hour", "t").agg(sum("delta").as("delta"))
    // max(carry + run_local) = carry + max(run_local): fold each hour to
    // one row BEFORE the carry prefix, so the global pass touches only the
    // hour frame and no join ever returns to the boundary table
    bounds
      .withColumn("run_local", sum("delta").over(Window.partitionBy("hour")
        .orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("hour")
      .agg(max("run_local").as("max_local"), sum("delta").as("h_delta"),
        count(lit(1)).as("n_points"))
      .withColumn("carry_in", coalesce(sum("h_delta").over(
        Window.orderBy("hour").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("hour"),
        greatest(col("carry_in") + col("max_local"), col("carry_in"))
          .as("max_conc"),
        col("n_points"))
  }

  /** Top-10 within-session 3-step event-type paths — the "how do users
    * actually move through the product" query next to [[transitions]]'s
    * global bigram matrix: a path counts only when all three events fall
    * in ONE session (the gap rule of [[sessionize]]), with the
    * deterministic (count desc, path asc) tiebreak.
    *
    * Scale shape: session breaks and both lookaheads ride the SAME
    * per-user window partitioning — one hash exchange on `user_id` total
    * (plan-pinned); the path aggregate lands in a ≤|types|³ key space
    * with map-side partials, and the top-10 is TakeOrderedAndProject.
    * Session boundaries are enforced by the lookahead BREAK flags (an
    * event whose next or next-next row starts a new session emits no
    * path), not by re-partitioning on (user, session).
    */
  def paths(s: SparkSession, dir: String): DataFrame = {
    val order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        tsS("ts").as("ts_s"))
      .withColumn("prev_s", lag(col("ts_s"), 1).over(order))
      .withColumn("brk",
        when(col("prev_s").isNull || col("ts_s") - col("prev_s") > SessionGapS,
          1L).otherwise(0L))
      .withColumn("t1", lead(col("event_type"), 1).over(order))
      .withColumn("t2", lead(col("event_type"), 2).over(order))
      .withColumn("b1", lead(col("brk"), 1).over(order))
      .withColumn("b2", lead(col("brk"), 2).over(order))
      .filter(col("b1") === 0L && col("b2") === 0L)
      .withColumn("path",
        concat_ws(" > ", col("event_type"), col("t1"), col("t2")))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("path")).limit(10)
      .withColumn("rnk", row_number().over(Window.orderBy(desc("n"), asc("path"))))
      .select("rnk", "path", "n")
  }

  /** Log₂-bucketed value histogram per event type — the numeric-feature
    * distribution pass a warehouse (or a curation pipeline profiling
    * per-doc costs) runs before choosing thresholds: bucket =
    * ⌊log₂ cents⌋ + 1, computed WITHOUT libm as `length(bin(cents))` —
    * the binary-string length of a positive int64 is an exact integer
    * log₂ in both engines, so no transcendental can diverge the bucket
    * edge. Values are exact 2-decimal money → lossless cents; the whole
    * operator is one scan + one partial-agg exchange on the
    * (type × ≤64 buckets)-bounded key space, the smallest shuffle an
    * aggregation can have.
    */
  def histogram(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        round(col("value") * 100).cast("bigint").as("cents"))
      .select(col("event_type"),
        when(col("cents") <= 0, lit(0))
          .otherwise(length(bin(col("cents")))).as("bucket"),
        col("cents"))
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("n"),
        min("cents").as("min_cents"), max("cents").as("max_cents"),
        sum("cents").as("sum_cents"))
      .orderBy("event_type", "bucket")

  /** Incident window length (seconds) for [[intervalJoin]]. */
  val IncidentWindowS = 600L

  /** INTERVAL JOIN as a SWEEP-LINE — the time-range join with a scale
    * path that materializes NO pairs at all: every `error` event opens a
    * 10-minute incident window `[t0, t0+600)`; report, per incident, the
    * events of ANY type inside it plus the exact distinct users touched.
    *
    * Why not a join: the r12 bucketized equi-join (bin = window size,
    * range residual) still enumerates every (event, incident) candidate
    * pair sharing a bin — and the pair set grows QUADRATICALLY in
    * temporal density (10× rows in the same wall-clock span = ×100
    * pairs; measured ×25 wall at sf1). But the per-incident aggregates
    * never needed the pairs:
    *
    *   - `n_events(t0)` — an event at `ts` counts for incidents starting
    *     at t0 ∈ [ts−599, ts], so fold events into per-second ±count
    *     deltas in INCIDENT-START space and read the running sum at t0.
    *   - `n_users(t0)` — exact windowed COUNT DISTINCT, which no running
    *     sum gives directly; but per user the covered t0-set is the
    *     UNION of per-event intervals, so merge each user's intervals
    *     into disjoint ISLANDS (the q28 gaps-and-islands pass — one
    *     user-keyed exchange) and each island is a clean ±1 delta.
    *
    * Incident probes union into the delta stream as zero-delta rows
    * sorting AFTER same-second deltas (inclusive read), and the global
    * running sum decomposes exactly like [[concurrency]]: within-bin
    * windows on a 600 s bin key + a carry prefix over the TIME-bounded
    * bin frame (52 560 rows/decade at any corpus size) broadcast-joined
    * back. Shuffled rows stay O(events + incidents) — corpus-LINEAR at
    * any density. Top 25 busiest incidents, ties broken by id.
    */
  def intervalJoin(s: SparkSession, dir: String): DataFrame = {
    val W = IncidentWindowS
    val ev = Tables.events(s, dir)
      .select(col("user_id"), tsS("ts").as("ts_s"))
    // per-second event-count deltas in t0-space (+c at ts−599, −c at ts+1)
    val evDeltas = ev.groupBy("ts_s").agg(count(lit(1)).as("c"))
      .select(explode(array(
        struct((col("ts_s") - (W - 1)).as("t"), col("c").as("de")),
        struct((col("ts_s") + 1).as("t"), (-col("c")).as("de")))).as("b"))
      .select(col("b.t").as("t"), col("b.de").as("de"), lit(0L).as("du"))
    // per-user coverage islands → exact-distinct ±1 deltas
    val wUser = Window.partitionBy("user_id").orderBy("a")
    val islands = ev
      .select(col("user_id"), (col("ts_s") - (W - 1)).as("a"), col("ts_s").as("b"))
      .withColumn("maxb",
        max("b").over(wUser.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("fresh",
        when(col("maxb").isNull || col("a") > col("maxb"), 1L).otherwise(0L))
      .withColumn("isl", sum("fresh").over(
        wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "isl").agg(min("a").as("a"), max("b").as("b"))
    val userDeltas = islands.select(explode(array(
        struct(col("a").as("t"), lit(1L).as("du")),
        struct((col("b") + 1).as("t"), lit(-1L).as("du")))).as("x"))
      .select(col("x.t").as("t"), lit(0L).as("de"), col("x.du").as("du"))
    val deltas = evDeltas.unionByName(userDeltas)
      .groupBy("t").agg(sum("de").as("de"), sum("du").as("du"))
      .select(col("t"), col("de"), col("du"),
        lit(null).cast("long").as("inc_id"), lit(0).as("tag"))
    val probes = Tables.events(s, dir)
      .filter(col("event_type") === "error")
      .select(tsS("ts").as("t"), lit(0L).as("de"), lit(0L).as("du"),
        col("event_id").as("inc_id"), lit(1).as("tag"))
    val all = deltas.unionByName(probes)
      .withColumn("bkt", expr(s"t div $W"))
    val wBin = Window.partitionBy("bkt").orderBy("t", "tag")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // carry-in per bin: prefix over the time-bounded bin frame, broadcast
    val wCarry = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    val carry = all.groupBy("bkt")
      .agg(sum("de").as("be"), sum("du").as("bu"))
      .select(col("bkt"),
        coalesce(sum("be").over(wCarry), lit(0L)).as("ce"),
        coalesce(sum("bu").over(wCarry), lit(0L)).as("cu"))
    all
      .withColumn("run_e", sum("de").over(wBin))
      .withColumn("run_u", sum("du").over(wBin))
      .filter(col("tag") === 1)
      .join(broadcast(carry), "bkt")
      .select(col("inc_id"), (col("ce") + col("run_e")).as("n_events"),
        (col("cu") + col("run_u")).as("n_users"))
      .orderBy(desc("n_events"), asc("inc_id"))
      .limit(25)
  }

  /** SEMI-STRUCTURED SCHEMA-DRIFT MONITOR — the JSON property-key census
    * a warehouse runs over an event stream's freeform `props` column:
    * per (event_type, key) the presence count and per-mille presence
    * rate against the type's event total. A producer silently adding,
    * renaming, or dropping a property shows up as a new/vanished row or
    * a presence-rate step — BEFORE a downstream extraction (evt_json's
    * typed pulls) starts returning nulls. The key set is
    * domain-bounded (property vocabularies are small), so the census
    * frame stays tiny at any corpus size.
    *
    * Scale shape: ONE events scan; `json_object_keys` + explode are
    * scan-side; map-side partials into the (type × key) frame; the
    * type totals aggregate on the same scan's other branch is
    * domain-scale and broadcast back.
    */
  def schemaAudit(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val totals = ev.groupBy("event_type").agg(count(lit(1)).as("n_events"))
    // malformed/non-object props are EXPLICITLY excluded on both engines:
    // Spark's json_object_keys yields null there (explode would silently
    // drop the row) while DuckDB's json_keys raises — the shared filter
    // pins one semantics so a dirty corpus cannot desync the oracle
    ev.filter(expr("json_object_keys(props) IS NOT NULL"))
      .select(col("event_type"),
        explode(expr("json_object_keys(props)")).as("key"))
      .groupBy("event_type", "key").agg(count(lit(1)).as("n_present"))
      .join(broadcast(totals), "event_type")
      .withColumn("present_pm", expr("(1000 * n_present) div n_events"))
      .select("event_type", "key", "n_present", "n_events", "present_pm")
  }

  /** DATA FRESHNESS AUDIT — the staleness report an ingest SLO reads per
    * event type: event count, first/last seen (epoch µs), staleness
    * behind the corpus watermark, event count on the corpus' last
    * calendar day, and distinct active days. A producer that quietly
    * stopped emitting shows as a staleness step and a zero last-day
    * count — the check a warehouse runs before declaring a drop
    * complete.
    *
    * Scale shape: ONE events scan pre-aggregates into the (type × day)
    * domain frame map-side; the corpus watermark is a window over that
    * bounded frame (never a 1-row scalar bind onto the fact table); the
    * per-type rollup and its windows stay domain-scale.
    */
  def freshness(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.events(s, dir)
      .withColumn("us", expr("ts div 1000"))
      .withColumn("day", expr("(ts div 1000) div 86400000000"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n"), min("us").as("f_us"), max("us").as("l_us"))
      .withColumn("max_day", max("day").over(Window.partitionBy()))
      .groupBy("event_type")
      .agg(sum("n").as("n_events"),
        min("f_us").as("first_us"),
        max("l_us").as("last_us"),
        (max(col("max_day")) * 86400000000L + 86400000000L - 1L -
          max("l_us")).as("stale_us"),
        sum(when(col("day") === col("max_day"), col("n")).otherwise(0L))
          .as("n_last_day"),
        countDistinct("day").as("active_days"))
  }

  /** GROWTH ACCOUNTING — the weekly user-lifecycle ledger (the classic
    * new / retained / resurrected / churned decomposition every growth
    * team reads): a user's week is `new` on first appearance, `retained`
    * when also active the prior week, `resurrected` after a gap; churn
    * is NOT computed by scanning forward — it falls out of the weekly
    * frame by identity, `churned(w) = active(w−1) − retained(w)` (users
    * active last week who didn't return), so no per-user lookahead and
    * no corpus-end edge case.
    *
    * DEFAULT — observed weeks only: the lag runs over weeks that HAVE
    * activity, so a calendar week with zero active users produces no
    * ledger row and its churn is attributed to the next observed week
    * (`active(w−1)` means the previous OBSERVED week). Corpora with
    * contiguous weekly activity (this table) are unaffected.
    * `denseWeeks = true` (r14) seeds every calendar week in the
    * observed [min, max] range with a zero-activity row BEFORE the
    * churn identity runs, so a gap week carries its own
    * `n_churned = active(prev)` row and the week after the gap shows
    * churn 0 — churn lands in its TRUE week on gapped calendars. The
    * dense domain is `sequence(min, max)` off the 1-row bounds
    * aggregate: bounded, declarative, no driver loop.
    *
    * Scale shape: one (user, week) distinct collapse (map-side
    * partials), one user-keyed lag window over each user's bounded week
    * list, one aggregate into the weekly domain frame where the churn
    * identity is a lag on ≤ hundreds of rows (dense mode adds only the
    * bounded calendar left join on that same frame).
    */
  def lifecycle(s: SparkSession, dir: String): DataFrame =
    lifecycleOf(Tables.events(s, dir))

  private[graft] def lifecycleOf(events: DataFrame,
      denseWeeks: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val uw = events
      .select(col("user_id"), expr("(ts div 1000) div 604800000000").as("week"))
      .distinct()
      .withColumn("prev", lag("week", 1).over(
        Window.partitionBy("user_id").orderBy("week")))
      .withColumn("state",
        when(col("prev").isNull, "new")
          .when(col("week") - col("prev") === 1, "retained")
          .otherwise("resurrected"))
    val observed = uw.groupBy("week").agg(
      count(lit(1)).as("n_active"),
      sum(when(col("state") === "new", 1L).otherwise(0L)).as("n_new"),
      sum(when(col("state") === "retained", 1L).otherwise(0L)).as("n_retained"),
      sum(when(col("state") === "resurrected", 1L).otherwise(0L))
        .as("n_resurrected"))
    val weekly =
      if (!denseWeeks) observed
      else observed
        .agg(min("week").as("lo"), max("week").as("hi"))
        .select(explode(expr("sequence(lo, hi)")).as("week"))
        .join(observed, Seq("week"), "left")
        .select(col("week") +: observed.columns.filter(_ != "week")
          .map(c => coalesce(col(c), lit(0L)).as(c)): _*)
    weekly
      .withColumn("n_churned",
        coalesce(lag("n_active", 1).over(Window.orderBy("week")), lit(0L)) -
          col("n_retained"))
      .select("week", "n_active", "n_new", "n_retained", "n_resurrected",
        "n_churned")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "evt_lifecycle" -> (lifecycle _),
    "evt_freshness" -> (freshness _),
    "evt_schema_audit" -> (schemaAudit _),
    "evt_interval_join" -> (intervalJoin _),
    "evt_histogram" -> (histogram _),
    "evt_cohort" -> (cohort _),
    "evt_multitouch" -> (multitouch _),
    "evt_acf" -> (acf _),
    "evt_markov" -> (markov _),
    "evt_ffill" -> (ffill _),
    "evt_paths" -> (paths _),
    "evt_concurrency" -> (concurrency _),
    "evt_sessionize" -> (sessionize _),
    "evt_lift" -> (lift _),
    "evt_gini" -> (gini _),
    "evt_funnel" -> (funnel _),
    "evt_retention" -> (retention _),
    "evt_json" -> (jsonExtract _),
    "evt_window" -> (tumblingWindow _),
    "evt_attribution" -> (attribution _),
    "evt_transitions" -> (transitions _),
    "evt_ttc" -> (ttc _),
    "evt_seasonality" -> (seasonality _),
    "evt_anomaly" -> (anomaly _),
    "evt_changepoint" -> (changepoint _),
    "evt_smooth" -> (smooth _),
    "evt_rfm" -> (rfm _),
    "evt_ab_test" -> (abTest _),
    "evt_streaks" -> (streaks _),
    "evt_survival" -> (survival _),
    "evt_holt" -> (holt _),
    "evt_trend" -> (trend _),
    "evt_dau" -> (dau _))

  val oracles: Map[String, String] = Map(
    "evt_lifecycle" ->
      """WITH uw AS (SELECT DISTINCT user_id,
        |    epoch_us(ts) // 604800000000 AS week FROM events),
        |c AS (SELECT user_id, week,
        |    lag(week) OVER (PARTITION BY user_id ORDER BY week) AS prev
        |  FROM uw),
        |s AS (SELECT week,
        |    CASE WHEN prev IS NULL THEN 'new'
        |         WHEN week - prev = 1 THEN 'retained'
        |         ELSE 'resurrected' END AS state
        |  FROM c),
        |w AS (SELECT week, CAST(count(*) AS BIGINT) AS n_active,
        |    CAST(sum(CASE WHEN state = 'new' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_new,
        |    CAST(sum(CASE WHEN state = 'retained' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_retained,
        |    CAST(sum(CASE WHEN state = 'resurrected' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_resurrected
        |  FROM s GROUP BY 1)
        |SELECT week, n_active, n_new, n_retained, n_resurrected,
        |  CAST(coalesce(lag(n_active) OVER (ORDER BY week), 0) - n_retained
        |    AS BIGINT) AS n_churned
        |FROM w ORDER BY week""".stripMargin,
    "evt_freshness" ->
      """WITH d AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(min(epoch_us(ts)) AS BIGINT) AS f_us,
        |    CAST(max(epoch_us(ts)) AS BIGINT) AS l_us
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, day, n, f_us, l_us,
        |    max(day) OVER () AS max_day FROM d)
        |SELECT event_type, CAST(sum(n) AS BIGINT) AS n_events,
        |  CAST(min(f_us) AS BIGINT) AS first_us,
        |  CAST(max(l_us) AS BIGINT) AS last_us,
        |  CAST(max(max_day) * 86400000000 + 86400000000 - 1 - max(l_us)
        |    AS BIGINT) AS stale_us,
        |  CAST(sum(CASE WHEN day = max_day THEN n ELSE 0 END) AS BIGINT)
        |    AS n_last_day,
        |  CAST(count(DISTINCT day) AS BIGINT) AS active_days
        |FROM m GROUP BY event_type ORDER BY event_type""".stripMargin,
    "evt_schema_audit" ->
      """WITH k AS (SELECT event_type, unnest(json_keys(props)) AS key
        |  FROM events
        |  WHERE json_valid(props) AND json_type(props) = 'OBJECT'),
        |t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1),
        |g AS (SELECT event_type, key, CAST(count(*) AS BIGINT) AS n_present
        |  FROM k GROUP BY 1, 2)
        |SELECT g.event_type, g.key, n_present, t.n_events,
        |  CAST((1000 * n_present) // t.n_events AS BIGINT) AS present_pm
        |FROM g JOIN t ON t.event_type = g.event_type
        |ORDER BY g.event_type, g.key""".stripMargin,
    "evt_interval_join" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) // 1000000 AS ts_s FROM events),
        |inc AS (SELECT event_id AS inc_id, epoch_us(ts) // 1000000 AS t0
        |        FROM events WHERE event_type = 'error')
        |SELECT inc_id, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users
        |FROM ev JOIN inc ON ev.ts_s >= inc.t0 AND ev.ts_s < inc.t0 + 600
        |GROUP BY 1 ORDER BY n_events DESC, inc_id LIMIT 25""".stripMargin,
    "evt_trend" ->
      """WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, hour, y,
        |    CAST(count(*) OVER win AS BIGINT) AS n,
        |    CAST(sum(hour) OVER win AS BIGINT) AS sx,
        |    CAST(sum(y) OVER win AS BIGINT) AS sy,
        |    CAST(sum(hour * y) OVER win AS BIGINT) AS sxy,
        |    CAST(sum(hour * hour) OVER win AS BIGINT) AS sxx
        |  FROM h WINDOW win AS (PARTITION BY event_type ORDER BY hour
        |    ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
        |SELECT event_type, hour, y, n,
        |  CASE WHEN n * sxx - sx * sx = 0 THEN NULL
        |       ELSE CAST((1000000 * (n * sxy - sx * sy)) // (n * sxx - sx * sx) AS BIGINT)
        |  END AS slope_ppm
        |FROM w ORDER BY event_type, hour""".stripMargin,
    "evt_holt" ->
      """WITH RECURSIVE hourly AS MATERIALIZED (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |idx AS MATERIALIZED (SELECT event_type, x,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY hour) AS BIGINT) AS i
        |  FROM hourly),
        |rec(event_type, i, l, b, serr, merr) AS (
        |  SELECT event_type, i, 10 * x, CAST(0 AS BIGINT),
        |    CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        |  FROM idx WHERE i = 1
        |  UNION ALL
        |  SELECT x.event_type, x.i,
        |    (30 * x.x + 7 * (r.l + r.b)) // 10,
        |    (3 * ((30 * x.x + 7 * (r.l + r.b)) // 10 - r.l) + 7 * r.b) // 10,
        |    r.serr + abs(10 * x.x - (r.l + r.b)),
        |    greatest(r.merr, abs(10 * x.x - (r.l + r.b)))
        |  FROM idx x JOIN rec r
        |    ON r.event_type = x.event_type AND x.i = r.i + 1),
        |last AS (SELECT event_type, max(i) AS n FROM idx GROUP BY 1)
        |SELECT r.event_type, n AS n_hours, l AS level10, b AS trend10,
        |  l + b AS forecast10, serr AS sum_abs_err, merr AS max_abs_err
        |FROM rec r JOIN last ON last.event_type = r.event_type AND r.i = last.n
        |ORDER BY r.event_type""".stripMargin,
    "evt_survival" ->
      """WITH RECURSIVE g AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR date_diff('second', lag(ts) OVER w, ts) > 14400
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sx AS (SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                   ROWS UNBOUNDED PRECEDING) AS si
        |  FROM g),
        |sess AS MATERIALIZED (SELECT user_id, si,
        |    min(epoch_us(ts) // 1000000) AS t0,
        |    max(epoch_us(ts) // 1000000) AS t1
        |  FROM sx GROUP BY 1, 2),
        |e AS (SELECT max(t1) AS dend FROM sess),
        |f AS (SELECT (t1 - t0) // 60 AS t,
        |    CAST(sum(CASE WHEN t1 <= dend - 14400 THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |    CAST(sum(CASE WHEN t1 <= dend - 14400 THEN 0 ELSE 1 END) AS BIGINT) AS c
        |  FROM sess, e GROUP BY 1),
        |r AS MATERIALIZED (SELECT t, d, c,
        |    CAST(sum(d + c) OVER (ORDER BY t DESC) AS BIGINT) AS n_risk,
        |    CAST(row_number() OVER (ORDER BY t) AS BIGINT) AS i
        |  FROM f),
        |rec(i, t, n_risk, d, c, s) AS (
        |  SELECT i, t, n_risk, d, c,
        |    CASE WHEN d > 0 THEN (1000 * (n_risk - d)) // n_risk
        |         ELSE CAST(1000 AS BIGINT) END
        |  FROM r WHERE i = 1
        |  UNION ALL
        |  SELECT r.i, r.t, r.n_risk, r.d, r.c,
        |    CASE WHEN r.d > 0 THEN (rec.s * (r.n_risk - r.d)) // r.n_risk
        |         ELSE rec.s END
        |  FROM r JOIN rec ON r.i = rec.i + 1)
        |SELECT t, n_risk, d AS d_ended, c AS c_censored, s AS surv_pm
        |FROM rec ORDER BY t""".stripMargin,
    "evt_streaks" ->
      """WITH days AS (SELECT DISTINCT user_id,
        |    epoch_us(ts) // 86400000000 AS day FROM events),
        |runs AS (SELECT user_id,
        |    day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |  FROM days),
        |per AS (SELECT user_id, max(runlen) AS longest FROM (
        |    SELECT user_id, grp, count(*) AS runlen FROM runs GROUP BY 1, 2) t
        |  GROUP BY 1)
        |SELECT longest, count(*) AS n_users,
        |  CAST(sum(user_id) AS BIGINT) AS id_sum
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,
    "evt_ab_test" ->
      """WITH u AS (SELECT DISTINCT user_id, user_id % 2 AS cohort FROM events),
        |sizes AS (SELECT
        |    CAST(sum(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM u),
        |c AS (SELECT DISTINCT user_id, event_type, user_id % 2 AS cohort
        |  FROM events),
        |conv AS (SELECT event_type,
        |    CAST(sum(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT) AS conv_a,
        |    CAST(sum(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT) AS conv_b
        |  FROM c GROUP BY 1)
        |SELECT event_type, conv_a, conv_b, n_a, n_b,
        |  (10000 * conv_a) // n_a AS rate_a_bp,
        |  (10000 * conv_b) // n_b AS rate_b_bp,
        |  CASE WHEN conv_a * n_b = 0 THEN NULL
        |       WHEN conv_b * n_a - conv_a * n_b >= 0
        |         THEN (10000 * (conv_b * n_a - conv_a * n_b)) // (conv_a * n_b)
        |       ELSE -((10000 * (conv_a * n_b - conv_b * n_a)) // (conv_a * n_b))
        |  END AS lift_bp,
        |  CAST(CASE WHEN
        |      10000::HUGEINT * (conv_a * n_b - conv_b * n_a)
        |        * (conv_a * n_b - conv_b * n_a) * (n_a + n_b)
        |    >= 38416::HUGEINT * n_a * n_b * (conv_a + conv_b)
        |        * (n_a + n_b - conv_a - conv_b)
        |    THEN 1 ELSE 0 END AS BIGINT) AS significant
        |FROM conv, sizes ORDER BY event_type""".stripMargin,
    "evt_rfm" ->
      """WITH p AS (SELECT user_id, epoch_us(ts) // 1000000 AS ts_s,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |anchor AS (SELECT max(ts_s) AS anchor_s FROM p),
        |pu AS MATERIALIZED (
        |  SELECT user_id, (anchor_s - max(ts_s)) // 86400 AS recency_d,
        |    count(*) AS freq, CAST(sum(cents) AS BIGINT) AS money_c,
        |    CAST(sum(cents) AS BIGINT) // 100 AS money_u
        |  FROM p, anchor GROUP BY user_id, anchor_s),
        |rt AS (SELECT min(CASE WHEN cum * 3 >= n THEN v END) AS r_t1,
        |    min(CASE WHEN cum * 3 >= 2 * n THEN v END) AS r_t2
        |  FROM (SELECT v, sum(nv) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
        |      sum(nv) OVER () AS n
        |    FROM (SELECT recency_d AS v, count(*) AS nv FROM pu GROUP BY 1))),
        |ft AS (SELECT min(CASE WHEN cum * 3 >= n THEN v END) AS f_t1,
        |    min(CASE WHEN cum * 3 >= 2 * n THEN v END) AS f_t2
        |  FROM (SELECT v, sum(nv) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
        |      sum(nv) OVER () AS n
        |    FROM (SELECT freq AS v, count(*) AS nv FROM pu GROUP BY 1))),
        |mt AS (SELECT min(CASE WHEN cum * 3 >= n THEN v END) AS m_t1,
        |    min(CASE WHEN cum * 3 >= 2 * n THEN v END) AS m_t2
        |  FROM (SELECT v, sum(nv) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
        |      sum(nv) OVER () AS n
        |    FROM (SELECT money_u AS v, count(*) AS nv FROM pu GROUP BY 1)))
        |SELECT
        |  CAST(1 + CASE WHEN recency_d > r_t1 THEN 1 ELSE 0 END
        |    + CASE WHEN recency_d > r_t2 THEN 1 ELSE 0 END AS BIGINT) AS r_bucket,
        |  CAST(1 + CASE WHEN freq > f_t1 THEN 1 ELSE 0 END
        |    + CASE WHEN freq > f_t2 THEN 1 ELSE 0 END AS BIGINT) AS f_bucket,
        |  CAST(1 + CASE WHEN money_u > m_t1 THEN 1 ELSE 0 END
        |    + CASE WHEN money_u > m_t2 THEN 1 ELSE 0 END AS BIGINT) AS m_bucket,
        |  count(*) AS n_users, CAST(sum(user_id) AS BIGINT) AS id_sum,
        |  CAST(sum(money_c) AS BIGINT) AS money_sum
        |FROM pu, rt, ft, mt
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "evt_histogram" ->
      """WITH c AS (SELECT event_type,
        |  CAST(round(value * 100) AS BIGINT) AS cents FROM events)
        |SELECT event_type,
        |  CASE WHEN cents <= 0 THEN 0 ELSE length(bin(cents)) END AS bucket,
        |  count(*) AS n,
        |  min(cents) AS min_cents, max(cents) AS max_cents,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents
        |FROM c GROUP BY 1, 2 ORDER BY event_type, bucket""".stripMargin,
    "evt_multitouch" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |    epoch_us(ts) // 1000000 AS ts_s FROM events),
        |w AS (SELECT event_id, user_id, event_type, ts_s,
        |    CAST(count(CASE WHEN event_type = 'click' THEN 1 END)
        |      OVER lk AS BIGINT) AS n_clicks24,
        |    coalesce(min(CASE WHEN event_type = 'click' THEN ts_s END)
        |      OVER lk, -1) AS first_s,
        |    coalesce(max(CASE WHEN event_type = 'click' THEN ts_s END)
        |      OVER lk, -1) AS last_s
        |  FROM e WINDOW lk AS (PARTITION BY user_id ORDER BY ts_s
        |    RANGE BETWEEN 86399 PRECEDING AND 1 PRECEDING))
        |SELECT event_id, user_id, ts_s, n_clicks24,
        |  CAST(first_s AS BIGINT) AS first_s,
        |  CAST(last_s AS BIGINT) AS last_s,
        |  CAST(CASE WHEN n_clicks24 = 0 THEN 0
        |       WHEN n_clicks24 = 1 THEN 1000
        |       WHEN n_clicks24 = 2 THEN 500 ELSE 400 END AS BIGINT)
        |    AS first_pm,
        |  CAST(CASE WHEN n_clicks24 <= 1 THEN 0
        |       WHEN n_clicks24 = 2 THEN 500 ELSE 400 END AS BIGINT)
        |    AS last_pm,
        |  CAST(CASE WHEN n_clicks24 <= 2 THEN 0
        |       ELSE 200 // (n_clicks24 - 2) END AS BIGINT) AS mid_each_pm
        |FROM w WHERE event_type = 'purchase'""".stripMargin,
    "evt_acf" ->
      """WITH hourly AS (SELECT event_type,
        |    epoch_us(ts) // 3600000000 AS hour,
        |    CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
        |mom AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS qx
        |  FROM hourly GROUP BY 1),
        |pr AS (SELECT a.event_type, l.lag,
        |    CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(sum(a.x * b.x) AS BIGINT) AS sxy,
        |    CAST(sum(a.x) AS BIGINT) AS sa, CAST(sum(b.x) AS BIGINT) AS sb
        |  FROM hourly a
        |  CROSS JOIN (SELECT CAST(unnest(generate_series(1, 24)) AS BIGINT)
        |              AS lag) l
        |  JOIN hourly b ON b.event_type = a.event_type
        |    AND b.hour = a.hour - l.lag
        |  GROUP BY 1, 2)
        |SELECT p.event_type, p.lag, p.n_pairs,
        |  m.n * m.n * p.sxy - m.n * m.sx * p.sa - m.n * m.sx * p.sb
        |    + p.n_pairs * m.sx * m.sx AS num,
        |  m.n * m.n * m.qx - m.n * m.sx * m.sx AS den,
        |  CAST(m.n * m.n * p.sxy - m.n * m.sx * p.sa - m.n * m.sx * p.sb
        |    + p.n_pairs * m.sx * m.sx AS DOUBLE)
        |    / (m.n * m.n * m.qx - m.n * m.sx * m.sx) AS r
        |FROM pr p JOIN mom m ON m.event_type = p.event_type
        |ORDER BY 1, 2""".stripMargin,
    // the 8 power-iteration rounds replay as chained CTEs (the
    // dpLevelSql discipline) — all-integer ppm arithmetic, so the
    // replay is exact
    "evt_markov" -> {
      val rounds = (1 to 8).map(k =>
        s"""v$k AS (SELECT m.to_type AS type,
           |  CAST(sum(v.p * m.p6) // 1000000 AS BIGINT) AS p
           |  FROM v${k - 1} v JOIN m ON m.from_type = v.type GROUP BY 1)"""
          .stripMargin).mkString(",\n")
      s"""WITH pr AS (
         |  SELECT lag(event_type) OVER w AS from_type, event_type AS to_type,
         |    epoch_us(ts) // 1000000
         |      - lag(epoch_us(ts) // 1000000) OVER w AS gap_s
         |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |m AS (
         |  SELECT from_type, to_type,
         |    CAST((1000000 * count(*))
         |      // sum(count(*)) OVER (PARTITION BY from_type) AS BIGINT) AS p6
         |  FROM pr WHERE from_type IS NOT NULL AND gap_s <= 14400
         |  GROUP BY 1, 2),
         |t AS (SELECT DISTINCT from_type AS type FROM m),
         |v0 AS (SELECT type,
         |  CAST(1000000 // (SELECT count(*) FROM t) AS BIGINT) AS p FROM t),
         |$rounds
         |SELECT type, p AS ppm FROM v8 ORDER BY type""".stripMargin
    },
    "evt_ffill" ->
      """SELECT event_id, user_id, event_type,
        |  epoch_us(ts) // 1000000 AS ts_s,
        |  coalesce(last_value(CASE WHEN event_type = 'purchase'
        |      THEN CAST(round(value * 100) AS BIGINT) END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1)
        |    AS last_purchase_c
        |FROM events""".stripMargin,
    "evt_cohort" ->
      """WITH e AS (SELECT user_id, event_type,
        |    (epoch_us(ts) // 1000000 // 86400) // 7 AS week,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |c AS (SELECT *, min(week) OVER (PARTITION BY user_id) AS cohort
        |      FROM e)
        |SELECT cohort, week - cohort AS age_w,
        |  count(DISTINCT user_id) AS n_users, count(*) AS n_events,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN cents
        |           ELSE 0 END) AS BIGINT) AS rev_cents
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "evt_paths" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR date_diff('second', lag(ts) OVER w, ts) > 14400
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), g2 AS (
        |  SELECT event_type,
        |    lead(event_type, 1) OVER w AS t1,
        |    lead(event_type, 2) OVER w AS t2,
        |    lead(brk, 1) OVER w AS b1,
        |    lead(brk, 2) OVER w AS b2
        |  FROM g WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), p AS (
        |  SELECT event_type || ' > ' || t1 || ' > ' || t2 AS path,
        |    count(*) AS n
        |  FROM g2 WHERE b1 = 0 AND b2 = 0 GROUP BY 1
        |)
        |SELECT CAST(row_number() OVER (ORDER BY n DESC, path) AS INT) AS rnk,
        |  path, n
        |FROM p ORDER BY n DESC, path LIMIT 10""".stripMargin,
    "evt_concurrency" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR date_diff('second', lag(ts) OVER w, ts) > 14400
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                   ROWS UNBOUNDED PRECEDING) AS session_idx
        |  FROM g
        |), sess AS (
        |  SELECT user_id, session_idx,
        |    min(epoch_us(ts) // 1000000) AS start_s,
        |    max(epoch_us(ts) // 1000000) AS end_s
        |  FROM s GROUP BY 1, 2
        |), b AS (
        |  SELECT start_s AS t, 1 AS delta FROM sess
        |  UNION ALL SELECT end_s + 1, -1 FROM sess
        |), bt AS (
        |  SELECT t // 3600 AS hour, t, CAST(sum(delta) AS BIGINT) AS delta
        |  FROM b GROUP BY 1, 2
        |), ht AS (
        |  SELECT hour, sum(delta) AS h_delta, count(*) AS n_points
        |  FROM bt GROUP BY 1
        |), c AS (
        |  SELECT hour, n_points,
        |    CAST(coalesce(sum(h_delta) OVER (ORDER BY hour
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS carry_in
        |  FROM ht
        |), w AS (
        |  SELECT hour, t, sum(delta) OVER (PARTITION BY hour ORDER BY t
        |    ROWS UNBOUNDED PRECEDING) AS run_local
        |  FROM bt
        |)
        |SELECT w.hour,
        |  CAST(greatest(max(c.carry_in + w.run_local), max(c.carry_in))
        |       AS BIGINT) AS max_conc,
        |  CAST(max(c.n_points) AS BIGINT) AS n_points
        |FROM w JOIN c ON c.hour = w.hour
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "evt_gini" ->
      """WITH ux AS (SELECT event_type, user_id, count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |vx AS (SELECT event_type, x, count(*) AS m FROM ux GROUP BY 1, 2),
        |t AS (
        |  SELECT event_type, x, m,
        |    coalesce(sum(m) OVER (PARTITION BY event_type ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
        |  FROM vx),
        |agg AS (
        |  SELECT event_type, CAST(sum(m) AS BIGINT) AS n_users,
        |    CAST(sum(x * m) AS BIGINT) AS total_events,
        |    CAST(sum(x * (m * cum + (m * (m + 1)) // 2)) AS BIGINT) AS s_ix
        |  FROM t GROUP BY 1)
        |SELECT event_type, n_users, total_events,
        |  (1000 * (2 * s_ix - (n_users + 1) * total_events))
        |    // (n_users * total_events) AS gini_pm
        |FROM agg ORDER BY event_type""".stripMargin,
    "evt_lift" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR date_diff('second', lag(ts) OVER w, ts) > 14400
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), st AS MATERIALIZED (
        |  SELECT DISTINCT user_id, session_idx, event_type FROM (
        |    SELECT user_id, event_type,
        |      sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS UNBOUNDED PRECEDING) AS session_idx
        |    FROM g)
        |), ns AS (SELECT count(*) AS n_sessions FROM
        |    (SELECT DISTINCT user_id, session_idx FROM st)),
        |marg AS (SELECT event_type, count(*) AS n_t FROM st GROUP BY 1),
        |co AS (
        |  SELECT x.event_type AS a, y.event_type AS b, count(*) AS n_ab
        |  FROM st x JOIN st y
        |    ON x.user_id = y.user_id AND x.session_idx = y.session_idx
        |   AND x.event_type < y.event_type
        |  GROUP BY 1, 2)
        |SELECT a, b, n_ab, ma.n_t AS n_a, mb.n_t AS n_b,
        |  (SELECT n_sessions FROM ns) AS n_sessions,
        |  (1000 * (SELECT n_sessions FROM ns) * n_ab) // (ma.n_t * mb.n_t)
        |    AS lift_pm
        |FROM co JOIN marg ma ON ma.event_type = a
        |JOIN marg mb ON mb.event_type = b
        |ORDER BY lift_pm DESC, a, b""".stripMargin,
    "evt_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR date_diff('second', lag(ts) OVER w, ts) > 14400
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                   ROWS UNBOUNDED PRECEDING) AS session_idx
        |  FROM g
        |)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |  count(*) AS n_events,
        |  date_diff('second', min(ts), max(ts)) AS duration_s
        |FROM s GROUP BY user_id, session_idx""".stripMargin,
    "evt_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id
        |), s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'view' AND e.ts > s1.t1
        |    AND date_diff('second', s1.t1, e.ts) <= 86400
        |  GROUP BY e.user_id
        |), s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        |    AND date_diff('second', s2.t2, e.ts) <= 86400
        |  GROUP BY e.user_id
        |)
        |SELECT 'stage1_signup' AS stage, count(*) AS n_users FROM s1
        |UNION ALL SELECT 'stage2_view', count(*) FROM s2
        |UNION ALL SELECT 'stage3_purchase', count(*) FROM s3""".stripMargin,
    "evt_retention" ->
      """WITH first AS (
        |  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        |  FROM events GROUP BY user_id
        |)
        |SELECT f.cohort_week,
        |  CAST(date_diff('day', f.cohort_week, date_trunc('week', e.ts)) / 7
        |       AS BIGINT) AS week_offset,
        |  count(DISTINCT e.user_id) AS n_users
        |FROM events e JOIN first f ON e.user_id = f.user_id
        |GROUP BY 1, 2""".stripMargin,
    "evt_json" ->
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
        |    / count(*) AS k_avg
        |FROM events GROUP BY event_type""".stripMargin,
    "evt_dau" ->
      """WITH pd AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id
        |  FROM events),
        |d AS (SELECT day, count(*) AS dau FROM pd GROUP BY 1),
        |w AS (SELECT d.day, count(DISTINCT pd.user_id) AS wau
        |  FROM d JOIN pd ON pd.day BETWEEN d.day - 6 AND d.day
        |  GROUP BY 1)
        |SELECT d.day, CAST(d.dau AS BIGINT) AS dau,
        |  CAST(w.wau AS BIGINT) AS wau,
        |  CAST((1000 * d.dau) // w.wau AS BIGINT) AS stickiness_pm
        |FROM d JOIN w ON w.day = d.day ORDER BY 1""".stripMargin,
    "evt_smooth" ->
      """WITH RECURSIVE hourly AS MATERIALIZED (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
        |    CAST(count(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1, 2),
        |idx AS MATERIALIZED (SELECT event_type, hour, n_events,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY hour) AS BIGINT) AS i
        |  FROM hourly),
        |rec(event_type, i, hour, n_events, s) AS (
        |  SELECT event_type, i, hour, n_events, 10 * n_events
        |  FROM idx WHERE i = 1
        |  UNION ALL
        |  SELECT x.event_type, x.i, x.hour, x.n_events,
        |    (30 * x.n_events + 7 * r.s) // 10
        |  FROM idx x JOIN rec r
        |    ON r.event_type = x.event_type AND x.i = r.i + 1)
        |SELECT event_type, CAST(hour AS BIGINT) AS hour, n_events,
        |  CAST(s AS BIGINT) AS ewma10,
        |  coalesce(i > 1 AND 100 * n_events >
        |    15 * lag(s) OVER (PARTITION BY event_type ORDER BY i),
        |    false) AS is_burst
        |FROM rec ORDER BY event_type, hour""".stripMargin,
    "evt_changepoint" ->
      """WITH hourly AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, hour,
        |    CAST(row_number() OVER th AS BIGINT) AS i,
        |    CAST(sum(x) OVER th AS BIGINT) AS s,
        |    CAST(count(*) OVER t AS BIGINT) AS n_hours,
        |    CAST(sum(x) OVER t AS BIGINT) AS n_events
        |  FROM hourly
        |  WINDOW th AS (PARTITION BY event_type ORDER BY hour
        |                ROWS UNBOUNDED PRECEDING),
        |         t AS (PARTITION BY event_type)),
        |d AS (
        |  SELECT event_type, n_hours, n_events, i AS cp_idx,
        |    CAST(hour AS BIGINT) AS cp_hour,
        |    abs(n_hours * s - n_events * i) AS max_dev,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY abs(n_hours * s - n_events * i) DESC, i) AS rn
        |  FROM w)
        |SELECT event_type, n_hours, n_events, cp_idx, cp_hour, max_dev
        |FROM d WHERE rn = 1""".stripMargin,
    "evt_anomaly" ->
      """WITH hourly AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
        |    count(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, count(*) AS n_hours,
        |    CAST(sum(n_events) AS BIGINT) AS s1,
        |    CAST(sum(n_events * n_events) AS BIGINT) AS s2
        |  FROM hourly GROUP BY 1)
        |SELECT h.event_type, CAST(h.hour AS BIGINT) AS hour,
        |  h.n_events,
        |  (m.n_hours * h.n_events - m.s1 > 0 AND
        |   (m.n_hours * h.n_events - m.s1) * (m.n_hours * h.n_events - m.s1)
        |     > 4 * (m.n_hours * m.s2 - m.s1 * m.s1)) AS is_spike
        |FROM hourly h JOIN m ON m.event_type = h.event_type""".stripMargin,
    "evt_seasonality" ->
      """WITH e AS (SELECT epoch_us(ts) // 1000000 AS ts_s, user_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |g AS (SELECT ((ts_s // 86400) + 4) % 7 AS dow,
        |    (ts_s % 86400) // 3600 AS hod,
        |    count(*) AS n_events, count(DISTINCT user_id) AS n_users,
        |    CAST(sum(cents) AS BIGINT) AS sum_cents
        |  FROM e GROUP BY 1, 2)
        |SELECT dow, hod, n_events, n_users, sum_cents,
        |  CAST((1000 * n_events) // (sum(n_events) OVER ()) AS BIGINT)
        |    AS share_pm
        |FROM g ORDER BY dow, hod""".stripMargin,
    "evt_ttc" ->
      """WITH s AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'signup'
        |        THEN epoch_us(ts) // 1000000 END) AS s0
        |  FROM events GROUP BY 1
        |), u AS (
        |  SELECT s.user_id, s.s0,
        |    min(CASE WHEN e.event_type = 'purchase'
        |          AND epoch_us(e.ts) // 1000000 >= s.s0
        |        THEN epoch_us(e.ts) // 1000000 END) AS p0
        |  FROM s JOIN events e ON e.user_id = s.user_id
        |  WHERE s.s0 IS NOT NULL GROUP BY 1, 2
        |), t AS (SELECT p0 - s0 AS ttc_s, p0 FROM u)
        |SELECT CASE WHEN p0 IS NULL THEN -1
        |         ELSE length(bin(ttc_s + 1)) END AS bucket,
        |  count(*) AS n_users, min(ttc_s) AS min_s, max(ttc_s) AS max_s,
        |  CAST(sum(ttc_s) AS BIGINT) AS sum_s
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    "evt_transitions" ->
      """WITH p AS (
        |  SELECT lag(event_type) OVER w AS from_type, event_type AS to_type,
        |    epoch_us(ts) // 1000000
        |      - lag(epoch_us(ts) // 1000000) OVER w AS gap_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), m AS (
        |  SELECT from_type, to_type, count(*) AS n FROM p
        |  WHERE from_type IS NOT NULL AND gap_s <= 14400
        |  GROUP BY 1, 2
        |)
        |SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
        |  CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS row_total,
        |  CAST((1000000 * n) // sum(n) OVER (PARTITION BY from_type)
        |       AS BIGINT) AS p6
        |FROM m""".stripMargin,
    "evt_attribution" ->
      """WITH w AS (
        |  SELECT event_id, user_id, event_type,
        |    epoch_us(ts) // 1000000 AS ts_s,
        |    CAST(round(value * 100) AS BIGINT) AS value_cents,
        |    max(CASE WHEN event_type = 'click'
        |             THEN epoch_us(ts) // 1000000 END) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_s
        |  FROM events
        |)
        |SELECT event_id, user_id, ts_s AS purchase_s,
        |  CASE WHEN last_click_s IS NOT NULL AND ts_s - last_click_s <= 86400
        |       THEN last_click_s ELSE -1 END AS click_s,
        |  last_click_s IS NOT NULL AND ts_s - last_click_s <= 86400 AS attributed,
        |  value_cents
        |FROM w WHERE event_type = 'purchase'""".stripMargin,
    "evt_window" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start, event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2""".stripMargin)
}
