package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Probabilistic sketches — the approximate-aggregation toolkit a 100 TB
  * warehouse leans on when exact answers cost a full shuffle of the fact
  * table: HyperLogLog distinct counting (Flajolet et al. 2007) and
  * count-min heavy-hitter estimation (Cormode & Muthukrishnan 2005).
  *
  * Spark's own `approx_count_distinct` is HLL++ too, but its register
  * layout is engine-private, so results can't be replayed by another
  * engine. These sketches instead build the registers from an explicit
  * modular hash in plain integer arithmetic — every register, and
  * therefore every estimate, is bit-identical in the DuckDB oracle. That
  * is the point: a sketch you can hand to ANY engine and merge.
  *
  * Scale shape (both sketches): one scan + map-side partial aggregation
  * into a FIXED-size state (64 registers / 512 cells) — the reduce side
  * is O(groups × sketch), independent of row count. Register max and
  * cell sum are both commutative monoids, so the sketches merge across
  * partitions, days, or clusters without re-reading data.
  */
object Sketches {

  /** Modulus for the first fold: a prime, so the fold is close to
    * uniform; small enough that `u0 * KnuthA` cannot overflow a long.
    */
  private[graft] val FoldP = 94906249L

  /** Knuth's multiplicative constant and an offset prime. */
  private[graft] val KnuthA = 2654435761L
  private[graft] val HashB = 104729L

  /** Hash range: the prime 2^52 - 47 — products stay inside a long. */
  private[graft] val HashP = 4503599627370449L

  /** HLL register count (m = 64 → alpha = 0.709 per the HLL paper). */
  private val HllM = 64

  /** The shared integer hash: h in [0, HashP). */
  private def h64(u: Column): Column =
    ((u % FoldP) * KnuthA + HashB) % HashP

  /** Scala-side twin of the register update the SQL plan performs —
    * shared with [[graft.streaming.SketchStream]] so the streaming face
    * cannot drift from the batch operator (one source of truth for the
    * hash, the rank clamp, and the estimate).
    */
  private[graft] def hllUpdate(regs: Array[Long], userId: Long): Unit = {
    val h = ((userId % FoldP) * KnuthA + HashB) % HashP
    val reg = (h % HllM).toInt
    val w = h / HllM
    val rho = math.min(java.lang.Long.numberOfTrailingZeros(w) + 1, 47).toLong
    if (rho > regs(reg)) regs(reg) = rho
  }

  /** Exact-integer HLL estimate from a 64-register array (raw harmonic
    * mean, linear counting below 2.5m when zero registers remain).
    */
  private[graft] def hllEstimate(regs: Array[Long]): Long = {
    val num = regs.map(m => 1L << (47 - m)).sum
    val raw = 709L * (576460752303423488L / num) / 1000L
    val v0 = regs.count(_ == 0L)
    if (v0 > 0 && raw <= 2L * HllM + HllM / 2) LcLut(v0 - 1) else raw
  }

  /** Small-range (linear counting) lookup: lc(V) = round(m·ln(m/V)) for
    * V zero registers, precomputed ONCE here and inlined into both the
    * Spark plan and the oracle SQL — the only ln in the sketch runs at
    * plan-build time, so no runtime float can diverge between engines.
    */
  private[graft] val LcLut: Seq[Long] =
    (1 to HllM).map(v => math.round(HllM * math.log(HllM.toDouble / v)))

  /** Adds the register columns (`reg`, `rho`) to any frame with a
    * `user_id` — the scan-side half of the sketch, shared by the inline
    * operator and the persisted store's daily builds.
    */
  private[operators] def withRegisterCols(df: DataFrame): DataFrame =
    df.withColumn("h", h64(col("user_id")))
      .withColumn("reg", (col("h") % HllM).cast("int"))
      .withColumn("w", expr(s"h div $HllM"))
      .withColumn("rho",
        least(expr("bit_count((w & -w) - 1) + 1"), lit(47)).cast("long"))

  /** Folds a (event_type, reg, m_rho) register table into per-type
    * estimates — exact integer arithmetic, shared by the inline sketch
    * and any merge of persisted register artifacts.
    */
  private[operators] def estimateFromRegisters(regs: DataFrame): DataFrame = {
    // empty registers count as rho = 0 (the standard HLL convention) —
    // the grid explodes a literal 0..63 array per type, no join needed
    val grid = regs.select("event_type").distinct()
      .select(col("event_type"),
        explode(typedLit((0 until HllM).toArray)).as("reg"))
    grid.join(regs, Seq("event_type", "reg"), "left")
      .withColumn("m_rho", coalesce(col("m_rho"), lit(0L)))
      .groupBy("event_type")
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(47 - m_rho AS INT))"))
        .as("num"),
        sum(when(col("m_rho") === 0L, 1L).otherwise(0L)).as("v0"))
      .withColumn("raw_est", expr("(709 * (576460752303423488 div num)) div 1000"))
      .withColumn("hll_est",
        when(col("v0") > 0L && col("raw_est") <= 2L * HllM + HllM / 2,
          element_at(typedLit(LcLut), col("v0").cast("int")))
          .otherwise(col("raw_est")))
  }

  /** HyperLogLog distinct users per event type, next to the exact
    * count-distinct it approximates. Register index = h mod 64; rank =
    * trailing-zero count of h div 64, clamped to 47 (h has 52 hashed
    * bits). The harmonic mean is evaluated in EXACT integer arithmetic:
    * num = Σ 2^(47-M_r) ≤ 2^53, raw = (709 · (2^59 div num)) div 1000 —
    * no float ever enters, so Spark and DuckDB agree to the last digit.
    * In the small range (raw ≤ 2.5m with zero registers present) the
    * estimate switches to linear counting via the integer [[LcLut]],
    * exactly as the HLL paper prescribes.
    */
  def sketchHll(s: SparkSession, dir: String): DataFrame = {
    val ev = withRegisterCols(
      Tables.events(s, dir).select(col("event_type"), col("user_id")))
    val est = estimateFromRegisters(
      ev.groupBy("event_type", "reg").agg(max("rho").as("m_rho")))
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_n"))
    est.join(exact, Seq("event_type"))
      .select("event_type", "hll_est", "exact_n")
  }

  /** Persisted day-partitioned HLL registers — the warehouse pattern the
    * sketch exists for: each day's job reduces that day's events to a
    * 64-register file per group (O(sketch) bytes, never the raw ids),
    * and ANY day range answers distinct-count queries later by merging
    * registers with max — no re-scan of history, no raw-id retention
    * (the privacy side-benefit real pipelines lean on). Day writes are
    * independent dynamic partitions, so daily appends touch O(day)
    * bytes; the register max is associative + commutative + idempotent,
    * so replayed or overlapping builds merge to the same artifact.
    *
    * Driver key `sketch_hll_store`: bulk-build all days but the last,
    * append the last day separately (the daily-increment path), then
    * answer the full-range query from the ARTIFACT alone — which must be
    * indistinguishable from the inline sketch, so it shares the
    * `sketch_hll` oracle verbatim.
    */
  def sketchHllStore(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_type"), col("user_id"),
        expr("ts div 86400000000000").as("day"))
    val store = Scratch.scratch("graft-hll-store").toString
    val mm = ev.agg(min("day"), max("day")).collect()(0)
    val (minDay, maxDay) = (mm.getLong(0), mm.getLong(1))
    def dailyRegs(df: DataFrame): DataFrame =
      withRegisterCols(df)
        .groupBy("day", "event_type", "reg").agg(max("rho").as("m_rho"))
    // cluster the bulk write BY DAY at the day count (r15, guide §6/§2.2):
    // day dirs are the write unit, so one task per day is the right
    // parallelism at any scale — AQE had coalesced the post-agg exchange
    // to 2 tasks that each wrote all ~30 day dirs (0.54 s serial at
    // bench scale, and tasks × days small files at any scale); the
    // explicit count is DATA-derived (the day span), not a core count
    val nDays = (maxDay - minDay).max(1L).toInt
    dailyRegs(ev.filter(col("day") < maxDay))
      .repartition(nDays, col("day"))
      .write.partitionBy("day").mode("overwrite").parquet(store)
    dailyRegs(ev.filter(col("day") === maxDay))
      .write.partitionBy("day").mode("append").parquet(store)
    val merged = s.read.parquet(store)
      .groupBy("event_type", "reg").agg(max("m_rho").as("m_rho"))
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_n"))
    estimateFromRegisters(merged)
      .join(exact, Seq("event_type"))
      .select("event_type", "hll_est", "exact_n")
  }

  /** Count-min sketch width/depth. */
  private val CmsW = 128
  private val CmsD = 4

  /** Per-row hash family: 4 affine variants of the shared fold. */
  private def cmsCol(j: Int, u: Column): Column =
    (((u % FoldP) * (KnuthA + 2 * j + 1) + HashB * (j + 1)) % HashP) % CmsW

  /** Count-min heavy hitters: build a 4×128 sketch of per-user event
    * counts, then read the top-10 users (by exact count, user_id
    * tiebreak) back THROUGH the sketch — est = min over the 4 cells, the
    * classic one-sided estimate (est ≥ exact always; `exact_hit` marks
    * collision-free cells). Build aggregates per-user partials into 512
    * integer cells; probe joins 40 (user, cell) pairs against them.
    */
  def sketchCms(s: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(s, dir)
      .groupBy("user_id").agg(count(lit(1)).as("n_u"))
    val cells = perUser
      .select(col("n_u"), explode(array((0 until CmsD).map(j =>
        struct(lit(j).as("j"), cmsCol(j, col("user_id")).as("c"))): _*)).as("jc"))
      .groupBy(col("jc.j").as("j"), col("jc.c").as("c"))
      .agg(sum("n_u").as("cnt"))
    val top = perUser
      .orderBy(desc("n_u"), asc("user_id")).limit(10)
      .select(col("user_id"), col("n_u").as("exact_n"),
        explode(array((0 until CmsD).map(j =>
          struct(lit(j).as("j"), cmsCol(j, col("user_id")).as("c"))): _*)).as("jc"))
      .select(col("user_id"), col("exact_n"),
        col("jc.j").as("j"), col("jc.c").as("c"))
    top.join(broadcast(cells), Seq("j", "c"))
      .groupBy("user_id", "exact_n")
      .agg(min("cnt").as("cms_est"))
      .withColumn("exact_hit", col("cms_est") === col("exact_n"))
      .select("user_id", "exact_n", "cms_est", "exact_hit")
  }

  /** Histogram-quantile bin width (cents) and bin count. */
  private val QBinW = 1024L
  private val QBins = 64

  /** Histogram quantile sketch: per event type, fold the `value` column
    * into 64 fixed-width integer bins and read the 25/50/75th percentile
    * estimates off the cumulative counts (estimate = upper edge of the
    * first bin whose running count reaches ceil(q·n) — one-sided error ≤
    * one bin width, the classic fixed-histogram bound). The state is 64
    * integers per group like [[sketchHll]]: map-side partial counts, a
    * constant-size reduce, and bin counts merge by addition across
    * partitions/days — where an exact quantile (`q12_quantiles`) needs a
    * full per-group sort at every refresh.
    */
  def sketchQuantile(s: SparkSession, dir: String): DataFrame = {
    val hist = Tables.events(s, dir)
      .select(col("event_type"),
        round(col("value") * 100).cast("bigint").as("cents"))
      .withColumn("bin", least(expr(s"cents div $QBinW"), lit(QBins - 1L)))
      .groupBy("event_type", "bin").agg(count(lit(1)).as("n_bin"))
    val w = Window.partitionBy("event_type").orderBy("bin")
    val cum = hist
      .withColumn("cum", sum("n_bin").over(w))
      .withColumn("n", sum("n_bin").over(Window.partitionBy("event_type")))
    def qEst(q: Int): Column =
      min(when(col("cum") * 100 >= col("n") * q, (col("bin") + 1) * QBinW))
    cum.groupBy("event_type")
      .agg(max("n").as("n"),
        qEst(25).as("q25_est"), qEst(50).as("q50_est"), qEst(75).as("q75_est"))
  }

  /** KMV sketch size. */
  private val KmvK = 64

  /** Hard cap on the KMV pair frame's type domain: pairs are |types|²,
    * which the operator's contract assumes is enum-scale. Past the cap
    * the first [[KmvTypeCap]] types (sorted) are kept, the drop is
    * logged, and `n_types_dropped` audits it in every output row.
    */
  private[operators] val KmvTypeCap = 64

  /** Second mixing round for KMV: unlike HLL (which reads only the LOW
    * bits of h64, fine for any input), KMV compares hash VALUES against
    * the full range — and for small inputs `u·A + B` never wraps HashP,
    * leaving h64 linear in u and θ meaningless. Folding through FoldP
    * and re-multiplying wraps the modulus ~50× for every input, so the
    * k-th minimum actually measures density.
    */
  private def kmvHash(u: Column): Column =
    ((h64(u) % FoldP) * 2654435789L + 97L) % HashP

  /** K-minimum-values sketch with SET-INTERSECTION estimation — the
    * operation HLL registers cannot answer (register max loses identity;
    * KMV keeps the k smallest hash VALUES, so sketches intersect). For
    * every unordered event-type pair: the union estimate
    * `(k−1)·P div θ` (θ = k-th smallest hash of the union) scaled by the
    * matching fraction `m div k` (m = union-top-k hashes present in BOTH
    * sketches) — the Beyer et al. 2007 estimator, evaluated entirely in
    * exact integers next to the exact distinct-both count it
    * approximates.
    *
    * Scale shape: the ONE pass over the fact table is the per-type
    * distinct + k-smallest reduce (WindowGroupLimit prunes to k rows per
    * type map-side); everything after operates on ≤ types·k hash values
    * — sketch algebra is coordinator-scale by design, exactly why KMV
    * sketches ship between systems. The exact control is a per-user
    * type-pair join bounded by 10 pairs per user.
    */
  def sketchKmv(s: SparkSession, dir: String): DataFrame = {
    val hs = Tables.events(s, dir)
      .select(col("event_type"), col("user_id"))
      .withColumn("h", kmvHash(col("user_id")))
      .select("event_type", "h").distinct()
    val kmv = hs
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type").orderBy("h")))
      .filter(col("rn") <= KmvK)
      .select("event_type", "h")
      .localCheckpoint(true) // ≤ types·k rows — private materialization
    import s.implicits._
    // |types|² contract, made explicit: the pair frame is quadratic in
    // the type domain, which is fine for an enum-like key (~6 here) and
    // catastrophic if someone points this at a high-cardinality column —
    // so the domain is CAPPED at the first KmvTypeCap types (sorted, so
    // the kept set is deterministic), the drop is logged, and the
    // n_types_dropped audit column records it in the output
    val allTypes = kmv.select("event_type").distinct()
      .collect().map(_.getString(0)).sorted
    val types = allTypes.take(KmvTypeCap)
    val nDropped = (allTypes.length - types.length).toLong
    if (nDropped > 0)
      System.err.println(s"[sketch_kmv] type domain ${allTypes.length} exceeds " +
        s"cap $KmvTypeCap: dropping $nDropped types from the pair frame " +
        "(KMV pair estimation is |types|^2 — this key expects an enum-like domain)")
    val pairs = types.combinations(2).map { case Array(a, b) => (a, b) }
      .toSeq.toDF("ta", "tb")
    val ua = pairs.join(kmv.select(col("event_type").as("ta"), col("h")), "ta")
    val ub = pairs.join(kmv.select(col("event_type").as("tb"), col("h")), "tb")
    val topu = ua.select("ta", "tb", "h").union(ub.select("ta", "tb", "h"))
      .distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy("ta", "tb").orderBy("h")))
      .filter(col("rn") <= KmvK)
    val theta = topu.groupBy("ta", "tb").agg(max("h").as("theta"))
    val matches = topu
      .join(kmv.select(col("event_type").as("ta"), col("h")), Seq("ta", "h"), "left_semi")
      .join(kmv.select(col("event_type").as("tb"), col("h")), Seq("tb", "h"), "left_semi")
      .groupBy("ta", "tb").agg(count(lit(1)).as("m"))
    val tu = Tables.events(s, dir)
      .select(col("event_type"), col("user_id")).distinct()
    val exact = tu.join(tu.toDF("tb_", "user_id"), "user_id")
      .filter(col("event_type") < col("tb_"))
      .groupBy(col("event_type").as("ta"), col("tb_").as("tb"))
      .agg(count(lit(1)).as("exact_n"))
    theta.join(matches, Seq("ta", "tb"), "left")
      .na.fill(0L, Seq("m"))
      .withColumn("kmv_est",
        expr(s"(m * ((${(KmvK - 1).toLong * HashP} div theta))) div $KmvK"))
      .join(exact, Seq("ta", "tb"), "left")
      .na.fill(0L, Seq("exact_n"))
      .withColumn("n_types_dropped", lit(nDropped))
      .select("ta", "tb", "m", "kmv_est", "exact_n", "n_types_dropped")
  }

  /** AMS tug-of-war estimators: 32, read as 8 groups of 4 — the paper's
    * MEDIAN-OF-MEANS layout. The median of RAW squares is NOT an option:
    * Z² is χ²₁-distributed, whose median is 0.455·σ², so a raw median
    * under-reports F₂ by half (first cut measured exactly that); means
    * of 4 unbias each group, the median across groups tames outliers.
    */
  private val AmsK = 32
  private val AmsGroups = 8

  /** Even hex digits — an md5 hex char is one of these iff its low bit
    * is 0; the per-char test is the engine-portable sign bit.
    */
  private val HexEven = Seq("0", "2", "4", "6", "8", "a", "c", "e")

  /** ±1 sign for estimator j: the parity of the j-th hex char of ONE md5
    * of the user id — 32 high-quality independent bits from a single
    * digest per row. AMS needs 4-wise independent signs, and the modular
    * h64 family is NOT: an affine per-j tweak after the fold only flips
    * parity deterministically (all 32 estimators collapse to ±one
    * value), and even a per-j pre-shift leaves the parities so balanced
    * that they anti-correlate against near-uniform counts (measured 93 %
    * and 85-95 % low respectively). md5, like the dedup family uses, has
    * no such structure — identical hex output in both engines, so every
    * sign replays.
    */
  private def amsSign(j: Int, h: Column): Column =
    when(substring(h, j + 1, 1).isin(HexEven: _*), 1L).otherwise(-1L)

  /** AMS F₂ sketch (Alon–Matias–Szegedy 1996): the second frequency
    * moment F₂ = Σ_u c_u² of per-user event counts, per event type —
    * which is exactly the SELF-JOIN SIZE on user_id, the number the
    * optimizer wants BEFORE running the join. Each of 16 tug-of-war
    * estimators keeps ONE integer Z_j = Σ_events sign_j(user_id); E[Z²]
    * = F₂, and the median of the 16 squares is the estimate. The exact
    * F₂ rides along (one distinct-tuple exchange) so the key measures
    * its own sketch, like `ann_recall` does for the IVF index.
    *
    * Scale shape: the sketch side is ONE scan with 16 sum aggregates —
    * map-side partials into a |types|×16-integer state, constant-size
    * reduce, and Z vectors merge by ADDITION across partitions/days/
    * clusters (the same mergeability argument as the HLL registers; an
    * exact F₂ at 100 TB pays a (type, user) exchange every refresh).
    * Median of 16 = mean of order stats 8 and 9 of the sorted squares,
    * computed in-row on the 16-element array.
    */
  def sketchAms(s: SparkSession, dir: String): DataFrame = {
    // spreadIfSmall (keyless) + md5 AFTER the exchange: event_type has a
    // handful of groups, so the md5 + 16 sign-sum fold otherwise runs
    // entirely inside the one-split scan task (measured 0.70 s serial)
    val ev = Tables.spreadIfSmall(s, dir, "events",
        Tables.events(s, dir).select(col("event_type"), col("user_id")),
        Seq.empty)
      .withColumn("hh", md5(col("user_id").cast("string")))
    val aggs = count(lit(1)).as("n_events") +:
      (0 until AmsK).map(j => sum(amsSign(j, col("hh"))).as(s"z$j"))
    val groupMean = (g: Int) => expr(
      (0 until 4).map(r => s"z${4 * g + r} * z${4 * g + r}")
        .mkString("(", " + ", ") div 4"))
    val est = ev.groupBy("event_type")
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("ests", array_sort(array(
        (0 until AmsGroups).map(groupMean): _*)))
      .withColumn("f2_est", expr("(ests[3] + ests[4]) div 2"))
    val exact = ev.groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("cu"))
      .groupBy("event_type")
      .agg(sum(col("cu") * col("cu")).as("f2_exact"))
    est.join(exact, "event_type")
      .withColumn("err_pm",
        expr("(1000 * abs(f2_est - f2_exact)) div f2_exact"))
      .select("event_type", "n_events", "f2_exact", "f2_est", "err_pm")
      .orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_ams" -> (sketchAms _),
    "sketch_kmv" -> (sketchKmv _),
    "sketch_hll" -> (sketchHll _),
    "sketch_hll_store" -> (sketchHllStore _),
    "sketch_cms" -> (sketchCms _),
    "sketch_quantile" -> (sketchQuantile _))

  private val hSql = s"((user_id % $FoldP) * $KnuthA + $HashB) % $HashP"

  private val amsZSql = (0 until AmsK).map(j =>
    s"CAST(sum(CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), ${j + 1}, 1) " +
      "IN ('0','2','4','6','8','a','c','e') THEN 1 ELSE -1 END) " +
      s"AS BIGINT) AS z$j").mkString(", ")

  val oracles: Map[String, String] = Map(
    "sketch_ams" ->
      s"""WITH z AS (SELECT event_type, count(*) AS n_events, $amsZSql
         |  FROM events GROUP BY 1),
         |est AS (SELECT event_type, n_events,
         |    list_sort([${(0 until AmsGroups).map(g =>
             (0 until 4).map(r => s"z${4 * g + r} * z${4 * g + r}")
               .mkString("(", " + ", ") // 4")).mkString(", ")}]) AS l
         |  FROM z),
         |ex AS (SELECT event_type, CAST(sum(cu * cu) AS BIGINT) AS f2_exact
         |  FROM (SELECT event_type, user_id, count(*) AS cu
         |        FROM events GROUP BY 1, 2) t GROUP BY 1)
         |SELECT est.event_type, n_events, f2_exact,
         |  CAST((l[4] + l[5]) // 2 AS BIGINT) AS f2_est,
         |  CAST((1000 * abs((l[4] + l[5]) // 2 - f2_exact)) // f2_exact AS BIGINT)
         |    AS err_pm
         |FROM est JOIN ex ON ex.event_type = est.event_type
         |ORDER BY 1""".stripMargin,
    "sketch_kmv" ->
      s"""WITH hs AS MATERIALIZED (SELECT DISTINCT event_type,
         |    ((($hSql) % $FoldP) * 2654435789 + 97) % $HashP AS h FROM events),
         |kmv AS MATERIALIZED (SELECT event_type, h FROM (
         |    SELECT event_type, h,
         |      row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
         |    FROM hs) WHERE rn <= $KmvK),
         |tall AS (SELECT DISTINCT event_type FROM kmv),
         |tps AS (SELECT event_type FROM (
         |    SELECT event_type, row_number() OVER (ORDER BY event_type) AS rn
         |    FROM tall) WHERE rn <= $KmvTypeCap),
         |aud AS (SELECT CAST(greatest(count(*) - $KmvTypeCap, 0) AS BIGINT)
         |    AS n_types_dropped FROM tall),
         |pairs AS (SELECT a.event_type AS ta, b.event_type AS tb
         |  FROM tps a JOIN tps b ON a.event_type < b.event_type),
         |uni AS (SELECT DISTINCT p.ta, p.tb, k.h
         |  FROM pairs p JOIN kmv k ON k.event_type = p.ta OR k.event_type = p.tb),
         |topu AS MATERIALIZED (SELECT ta, tb, h FROM (
         |    SELECT ta, tb, h,
         |      row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rn
         |    FROM uni) WHERE rn <= $KmvK),
         |theta AS (SELECT ta, tb, max(h) AS theta FROM topu GROUP BY 1, 2),
         |mm AS (SELECT t.ta, t.tb, count(*) AS m FROM topu t
         |  WHERE EXISTS (SELECT 1 FROM kmv ka
         |                WHERE ka.event_type = t.ta AND ka.h = t.h)
         |    AND EXISTS (SELECT 1 FROM kmv kb
         |                WHERE kb.event_type = t.tb AND kb.h = t.h)
         |  GROUP BY 1, 2),
         |tu AS MATERIALIZED (SELECT DISTINCT event_type, user_id FROM events),
         |ex AS (SELECT a.event_type AS ta, b.event_type AS tb,
         |    count(*) AS exact_n
         |  FROM tu a JOIN tu b
         |    ON a.user_id = b.user_id AND a.event_type < b.event_type
         |  GROUP BY 1, 2)
         |SELECT th.ta, th.tb, CAST(coalesce(mm.m, 0) AS BIGINT) AS m,
         |  CAST((coalesce(mm.m, 0) * (${(KmvK - 1).toLong * HashP} // th.theta))
         |    // $KmvK AS BIGINT) AS kmv_est,
         |  CAST(coalesce(ex.exact_n, 0) AS BIGINT) AS exact_n,
         |  aud.n_types_dropped
         |FROM theta th
         |CROSS JOIN aud
         |LEFT JOIN mm ON mm.ta = th.ta AND mm.tb = th.tb
         |LEFT JOIN ex ON ex.ta = th.ta AND ex.tb = th.tb
         |ORDER BY 1, 2""".stripMargin,
    "sketch_quantile" ->
      s"""WITH h AS (SELECT event_type,
         |    least(CAST(round(value * 100) AS BIGINT) // $QBinW, ${QBins - 1}) AS bin,
         |    count(*) AS n_bin
         |  FROM events GROUP BY 1, 2),
         |c AS (SELECT event_type, bin, n_bin,
         |    sum(n_bin) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
         |    sum(n_bin) OVER (PARTITION BY event_type) AS n
         |  FROM h)
         |SELECT event_type, CAST(max(n) AS BIGINT) AS n,
         |  CAST(min(CASE WHEN cum * 100 >= n * 25 THEN (bin + 1) * $QBinW END) AS BIGINT) AS q25_est,
         |  CAST(min(CASE WHEN cum * 100 >= n * 50 THEN (bin + 1) * $QBinW END) AS BIGINT) AS q50_est,
         |  CAST(min(CASE WHEN cum * 100 >= n * 75 THEN (bin + 1) * $QBinW END) AS BIGINT) AS q75_est
         |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "sketch_hll" -> hllSql,
    // the persisted day-partitioned store must serve the identical
    // estimate: daily register max then cross-day max == global max
    "sketch_hll_store" -> hllSql,
    "sketch_cms" -> cmsSql)

  private lazy val hllSql: String =
      s"""WITH e AS (SELECT event_type, user_id, $hSql AS h FROM events),
         |r AS (SELECT event_type, h % $HllM AS reg, h // $HllM AS w FROM e),
         |rho AS (SELECT event_type, reg,
         |    least(bit_count((w & (-w)) - 1) + 1, 47) AS rho FROM r),
         |regs AS (SELECT event_type, reg, max(rho) AS m_rho
         |  FROM rho GROUP BY 1, 2),
         |grid AS (SELECT DISTINCT event_type, g.range AS reg
         |  FROM events, range(0, $HllM) g),
         |full_regs AS (SELECT grid.event_type, grid.reg,
         |    coalesce(regs.m_rho, 0) AS m_rho
         |  FROM grid LEFT JOIN regs
         |    ON regs.event_type = grid.event_type AND regs.reg = grid.reg),
         |est AS (SELECT event_type,
         |    CAST(sum(CAST(1 AS BIGINT) << CAST(47 - m_rho AS INT)) AS BIGINT) AS num,
         |    CAST(sum(CASE WHEN m_rho = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v0
         |  FROM full_regs GROUP BY 1),
         |fin AS (SELECT event_type, v0,
         |    CAST((709 * (576460752303423488 // num)) // 1000 AS BIGINT) AS raw_est
         |  FROM est)
         |SELECT e.event_type,
         |  CAST(CASE WHEN fin.v0 > 0 AND fin.raw_est <= 160
         |       THEN (LIST_VALUE(${LcLut.mkString(", ")}))[CAST(fin.v0 AS INT)]
         |       ELSE fin.raw_est END AS BIGINT) AS hll_est,
         |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS exact_n
         |FROM events e JOIN fin ON fin.event_type = e.event_type
         |GROUP BY 1, fin.v0, fin.raw_est ORDER BY 1""".stripMargin

  private lazy val cmsSql: String = {
      val cols = (0 until CmsD).map(j =>
        s"(((user_id % $FoldP) * (${KnuthA + 2 * j + 1}) + ${HashB * (j + 1)}) % $HashP) % $CmsW AS c$j")
        .mkString(", ")
      val cellUnion = (0 until CmsD).map(j =>
        s"SELECT $j AS j, c$j AS c, CAST(sum(n_u) AS BIGINT) AS cnt FROM pu GROUP BY 2")
        .mkString(" UNION ALL ")
      val probeUnion = (0 until CmsD).map(j =>
        s"SELECT user_id, exact_n, $j AS j, c$j AS c FROM top")
        .mkString(" UNION ALL ")
      s"""WITH pu AS (SELECT user_id, count(*) AS n_u, $cols
         |  FROM events GROUP BY user_id),
         |cells AS ($cellUnion),
         |top AS (SELECT user_id, n_u AS exact_n, c0, c1, c2, c3 FROM pu
         |  ORDER BY n_u DESC, user_id LIMIT 10),
         |probe AS ($probeUnion)
         |SELECT p.user_id, CAST(p.exact_n AS BIGINT) AS exact_n,
         |  CAST(min(cnt) AS BIGINT) AS cms_est,
         |  min(cnt) = p.exact_n AS exact_hit
         |FROM probe p JOIN cells ON cells.j = p.j AND cells.c = p.c
         |GROUP BY p.user_id, p.exact_n ORDER BY 1""".stripMargin
  }
}
