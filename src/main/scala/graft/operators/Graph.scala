package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed graph analytics over the co-purchase graph.
  *
  * The graph: parts are nodes, and an undirected edge joins two parts that
  * ever appear in the same order (`lineitem` self-join on `l_orderkey`).
  * This is the item-item graph a recommender / curation pipeline builds
  * from transaction logs, and in the reference's world it is the shape of
  * "entities co-edited in one changeset" (ohsome-contributions groups
  * edits by changeset the same way; cf.
  * reference/ohsome-contributions/.../ContributionsAvroConverter.java's
  * changeset struct).
  *
  * Both operators here are the canonical MapReduce-era distributed-graph
  * algorithms re-expressed as Catalyst plans:
  *
  *  - '''graph_triangles''' — triangle counting by degree orientation
  *    (Suri & Vassilvitskii, WWW 2011): orient every undirected edge from
  *    its lower-(degree, id) endpoint to the higher one. Every triangle
  *    then has exactly ONE "pivot" node with two outgoing oriented edges,
  *    so wedges (pairs of out-edges at a node) + one hash join against the
  *    oriented edge set count each triangle exactly once. Orientation
  *    bounds out-degree by O(√m) even on power-law graphs — the wedge
  *    explosion Σ outdeg² that kills the naive formulation is capped, so
  *    the plan survives a 100× scale-up where "join edges to edges on any
  *    shared endpoint" would not.
  *
  *  - '''graph_pagerank''' — PageRank as the iterative join+aggregate loop
  *    (the GraphX/Pregel shape): 5 rounds of
  *    `r' = base + d·Σ_{u→v} r(u)/deg(u)`, entirely in FIXED-POINT integer
  *    arithmetic (scale 10^12, damping 85/100, every division a floor
  *    `div`) so DuckDB replays bit-for-bit — no float accumulation order
  *    to diverge. Per round: one shuffle join (ranks onto edges, keyed by
  *    source) + one aggregate (keyed by destination). Round count is
  *    bounded and small, so lineage stays shallow; at planet scale each
  *    round's exchange reuses the same hash partitioning on the node key.
  */
object Graph {

  /** Fixed-point scale for PageRank mass (10^12 ≈ 40 bits of fraction —
    * 85·S and 15·S both fit comfortably in a BIGINT).
    */
  val PrScale = 1000000000000L

  /** PageRank iterations. Bounded + small keeps the iterative plan's
    * lineage shallow; real deployments checkpoint between rounds.
    */
  val PrRounds = 5

  /** Distinct undirected co-purchase edges `(pa < pb)`.
    *
    * One self-join on the order key — Spark plans a single exchange on
    * `l_orderkey` reused by both sides (ReusedExchange) — then a distinct
    * on the pair. Lines per order are bounded (TPC-H ≤ 7), so the
    * per-order pair fan-out is constant: edge count is O(rows), never
    * quadratic in the corpus.
    */
  private[graft] def copurchaseEdges(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    li.as("a").join(li.as("b").hint("shuffle_hash"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("pa"), col("b.pk").as("pb"))
      .distinct()
  }

  /** Per-node triangle counts, top 20 by (count desc, part asc).
    *
    * Orientation key is the pair (degree, id) compared lexicographically —
    * a total order, so every triangle has exactly one pivot node with two
    * outgoing oriented edges. Counting runs as ADJACENCY-LIST
    * INTERSECTION, not a wedge join: for each oriented edge (u, v) the
    * third corners are exactly N⁺(u) ∩ N⁺(v) (triangle u→v, u→w, v→w —
    * u is the pivot; the orientation between the pivot's two neighbors
    * picks which of them is v, so each triangle is counted once). The
    * wedge-join formulation materializes and SHUFFLES Σ outdeg² wedge
    * rows through a hash join against the edge set — at this graph's
    * density (avg degree ~300: ≤7 lines/order over a parts domain 30×
    * smaller than orders) that is ~40× the edge count in shuffled rows.
    * Here the per-node out-neighbor arrays (O(√m) long by orientation)
    * ride two edge-keyed broadcasts/exchanges instead, and the
    * intersection itself is in-kernel array work with no row explosion
    * (the `isect_sorted` merge-scan codegen kernel — both arrays arrive
    * sorted, so no per-row hash set): shuffled rows stay O(m), and only
    * actual triangles (≪ wedges) surface, as array elements. 12.9 →
    * 4.0 s solo at sf0.1; the plan survives a 100× scale-up because
    * BOTH sides of every exchange are edge- or node-scale, never
    * wedge-scale.
    *
    * Corner attribution per edge (u,v) with W = N⁺(u) ∩ N⁺(v): u and v
    * each close |W| triangles, every w ∈ W closes one.
    */
  /** Per-node full degrees over the undirected edge set. */
  private def degrees(e: DataFrame): DataFrame =
    e.select(col("pa").as("node")).unionAll(e.select(col("pb")))
      .groupBy("node").agg(count(lit(1)).as("deg"))

  /** Per-dir shared graph artifacts — the production shape SURVEY §F1b
    * names: the item graph is DERIVED ONCE from the transaction log and
    * every analytic (components, ranks, cores, distances, similarity)
    * runs against that one artifact, exactly like the bm25/IVF store
    * pattern. Two artifacts matter for the iterative ops' plans:
    *
    *  - `coBi` / `supBi`: the symmetric directed edge view, REPARTITIONED
    *    BY `src` before the checkpoint. `localCheckpoint` preserves the
    *    physical `HashPartitioning` in the resulting `LogicalRDD`, so
    *    every one of an iterative op's rounds joins against an edge
    *    relation that is ALREADY distributed on the join key — the only
    *    per-round exchange left is the node-scale label/rank table and
    *    the post-partial-aggregate gather. Without this, each of
    *    graph_cc's 8 rounds re-shuffles the full edge set: 8 edge-scale
    *    exchanges replaced by 8 node-scale ones. This is precisely the
    *    GraphX/Pregel discipline (partition the immutable edge relation
    *    once, iterate moving only vertex state).
    *
    *  - `coOriented`: degree-oriented edges partitioned by `src`, so the
    *    adjacency-array build (`groupBy(src)`) and the first
    *    intersection join in [[closedTriads]] both run exchange-free.
    *
    * All frames are eagerly checkpointed (edge-/node-scale — orders of
    * magnitude smaller than the corpus) and held for the session, keyed
    * by dir; at 100 TB this is a persisted parquet graph store.
    */
  /** Store pieces build LAZILY and memoize independently — a query pays
    * only for the artifacts its own plan reads (graph_kcore never
    * triggers the triad build; graph_triangles never materializes the
    * support views). At sf1 the full build is ~110 s, the support-only
    * slice ~25 s — a monolithic artifact would bill the whole store to
    * whichever query arrives first.
    */
  private val pieceCache =
    scala.collection.concurrent.TrieMap[(String, String), DataFrame]()

  /** Artifact durability (r14): when `spark.graft.checkpointDir` is set,
    * shared artifacts use RELIABLE `Dataset.checkpoint` instead of
    * `localCheckpoint`. localCheckpoint blocks live in executor memory:
    * they die with their executor on a real cluster, and under
    * block-manager pressure they evict and force a mid-key lineage
    * recompute (the in-campaign graph_jaccard ×5 blowup). A reliable
    * checkpoint writes the materialized partitions once to the
    * configured directory and every later read streams from those files
    * — survives cache purges, storage sweeps and executor loss.
    * `Dataset.checkpoint` preserves the physical HashPartitioning in the
    * resulting LogicalRDD exactly like localCheckpoint, so the iterative
    * ops' exchange-free round joins are unchanged. The frame is persisted
    * across the two materialization jobs (count + checkpoint write) so
    * the artifact builds once, then released.
    */
  private def durable(s: SparkSession, build: => DataFrame): DataFrame = {
    // AQE OFF for the artifact materialization (only): under AQE the
    // checkpoint's physical plan reports UnknownPartitioning, so the
    // resulting LogicalRDD LOSES the HashPartitioning metadata the
    // repartition(src) paid for — and every iterative round then
    // re-exchanges the EDGE side (measured: graph_pagerank shuffled
    // 133 MB at sf0.1 for 5 rounds over a 25 MB edge set). With AQE off
    // during the one build job, the checkpointed artifact carries
    // HashPartitioning(src, spark.sql.shuffle.partitions) and each
    // round's join satisfies ENSURE_REQUIREMENTS on the edge side with
    // ZERO exchange — the GraphX "partition the immutable edge relation
    // once" discipline, now actually visible in the plan (guide §2.4).
    // Queries over the artifact still run with AQE on.
    val aqePrev = s.conf.get("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val ckpt = s.conf.get("spark.graft.checkpointDir", "")
      if (ckpt.isEmpty) graft.GraftSession.pin(build.localCheckpoint(eager = true))
      else {
        if (s.sparkContext.getCheckpointDir.isEmpty)
          s.sparkContext.setCheckpointDir(ckpt)
        val staged = build.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try staged.checkpoint(eager = true)
        finally { staged.unpersist(blocking = false); () }
      }
    } finally s.conf.set("spark.sql.adaptive.enabled", aqePrev)
  }

  private def piece(s: SparkSession, dir: String, name: String)
      (build: => DataFrame): DataFrame =
    pieceCache.getOrElseUpdate((dir, name), {
      graft.functions.GeoFunctions.register(s) // isect_sorted for the triad build
      durable(s, build)
    })

  /** A piece hash-partitioned on `key` with a SIZE-DERIVED partition
    * count: the build result is materialized once (AQE on), its byte
    * size estimated as rows × schema width, and the artifact re-written
    * as `repartition(⌈bytes / advisory⌉, key)` under the AQE-off
    * checkpoint so the HashPartitioning metadata survives into the
    * LogicalRDD. At sf0.1 the edge artifacts land in ONE partition
    * (single-task round stages, no 32-way scheduling tax); at cluster
    * scale the same rule yields hundreds of partitions of ~advisory
    * bytes each (`spark.graft.artifactAdvisoryBytes`, default 64 MB) —
    * scale-adaptive, never a constant tuned for either mode (guide §2.2,
    * round rules).
    */
  private def pieceKeyed(s: SparkSession, dir: String, name: String,
      key: String)(build: => DataFrame): DataFrame =
    pieceCache.getOrElseUpdate((dir, name), {
      graft.functions.GeoFunctions.register(s)
      val staged = build.localCheckpoint(eager = true)
      try {
        val width = staged.schema.map(_.dataType.defaultSize).sum + 8
        val bytes = staged.count() * width
        val advisory = s.conf.get("spark.graft.artifactAdvisoryBytes",
          (64L << 20).toString).toLong
        val n = math.max(1L, (bytes + advisory - 1) / advisory).toInt
        durable(s, staged.repartition(n, col(key)))
      } finally staged.unpersist(blocking = false)
    })

  /** Test hook: forget one directory's cached artifacts so the next
    * graph query rebuilds them under the current durability mode.
    */
  private[graft] def resetPieces(dir: String): Unit =
    pieceCache.keys.filter(_._1 == dir).foreach(pieceCache.remove)

  private def biOf(e: DataFrame): DataFrame =
    e.select(col("pa").as("src"), col("pb").as("dst"))
      .unionAll(e.select(col("pb"), col("pa")))

  private def coE(s: SparkSession, dir: String) =
    piece(s, dir, "co")(copurchaseEdges(s, dir))
  private def supE(s: SparkSession, dir: String) =
    piece(s, dir, "sup")(supportEdges(s, dir))
  private def coDegA(s: SparkSession, dir: String) =
    piece(s, dir, "coDeg")(degrees(coE(s, dir)))
  private def supDegA(s: SparkSession, dir: String) =
    piece(s, dir, "supDeg")(degrees(supE(s, dir)))
  private def coBiA(s: SparkSession, dir: String) =
    pieceKeyed(s, dir, "coBi", "src")(biOf(coE(s, dir)))

  /** Symmetric support-graph view WITH hop-weighted self-loops:
    * (src, dst, w) where real edges carry w=1 and every node carries a
    * (node, node, w=0) self-row. min-aggregating `f(src)+w` (or just
    * `f(src)`) by dst over this ONE artifact computes
    * `min over N(v) ∪ {v}` — which turns graph_cc's hash-min and
    * graph_bfs's min-plus rounds into SINGLE-REFERENCE recurrences: the
    * old `state JOIN messages` merge (the second reference that forced a
    * localCheckpoint barrier every round) is replaced by the self-loop
    * row carrying the state through the same aggregate. graph_lpa's
    * neighbor-only vote reads the `w = 1` slice (Filter preserves the
    * checkpointed HashPartitioning, so its round joins stay
    * exchange-free on the edge side).
    */
  private def supBiA(s: SparkSession, dir: String) =
    pieceKeyed(s, dir, "supBiW", "src") {
      val e = supE(s, dir)
      e.select(col("pa").as("src"), col("pb").as("dst"), lit(1L).as("w"))
        .unionAll(e.select(col("pb"), col("pa"), lit(1L)))
        .unionAll(supDegA(s, dir).select(col("node").as("src"),
          col("node").as("dst"), lit(0L).as("w")))
    }
  private def orientedA(s: SparkSession, dir: String) =
    pieceKeyed(s, dir, "oriented", "src")(
      orientedEdges(coE(s, dir), coDegA(s, dir)))
  // The triad table materializes ONCE: both triangle consumers reference
  // it 3× in a union — without a materialization point each branch would
  // re-run the intersection kernel (the old plans reused the
  // pre-intersection Exchange; the src-partitioned checkpoint removed
  // that Exchange, so the reuse point must be explicit now).
  private def triA(s: SparkSession, dir: String) =
    piece(s, dir, "tri")(closedTriads(orientedA(s, dir)))

  /** Degree-oriented edges: src = lower (deg, id) endpoint. The total
    * order makes every triangle have exactly one pivot and bounds
    * out-degree O(√m) even on power-law graphs.
    */
  private def orientedEdges(e: DataFrame, deg: DataFrame): DataFrame =
    e.join(deg.withColumnRenamed("node", "pa").withColumnRenamed("deg", "da")
        .hint("shuffle_hash"), "pa")
      .join(deg.withColumnRenamed("node", "pb").withColumnRenamed("deg", "db")
        .hint("shuffle_hash"), "pb")
      .select(
        when(col("da") < col("db") ||
             (col("da") === col("db") && col("pa") < col("pb")), col("pa"))
          .otherwise(col("pb")).as("src"),
        when(col("da") < col("db") ||
             (col("da") === col("db") && col("pa") < col("pb")), col("pb"))
          .otherwise(col("pa")).as("dst"))

  /** Closed triads: one row per oriented edge (src, dst) with the array
    * `ws` of third corners N⁺(src) ∩ N⁺(dst) — each (src, dst, w) is one
    * triangle, counted exactly once (src is its pivot). Intersection via
    * the `isect_sorted` merge-scan kernel over sorted out-neighbor
    * arrays (O(√m)-bounded by the orientation).
    */
  private def closedTriads(ed: DataFrame): DataFrame = {
    val adj = ed.groupBy(col("src").as("node"))
      .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
    ed.join(adj.withColumnRenamed("nbrs", "nu").hint("shuffle_hash"),
        col("src") === col("node"))
      .drop("node")
      .join(adj.withColumnRenamed("nbrs", "nv").hint("shuffle_hash"),
        col("dst") === col("node"))
      .select(col("src"), col("dst"),
        call_function("isect_sorted", col("nu"), col("nv")).as("ws"))
      .where(size(col("ws")) > 0)
  }

  def graphTriangles(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GeoFunctions.register(s)
    val tri = triA(s, dir)
    tri.select(col("src").as("node"), size(col("ws")).cast("long").as("c"))
      .unionAll(tri.select(col("dst"), size(col("ws")).cast("long")))
      .unionAll(tri.select(explode(col("ws")).as("node"), lit(1L)))
      .groupBy("node").agg(sum("c").as("n_tri"))
      .orderBy(col("n_tri").desc, col("node"))
      .limit(20)
      .select(col("node").as("part"), col("n_tri"))
  }

  /** 5-round fixed-point PageRank, top 20 by (rank desc, part asc).
    *
    * All arithmetic is integer: `r0 = S div N`,
    * `r' = (15·S) div (100·N) + (85 · Σ share) div 100` with
    * `share = r div deg`. N rides in as a broadcast 1-row aggregate, so
    * plan construction runs no job and the plan stays fully declarative.
    * Nodes with no in-edges can't occur (the graph is symmetric), but the
    * left join + coalesce keeps the recurrence total anyway.
    */
  /** PERSONALIZED PageRank from a deterministic seed set (nodes ≡ 0
    * mod 97): the same 5-round exact-integer recurrence as
    * [[graphPagerank]], but ALL teleport mass returns to the seeds —
    * `r0 = S div |seeds|` on seeds / 0 elsewhere,
    * `r' = seed·(15·S) div (100·|seeds|) + (85 · Σ share) div 100`.
    * The result ranks the graph by proximity to the seed set — the
    * similar-items / recommendation query a co-purchase graph exists
    * for, which global PageRank (uniform teleport) cannot answer.
    * Identical plan shape: per-round one edge-side exchange-free join
    * against the pinned src-partitioned view + one node-keyed merge;
    * seed membership is a scan-side predicate, never a join.
    */
  /** Round-invariant PageRank/PPR init table — one more shared node-scale
    * artifact: (node, deg) plus the uniform-teleport start/base
    * (`r0_pr`/`base_pr`) and the seed-teleport start/base
    * (`r0_ppr`/`base_ppr`, seeds ≡ 0 mod 97). Folding the two 1-row count
    * scalars and the per-node constants into ONE checkpointed frame lets
    * each rank round reference the ITERATED state exactly once (the
    * contribution join) and this table once (the merge) — so the whole
    * bounded recurrence stays a single linear plan with NO per-round
    * eager materialization: the per-round localCheckpoint barrier
    * (a blocking job + a node-frame block copy per round, r13 shape) is
    * gone, and all rounds pipeline inside one Spark job (guide §1.2/§2.4
    * — remove passes and barriers before tuning inside them).
    */
  private def prInitA(s: SparkSession, dir: String) =
    pieceKeyed(s, dir, "prInit", "node") {
      val deg = coDegA(s, dir)
      val nRow = deg.agg(count(lit(1)).as("nn"))
      val nsRow = deg.filter(col("node") % 97 === 0)
        .agg(count(lit(1)).as("ns"))
      deg.crossJoin(broadcast(nRow)).crossJoin(broadcast(nsRow))
        .select(col("node"), col("deg"),
          expr(s"${PrScale}L div nn").as("r0_pr"),
          expr(s"${15 * PrScale}L div (100L * nn)").as("base_pr"),
          when(col("node") % 97 === 0, expr(s"${PrScale}L div ns"))
            .otherwise(0L).as("r0_ppr"),
          when(col("node") % 97 === 0, expr(s"${15 * PrScale}L div (100L * ns)"))
            .otherwise(0L).as("base_ppr"))
    }

  /** The shared bounded-rank recurrence: `rounds` iterations of
    * `r' = base + (85·Σ_{u→v} r(u) div deg(u)) div 100` over the
    * src-partitioned edge artifact, starting from `r0`. The state frame
    * (node, deg, r) is referenced ONCE per round (the contribution join);
    * node set, deg and base re-enter from the invariant init artifact, so
    * the plan grows linearly in rounds and no round needs a
    * materialization barrier.
    */
  private def rankRounds(bi: DataFrame, init: DataFrame,
      r0: String, base: String, rounds: Int): DataFrame = {
    var ranks = init.select(col("node"), col("deg"), col(r0).as("r"))
    var round = 0
    while (round < rounds) {
      // shuffle_hash on the node-scale side: SMJ would SORT the
      // src-partitioned edge artifact every round; SHJ streams it and
      // builds the rank table per partition (guide §3.1)
      val contrib = bi
        .join(ranks.select(col("node").as("src"),
          expr("r div deg").as("share")).hint("shuffle_hash"), "src")
        .groupBy(col("dst").as("node")).agg(sum("share").as("sm"))
      ranks = init.select("node", "deg", base)
        .join(contrib.hint("shuffle_hash"), Seq("node"), "left")
        .withColumn("r",
          col(base) + expr("(85L * coalesce(sm, 0L)) div 100L"))
        .select("node", "deg", "r")
      round += 1
    }
    ranks
  }

  def graphPpr(s: SparkSession, dir: String): DataFrame =
    rankRounds(coBiA(s, dir), prInitA(s, dir), "r0_ppr", "base_ppr", PrRounds)
      .orderBy(col("r").desc, col("node"))
      .limit(20)
      .select(col("node").as("part"), col("r").as("ppr_fp"))

  def graphPagerank(s: SparkSession, dir: String): DataFrame =
    rankRounds(coBiA(s, dir), prInitA(s, dir), "r0_pr", "base_pr", PrRounds)
      .orderBy(col("r").desc, col("node"))
      .limit(20)
      .select(col("node").as("part"), col("r").as("pr_fp"))

  /** Hash-min label-propagation rounds for connected components. 8
    * rounds closes any graph of diameter ≤ 8 — this co-purchase graph's
    * diameter is 2-3 — and an unconverged label set is still
    * DETERMINISTIC (round k's labels are a pure function of round k−1),
    * so the oracle replays the same bounded iteration rather than a
    * convergence test. Production components runs alternate large-star/
    * small-star to collapse long paths in O(log n) rounds; the bounded
    * hash-min here is that loop's per-round shape.
    */
  val CcRounds = 8

  /** Co-purchase edges with SUPPORT ≥ 2 (the pair appears in at least
    * two distinct orders) — the classic market-basket noise floor. The
    * raw co-purchase graph is near-complete at this density (one giant
    * component, diameter 2), so the support cut is what gives the
    * component structure any meaning: one-off co-occurrences are noise,
    * repeated ones are signal. Same single `l_orderkey` self-join as
    * [[copurchaseEdges]], the distinct merely upgraded to a count.
    */
  private[graft] def supportEdges(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    li.as("a").join(li.as("b").hint("shuffle_hash"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("pa"), col("b.pk").as("pb"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
      .select("pa", "pb")
  }

  /** Connected components of the SUPPORT-≥2 co-purchase graph
    * (hash-min label propagation), top 20 by (size desc, component
    * asc). Component label = min node id reachable within [[CcRounds]]
    * hops.
    *
    * Per round: ONE node-keyed join (labels onto edge sources) + one
    * min-aggregate keyed by destination — the PageRank exchange shape
    * reused, every exchange node- or edge-scale. Lineage stays shallow
    * because rounds are bounded; a planet-scale deployment would
    * checkpoint between rounds.
    */
  def graphCc(s: SparkSession, dir: String): DataFrame = {
    // The edge set is the shared src-partitioned checkpoint WITH
    // SELF-LOOPS ([[supBiA]]): each round's join against it is
    // exchange-free on the edge side, and because the self-row carries
    // every node's own label through the min-aggregate,
    // `min over N(v) ∪ {v}` IS the old `least(lbl, min-neighbor)` merge
    // — the label frame is referenced exactly ONCE per round, the plan
    // grows linearly, and the per-round localCheckpoint barrier (one
    // blocking job + node-frame block copy per round) is gone: all 8
    // rounds pipeline inside one job (guide §1.2 — fix the number of
    // passes/barriers first). Equivalence: the graph is symmetric and
    // every node has a self-row, so each node appears as `dst` every
    // round and `min(lbl(u) : u ∈ N(v) ∪ {v})` equals
    // `least(lbl(v), coalesce(min-neighbor, lbl(v)))` row for row.
    val bi = supBiA(s, dir)
    var lbl = supDegA(s, dir).select(col("node"), col("node").as("lbl"))
    var round = 0
    while (round < CcRounds) {
      lbl = bi.join(lbl.select(col("node").as("src"), col("lbl"))
          .hint("shuffle_hash"), "src")
        .groupBy(col("dst").as("node")).agg(min("lbl").as("lbl"))
      round += 1
    }
    lbl.groupBy(col("lbl").as("comp")).agg(count(lit(1)).as("n_nodes"))
      .orderBy(desc("n_nodes"), asc("comp")).limit(20)
  }

  /** Rounds of frequency label propagation ([[graphLpa]]). Bounded like
    * [[CcRounds]]; LPA stabilizes in a handful of sweeps on sparse
    * graphs (Raghavan et al. 2007 report ~5).
    */
  val LpaRounds = 4

  /** LABEL-PROPAGATION community detection (Raghavan–Albert–Kumara
    * 2007) over the support graph — COMMUNITY structure, which
    * [[graphCc]]'s hash-min labels cannot see (components only say
    * "reachable", not "densely knit"): each round every node adopts its
    * neighbors' MOST FREQUENT label (ties → lowest label, the
    * deterministic tiebreak both engines replay), [[LpaRounds]] sweeps.
    * Output: top-20 communities by size with per-community intra-edge
    * count `e_c`, degree mass `d_c`, and the EXACT-integer modularity
    * numerator `q_num = 4m·e_c − d_c²` (Newman's Q·4m² — kept as a
    * numerator over the constant 4m² denominator because Q itself is a
    * ratio and a float Q diverges in the last ulp; q_num > 0 ⇔ the
    * community beats the random-graph null model). At ~1e12 edges the
    * products need DECIMAL(38) — the evt_anomaly convention.
    *
    * Scale shape: the per-round frequency vote is (dst, lbl)-keyed
    * partial aggregation + a dst window the following dst-keyed min
    * reuses — node-/edge-scale exchanges only, against the ONE
    * src-partitioned edge checkpoint every iterative op shares; rounds
    * checkpoint node-scale label frames (the [[graphCc]] discipline).
    * The census joins are label-keyed hash joins; the 1-row edge-count
    * scalar binds broadcast (the whitelisted NLJ shape).
    */
  def graphLpa(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Neighbor-only votes read the w=1 slice of the self-loop artifact
    // (Filter preserves the checkpointed src HashPartitioning). Every
    // node has ≥ 1 neighbor BY CONSTRUCTION (the node set is
    // degrees(edges)), so the vote aggregate emits a row for every node
    // and the old `coalesce(best, lbl)` fallback merge — the second
    // state reference that forced a per-round localCheckpoint barrier —
    // was provably dead: `lbl' = best` outright. The 4 rounds now
    // pipeline unmaterialized inside one job; only the FINAL label frame
    // (referenced 3× by the census joins below) gets one checkpoint.
    val bi = supBiA(s, dir).filter(col("w") === 1L)
    val deg = supDegA(s, dir)
    var lbl = deg.select(col("node"), col("node").as("lbl"))
    var round = 0
    while (round < LpaRounds) {
      val cnt = bi.join(lbl.select(col("node").as("src"), col("lbl"))
          .hint("shuffle_hash"), "src")
        .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("c"))
      lbl = cnt
        .withColumn("mx", max("c").over(Window.partitionBy("dst")))
        .filter(col("c") === col("mx"))
        .groupBy(col("dst").as("node")).agg(min("lbl").as("lbl"))
      round += 1
    }
    lbl = lbl.localCheckpoint(eager = true)
    val e = supE(s, dir)
    val intra = e
      .join(lbl.select(col("node").as("pa"), col("lbl").as("ca")), "pa")
      .join(lbl.select(col("node").as("pb"), col("lbl").as("cb")), "pb")
      .filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("comm")).agg(count(lit(1)).as("e_c"))
    val mass = lbl.join(deg, "node")
      .groupBy(col("lbl").as("comm"))
      .agg(count(lit(1)).as("n_nodes"), sum("deg").as("d_c"))
    val m = e.agg(count(lit(1)).as("m"))
    Dedup.releasing(
      mass.join(intra, Seq("comm"), "left")
        .withColumn("e_c", coalesce(col("e_c"), lit(0L)))
        .crossJoin(broadcast(m))
        .withColumn("q_num", expr("4 * m * e_c - d_c * d_c"))
        .select("comm", "n_nodes", "e_c", "d_c", "q_num")
        .orderBy(desc("n_nodes"), asc("comm")).limit(20),
      lbl)
  }

  /** Neighborhood Jaccard similarity per co-purchase edge — the classic
    * link-prediction / item-similarity feature: for each edge (a, b),
    * `jac_pm = ⌊1000·|N(a)∩N(b)| / |N(a)∪N(b)|⌋`, top 20 by
    * (jac_pm desc, pa, pb). Common-neighbor counts come FROM THE
    * TRIANGLE MACHINERY, not a per-edge full-adjacency intersection:
    * every triangle {u,v,w} credits each of its 3 edges with one shared
    * neighbor, so exploding [[closedTriads]] and aggregating by
    * canonical edge gives |N(a)∩N(b)| for every edge in triangle-scale
    * rows. A full-adjacency formulation would carry O(max-degree)
    * arrays — unbounded under power law — where the oriented arrays
    * here stay O(√m); the credit aggregate is output-inherent
    * (common-neighbor instances ARE triangle corners). Degrees join
    * from the node-scale degree table; union size by inclusion-
    * exclusion (da + db − common), division deferred to one integer
    * `div` per edge.
    */
  def graphJaccard(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GeoFunctions.register(s)
    val e = coE(s, dir)
    val deg = coDegA(s, dir)
    val tw = triA(s, dir)
      .select(col("src"), col("dst"), explode(col("ws")).as("w"))
    val credits = tw.select(least(col("src"), col("dst")).as("pa"),
        greatest(col("src"), col("dst")).as("pb"))
      .unionAll(tw.select(least(col("src"), col("w")),
        greatest(col("src"), col("w"))))
      .unionAll(tw.select(least(col("dst"), col("w")),
        greatest(col("dst"), col("w"))))
      .groupBy("pa", "pb").agg(count(lit(1)).as("common"))
    // shuffle_hash, not SMJ: every side is a derived frame (no stats for
    // broadcast planning), and at scale credits/deg are edge-/node-scale
    // — a hash exchange on the join key without the two sorts SMJ pays
    e.join(credits.hint("shuffle_hash"), Seq("pa", "pb"), "left")
      .na.fill(0L, Seq("common"))
      .join(deg.select(col("node").as("pa"), col("deg").as("da"))
        .hint("shuffle_hash"), "pa")
      .join(deg.select(col("node").as("pb"), col("deg").as("db"))
        .hint("shuffle_hash"), "pb")
      .select(col("pa"), col("pb"), col("common"), col("da"), col("db"),
        expr("(1000L * common) div (da + db - common)").as("jac_pm"))
      .orderBy(desc("jac_pm"), asc("pa"), asc("pb"))
      .limit(20)
  }

  /** k for the k-core peel and its bounded round count. 8 rounds peel
    * this graph to its fixed point (the round-8 row equals round 7's);
    * an unconverged peel is still deterministic — round k is a pure
    * function of round k−1 — so the oracle replays the same bounded
    * chain rather than a convergence test.
    */
  val KcoreK = 3
  val KcoreRounds = 8

  /** k-core decomposition by iterative peeling over the support graph:
    * each round drops every node whose CURRENT degree is < k, then the
    * edges touching it; the survivors after the fixed point are the
    * k-core (the standard density filter a recommender runs before
    * community detection — degree-1 tendrils and weak pairs peel away,
    * cores of mutually-supported items remain). Output: one row per
    * round `(round, n_nodes, n_edges)` — the peel trajectory, which
    * pins every intermediate state, not just the fixed point.
    *
    * Scale shape (r14, guide §1.2/§2.4): the peel iterates NODE-SCALE
    * state over the INVARIANT self-loop edge artifact — the pagerank
    * discipline — instead of rewriting (and checkpointing) the edge set
    * every round. State = (node, keep_r, deg_r) with
    * deg_r(v) = [keep_{r−1}(v)] · #{u ∈ N(v) : keep_{r−1}(u)} and
    * keep_r = keep_{r−1} ∧ deg_r ≥ k: ONE join of the w-tagged artifact
    * against the state (the w=0 self-row carries keep_{r−1}(v) through
    * the same aggregate the neighbors' w=1 rows ride), so each round is
    * one edge-keyed join + one aggregate — the old round paid a degree
    * aggregate plus TWO left-semi edge joins and checkpointed the
    * EDGE-scale survivor set. Census identities: n_nodes_r = |keep_r|,
    * and because every surviving edge is counted once from each end,
    * n_edges_r = Σ_v deg_{r+1}(v) div 2 — so the peel runs R+1 state
    * rounds and reads round r's edge count from round r+1's degrees.
    * Per-round state still checkpoints (it is read by the next round
    * AND two census aggregates), but the checkpointed frame is now
    * node-scale at any corpus size.
    */
  def graphKcore(s: SparkSession, dir: String): DataFrame = {
    val biW = supBiA(s, dir)
    val held = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var st = supDegA(s, dir).select(col("node"), lit(true).as("keep"))
    val states = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var round = 1
    while (round <= KcoreRounds + 1) {
      st = biW
        .join(st.select(col("node").as("src"), col("keep")).hint("shuffle_hash"),
          Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(
          sum(when(col("w") === 1 && col("keep"), 1L).otherwise(0L)).as("nbrk"),
          max(when(col("w") === 0, col("keep"))).as("selfk"))
        .select(col("node"),
          (col("selfk") && col("nbrk") >= KcoreK).as("keep"),
          when(col("selfk"), col("nbrk")).otherwise(0L).as("deg"))
        .localCheckpoint(eager = true)
      held += st
      states += st
      round += 1
    }
    val rows = (1 to KcoreRounds).map { r =>
      states(r - 1).filter(col("keep")).agg(count(lit(1)).as("n_nodes"))
        .crossJoin(states(r).agg(expr("sum(deg) div 2").as("n_edges")))
        .select(lit(r.toLong).as("round"), col("n_nodes"), col("n_edges"))
    }.reduce(_.unionByName(_))
    Dedup.releasing(rows.orderBy("round"), held.toSeq: _*)
  }

  /** Bounded BFS rounds (min-plus propagation reaches the 6-hop ball). */
  val BfsRounds = 6

  /** Multi-source BFS hop distance over the support graph — "how far is
    * every item from the promoted set" (seeds = parts with
    * `p_size = 50`), the reachability feature a curation pipeline
    * derives before boosting neighbors. Min-PLUS label propagation:
    * `hop' = min(hop, min_{u→v}(hop(u)) + 1)`, [[BfsRounds]] rounds —
    * the graph_cc exchange shape with min-label upgraded to
    * min-distance; unreached after the ball radius reports −1. All
    * integer, sentinel 999 for ∞, so the bounded chain replays exactly
    * in the oracle. Output: the hop histogram `(hop, n_nodes)`.
    *
    * Scale shape: seeds prune via one node-keyed left join; per round
    * one edge-keyed join + one min-aggregate, all support-graph-scale;
    * the edge set checkpoints once (every round joins it).
    */
  def graphBfs(s: SparkSession, dir: String): DataFrame = {
    val Inf = 999L
    val bi = supBiA(s, dir)
    val seeds = Tables.part(s, dir).filter(col("p_size") === 50)
      .select(col("p_partkey").as("node")).withColumn("z", lit(0L))
    var dist = supDegA(s, dir).select("node")
      .join(seeds, Seq("node"), "left")
      .select(col("node"), coalesce(col("z"), lit(Inf)).as("hop"))
    // Single-reference min-plus rounds over the self-loop edge artifact:
    // the w=0 self-row carries hop(v) through the same min-aggregate the
    // neighbors' hop+1 rides (w=1), so
    // `min(hop(u)+w : u ∈ N(v) ∪ {v})` equals the old
    // `least(hop, coalesce(min-neighbor, Inf)+1)` merge exactly — capped
    // at Inf after the aggregate (hop ≤ Inf always, so min-neighbor+1 ≤
    // Inf+1 and the old plan applied the same `least(..., Inf)`). One
    // state reference per round → linear plan, no per-round
    // localCheckpoint barrier, all 6 rounds in one pipelined job.
    var round = 0
    while (round < BfsRounds) {
      dist = bi.join(dist.select(col("node").as("src"), col("hop"))
          .hint("shuffle_hash"), "src")
        .groupBy(col("dst").as("node"))
        .agg(min(col("hop") + col("w")).as("hop"))
        .select(col("node"), least(col("hop"), lit(Inf)).as("hop"))
      round += 1
    }
    dist.select(when(col("hop") === Inf, lit(-1L)).otherwise(col("hop")).as("hop"))
      .groupBy("hop").agg(count(lit(1)).as("n_nodes"))
      .orderBy("hop")
  }

  /** Log2-binned DEGREE DISTRIBUTION of the support graph — the
    * power-law profile every graph pipeline inspects before choosing
    * partitioning/skew strategy. `length(bin(deg))` = ⌊log2 deg⌋+1 in
    * exact INTEGER arithmetic on both engines (a float `log2` flips at
    * exact powers of two). Reads the shared node-scale degree artifact;
    * one bounded aggregate, no corpus access.
    */
  def graphDegreeDist(s: SparkSession, dir: String): DataFrame =
    supDegA(s, dir)
      .withColumn("bucket", expr("CAST(length(bin(deg)) AS BIGINT)"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_nodes"), min("deg").as("min_deg"),
        max("deg").as("max_deg"), sum("deg").as("sum_deg"))
      .orderBy("bucket")

  /** Local CLUSTERING-coefficient profile of the co-purchase graph
    * (Watts & Strogatz 1998's C_v) — "how clique-like is each node's
    * neighborhood", the community-structure diagnostic next to the
    * degree distribution. Per node with deg ≥ 2:
    * `lcc_pm = ⌊2000·tri(v) / (deg·(deg−1))⌋`, histogrammed into 11
    * per-mille deciles `(bucket, n_nodes, sum_tri, sum_deg)`. Triangle
    * counts come from the SHARED triad artifact ([[closedTriads]] — the
    * O(√m)-bounded oriented enumeration), degrees from the shared
    * node-scale degree table; everything after the two store reads is
    * node-scale with one bounded aggregate. All integer — a float
    * 2t/(d(d−1)) would flip deciles at exact boundaries.
    */
  def graphClustering(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GeoFunctions.register(s)
    val tri = triA(s, dir)
    val cnt = tri.select(col("src").as("node"), size(col("ws")).cast("long").as("t"))
      .unionAll(tri.select(col("dst"), size(col("ws")).cast("long")))
      .unionAll(tri.select(explode(col("ws")).as("node"), lit(1L)))
      .groupBy("node").agg(sum("t").as("tri"))
    coDegA(s, dir).filter(col("deg") >= 2)
      .join(cnt.hint("shuffle_hash"), Seq("node"), "left")
      .na.fill(0L, Seq("tri"))
      .withColumn("bucket",
        expr("((2000L * tri) div (deg * (deg - 1L))) div 100L"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_nodes"), sum("tri").as("sum_tri"),
        sum("deg").as("sum_deg"))
      .orderBy("bucket")
  }

  /** Degree–degree MIXING MATRIX of the co-purchase graph (Newman 2002's
    * e_jk, log2-binned) — the assortativity profile: does a hub link to
    * hubs or to leaves? Per undirected edge, the sorted pair of endpoint
    * degree bins `(bl, bh)` with exact-integer moments
    * `(n_edges, Σ da·db, Σ min-deg, Σ max-deg)` — the full Pearson
    * assortativity is a closed form over these bins, but the binned
    * moments stay BIGINT-exact where the global 4m·Σjk − (Σj)² products
    * overflow int64 at planet scale. One edge-scale pass: two node-keyed
    * hash joins against the shared degree artifact, then a bounded
    * (≤ bins²) aggregate.
    */
  def graphAssortativity(s: SparkSession, dir: String): DataFrame = {
    val deg = coDegA(s, dir)
    coE(s, dir)
      .join(deg.select(col("node").as("pa"), col("deg").as("da"))
        .hint("shuffle_hash"), "pa")
      .join(deg.select(col("node").as("pb"), col("deg").as("db"))
        .hint("shuffle_hash"), "pb")
      .select(
        expr("CAST(least(length(bin(da)), length(bin(db))) AS BIGINT)").as("bl"),
        expr("CAST(greatest(length(bin(da)), length(bin(db))) AS BIGINT)").as("bh"),
        (col("da") * col("db")).as("jk"),
        least(col("da"), col("db")).as("dmin"),
        greatest(col("da"), col("db")).as("dmax"))
      .groupBy("bl", "bh")
      .agg(count(lit(1)).as("n_edges"), sum("jk").as("s_jk"),
        sum("dmin").as("s_min"), sum("dmax").as("s_max"))
      .orderBy("bl", "bh")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_lpa" -> (graphLpa _),
    "graph_clustering" -> (graphClustering _),
    "graph_assortativity" -> (graphAssortativity _),
    "graph_degree_dist" -> (graphDegreeDist _),
    "graph_kcore" -> (graphKcore _),
    "graph_bfs" -> (graphBfs _),
    "graph_triangles" -> (graphTriangles _),
    "graph_pagerank" -> (graphPagerank _),
    "graph_ppr" -> (graphPpr _),
    "graph_cc" -> (graphCc _),
    "graph_jaccard" -> (graphJaccard _))

  /** Shared oracle CTE prefix: the distinct co-purchase edge set. */
  private val edgeSql =
    """li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |e AS MATERIALIZED (
      |  SELECT DISTINCT a.pk AS pa, b.pk AS pb
      |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
      |bi AS MATERIALIZED (SELECT pa AS src, pb AS dst FROM e
      |                    UNION ALL SELECT pb, pa FROM e),
      |deg AS MATERIALIZED (SELECT src AS node, count(*) AS deg FROM bi GROUP BY 1)""".stripMargin

  /** Oracle triad CTE: the degree-oriented triangle enumeration shared by
    * graph_triangles and graph_clustering (same orientation rule as
    * [[orientedEdges]]/[[closedTriads]]).
    */
  private val triadSql =
    s"""$edgeSql,
       |ed AS MATERIALIZED (
       |  SELECT CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND pa < pb)
       |              THEN pa ELSE pb END AS src,
       |         CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND pa < pb)
       |              THEN pb ELSE pa END AS dst,
       |         CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND pa < pb)
       |              THEN db.deg ELSE da.deg END AS ddeg
       |  FROM e JOIN deg da ON da.node = pa JOIN deg db ON db.node = pb),
       |tri AS MATERIALIZED (
       |  SELECT e1.src AS u, e1.dst AS v, e2.dst AS w
       |  FROM ed e1
       |  JOIN ed e2 ON e1.src = e2.src
       |   AND ((e1.ddeg < e2.ddeg) OR (e1.ddeg = e2.ddeg AND e1.dst < e2.dst))
       |  JOIN ed e3 ON e3.src = e1.dst AND e3.dst = e2.dst),
       |corners AS (SELECT u AS node FROM tri
       |            UNION ALL SELECT v FROM tri
       |            UNION ALL SELECT w FROM tri)""".stripMargin

  private def ccRoundSql(k: Int): String =
    s"""l$k AS MATERIALIZED (
       |  SELECT p.node, least(p.lbl, coalesce(m.ml, p.lbl)) AS lbl
       |  FROM l${k - 1} p LEFT JOIN (
       |    SELECT bi.dst AS node, min(q.lbl) AS ml
       |    FROM bi JOIN l${k - 1} q ON q.node = bi.src GROUP BY 1) m
       |  USING (node))""".stripMargin

  private def prRoundSql(k: Int): String =
    s"""r$k AS MATERIALIZED (
       |  SELECT d.node, d.deg,
       |    CAST((15 * ${PrScale}::BIGINT) // (100 * (SELECT n FROM nn))
       |      + (85 * coalesce(s.sm, 0)) // 100 AS BIGINT) AS r
       |  FROM deg d LEFT JOIN (
       |    SELECT bi.dst AS node, sum(p.r // p.deg) AS sm
       |    FROM bi JOIN r${k - 1} p ON p.node = bi.src GROUP BY 1) s
       |  USING (node))""".stripMargin

  /** Personalized-PageRank oracle round: teleport mass returns only to
    * the mod-97 seed set (mirrors [[graphPpr]]'s recurrence exactly).
    */
  private def pprRoundSql(k: Int): String =
    s"""p$k AS MATERIALIZED (
       |  SELECT d.node, d.deg,
       |    CAST(CASE WHEN d.node % 97 = 0
       |           THEN (15 * ${PrScale}::BIGINT) // (100 * (SELECT n FROM ns))
       |           ELSE 0 END
       |      + (85 * coalesce(s.sm, 0)) // 100 AS BIGINT) AS r
       |  FROM deg d LEFT JOIN (
       |    SELECT bi.dst AS node, sum(p.r // p.deg) AS sm
       |    FROM bi JOIN p${k - 1} p ON p.node = bi.src GROUP BY 1) s
       |  USING (node))""".stripMargin

  /** Shared oracle CTE prefix: the SUPPORT-≥2 graph (mirrors graph_cc's). */
  private val supportSql =
    """li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |e0 AS MATERIALIZED (
      |  SELECT a.pk AS pa, b.pk AS pb
      |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY 1, 2 HAVING count(*) >= 2)""".stripMargin

  private def lpaRoundSql(k: Int): String =
    s"""c$k AS (SELECT bi.dst, q.lbl, count(*) AS c
       |  FROM bi JOIN p${k - 1} q ON q.node = bi.src GROUP BY 1, 2),
       |x$k AS (SELECT dst, lbl, c, max(c) OVER (PARTITION BY dst) AS mx
       |  FROM c$k),
       |b$k AS (SELECT dst AS node, min(lbl) AS best
       |  FROM x$k WHERE c = mx GROUP BY 1),
       |p$k AS MATERIALIZED (SELECT p.node, coalesce(b.best, p.lbl) AS lbl
       |  FROM p${k - 1} p LEFT JOIN b$k b USING (node))""".stripMargin

  private def kcoreRoundSql(k: Int): String =
    s"""k$k AS MATERIALIZED (
       |  SELECT node FROM (SELECT pa AS node FROM c${k - 1}
       |                    UNION ALL SELECT pb FROM c${k - 1})
       |  GROUP BY 1 HAVING count(*) >= $KcoreK),
       |c$k AS MATERIALIZED (
       |  SELECT pa, pb FROM c${k - 1}
       |  WHERE pa IN (SELECT node FROM k$k) AND pb IN (SELECT node FROM k$k))""".stripMargin

  private def bfsRoundSql(k: Int): String =
    s"""d$k AS MATERIALIZED (
       |  SELECT p.node, least(p.hop, coalesce(m.mh, 999) + 1, 999) AS hop
       |  FROM d${k - 1} p LEFT JOIN (
       |    SELECT bi.dst AS node, min(q.hop) AS mh
       |    FROM bi JOIN d${k - 1} q ON q.node = bi.src GROUP BY 1) m
       |  USING (node))""".stripMargin

  val oracles: Map[String, String] = Map(
    "graph_degree_dist" ->
      s"""WITH $supportSql,
         |sdeg AS (SELECT node, count(*) AS deg FROM (
         |    SELECT pa AS node FROM e0 UNION ALL SELECT pb FROM e0)
         |  GROUP BY 1)
         |SELECT CAST(length(bin(deg)) AS BIGINT) AS bucket,
         |  count(*) AS n_nodes, min(deg) AS min_deg, max(deg) AS max_deg,
         |  CAST(sum(deg) AS BIGINT) AS sum_deg
         |FROM sdeg GROUP BY 1 ORDER BY 1""".stripMargin,
    "graph_kcore" ->
      s"""WITH $supportSql,
         |c0 AS MATERIALIZED (SELECT pa, pb FROM e0),
         |${(1 to KcoreRounds).map(kcoreRoundSql).mkString(",\n")}
         |${(1 to KcoreRounds).map(k =>
           s"SELECT CAST($k AS BIGINT) AS round, " +
           s"(SELECT count(*) FROM k$k) AS n_nodes, " +
           s"(SELECT count(*) FROM c$k) AS n_edges").mkString("\nUNION ALL\n")}
         |ORDER BY round""".stripMargin,
    "graph_bfs" ->
      s"""WITH $supportSql,
         |bi AS MATERIALIZED (SELECT pa AS src, pb AS dst FROM e0
         |                    UNION ALL SELECT pb, pa FROM e0),
         |d0 AS MATERIALIZED (
         |  SELECT node,
         |    CASE WHEN node IN (SELECT p_partkey FROM part WHERE p_size = 50)
         |         THEN 0 ELSE 999 END AS hop
         |  FROM (SELECT DISTINCT src AS node FROM bi)),
         |${(1 to BfsRounds).map(bfsRoundSql).mkString(",\n")}
         |SELECT CAST(CASE WHEN hop = 999 THEN -1 ELSE hop END AS BIGINT) AS hop,
         |  count(*) AS n_nodes
         |FROM d$BfsRounds GROUP BY 1 ORDER BY 1""".stripMargin,
    "graph_triangles" ->
      s"""WITH $triadSql
         |SELECT node AS part, count(*) AS n_tri
         |FROM corners GROUP BY 1
         |ORDER BY n_tri DESC, part LIMIT 20""".stripMargin,
    "graph_clustering" ->
      s"""WITH $triadSql,
         |tc AS (SELECT node, count(*) AS tri FROM corners GROUP BY 1)
         |SELECT ((2000 * coalesce(tc.tri, 0)) // (d.deg * (d.deg - 1))) // 100
         |    AS bucket,
         |  count(*) AS n_nodes,
         |  CAST(sum(coalesce(tc.tri, 0)) AS BIGINT) AS sum_tri,
         |  CAST(sum(d.deg) AS BIGINT) AS sum_deg
         |FROM deg d LEFT JOIN tc ON tc.node = d.node
         |WHERE d.deg >= 2
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "graph_assortativity" ->
      s"""WITH $edgeSql,
         |j AS (
         |  SELECT least(length(bin(da.deg)), length(bin(db.deg))) AS bl,
         |    greatest(length(bin(da.deg)), length(bin(db.deg))) AS bh,
         |    da.deg * db.deg AS jk,
         |    least(da.deg, db.deg) AS dmin, greatest(da.deg, db.deg) AS dmax
         |  FROM e JOIN deg da ON da.node = pa JOIN deg db ON db.node = pb)
         |SELECT CAST(bl AS BIGINT) AS bl, CAST(bh AS BIGINT) AS bh,
         |  count(*) AS n_edges, CAST(sum(jk) AS BIGINT) AS s_jk,
         |  CAST(sum(dmin) AS BIGINT) AS s_min, CAST(sum(dmax) AS BIGINT) AS s_max
         |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "graph_lpa" ->
      s"""WITH li AS MATERIALIZED (
         |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         |e AS MATERIALIZED (
         |  SELECT a.pk AS pa, b.pk AS pb
         |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
         |  GROUP BY 1, 2 HAVING count(*) >= 2),
         |bi AS MATERIALIZED (SELECT pa AS src, pb AS dst FROM e
         |                    UNION ALL SELECT pb, pa FROM e),
         |deg AS MATERIALIZED (SELECT src AS node, count(*) AS deg FROM bi GROUP BY 1),
         |p0 AS MATERIALIZED (SELECT node, node AS lbl FROM deg),
         |${(1 to LpaRounds).map(lpaRoundSql).mkString(",\n")},
         |intra AS (SELECT la.lbl AS comm, count(*) AS e_c
         |  FROM e JOIN p$LpaRounds la ON la.node = e.pa
         |         JOIN p$LpaRounds lb ON lb.node = e.pb
         |  WHERE la.lbl = lb.lbl GROUP BY 1),
         |mass AS (SELECT p.lbl AS comm, count(*) AS n_nodes,
         |    CAST(sum(d.deg) AS BIGINT) AS d_c
         |  FROM p$LpaRounds p JOIN deg d USING (node) GROUP BY 1),
         |mm AS (SELECT count(*) AS m FROM e)
         |SELECT comm, n_nodes, CAST(coalesce(e_c, 0) AS BIGINT) AS e_c, d_c,
         |  CAST(4 * (SELECT m FROM mm) * coalesce(e_c, 0) - d_c * d_c
         |    AS BIGINT) AS q_num
         |FROM mass LEFT JOIN intra USING (comm)
         |ORDER BY n_nodes DESC, comm LIMIT 20""".stripMargin,
    "graph_cc" ->
      s"""WITH li AS MATERIALIZED (
         |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         |e AS MATERIALIZED (
         |  SELECT a.pk AS pa, b.pk AS pb
         |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
         |  GROUP BY 1, 2 HAVING count(*) >= 2),
         |bi AS MATERIALIZED (SELECT pa AS src, pb AS dst FROM e
         |                    UNION ALL SELECT pb, pa FROM e),
         |deg AS MATERIALIZED (SELECT src AS node, count(*) AS deg FROM bi GROUP BY 1),
         |l0 AS MATERIALIZED (SELECT node, node AS lbl FROM deg),
         |${(1 to CcRounds).map(ccRoundSql).mkString(",\n")}
         |SELECT lbl AS comp, count(*) AS n_nodes FROM l$CcRounds
         |GROUP BY 1 ORDER BY n_nodes DESC, comp LIMIT 20""".stripMargin,
    "graph_jaccard" ->
      s"""WITH $edgeSql,
         |common AS MATERIALIZED (
         |  SELECT e.pa, e.pb, count(*) AS c
         |  FROM e
         |  JOIN bi n1 ON n1.src = e.pa
         |  JOIN bi n2 ON n2.src = e.pb AND n2.dst = n1.dst
         |  GROUP BY 1, 2)
         |SELECT e.pa, e.pb,
         |  CAST(coalesce(c.c, 0) AS BIGINT) AS common,
         |  CAST(da.deg AS BIGINT) AS da, CAST(db.deg AS BIGINT) AS db,
         |  CAST((1000 * coalesce(c.c, 0))
         |    // (da.deg + db.deg - coalesce(c.c, 0)) AS BIGINT) AS jac_pm
         |FROM e LEFT JOIN common c ON c.pa = e.pa AND c.pb = e.pb
         |JOIN deg da ON da.node = e.pa JOIN deg db ON db.node = e.pb
         |ORDER BY jac_pm DESC, e.pa, e.pb LIMIT 20""".stripMargin,
    "graph_ppr" ->
      s"""WITH $edgeSql,
         |ns AS (SELECT count(*) AS n FROM deg WHERE node % 97 = 0),
         |p0 AS MATERIALIZED (
         |  SELECT node, deg,
         |    CAST(CASE WHEN node % 97 = 0
         |           THEN ${PrScale}::BIGINT // (SELECT n FROM ns)
         |           ELSE 0 END AS BIGINT) AS r
         |  FROM deg),
         |${(1 to PrRounds).map(pprRoundSql).mkString(",\n")}
         |SELECT node AS part, r AS ppr_fp FROM p$PrRounds
         |ORDER BY ppr_fp DESC, part LIMIT 20""".stripMargin,
    "graph_pagerank" ->
      s"""WITH $edgeSql,
         |nn AS (SELECT count(*) AS n FROM deg),
         |r0 AS MATERIALIZED (
         |  SELECT node, deg,
         |    CAST(${PrScale}::BIGINT // (SELECT n FROM nn) AS BIGINT) AS r
         |  FROM deg),
         |${(1 to PrRounds).map(prRoundSql).mkString(",\n")}
         |SELECT node AS part, r AS pr_fp FROM r$PrRounds
         |ORDER BY pr_fp DESC, part LIMIT 20""".stripMargin)
}
