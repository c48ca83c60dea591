package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Graph operators checked against INDEPENDENT formulations: triangles vs
  * a brute-force unoriented triple join, PageRank vs a driver-side exact
  * integer replay on the collected edge list.
  */
class GraphSpec extends SparkSpec {

  test("graph_triangles matches a brute-force unoriented triple join") {
    val e = Graph.copurchaseEdges(spark, sfDir).cache()
    // brute force: triangles are ordered triples a<b<c with all three edges
    // present in canonical (lo, hi) form — no degree orientation involved
    val ab = e.select(col("pa").as("a"), col("pb").as("b"))
    val bc = e.select(col("pa").as("b"), col("pb").as("c"))
    val ac = e.select(col("pa").as("a"), col("pb").as("c"))
    val tri = ab.join(bc, "b").join(ac, Seq("a", "c"))
    val expected = tri.select(col("a").as("node"))
      .unionAll(tri.select(col("b")))
      .unionAll(tri.select(col("c")))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
      .orderBy(col("n_tri").desc, col("node")).limit(20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val got = Graph.graphTriangles(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
    e.unpersist()
  }

  test("graph_pagerank matches a driver-side exact integer replay") {
    val edges = Graph.copurchaseEdges(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val bi = edges ++ edges.map { case (a, b) => (b, a) }
    val deg = bi.groupBy(_._1).map { case (n, es) => n -> es.length.toLong }
    val n = deg.size.toLong
    val s = Graph.PrScale
    val base = (15L * s) / (100L * n)
    var r: Map[Long, Long] = deg.map { case (node, _) => node -> s / n }
    for (_ <- 1 to Graph.PrRounds) {
      val shares = r.map { case (node, v) => node -> v / deg(node) }
      val in = bi.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(e => shares(e._1)).sum
      }
      r = r.map { case (node, _) =>
        node -> (base + (85L * in.getOrElse(node, 0L)) / 100L)
      }
    }
    val expected = r.toSeq.sortBy { case (node, v) => (-v, node) }.take(20)
    val got = Graph.graphPagerank(spark, sfDir)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(got == expected)
  }

  test("pagerank mass stays conserved up to floor-division loss") {
    val rows = Graph.graphPagerank(spark, sfDir).collect()
    assert(rows.length == 20)
    val vals = rows.map(_.getLong(1))
    assert(vals.sameElements(vals.sortBy(-_)), "ranks must be descending")
    // every rank is positive and below total mass
    assert(vals.forall(v => v > 0 && v < Graph.PrScale))
  }

  test("graph_cc matches an exact driver-side union-find on the support graph") {
    val edges = Graph.supportEdges(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // exact union-find (path compression), TRUE components — 8 hash-min
    // rounds must have converged on this graph for the spec to pass
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // component label = min member id (find-root after min-directed
    // unions IS the min member)
    val sizes = parent.keys.toSeq.groupBy(find).map { case (c, m) => c -> m.size.toLong }
    val expected = sizes.toSeq.sortBy { case (c, n) => (-n, c) }.take(20)
    val got = Graph.graphCc(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("graph_jaccard matches a brute-force common-neighbor count") {
    val edges = Graph.copurchaseEdges(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nbrs = (edges ++ edges.map { case (a, b) => (b, a) })
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    val expected = edges.map { case (a, b) =>
      val (na, nb) = (nbrs(a), nbrs(b))
      val c = (na & nb).size.toLong
      (a, b, c, na.size.toLong, nb.size.toLong,
        (1000L * c) / (na.size + nb.size - c))
    }.sortBy { case (a, b, _, _, _, j) => (-j, a, b) }.take(20).toSeq
    val got = Graph.graphJaccard(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
  }

  test("graph_kcore matches an exact driver-side peel") {
    var edges = Graph.supportEdges(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = (1 to Graph.KcoreRounds).map { round =>
      val deg = (edges.map(_._1) ++ edges.map(_._2))
        .groupBy(identity).map { case (n, xs) => n -> xs.size }
      val keep = deg.filter(_._2 >= Graph.KcoreK).keySet
      edges = edges.filter { case (a, b) => keep(a) && keep(b) }
      (round.toLong, keep.size.toLong, edges.size.toLong)
    }
    // the peel must have CONVERGED within the bounded rounds on this
    // graph — otherwise the "k-core" label on the last row is a lie
    assert(expected(Graph.KcoreRounds - 1)._3 == expected(Graph.KcoreRounds - 2)._3)
    val got = Graph.graphKcore(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("graph_bfs matches an exact driver-side BFS histogram") {
    val edges = Graph.supportEdges(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).toSet
    val seeds = graft.Tables.part(spark, sfDir)
      .filter(col("p_size") === 50).select("p_partkey")
      .collect().map(_.getLong(0)).toSet & nodes
    assert(seeds.nonEmpty, "test data must place at least one seed in the graph")
    val adj = (edges ++ edges.map { case (a, b) => (b, a) })
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2) }
    // true BFS; min-plus after R rounds is exact for dist <= R, -1 beyond
    val dist = scala.collection.mutable.Map.empty[Long, Long]
    var frontier = seeds
    var d = 0L
    while (frontier.nonEmpty) {
      frontier.foreach(dist(_) = d)
      frontier = frontier.flatMap(adj(_)).filterNot(dist.contains)
      d += 1
    }
    val expected = nodes.toSeq
      .map(n => dist.get(n).filter(_ <= Graph.BfsRounds).getOrElse(-1L))
      .groupBy(identity).map { case (h, xs) => (h, xs.size.toLong) }
      .toSeq.sorted
    val got = Graph.graphBfs(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("graph_lpa matches a driver-side exact replay") {
    val e = Graph.supportEdges(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val bi = e ++ e.map { case (a, b) => (b, a) }
    val deg = bi.groupBy(_._1).map { case (n, es) => n -> es.length.toLong }
    var lbl: Map[Long, Long] = deg.keys.map(n => n -> n).toMap
    for (_ <- 1 to Graph.LpaRounds) {
      val votes = bi.groupBy(_._2).map { case (dst, es) =>
        val cnt = es.map(x => lbl(x._1)).groupBy(identity)
          .map { case (l, xs) => (l, xs.size) }
        val mx = cnt.values.max
        dst -> cnt.collect { case (l, c) if c == mx => l }.min
      }
      lbl = lbl.map { case (n, l) => n -> votes.getOrElse(n, l) }
    }
    val m = e.length.toLong
    val intra = e.filter { case (a, b) => lbl(a) == lbl(b) }
      .groupBy { case (a, _) => lbl(a) }.map { case (c, es) => c -> es.length.toLong }
    val expected = lbl.toSeq.groupBy(_._2).map { case (c, ns) =>
      val dC = ns.map { case (n, _) => deg(n) }.sum
      val eC = intra.getOrElse(c, 0L)
      (c, ns.size.toLong, eC, dC, 4L * m * eC - dC * dC)
    }.toSeq.sortBy { case (c, n, _, _, _) => (-n, c) }.take(20)
    val got = Graph.graphLpa(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == expected)
  }

  test("reliable-checkpoint artifacts survive a simulated cache purge") {
    // the r14 durability option: with spark.graft.checkpointDir set, the
    // shared graph artifacts are RELIABLY checkpointed — after a full
    // cache purge (every cached plan dropped AND every persistent RDD
    // unpersisted, the eviction that forced r13's in-campaign
    // graph_jaccard lineage recompute, and the analog of losing an
    // executor's localCheckpoint blocks on a real cluster) a query over
    // the same artifacts must still answer, bit-identically, from the
    // checkpoint files
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt-spec")
    try {
      Graph.resetPieces(sfDir)
      spark.conf.set("spark.graft.checkpointDir", ckpt.toString)
      val a = Graph.graphJaccard(spark, sfDir).collect().toSeq
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      val b = Graph.graphJaccard(spark, sfDir).collect().toSeq
      assert(a === b)
      assert(a.nonEmpty)
    } finally {
      spark.conf.unset("spark.graft.checkpointDir")
      // later suites rebuild under the default localCheckpoint mode
      Graph.resetPieces(sfDir)
    }
  }

  test("isectSorted equals set intersection on seeded sorted arrays") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val a = Array.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong).distinct.sorted
      val b = Array.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong).distinct.sorted
      val got = graft.functions.VecKernels.isectSorted(a, b).toSeq
      val want = (a.toSet & b.toSet).toSeq.sorted
      assert(got == want, s"a=${a.toSeq} b=${b.toSeq}")
    }
  }
}
