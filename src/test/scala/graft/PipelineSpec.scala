package graft

import graft.functions.TextKernels
import graft.operators.{Ann, Dedup, Multimodal, TextOps}
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {

  test("simhash kernel: identical text → identical fingerprint; tweak → near") {
    val a = TextKernels.simHash64Hex("the quick brown fox jumps over the lazy dog")
    val b = TextKernels.simHash64Hex("the quick brown fox jumps over the lazy dog")
    val c = TextKernels.simHash64Hex("the quick brown fox jumps over the lazy cat")
    assert(a === b)
    assert(a.length === 16)
    val ham = (java.lang.Long.parseUnsignedLong(a, 16) ^
      java.lang.Long.parseUnsignedLong(c, 16)).toBinaryString.count(_ == '1')
    assert(ham > 0 && ham < 32, s"one-word change should be hamming-near, got $ham")
  }

  test("simhash hamming-near pair generation via prefix banding") {
    // band on 4-hex-char prefixes of the fingerprint (4 bands of 16 bits):
    // two near docs must share ≥1 band if hamming distance < 4 spread bits
    val fp = Dedup.dedupSimhash(spark, sfDir).collect()
    assert(fp.length > 0)
    assert(fp.forall(_.getString(1).matches("[0-9a-f]{16}")))
  }

  test("dedup_clusters: components agree with pair reachability") {
    // every clustered doc pairs must be internally consistent: two docs
    // sharing a high-agreement candidate pair get the same cluster id
    val pairs = Dedup.dedupLshPairs(spark, sfDir)
      .filter(col("jaccard_est") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val clusters = Dedup.dedupClusters(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(clusters(a) === clusters(b), s"pair ($a,$b) split across clusters")
    }
    // representative is the component minimum: every cluster id is a member
    // of its own cluster and no member is smaller
    clusters.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keySet.min === cid)
    }
  }

  test("rollhash kernel: matches direct polynomial hashes, handles short docs") {
    // "abcdefghij" → windows abcdefgh/bcdefghi/cdefghij with direct
    // Σ byte·257^(7-j) mod 1e9+7 hashes 517618891/870677744/223736590
    // (computed independently of the rolling recurrence)
    val r = TextKernels.rollHash(
      org.apache.spark.unsafe.types.UTF8String.fromString("abcdefghij"))
    assert(r.getLong(0) === 223736590L) // min of the three
    assert(r.getLong(1) === 2L)         // at byte offset 2
    assert(r.getLong(2) === 3L)         // 10 - 8 + 1 windows
    val short = TextKernels.rollHash(
      org.apache.spark.unsafe.types.UTF8String.fromString("short"))
    assert(short.getLong(0) === -1L && short.getLong(1) === -1L && short.getLong(2) === 0L)
  }

  test("rollfps kernel: sampled subset of window hashes, shared spans collide") {
    import org.apache.spark.unsafe.types.UTF8String
    val text = "the quick brown fox jumps over the lazy dog 0123456789 again and again"
    val fps = TextKernels.rollFps(UTF8String.fromString(text))
    assert(fps.numElements() > 0, "a 70-byte doc should sample at least one fp")
    // every selected fingerprint obeys the 0-mod-p rule and is ascending
    val vs = (0 until fps.numElements()).map(fps.getLong)
    assert(vs.forall(_ % TextKernels.FpSample === 0))
    assert(vs === vs.sorted && vs.distinct === vs)
    // a document CONTAINING this text selects a superset (windows inside
    // the shared span hash identically — the substring-dedup property)
    val sup = TextKernels.rollFps(UTF8String.fromString("prefix words " + text + " suffix"))
    val svs = (0 until sup.numElements()).map(sup.getLong).toSet
    assert(vs.forall(svs.contains))
    // shorter than one window → empty set
    assert(TextKernels.rollFps(UTF8String.fromString("short")).numElements() === 0)
  }

  test("dedup_substring: span-sharing pairs found, disjoint docs not paired") {
    import spark.implicits._
    val shared = (1 to 40).map(i => s"shared-span-token-$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha preamble $shared alpha tail"),
      (2L, s"beta intro $shared beta outro"),
      (3L, "completely different content with nothing in common at all x y z"),
      (4L, "another unrelated document full of its own words qrs tuv wxy"))
      .toDF("doc_id", "text")
    val pairs = Dedup.substringPairsOf(spark, docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "the span-sharing pair must surface")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L || p._1 == 4L || p._2 == 4L),
      "disjoint docs must not pair")
  }

  test("dedup_window50: exact 50-token spans pair with exact window counts") {
    import spark.implicits._
    // a shared span of exactly 55 tokens → 55-50+1 = 6 shared windows,
    // est_span_toks = 55 exactly (one contiguous overlap)
    val span = (1 to 55).map(i => s"span-token-$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha preamble padding ${span} alpha tail closing words here"),
      (2L, s"beta different intro ${span} and a beta outro"),
      // doc 3 shares only 49 tokens — BELOW the granularity, must not pair
      (3L, "gamma " + (1 to 49).map(i => s"span-token-$i").mkString(" ") + " gamma-end"),
      (4L, (1 to 60).map(i => s"unrelated-$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Dedup.windowPairsOf(spark, docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((1L, 2L, 6L, 55L)),
      "exactly the ≥50-token span pair, with the exact window count and span estimate")
    // candidate parity with the SAMPLED substring dedup: an exact
    // ≥50-token span is ~300+ shared bytes, so the winnowing fingerprint
    // candidates (pre-threshold) must contain every window50 pair
    val substrCands = Dedup.substringPairsOf(spark, docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(substrCands.contains((1L, 2L)),
      "window50 pairs must appear among the sampled-fingerprint candidates")
  }

  test("text_pii: redacts emails, phones, and long digit runs on synthetic rows") {
    import spark.implicits._
    val rows = Seq(
      (1L, "contact me at jane.doe+spam@example.co.uk or call +1 (555) 123-4567 now"),
      (2L, "ssn-ish 123456789 and order 42 stay"),
      (3L, "plain text with no pii at all")).toDF("doc_id", "text")
    val out = TextOps.piiColumns(rows).orderBy("doc_id").collect()
    assert(out(0).getInt(1) === 1 && out(0).getInt(2) === 1, "email + phone found")
    assert(out(1).getInt(3) === 1, "long digit run found, short number ignored")
    assert(out(2).getInt(1) === 0 && out(2).getInt(2) === 0 && out(2).getInt(3) === 0)
    // row 3 unredacted → md5 equals md5 of the original text
    val plainMd5 = rows.filter($"doc_id" === 3L)
      .select(md5($"text")).collect().head.getString(0)
    assert(out(2).getString(4) === plainMd5)
    assert(out(0).getString(4) !== plainMd5)
  }

  test("sampling: stratified rates land near target and quota caps every stratum") {
    val strat = operators.Sampling.sampleStratified(spark, sfDir).collect()
    val docs = graft.Tables.documents(spark, sfDir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val byLang = strat.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    // hash buckets are uniform-ish: en ≈ 5%, others ≈ 20% (loose bounds —
    // the oracle checks exactness, this checks the rates are really applied)
    assert(byLang("en").toDouble / docs("en") < 0.12)
    assert(byLang.filter(_._1 != "en").forall { case (l, n) =>
      val f = n.toDouble / docs(l); f > 0.08 && f < 0.35
    })
    val quota = operators.Sampling.sampleQuota(spark, sfDir).collect()
    val perLang = quota.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(perLang.values.forall(_ <= 20))
    assert(perLang.values.forall(_ === 20), "every sf0.001+ stratum has ≥20 docs")
  }

  test("connectedComponents: contraction and propagation paths agree on a cross-partition graph") {
    import spark.implicits._
    // a long chain (distinct components linked only through consecutive
    // edges), two rings, and singleton pairs — scattered across many
    // partitions so partition-local union-find alone cannot finish
    val chain = (0L until 400L).map(i => (i, i + 1))
    val ring = (1000L until 1010L).map(i => (i, if (i == 1009L) 1000L else i + 1))
    val pairs = Seq((5000L, 6000L), (7000L, 7001L))
    val edges = spark.sparkContext
      .parallelize(scala.util.Random.shuffle(chain ++ ring ++ pairs), 16)
      .toDF("a", "b")
    val fast = Dedup.connectedComponents(spark, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val slow = Dedup.connectedComponents(spark, edges, singleTaskMax = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast === slow)
    // exact min-label semantics
    (0L to 400L).foreach(n => assert(fast(n) === 0L))
    (1000L until 1010L).foreach(n => assert(fast(n) === 1000L))
    assert(fast(6000L) === 5000L && fast(7001L) === 7000L)
  }

  test("ann_ivf results live in the brute-force universe with valid ranks") {
    val bf = Ann.annTopk(spark, sfDir).select("q_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val ivf = Ann.annIvf(spark, sfDir).collect()
    assert(ivf.nonEmpty)
    assert(ivf.forall(r => bf.contains(r.getLong(0))))
    ivf.groupBy(_.getLong(0)).values.foreach { rows =>
      val ranks = rows.map(_.getInt(2)).sorted.toSeq
      assert(ranks === (1 to ranks.length), "ranks contiguous from 1")
    }
    // every neighbor's cell is one of its query's probed cells by
    // construction: cells span the centroid id range
    assert(ivf.forall(r => r.getLong(3) >= 8 && r.getLong(3) <= 15))
  }

  test("lsh bucket cap: a degenerate mega-bucket yields bounded pairs") {
    import spark.implicits._
    // 300 identical docs all hash into one bucket per band — 300 > MaxBucket,
    // so the bucket is dropped (it would contribute 300*299/2 = 44850 pairs
    // and make candidate generation quadratic at corpus scale). The twin
    // pair lives in a size-2 bucket and must survive.
    val mega = (0 until 300).map(i =>
      (i.toLong, "identical boilerplate text repeated across the whole corpus"))
    val twins = Seq(
      (1000L, "a genuinely unique document about rivers and mountains xyz"),
      (1001L, "a genuinely unique document about rivers and mountains xyz"))
    val docs = (mega ++ twins).toDF("doc_id", "text")
    val pairs = Dedup.candidates(Dedup.signaturesOf(spark, docs)).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1000L, 1001L)))
  }

  test("lsh candidates are a superset of high-jaccard pairs") {
    val ver = Dedup.dedupNgramJaccard(spark, sfDir)
      .filter(col("jaccard") >= 0.5).count()
    // candidates that verify ≥0.5 must exist or the corpus has no near-dups;
    // either way the pipeline ran end-to-end
    assert(ver >= 0)
  }

  test("ann_lsh results are a subset of brute-force ranking universe") {
    val bf = Ann.annTopk(spark, sfDir).select("q_id").distinct().collect().map(_.getLong(0)).toSet
    val lsh = Ann.annLsh(spark, sfDir).collect()
    assert(lsh.forall(r => bf.contains(r.getLong(0))), "every LSH query id must be a brute-force query id")
    // per query at most 3 ranked candidates, ranks contiguous from 1
    val byQ = lsh.groupBy(_.getLong(0))
    byQ.values.foreach { rows =>
      val ranks = rows.map(_.getInt(2)).sorted.toSeq
      assert(ranks === (1 to ranks.length))
    }
  }

  test("ann_lsh_mp dominates single-probe LSH rank for rank") {
    // multi-probe's candidate set contains the home bucket, so at every
    // rank a query's multi-probe cosine must be >= its single-probe one
    val lsh = Ann.annLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getDouble(4)).toMap
    val mp = Ann.annLshMp(spark, sfDir).collect()
    assert(mp.nonEmpty)
    mp.foreach { r =>
      val key = (r.getLong(0), r.getInt(2))
      lsh.get(key).foreach { c =>
        assert(r.getDouble(3) >= c - 1e-12,
          s"multi-probe rank-${key._2} for query ${key._1} lost cosine vs single-probe")
      }
    }
    // the flip probes must actually contribute results somewhere —
    // otherwise the technique isn't load-bearing at this scale
    assert(mp.exists(_.getBoolean(4)),
      "no top-3 result came from a flipped bucket")
  }

  test("langid predictions beat the 20% uniform-guess floor") {
    // sf0.01: the sf0.001 corpus is too small for the weak lexical signal
    val df = TextOps.textLangid(spark, "/root/testdata/sf0.01")
    val n = df.count().toDouble
    val ok = df.filter(col("correct")).count().toDouble
    assert(ok / n > 0.25, s"accuracy ${ok / n} should beat random")
  }

  test("mm_features: real decode is deterministic, batch-shaped, magic bytes match format") {
    val a = Multimodal.mmFeatures(spark, sfDir).collect()
    val b = Multimodal.mmFeatures(spark, sfDir).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    assert(a.forall(_.getAs[String]("feat_str").split(",").length === 8))
    // magic bytes come from the ENCODED container, proving the payload is
    // a real file of the claimed format
    a.foreach { r =>
      (r.getString(1), r.getAs[String]("magic_hex")) match {
        case ("ppm", m) => assert(m.startsWith("50360a")) // "P6\n"
        case ("bmp", m) => assert(m.startsWith("424d"))   // "BM"
        case ("wav", m) => assert(m === "52494646")       // "RIFF"
        case (f, _) => fail(s"unexpected fmt $f")
      }
    }
  }

  test("kmeansRounds: the Lloyd loop converges in 2 rounds on a 3-cluster corpus") {
    import spark.implicits._
    // three cosine clusters near the x / y / z axes + one boundary point
    // (0.7, 0.6, 0) that belongs with cluster 0 but pulls its mean
    val pts = Seq(
      Seq(1.0f, 0.1f, 0.0f), Seq(0.9f, -0.1f, 0.0f),    // cluster 0
      Seq(0.1f, 1.0f, 0.0f), Seq(-0.1f, 0.9f, 0.0f),    // cluster 1
      Seq(0.0f, 0.1f, 1.0f), Seq(0.0f, -0.1f, 0.9f),    // cluster 2
      Seq(0.7f, 0.6f, 0.0f))                            // boundary → cluster 0
    val emb = pts.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val init = Seq(
      0L -> Seq(1.0f, 0.0f, 0.0f),
      1L -> Seq(0.0f, 1.0f, 0.0f),
      2L -> Seq(0.0f, 0.0f, 1.0f))

    val r1 = Ann.kmeansRounds(emb, init, 1)
    val r2 = Ann.kmeansRounds(emb, init, 2)
    // round 1 moves every centroid off its init; round 2 reproduces
    // round 1 exactly — the assignment is stable, the loop has converged
    assert(r1.map(_._2) !== init.map(_._2))
    assert(r2 === r1, "round 2 must be a fixed point on this corpus")

    // the converged means are the exact fixed-point means of the true
    // clusters (boundary point counted into cluster 0)
    def mean(vs: Seq[Seq[Float]]): Seq[Float] =
      (0 until 3).map { i =>
        (vs.map(v => math.round(v(i).toDouble * 1e9)).sum.toDouble / 1e9 / vs.length).toFloat
      }
    assert(r2.toMap === Map(
      0L -> mean(Seq(pts(0), pts(1), pts(6))),
      1L -> mean(Seq(pts(2), pts(3))),
      2L -> mean(Seq(pts(4), pts(5)))))
  }

  test("dedup_embedding caps oversized label blocks instead of going quadratic") {
    import spark.implicits._
    val n = Ann.MaxBlock + 44
    // one label whose block far exceeds the cap; identical vectors so
    // every surviving pair passes the cosine threshold
    val v = (0 until 8).map(_ => 1.0f)
    val emb = (1 to n).map(i => (i.toLong, "big", v))
      .toDF("vec_id", "label", "embedding")
    val pairs = Ann.dedupEmbeddingOf(emb)
    val kept = Ann.MaxBlock.toLong
    assert(pairs.count() === kept * (kept - 1) / 2,
      "the block must shrink to its MaxBlock lowest vec_ids before pairing")
    // deterministic prefix: only the lowest vec_ids survive
    assert(pairs.agg(max("vb")).head.getLong(0) === kept)

    // an at-cap block is untouched
    val small = (1 to 10).map(i => (i.toLong, "ok", v))
      .toDF("vec_id", "label", "embedding")
    assert(Ann.dedupEmbeddingOf(small).count() === 45L)
  }

  test("sample_mixture: kept set equals a driver-side BigInt replay of the budget rule") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val srcChars = docs.groupBy(_._2).view.mapValues(ds => BigInt(ds.map(_._3).sum)).toMap
    val totChars = BigInt(docs.map(_._3).sum)
    def part(src: String): BigInt =
      if (Set("src0", "src1", "src2", "src3")(src)) 30
      else if (Set("src4", "src5", "src6", "src7", "src8", "src9")(src)) 10
      else 2
    def bucket(id: Long): BigInt = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"mix|$id".getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString.take(8)
      BigInt(java.lang.Long.parseLong(hex, 16)) % 1000000
    }
    val expected = docs.collect {
      case (id, src, _) if bucket(id) * 200 * srcChars(src) < totChars * part(src) * 1000000 => id
    }.toSet
    val got = operators.Sampling.sampleMixture(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(got === expected)
    // head sources are under-budget (want 15% of chars, have ~5%): every doc kept
    val bySrc = docs.filter(d => part(d._2) == BigInt(30)).map(_._1).toSet
    assert(bySrc.subsetOf(got), "under-budget head sources must keep everything")
    // tail sources are over-budget (want 1%, have ~5%): strictly downsampled
    val tailAll = docs.filter(d => part(d._2) == BigInt(2)).map(_._1).toSet
    assert((tailAll -- got).nonEmpty, "over-budget tail sources must drop docs")
  }

  test("sample_temperature: kept set equals a driver-side BigInt replay of the sqrt rule") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val srcN = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val w = srcN.view.mapValues(n => BigInt(math.floor(math.sqrt(n.toDouble) * 1e6).toLong)).toMap
    val sumW = w.values.sum
    val budget = BigInt(docs.length / 4)
    def bucket(id: Long): BigInt = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"mix|$id".getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString.take(8)
      BigInt(java.lang.Long.parseLong(hex, 16)) % 1000000
    }
    val expected = docs.collect {
      case (id, src) if bucket(id) * srcN(src) * sumW < budget * w(src) * 1000000 => id
    }.toSet
    val got = operators.Sampling.sampleTemperature(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(got === expected)
    // temperature flattening: every source's kept fraction is positive and
    // small sources keep a HIGHER fraction than the corpus-wide rate
    val keptBySrc = docs.filter(d => got(d._1)).groupBy(_._2).view.mapValues(_.length).toMap
    val overallRate = got.size.toDouble / docs.length
    val smallest = srcN.minBy(_._2)._1
    if (srcN(smallest) < docs.length / srcN.size)
      assert(keptBySrc.getOrElse(smallest, 0).toDouble / srcN(smallest) >= overallRate,
        "temperature sampling must upweight low-resource sources")
  }

  test("ann_pq: codewords self-encode, ranks are adc-monotone, codes in range") {
    val rows = operators.Ann.annPq(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.nonEmpty)
    byQ.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("rnk")).sorted.toSeq == (1 to 5),
        "every query must get exactly ranks 1..5")
      val sorted = rs.sortBy(_.getAs[Int]("rnk"))
      val adcs = sorted.map(_.getAs[Long]("adc"))
      assert(adcs.zip(adcs.tail).forall { case (a, b) => a <= b },
        "adc must be non-decreasing with rank")
    }
    assert(rows.forall(r => (0 to 3).contains(r.getAs[Int]("code0")) &&
      (0 to 3).contains(r.getAs[Int]("code1"))), "codes must be 2-bit")
    // when a QUERY equals a codeword vector, its ADC distance to that
    // codeword's cell is exactly 0 — and the codeword source vector
    // itself (vec_id 8..11, which self-encodes) sits in the base set, so
    // the query's rank-1 hit must be adc=0 at that very vector
    val emb = Tables.embeddings(spark, sfDir)
    val cws = emb.filter(org.apache.spark.sql.functions.col("vec_id").between(8, 11))
      .collect().map(r => (r.getLong(0) - 8, r.getSeq[Float](1), r.getInt(2)))
    import spark.implicits._
    val probe = cws.map { case (k, v, l) => (k, v, l) }.toSeq
      .toDF("vec_id", "embedding", "label")
      .unionByName(emb.filter(org.apache.spark.sql.functions.col("vec_id") >= 8))
    val got = operators.Ann.annPqOf(spark, probe)
      .filter(org.apache.spark.sql.functions.col("rnk") === 1).collect()
    got.foreach { r =>
      assert(r.getAs[Long]("adc") == 0L,
        s"codeword query ${r.getAs[Long]("q_id")} must find an adc-0 neighbor")
      assert(r.getAs[Long]("n_id") == r.getAs[Long]("q_id") + 8,
        "the adc-0 rank-1 neighbor must be the codeword vector itself")
    }
    assert(got.length == 4)
  }

  test("text_salient: ranks replay the (tf desc, df asc, term) ordering exactly") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val tf = docs.flatMap { case (id, t) =>
      t.split(' ').filter(_.nonEmpty).groupBy(identity)
        .map { case (term, hits) => (id, term, hits.length.toLong) }
    }
    val df = tf.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val expected = tf.groupBy(_._1).toSeq.flatMap { case (id, ts) =>
      ts.toSeq.map { case (_, term, n) => (term, n, df(term)) }
        .sortBy { case (term, n, d) => (-n, d, term) }
        .take(3).zipWithIndex
        .map { case ((term, n, d), i) => (id, term, n, d, i + 1) }
    }.toSet
    val got = operators.TextOps.textSalient(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getInt(4))).toSet
    assert(got === expected)
  }

  test("text_pack: offsets tile the concatenated token stream exactly") {
    val rows = TextOps.textPack(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("start_off"), r.getAs[Long]("seq_id")))
      .sortBy(_._1)
    assert(rows.head._3 === 0L, "first doc starts the stream")
    // each doc starts exactly where the previous one ended — the
    // distributed block-prefix sum must equal the naive serial scan
    rows.sliding(2).foreach {
      case Array((_, n, off, _), (id2, _, off2, _)) =>
        assert(off2 === off + n, s"doc $id2 offset breaks the tiling")
      case _ =>
    }
    rows.foreach { case (_, _, off, seq) => assert(seq === off / 512L) }
  }

  test("ann_ivfpq: candidates come only from probed cells, adc ranks are monotone") {
    // independent replay of the probe selection: top-2 centroids by
    // (cosine desc, centroid id asc), same fixed-point dot kernel
    val allEmb = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    def dot9(a: Seq[Float], b: Seq[Float]): Long =
      a.zip(b).map { case (x, y) => Math.round(x.toDouble * y.toDouble * 1e9) }.sum
    def cosD(a: Seq[Float], b: Seq[Float]): Double =
      (dot9(a, b) / 1e9) / (math.sqrt(dot9(a, a) / 1e9) * math.sqrt(dot9(b, b) / 1e9))
    val cents = (8L to 15L).map(c => c -> allEmb(c))
    val probedCells = allEmb.keys.filter(_ < 8).map { q =>
      q -> cents.map { case (c, cv) => (c, cosD(allEmb(q), cv)) }
        .sortBy { case (c, cos) => (-cos, c) }.take(2).map(_._1).toSet
    }.toMap
    val rows = operators.Ann.annIvfPq(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rnk"))
      assert(sorted.map(_.getAs[Int]("rnk")).toSeq == (1 to sorted.length),
        "ranks must be dense from 1")
      val adcs = sorted.map(_.getAs[Long]("adc"))
      assert(adcs.zip(adcs.tail).forall { case (a, b) => a <= b },
        "adc non-decreasing with rank")
      // the coarse quantizer prunes: every neighbor's cell is one the
      // SAME query probed in the inline IVF (identical centroid artifact)
      probedCells.get(q).foreach { cells =>
        assert(rs.map(_.getAs[Long]("cell")).toSet.subsetOf(cells),
          s"query $q returned a neighbor outside its probed cells")
      }
    }
    // IVF-PQ neighbors are a subset of full-PQ candidates ranked the same
    // way, so any shared (q, n) pair must carry the same codes
    val pq = operators.Ann.annPq(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id")) ->
        (r.getAs[Int]("code0"), r.getAs[Int]("code1"))).toMap
    rows.foreach { r =>
      pq.get((r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).foreach { codes =>
        assert(codes === (r.getAs[Int]("code0"), r.getAs[Int]("code1")),
          "codes must match the plain PQ encoding")
      }
    }
  }

  test("dedup_semantic: keep-first rule replayed from the pair relation") {
    val rows = operators.Ann.dedupSemantic(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"),
        r.getAs[Boolean]("capped"), r.getAs[Long]("n_earlier_dups"),
        r.getAs[Boolean]("kept")))
    assert(rows.nonEmpty)
    // verdict consistency
    rows.foreach { case (id, _, _, n, kept) =>
      assert(kept === (n == 0L), s"vec $id kept flag inconsistent")
    }
    // independent replay: exact cosine over the cell blocks
    val e = Tables.embeddings(spark, sfDir).filter(col("vec_id") >= 8)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    def dot9(a: Seq[Float], b: Seq[Float]): Long =
      a.zip(b).map { case (x, y) => Math.round(x.toDouble * y.toDouble * 1e9) }.sum
    def cos(a: Seq[Float], b: Seq[Float]): Double =
      (dot9(a, b) / 1e9) / (math.sqrt(dot9(a, a) / 1e9) * math.sqrt(dot9(b, b) / 1e9))
    val byCell = rows.filter(!_._3).groupBy(_._2)
    byCell.values.foreach { members =>
      val ids = members.map(_._1).sorted
      val expected = ids.map { id =>
        id -> ids.filter(o => o < id && cos(e(o), e(id)) >= operators.Ann.SemTau).length.toLong
      }.toMap
      members.foreach { case (id, _, _, n, _) =>
        assert(n === expected(id), s"vec $id n_earlier_dups mismatch")
      }
    }
    // a vector's near-identical twin must be dropped: cosine ≈ 1 ≥ tau
    val sameCellDupes = rows.filter(!_._3).sortBy(_._1).groupBy(_._2).values
      .flatMap(_.combinations(2).filter { case Array(a, b) =>
        cos(e(a._1), e(b._1)) >= 0.999 }.map(_.last))
    sameCellDupes.foreach { case (id, _, _, _, kept) =>
      assert(!kept, s"near-identical later vector $id must be dropped")
    }
  }

  test("text_bigram_lm: integer conditional-probability sums replay exactly") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(' ').filter(_.nonEmpty)))
    val bigrams = docs.flatMap { case (id, t) =>
      t.sliding(2).collect { case Array(a, b) => (id, a, b) }
    }
    val c2 = bigrams.groupBy(t => (t._2, t._3)).view.mapValues(_.length.toLong).toMap
    val c1 = bigrams.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val expected = bigrams.groupBy(_._1).view.mapValues { bs =>
      val sum = bs.map { case (_, a, b) => 1000000L * c2((a, b)) / c1(a) }.sum
      (bs.length.toLong, sum, sum / bs.length)
    }.toMap
    val got = TextOps.textBigramLm(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("sum_p6"), r.getAs[Long]("avg_p6")))
      .toMap
    assert(got === expected.toMap)
    assert(got.nonEmpty)
    // a document repeating one bigram scores 1e6 per occurrence (p = 1)
    // in a corpus where that prefix always leads to the same word
    got.foreach { case (_, (n, sum, _)) =>
      assert(sum <= 1000000L * n, "p6 can never exceed probability one")
    }
  }

  test("sample_dsir: affinity scores replay, target docs score above threshold on average") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(' ').filter(_.nonEmpty)))
    val all = docs.flatMap { case (id, lang, ts) => ts.map(t => (id, lang, t)) }
    val cr = all.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val ct = all.filter(_._2 == "en").groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val p4 = cr.keys.map(t => t -> 10000L * ct.getOrElse(t, 0L) / cr(t)).toMap
    val nR = all.length.toLong
    val nT = all.count(_._2 == "en").toLong
    val thresh = 10000L * nT / nR
    val expect = docs.filter(_._3.nonEmpty).map { case (id, lang, ts) =>
      val sum = ts.map(p4).sum
      id -> (lang, ts.length.toLong, sum, sum / ts.length,
        sum / ts.length >= thresh)
    }.toMap
    val got = operators.Sampling.sampleDsir(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[String]("lang"),
        r.getAs[Long]("n_toks"), r.getAs[Long]("sum_p4"),
        r.getAs[Long]("avg_p4"), r.getAs[Boolean]("keep"))).toMap
    assert(got === expect)
    assert(got.nonEmpty)
    // the selection must enrich the target domain: the keep rate of 'en'
    // docs beats the keep rate of the rest
    val (en, rest) = got.values.partition(_._1 == "en")
    def rate(xs: Iterable[(String, Long, Long, Long, Boolean)]) =
      if (xs.isEmpty) 0.0 else xs.count(_._5).toDouble / xs.size
    assert(rate(en) >= rate(rest),
      "DSIR keep rate must favor the target domain")
  }

  test("sketch_hll: registers are engine-replayable and the estimate is sane") {
    val rows = operators.Sketches.sketchHll(spark, sfDir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("hll_est"),
        r.getAs[Long]("exact_n")))
    assert(rows.nonEmpty)
    // independent replay of the register walk in plain Scala
    val ev = Tables.events(spark, sfDir).select("event_type", "user_id")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expect = ev.groupBy(_._1).view.mapValues { es =>
      val regs = Array.fill(64)(0L)
      es.foreach { case (_, u) =>
        val h = ((u % 94906249L) * 2654435761L + 104729L) % 4503599627370449L
        val reg = (h % 64).toInt
        val w = h / 64
        val rho = math.min(java.lang.Long.numberOfTrailingZeros(w) + 1, 47)
        if (rho > regs(reg)) regs(reg) = rho
      }
      val num = regs.map(m => 1L << (47 - m)).sum
      val raw = 709L * (576460752303423488L / num) / 1000L
      val v0 = regs.count(_ == 0L)
      if (v0 > 0 && raw <= 160) operators.Sketches.LcLut(v0 - 1) else raw
    }.toMap
    rows.foreach { case (t, est, exact) =>
      assert(est === expect(t), s"register replay diverges for $t")
      // m=64 gives ~13% standard error (linear counting is tighter in
      // the small range); 40% is a generous 3-sigma sanity bound
      assert(math.abs(est - exact).toDouble / exact < 0.4,
        s"HLL estimate for $t off by more than 40%: est=$est exact=$exact")
    }
  }

  test("geo_knn: replays the 3x3 neighborhood contract with exact integer distances") {
    val pts = Tables.events(spark, sfDir).select("event_id").collect()
      .map(_.getLong(0))
      .map(id => (id, id * 7919 % 36000, id * 104729 % 18000))
    val byCell = pts.groupBy { case (_, x, y) => (x / 1200, y / 1200) }
    val expect = pts.filter(_._1 % 1009 == 0).flatMap { case (q, qx, qy) =>
      val (cx, cy) = (qx / 1200, qy / 1200)
      val cands = for {
        dx <- -1 to 1; dy <- -1 to 1
        c <- byCell.getOrElse((cx + dx, cy + dy), Array.empty).toSeq
        if c._1 != q
      } yield (c._1, (c._2 - qx) * (c._2 - qx) + (c._3 - qy) * (c._3 - qy))
      cands.sortBy { case (id, d2) => (d2, id) }.take(5).zipWithIndex
        .map { case ((n, d2), i) => (q, n, i + 1, d2) }
    }.toSet
    val got = operators.Geometry.geoKnn(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"),
        r.getAs[Int]("rnk"), r.getAs[Long]("d2"))).toSet
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("sketch_quantile: estimates bracket the exact quantiles within one bin") {
    val rows = operators.Sketches.sketchQuantile(spark, sfDir).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Long]("q25_est"),
          r.getAs[Long]("q50_est"), r.getAs[Long]("q75_est"))).toMap
    assert(rows.nonEmpty)
    val cents = Tables.events(spark, sfDir)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), Math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    rows.foreach { case (t, (n, e25, e50, e75)) =>
      val xs = cents(t)
      assert(n === xs.length.toLong)
      Seq((25, e25), (50, e50), (75, e75)).foreach { case (q, est) =>
        val exact = xs((Math.ceil(q * xs.length / 100.0) - 1).toInt.max(0))
        // upper-edge estimate: never below the exact value, within a bin
        assert(est >= exact && est - exact <= 1024L,
          s"$t q$q est=$est exact=$exact")
      }
    }
  }

  test("text_bpe_pairs: top merge candidates replay the corpus char-pair counts") {
    val toks = graft.Tables.documents(spark, sfDir)
      .select("text").collect()
      .flatMap(_.getString(0).split(' ').filter(_.nonEmpty))
    val counts = toks.filter(_.length >= 2)
      .flatMap(t => t.sliding(2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expect = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(10)
      .zipWithIndex.map { case ((p, n), i) => (i + 1, p, n) }
    val got = TextOps.textBpePairs(spark, sfDir).collect()
      .map(r => (r.getAs[Int]("rnk"), r.getAs[String]("pair"), r.getAs[Long]("n")))
      .sortBy(_._1)
    assert(got.toSeq === expect)
    // rank 1 is the first merge a BPE trainer would learn
    assert(got.head._3 === counts.values.max)
  }

  test("dedup_bloom: no false negatives, true hits equal the exact decontamination") {
    val rows = operators.Dedup.dedupBloom(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_bloom_hits"),
          r.getAs[Long]("n_true_hits"), r.getAs[Long]("n_fp")))
      .toMap
    assert(rows.nonEmpty)
    // one-sided filter: bloom hits >= true hits, fp is exactly the gap
    rows.values.foreach { case (n, bloom, truth, fp) =>
      assert(truth <= bloom, "a bloom filter must never miss a member")
      assert(fp === bloom - truth)
      assert(bloom <= n)
    }
    // the gated exact count must equal the ungated broadcast operator:
    // dedup_decontaminate reports hits only for docs with >= 1
    val exact = operators.Dedup.dedupDecontaminate(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_gram_hits")).toMap
    assert(rows.view.mapValues(_._3).filter(_._2 > 0).toMap === exact,
      "bloom-gated true hits must match the exact decontamination")
  }

  test("sketch_kmv: integer estimator replays; intersection estimate tracks exact") {
    val P = 4503599627370449L
    def h(u: Long): Long =
      ((((u % 94906249L) * 2654435761L + 104729L) % P % 94906249L)
        * 2654435789L + 97L) % P
    val tu = Tables.events(spark, sfDir)
      .select("event_type", "user_id").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val kmv = tu.map { case (t, u) => (t, h(u)) }.distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted.take(64).toSet).toMap
    val types = kmv.keys.toSeq.sorted
    val users = tu.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expect = types.combinations(2).map { case Seq(a, b) =>
      val union = (kmv(a) ++ kmv(b)).toSeq.sorted.take(64)
      val theta = union.max
      val m = union.count(x => kmv(a)(x) && kmv(b)(x)).toLong
      val est = m * (63L * P / theta) / 64L
      (a, b) -> (m, est, (users(a) & users(b)).size.toLong)
    }.toMap
    val got = operators.Sketches.sketchKmv(spark, sfDir).collect()
      .map(r => (r.getAs[String]("ta"), r.getAs[String]("tb")) ->
        (r.getAs[Long]("m"), r.getAs[Long]("kmv_est"), r.getAs[Long]("exact_n")))
      .toMap
    assert(got === expect)
    assert(got.nonEmpty)
    // accuracy: KMV at k=64 carries ~12.5% standard error; 40% bound
    got.values.foreach { case (_, est, exact) =>
      if (exact > 64)
        assert(math.abs(est - exact).toDouble / exact < 0.4,
          s"KMV intersection estimate off: est=$est exact=$exact")
    }
  }

  test("sketch_kmv: a high-cardinality type domain hits the cap and audits the drop") {
    import spark.implicits._
    // 70 synthetic types (2 users each) — 6 past the 64-type cap; types
    // are zero-padded so the sorted keep-set is t00..t63
    val dir = java.nio.file.Files.createTempDirectory("kmvcap").toString
    val rows = for {
      t <- 0 until 70
      u <- 0 until 2
    } yield (t.toLong * 100 + u, t.toLong * 1000L + u, (t * 2 + u).toLong,
      f"t$t%02d", 1.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = operators.Sketches.sketchKmv(spark, dir).collect()
    assert(got.nonEmpty)
    val kept = got.flatMap(r => Seq(r.getAs[String]("ta"), r.getAs[String]("tb"))).toSet
    assert(kept === (0 until 64).map(t => f"t$t%02d").toSet,
      s"pair frame must only hold the first 64 sorted types, got ${kept.toSeq.sorted}")
    assert(got.forall(_.getAs[Long]("n_types_dropped") === 6L),
      "the audit column must record the 6 dropped types")
    // at the sf corpus the enum domain is under the cap: audit stays 0
    assert(operators.Sketches.sketchKmv(spark, sfDir).collect()
      .forall(_.getAs[Long]("n_types_dropped") === 0L))
  }

  test("sketch_hll_store: day-partitioned register merge equals the inline sketch") {
    val inline0 = operators.Sketches.sketchHll(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getAs[Long]("hll_est"), r.getAs[Long]("exact_n")))
      .toSet
    val store = operators.Sketches.sketchHllStore(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getAs[Long]("hll_est"), r.getAs[Long]("exact_n")))
      .toSet
    // bulk-build + daily append + cross-day max must be indistinguishable
    // from the one-shot sketch: max is associative over any day split
    assert(store === inline0)
    assert(store.nonEmpty)
  }

  test("sketch_cms: estimates are one-sided and exact for collision-free cells") {
    val rows = operators.Sketches.sketchCms(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("exact_n"),
        r.getAs[Long]("cms_est"), r.getAs[Boolean]("exact_hit")))
    assert(rows.length === 10, "top-10 probe")
    rows.foreach { case (u, exact, est, hit) =>
      assert(est >= exact, s"CMS must overestimate, user $u: $est < $exact")
      assert(hit === (est == exact))
    }
    // the probed users ARE the exact top-10 by event count
    val counts = Tables.events(spark, sfDir).groupBy("user_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val top = counts.sortBy { case (u, n) => (-n, u) }.take(10).map(_._1).toSet
    assert(rows.map(_._1).toSet === top)
  }

  test("wgrams3 kernel equals the interpreted HOF chain it replaced, edge cases included") {
    import spark.implicits._
    graft.functions.GeoFunctions.register(spark)
    val edge = Seq("a b c d", "a b", "", "a  b c", " a b c ", "x y x y x y",
      "solo", "a b c a b c a b c").toDF("text")
    val corpus = Tables.documents(spark, sfDir).select("text")
    for (df <- Seq(edge, corpus)) {
      val got = df.select(call_function("wgrams3", col("text")).as("gs"))
        .collect().map(_.getSeq[String](0).toList)
      val want = df.select(split(col("text"), " ").as("w"))
        .select(when(size(col("w")) >= 3, array_distinct(expr(
          "transform(sequence(1, size(w) - 2), i -> array_join(slice(w, i, 3), ' '))")))
          .otherwise(array().cast("array<string>")).as("gs"))
        .collect().map(_.getSeq[String](0).toList)
      assert(got.toSeq === want.toSeq)
    }
  }

  test("ttrstats kernel equals the HOF chain it replaced, edge cases included") {
    import spark.implicits._
    graft.functions.GeoFunctions.register(spark)
    val edge = Seq("a b c d", "a b", "", "a  b c", " a b c ", "x y x y x y",
      "solo", "a a a a", "a b c a b c a b c").toDF("text")
    val corpus = Tables.documents(spark, sfDir).select("text")
    for (df <- Seq(edge, corpus)) {
      val got = df.select(call_function("ttrstats", col("text")).as("st"))
        .collect().map(_.getSeq[Long](0).toList)
      val want = df
        .withColumn("toks", expr("filter(split(text, ' '), t -> t <> '')"))
        .withColumn("st", array_sort(col("toks")))
        .select(array(
          size(col("toks")).cast("long"),
          size(array_distinct(col("toks"))).cast("long"),
          expr(
            """IF(size(st) = 0, 0L, aggregate(sequence(1, size(st)), 0L, (a, i) -> a +
              |  IF((i = 1 OR element_at(st, i) != element_at(st, i - 1)) AND
              |     (i = size(st) OR element_at(st, i) != element_at(st, i + 1)),
              |     1L, 0L)))""".stripMargin)))
        .collect().map(_.getSeq[Long](0).toList)
      assert(got.toSeq === want.toSeq)
    }
  }

  test("repstats kernel equals the expression chain it replaced, edge cases included") {
    import spark.implicits._
    graft.functions.GeoFunctions.register(spark)
    val edge = Seq("a b c d", "a b", "", "a  b c", " a b c ", "x y x y x y",
      "solo", "a a a a", "a b c a b c a b c").toDF("text")
    val corpus = Tables.documents(spark, sfDir).select("text")
    for (df <- Seq(edge, corpus)) {
      val got = df.select(call_function("repstats", col("text")).as("st"))
        .collect().map(_.getSeq[Long](0).toList)
      val want = df.withColumn("toks", expr("filter(split(text, ' '), t -> t <> '')"))
        .withColumn("grams3", expr(
          """CASE WHEN size(toks) >= 3
            |  THEN transform(sequence(1, size(toks) - 2),
            |         i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))
            |  ELSE array() END""".stripMargin))
        .select(array(
          size(col("toks")).cast("long"),
          size(array_distinct(col("toks"))).cast("long"),
          size(col("grams3")).cast("long"),
          size(array_distinct(col("grams3"))).cast("long"),
          expr("""CASE WHEN size(toks) > 0
                 |  THEN array_max(transform(array_distinct(toks),
                 |         t -> size(filter(toks, x -> x = t))))
                 |  ELSE 0 END""".stripMargin).cast("long")))
        .collect().map(_.getSeq[Long](0).toList)
      assert(got.toSeq === want.toSeq)
    }
  }

  test("jgrams3 / langscores5 / bpepairs kernels equal the expressions they replaced") {
    import spark.implicits._
    graft.functions.GeoFunctions.register(spark)
    val edge = Seq("a b c d", "a b", "", "a  b c", " a b c ", "x y x y x y",
      "solo", "ab", "abc de", "a b c a b c").toDF("text")
    val corpus = Tables.documents(spark, sfDir).select("text")
    for (df <- Seq(edge, corpus)) {
      // jgrams3 vs the transform/get/concat_ws chain (short-doc quirk incl.)
      val jg = df.select(call_function("jgrams3", col("text")).as("g"))
        .collect().map(_.getSeq[String](0).toList)
      val jw = df.withColumn("toks", expr("filter(split(text, ' '), t -> t <> '')"))
        .select(expr(
          "array_distinct(transform(sequence(0, greatest(size(toks) - 3, 0)), " +
            "i -> concat_ws(' ', get(toks, i), get(toks, i + 1), get(toks, i + 2))))"))
        .collect().map(_.getSeq[String](0).toList)
      assert(jg.toSeq === jw.toSeq)
      // langscores5 vs the per-model aggregate folds
      val ls = df.select(call_function("langscores5", col("text")).as("ls"))
        .collect().map(_.getSeq[Long](0).toList)
      val lw = df.withColumn("toks", expr("filter(split(text, ' '), t -> t <> '')"))
        .select(array(TextOps.Models.map { case (_, (prior, ws)) =>
          aggregate(col("toks"), lit(prior),
            (acc, t) => acc + coalesce(element_at(typedLit(ws), t), lit(0)).cast("long"))
        }: _*)).collect().map(_.getSeq[Long](0).toList)
      assert(ls.toSeq === lw.toSeq)
      // bpepairs map vs the occurrence-exploded counts
      val bp = df.select(explode(call_function("bpepairs", col("text")))
          .as(Seq("pair", "n")))
        .groupBy("pair").agg(sum("n").as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val bw = df.select(explode(expr("filter(split(text, ' '), t -> t <> '')")).as("t"))
        .filter(length(col("t")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, length(t) - 1), i -> substring(t, i, 2))")).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(bp === bw)
      // md5head48 vs the conv/substring/md5 expression it replaced
      val mh = df.select(call_function("md5head48", col("text")))
        .collect().map(_.getLong(0))
      val mw = df.select(conv(substring(md5(col("text")), 1, 12), 16, 10)
          .cast("long"))
        .collect().map(_.getLong(0))
      assert(mh.toSeq === mw.toSeq)
    }
  }

  test("editdist banding: verdicts equal the unbanded rule on random pairs") {
    import spark.implicits._
    // pure-Scala reference DP, an independent implementation path
    def lev(a: String, b: String): Int = {
      val prev = Array.range(0, b.length + 1)
      for (i <- 1 to a.length) {
        var diag = prev(0)
        prev(0) = i
        for (j <- 1 to b.length) {
          val t = prev(j)
          prev(j) = math.min(math.min(prev(j) + 1, prev(j - 1) + 1),
            diag + (if (a(i - 1) == b(j - 1)) 0 else 1))
          diag = t
        }
      }
      prev(b.length)
    }
    val rnd = new scala.util.Random(7)
    val words = Vector("alpha", "beta", "gamma", "delta", "omega", "zz")
    def doc() = Seq.fill(2 + rnd.nextInt(12))(words(rnd.nextInt(words.length)))
      .mkString(" ")
    // pairs biased toward near-duplicates (mutate a shared base) so both
    // branches of the verdict are exercised
    val pairs = Seq.fill(150) {
      val a = doc()
      val b = if (rnd.nextBoolean()) doc()
        else a.split(" ").map(w =>
          if (rnd.nextInt(4) == 0) words(rnd.nextInt(words.length)) else w)
          .mkString(" ")
      (a, b)
    }
    graft.functions.GeoFunctions.register(spark)
    val got = pairs.toDF("ta", "tb")
      .select(call_function("lev_band", col("ta"), col("tb")).as("lv"))
      .withColumn("is_dup", col("lv") >= 0)
      .collect().map(r => (r.getInt(0), r.getBoolean(1)))
    assert(got.exists(_._2) && got.exists(!_._2),
      "the sample must exercise both verdict branches")
    pairs.zip(got).foreach { case ((a, b), (lvBanded, dupBanded)) =>
      val full = lev(a, b)
      val k = (20 * math.max(a.length, b.length)) / 100
      // exact within the pair's own dup band, -1 beyond it
      assert(lvBanded === (if (full > k) -1 else full), s"'$a' vs '$b'")
      // the banded verdict equals the unbanded rule
      val dupFull = 100 * full <= 20 * math.max(a.length, b.length)
      assert(dupBanded === dupFull, s"verdict flip on '$a' vs '$b'")
      // the kernel's trim + band path agrees with the plain JVM call too
      assert(graft.functions.TextKernels.levBand(a, b) === lvBanded)
    }

    // multi-block Myers (middle > 64 chars, up to 5 blocks) against the
    // same independent full DP — the bit-parallel block chaining must be
    // exact across word boundaries, not just in the single-word case
    val alpha = "abcdefgh"
    def longDoc(len: Int) = (0 until len).map(i =>
      alpha(rnd.nextInt(alpha.length))).mkString
    val longPairs = Seq.fill(60) {
      val a = longDoc(80 + rnd.nextInt(240))
      val b =
        if (rnd.nextInt(3) == 0) longDoc(80 + rnd.nextInt(240))
        else a.map(c => if (rnd.nextInt(12) == 0) alpha(rnd.nextInt(alpha.length)) else c)
          .mkString
      (a, b)
    }
    longPairs.foreach { case (a, b) =>
      val full = lev(a, b)
      val k = (20 * math.max(a.length, b.length)) / 100
      assert(graft.functions.TextKernels.levBand(a, b) ===
        (if (full > k) -1 else full), s"multi-block mismatch len=(${a.length},${b.length})")
    }

    // non-ASCII middles take the banded-DP fallback — same contract
    val (na, nb) = ("der straße lauf", "der strasse lauf")
    val fullNa = lev(na, nb)
    val kNa = (20 * math.max(na.length, nb.length)) / 100
    assert(graft.functions.TextKernels.levBand(na, nb) ===
      (if (fullNa > kNa) -1 else fullNa))
  }

  test("mom9 kernel equals the HOF upper-triangle chain; diagonal sums to dot9") {
    import spark.implicits._
    graft.functions.GeoFunctions.register(spark)
    val edge = Seq(
      Seq(0.5f, -0.25f, 0.125f),
      Seq(1.0f),
      Seq(0.0f, 0.0f),
      Seq(-1.5f, 2.75f, -0.0625f, 3.25f)).toDF("embedding")
    val corpus = Tables.embeddings(spark, sfDir).select("embedding")
    for (df <- Seq(edge, corpus)) {
      val got = df.select(call_function("mom9", col("embedding")).as("m"))
        .collect().map(_.getSeq[Long](0).toList)
      val want = df.select(expr(
        "flatten(transform(sequence(0, size(embedding) - 1), i -> " +
          "transform(sequence(i, size(embedding) - 1), j -> " +
          "cast(round((cast(embedding[i] as double) * cast(embedding[j] as double)) * 1e9) as bigint))))")
        .as("m")).collect().map(_.getSeq[Long](0).toList)
      assert(got.toSeq === want.toSeq)
      // the diagonal entries ARE dot9(v, v)'s per-element terms
      val diag = df.select(call_function("mom9", col("embedding")).as("m"),
        size(col("embedding")).as("d"),
        call_function("dot9", col("embedding"), col("embedding")).as("n2"))
        .collect()
      diag.foreach { r =>
        val m = r.getSeq[Long](0)
        val d = r.getInt(1)
        var k = 0
        var s = BigInt(0)
        for (i <- 0 until d) { s += m(k); k += d - i }
        assert(s === BigInt(r.getLong(2)), "mom9 diagonal must sum to dot9")
      }
    }
  }

  test("emb_pca: projection is the exact integer component dot; iteration is idempotent per dir") {
    val a = Ann.embPca(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(a.nonEmpty && a.map(_._1).distinct.length === a.length)
    // memoized component: a second build returns the identical frame
    val b = Ann.embPca(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(a.toSeq === b.toSeq)
    // the projection must separate the corpus (a degenerate all-equal
    // projection would mean the iteration collapsed)
    assert(a.map(_._3).distinct.length > 1)
  }

  test("emb_outliers: verdicts replay the integer 0.9-mean rule; centroids self-assign clean") {
    val rows = Ann.embOutliers(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(rows.nonEmpty)
    // independent replay: per-cell sums from the collected rows
    val byCell = rows.groupBy(_._2)
    byCell.foreach { case (cell, members) =>
      val sum6 = members.map(m => BigInt(m._3)).sum
      val n = members.length
      assert(members.forall(_._4 == n.toLong), s"cell_n wrong in cell $cell")
      members.foreach { case (id, _, cos6, _, flagged) =>
        assert(flagged === (BigInt(10) * n * cos6 < BigInt(9) * sum6),
          s"vec $id verdict diverges from the integer rule")
      }
    }
    // the centroid vectors assign to themselves at cosine exactly 1
    rows.filter(r => r._1 >= 8 && r._1 < 16).foreach { case (id, cell, cos6, _, fl) =>
      assert(cell === id && cos6 === 1000000L && !fl,
        s"centroid $id must self-assign clean")
    }
  }

  test("pipe_curate: every gate fires on a crafted corpus and agrees with the standalone ops") {
    import spark.implicits._
    // crafted corpus: one doc per verdict path (the sf corpus never trips
    // the quality/repetition gates — synthetic text is too clean)
    val en = "the hash join order by key group filter sort merge table row scan"
    val docs = Seq(
      (1L, en, "en"),                                          // kept
      (2L, en, "en"),                                          // duplicate of 1
      (3L, "dup dup dup dup dup dup dup dup dup dup dup", "de"), // lang gate
      (4L, "the join!!! ??? ### $$$ %%% &&& *** ((( ))) @@@", "en"), // punct gate
      (5L, "short text", "en"),                                // <10 words gate
      (6L, "order table " * 12, "en"), // repetition gate (en-favored words)
      // 101 % 101 = 0 → benchmark doc: OOV words (no trigram shared with
      // docs 1-6), passes every text gate, then gates out contaminated by
      // its own grams; doc 7 embeds one of its trigrams → contaminated
      (101L, "zeta eta theta iota kappa lambda mu nu xi omicron pi rho", "en"),
      (7L, "the hash join order by key group filter sort merge kappa lambda mu", "en")
    ).toDF("doc_id", "text", "lang")
      .withColumn("source", lit("crafted"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("curate").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val got = TextOps.pipeCurate(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getAs[Boolean]("keep"), r.getAs[String]("reason")))
      .toMap
    assert(got(1L) === ((true, "kept")))
    assert(got(2L) === ((false, "duplicate")))
    assert(got(3L)._2 === "lang")
    assert(got(4L)._2 === "quality")
    assert(got(5L)._2 === "quality")
    assert(got(6L)._2 === "repetition", s"got ${got(6L)}")
    assert(got(101L) === ((false, "contaminated")),
      s"benchmark doc must gate out on its own grams, got ${got(101L)}")
    assert(got(7L) === ((false, "contaminated")),
      s"doc sharing a bench trigram must gate out, got ${got(7L)}")
    // on the sf corpus, gate flags must agree with the standalone operators
    val pc = TextOps.pipeCurate(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val lang = TextOps.textLangid(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang")).toMap
    val fp = TextOps.textFingerprint(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_canonical")).toMap
    pc.foreach { case (id, r) =>
      assert(r.getAs[Boolean]("ok_lang") === (lang(id) == "en"))
      assert(r.getAs[Boolean]("ok_uniq") === fp(id))
    }
    // the composed decon gate must match the standalone dedup_bloom audit
    // per training doc (bench docs are absent from the standalone output;
    // the pipeline marks them contaminated by construction)
    val bl = Dedup.dedupBloom(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_fp"), r.getAs[Long]("n_true_hits")))).toMap
    assert(bl.nonEmpty)
    bl.foreach { case (id, (nfp, ntrue)) =>
      val r = pc(id)
      assert(r.getAs[Long]("n_fp") === nfp, s"n_fp diverges for doc $id")
      assert(r.getAs[Boolean]("ok_decon") === (ntrue == 0L),
        s"ok_decon diverges for doc $id")
    }
    pc.keys.filter(_ % 101 == 0).foreach { id =>
      assert(!pc(id).getAs[Boolean]("ok_decon"),
        s"benchmark doc $id must not pass the decon gate")
    }
  }

  test("text_bpe_train: merges replay a hand-computed corpus and compose from prior rounds") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpetrain").toString
    // dict: abab f=3, ab f=2 → round 1 merges 'a b' (2·3 + 1·2 = 8),
    // round 2 merges 'ab ab' (3), round 3 finds no pairs → 2 rows
    Seq((1L, "abab abab abab", "en"), (2L, "ab ab", "en"))
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("crafted"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    val got = TextOps.textBpeTrain(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === Seq((1, "a b", "ab", 8L), (2, "ab ab", "abab", 3L)),
      s"got ${got.toSeq}")
    // on the sf corpus: full round count, non-increasing counts, and every
    // round-k pair is built from single chars or earlier rounds' merges —
    // the vocabulary-containment property of a correct BPE loop
    val rows = TextOps.textBpeTrain(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.length === 5)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._4 <= a._4, s"merge count must be non-increasing: $a -> $b")
    }
    rows.zipWithIndex.foreach { case ((k, pair, merged, _), i) =>
      assert(pair.replace(" ", "") === merged)
      val earlier = rows.take(i).map(_._3).toSet
      pair.split(" ").foreach { sym =>
        assert(sym.codePointCount(0, sym.length) == 1 || earlier.contains(sym),
          s"round-$k symbol '$sym' is neither a char nor an earlier merge")
      }
    }
  }

  test("text_bpe_apply: encoding counts replay the learned merges per doc") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpeapply").toString
    // merges learned on this corpus: r1 'a b'→ab, r2 'ab ab'→abab; the
    // final dict encodes abab and ab as ONE symbol each, and sub-dict
    // single-char words ('a', 'b') encode as one symbol by the fallback
    Seq((1L, "abab abab abab", "en"), (2L, "ab ab", "en"), (3L, "a b ab", "en"))
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("crafted"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    val got = TextOps.textBpeApply(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(1L -> ((3L, 3L)), 2L -> ((2L, 2L)), 3L -> ((3L, 3L))),
      s"got $got")
    // on the sf corpus: tokens never exceed the pre-merge symbol count
    // and never undercut the word count (merges only shrink within words)
    val chars = Tables.documents(spark, sfDir)
      .selectExpr("doc_id",
        "size(filter(split(text, ' '), w -> w <> '')) AS nw",
        "aggregate(transform(filter(split(text, ' '), w -> w <> ''), " +
          "w -> size(filter(split(w, ''), c -> c <> ''))), 0, (a, x) -> a + x) AS nc")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1).toLong, r.getInt(2).toLong))).toMap
    TextOps.textBpeApply(spark, sfDir).collect().foreach { r =>
      val (nw, nc) = chars(r.getLong(0))
      assert(r.getLong(1) === nw)
      assert(r.getLong(2) <= nc && r.getLong(2) >= nw,
        s"doc ${r.getLong(0)}: tokens ${r.getLong(2)} outside [$nw, $nc]")
    }
  }

  test("mm_audio: features replay hand-computed sample math through the decode path") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mmaudio").toString
    // "aé" → UTF-8 bytes [97, 0xC3=195, 0xA9=169]; centered [-31, 67, 41]
    Seq((1L, "aé", "en"), (2L, "", "en")).toDF("doc_id", "text", "lang")
      .withColumn("source", lit("crafted"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    val rows = Multimodal.mmAudio(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getLong(5)))).toMap
    // empty payload is dropped (undecodable), not faked
    assert(rows.keySet === Set(1L))
    val (n, energy, zc, peak, mean) = rows(1L)
    assert(n === 3)
    assert(energy === 31L * 31 + 67L * 67 + 41L * 41)
    assert(zc === 1L) // one strict sign change: -31 → +67
    assert(peak === 67)
    assert(mean === (97L + 195L + 169L) * 1000L / 3L)
  }

  test("mm_dedup: radius-3 pairs always share a band; hamming replays the kernel") {
    // kernel determinism
    val p = "some payload content for hashing".getBytes("UTF-8")
    assert(TextKernels.aHash64(p) === TextKernels.aHash64(p.clone))
    // pigeonhole guarantee: ≤3 flipped bits leave ≥1 of the 4 16-bit
    // bands intact, so a radius-3 pair can never miss the candidate join
    val h = TextKernels.aHash64(p)
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val h2 = Seq.fill(3)(rnd.nextInt(64)).foldLeft(h)((x, b) => x ^ (1L << b))
      assert((0 until 4).exists(bd =>
        ((h >>> (bd * 16)) & 0xffffL) === ((h2 >>> (bd * 16)) & 0xffffL)),
        f"radius-3 neighbor lost all bands: $h%016x vs $h2%016x")
    }
    // operator rows: ordered pairs, radius bound, hamming = kernel xor
    // popcount, and every pair genuinely shares a band (the contract)
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = Multimodal.mmDedup(spark, sfDir).collect()
    rows.foreach { r =>
      val (a, b, ham) = (r.getLong(0), r.getLong(1), r.getInt(2))
      assert(a < b && ham <= 16)
      val ha = TextKernels.aHash64(docs(a).getBytes("UTF-8"))
      val hb = TextKernels.aHash64(docs(b).getBytes("UTF-8"))
      assert(java.lang.Long.bitCount(ha ^ hb) === ham)
      assert((0 until 4).exists(bd =>
        ((ha >>> (bd * 16)) & 0xffffL) === ((hb >>> (bd * 16)) & 0xffffL)))
    }
    // pair uniqueness (band-join dedup really happened)
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length === rows.length)
  }

  test("pipe_manifest: kept set equals pipe_curate's, offsets are a gapless prefix") {
    val kept = operators.TextOps.pipeCurate(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("keep"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val man = operators.TextOps.pipeManifest(spark, sfDir)
      .orderBy("doc_id").collect()
    assert(man.map(_.getLong(0)).toSet === kept,
      "manifest rows must be exactly the curate-kept documents")
    // offsets: start_off is the running sum of n_tokens in doc_id order
    var off = 0L
    man.foreach { r =>
      assert(r.getLong(3) === off,
        s"doc ${r.getLong(0)} offset ${r.getLong(3)} != expected $off")
      assert(r.getLong(4) === off / 512, "seq_id must be start_off div 512")
      off += r.getLong(2)
    }
    // shards stay in the fixed 16-way layout
    assert(man.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 16))
  }

  test("dedup_cdc: cuts replay a direct rolling hash; an insertion resynchronizes") {
    import graft.functions.TextKernels
    def cuts(s: String): Seq[Long] = {
      val r = TextKernels.cdcCuts(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      (0 until r.numElements()).map(r.getLong)
    }
    def directCuts(s: String): Seq[Long] = {
      val b = s.getBytes("UTF-8")
      (0 to b.length - 8).flatMap { i =>
        var h = 0L
        (i until i + 8).foreach(k => h = (h * 257L + (b(k) & 0xffL)) % 1000000007L)
        if (h % 64L == 0L && i + 8 < b.length) Some((i + 8).toLong) else None
      }
    }
    def chunks(s: String): Seq[String] = {
      val bs = 0L +: cuts(s) :+ s.length.toLong
      bs.sliding(2).map { w => s.substring(w(0).toInt, w(1).toInt) }.toSeq
    }
    val docs = Tables.documents(spark, sfDir).select("text")
      .limit(50).collect().map(_.getString(0))
    docs.foreach { t => assert(cuts(t) === directCuts(t), "kernel vs direct") }
    // shift-robustness: a mid-document insertion leaves the chunk multiset
    // mostly intact (fixed-stride passage hashing would shift every
    // later boundary); only chunks overlapping the edit window change
    val long = docs.filter(_.length > 300)
    assert(long.nonEmpty)
    long.take(10).foreach { t =>
      val edited = t.substring(0, t.length / 2) + "X" + t.substring(t.length / 2)
      val a = chunks(t).groupBy(identity).view.mapValues(_.size).toMap
      val bch = chunks(edited).groupBy(identity).view.mapValues(_.size).toMap
      val shared =
        a.iterator.map { case (k, c) => math.min(c, bch.getOrElse(k, 0)) }.sum
      assert(shared >= a.values.sum - math.max(3, a.values.sum / 4),
        s"insertion should resynchronize: ${a.values.sum} chunks, $shared shared")
    }
  }

  test("ann_filtered: label predicate holds, ranks dense, oversearch measured") {
    val rows = Ann.annFiltered(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val labels = Tables.embeddings(spark, sfDir)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val q = r.getAs[Long]("q_id"); val n = r.getAs[Long]("n_id")
      assert(labels(q) === r.getAs[Int]("label"), "query label")
      assert(labels(n) === r.getAs[Int]("label"), "candidate label filtered")
      assert(n >= 8L, "base side only")
    }
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("rnk")).sorted === (1 to rs.length).toArray)
      // the top-3 never exceeds the measured candidate pool
      assert(rs.length <= rs.head.getAs[Long]("n_cand"))
      // cosine non-increasing in rank
      val byRnk = rs.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Double]("cos"))
      assert(byRnk.sliding(2).forall(w => w.length < 2 || w(0) >= w(1) - 1e-12))
    }
  }

  test("sketch_ams: md5 signs, median-of-means and exact F2 replay driver-side") {
    val rows = graft.operators.Sketches.sketchAms(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sfDir).select("event_type", "user_id")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    val even = "02468ace".toSet
    val byType = ev.groupBy(_._1)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val us = byType(t).map(_._2)
      val exact = us.groupBy(identity).values
        .map(v => v.size.toLong * v.size).sum
      assert(r.getAs[Long]("f2_exact") === exact, s"$t exact F2")
      assert(r.getAs[Long]("n_events") === us.length.toLong)
      val zs = (0 until 32).map { j =>
        us.map(u => if (even(md5hex(u.toString)(j))) 1L else -1L).sum
      }
      val means = (0 until 8)
        .map(g => (0 until 4).map(k => { val z = zs(4 * g + k); z * z }).sum / 4)
        .sorted
      val est = (means(3) + means(4)) / 2
      assert(r.getAs[Long]("f2_est") === est, s"$t median-of-means")
      assert(r.getAs[Long]("err_pm") ===
        1000L * math.abs(est - exact) / exact)
    }
  }

  test("text_keyness: chi-square replays in BigInt; counts partition the token stream") {
    val rows = TextOps.textKeyness(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir).select("lang", "text").collect()
    val counts = scala.collection.mutable.Map[String, (Long, Long)]()
    docs.foreach { d =>
      val isEn = d.getString(0) == "en"
      d.getString(1).split(" ").filter(_.nonEmpty).foreach { w =>
        val (a, b) = counts.getOrElse(w, (0L, 0L))
        counts(w) = if (isEn) (a + 1, b) else (a, b + 1)
      }
    }
    val na = counts.values.map(_._1).sum
    val nb = counts.values.map(_._2).sum
    assert(rows.map(_.getAs[Long]("n_en")).sum === na)
    assert(rows.map(_.getAs[Long]("n_rest")).sum === nb)
    assert(rows.length === counts.size)
    rows.foreach { r =>
      val (a, b) = counts(r.getAs[String]("term"))
      assert(r.getAs[Long]("n_en") === a)
      assert(r.getAs[Long]("n_rest") === b)
      val (c, d) = (na - a, nb - b)
      val num = BigInt(1000000) * BigInt(na + nb) *
        BigInt(a * d - b * c).pow(2)
      val den = BigInt(a + b) * BigInt(c + d) * BigInt(na) * BigInt(nb)
      assert(BigInt(r.getAs[Long]("chi2_ppm")) === num / den,
        s"chi2 for ${r.getAs[String]("term")}")
      assert(r.getAs[String]("overused") ===
        (if (a * nb > b * na) "en" else "rest"))
    }
  }

  test("mm_blur: Laplacian variance replays from raw bytes; drop rule exact") {
    val rows = Multimodal.mmBlur(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
    var expected = 0
    docs.foreach { d =>
      val id = d.getLong(0)
      if (id % 3 < 2) {
        val bytes = d.getString(1).getBytes("UTF-8")
        val h = math.min(bytes.length / 48, 64)
        if (h < 3) assert(!rows.contains(id), s"doc $id should be dropped")
        else {
          expected += 1
          val r = rows(id)
          def lum(i: Int): Long = {
            val rr = bytes(3 * i) & 0xff; val gg = bytes(3 * i + 1) & 0xff
            val bb = bytes(3 * i + 2) & 0xff
            (299L * rr + 587L * gg + 114L * bb) / 1000L
          }
          var n = 0L; var sl = 0L; var ssq = 0L
          for (y <- 1 until h - 1; x <- 1 until 15) {
            val i = y * 16 + x
            val lap = 4 * lum(i) - lum(i - 1) - lum(i + 1) -
              lum(i - 16) - lum(i + 16)
            n += 1; sl += lap; ssq += lap * lap
          }
          val varFlr = (n * ssq - sl * sl) / (n * n)
          assert(r.getAs[Int]("h") === h)
          assert(r.getAs[Long]("n_interior") === n)
          assert(r.getAs[Long]("lap_sum") === sl)
          assert(r.getAs[Long]("var_flr") === varFlr)
          assert(r.getAs[Boolean]("blurry") === (varFlr < 7500L))
        }
      } else assert(!rows.contains(id), s"wav doc $id must not appear")
    }
    assert(rows.size === expected)
  }
}
