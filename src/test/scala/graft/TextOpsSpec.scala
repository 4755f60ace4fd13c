package graft

import org.apache.spark.sql.functions._
import graft.text.TextOps

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): org.apache.spark.sql.Row =
    spark.range(1).select(c).head()

  test("tokens drops empties; ngrams build sliding windows") {
    val df = Seq("a b  c d").toDF("text")
    val toks = df.select(TextOps.tokens(col("text"))).head().getSeq[String](0)
    assert(toks == Seq("a", "b", "c", "d"))
    val grams = df.select(TextOps.wordNgrams(TextOps.tokens(col("text")), 3))
      .head().getSeq[String](0)
    assert(grams == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("text")
      .select(TextOps.wordNgrams(TextOps.tokens(col("text")), 3)).head().getSeq[String](0)
    assert(short.isEmpty)
  }

  test("spanDupStats: shared spans counted cross-doc, repeats within a doc don't") {
    // doc 1 and 2 share one 4-token span ("w x y z"); doc 3 repeats its
    // own span twice but shares nothing; doc 4 is too short for any span.
    val docs = Seq(
      (1L, "w x y z tail1"),        // spans: "w x y z", "x y z tail1"
      (2L, "head2 w x y z"),        // spans: "head2 w x y", "w x y z"
      (3L, "p q r s p q r s"),      // 5 spans, all self-only
      (4L, "a b c")                 // no 4-token span
    ).toDF("doc_id", "text")
    val out = TextOps.spanDupStats(docs, "text", "doc_id", 4)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val byId = out.map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(byId(1L) == ((2L, 1L, 5000L)))  // 1 of 2 spans duplicated
    assert(byId(2L) == ((2L, 1L, 5000L)))
    // "p q r s" occurs twice in doc 3 but in only ONE distinct doc —
    // not duplicated; both occurrences still count toward total_spans
    assert(byId(3L) == ((5L, 0L, 0L)))
  }

  test("stripBoilerplate: coverage expansion, order-preserving rebuild, full-strip law") {
    // docs 1 and 2 share "w x y z"; each keeps its non-covered tokens
    // IN ORDER. docs 10 and 11 are verbatim twins → every span shared →
    // fully stripped (clean_fp = md5 of the empty string). doc 3 shares
    // nothing → untouched, clean_fp = md5 of its own rebuilt text.
    val docs = Seq(
      (1L, "w x y z tail1"),
      (2L, "head2 w x y z"),
      (3L, "p q r s t u"),
      (10L, "dup dup2 dup3 dup4 dup5"),
      (11L, "dup dup2 dup3 dup4 dup5")
    ).toDF("doc_id", "text")
    val out = TextOps.stripBoilerplate(docs, "text", "doc_id", n = 4, minDocs = 2)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val emptyMd5 = one(md5(lit(""))).getString(0)
    // doc 1: spans "w x y z"(shared) + "x y z tail1" — coverage is the
    // UNION of windows of shared spans only = tokens 0..3, keeps tail1
    assert(out(1L)._1 == 5 && out(1L)._2 == 4)
    assert(out(1L)._3 == one(md5(lit("tail1"))).getString(0))
    assert(out(2L)._1 == 5 && out(2L)._2 == 4)
    assert(out(2L)._3 == one(md5(lit("head2"))).getString(0))
    // untouched doc keeps everything, fingerprint of the full rebuild
    assert(out(3L)._2 == 0 && out(3L)._3 == one(md5(lit("p q r s t u"))).getString(0))
    // verbatim twins share all spans → both fully stripped
    assert(out(10L) == ((5L, 5L, emptyMd5)) && out(11L) == ((5L, 5L, emptyMd5)))
  }

  test("decontaminate: flags only train docs sharing a full n-token span") {
    val bench = Seq((100L, "a b c d e suffix-b")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "x a b c d e y"),     // contains bench span "a b c d e"
      (2L, "a b c z d e"),       // shares words but no 5-token span
      (3L, "p q")                // too short for any span
    ).toDF("doc_id", "text")
    val out = TextOps.decontaminate(train, bench, "text", "doc_id", 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L))
  }

  test("sourceMix: rates derived toward the smallest group, kept via the md5 law") {
    val docs = ((1L to 20L).map(i => (i, "big")) ++ (21L to 25L).map(i => (i, "small")))
      .toDF("doc_id", "source")
    val out = TextOps.sourceMix(docs, "source", "doc_id").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("small") == ((5L, 1000L, 5L)))   // smallest group: keep everything
    val (bigTotal, bigPm, bigKept) = out("big")
    assert(bigTotal == 20L && bigPm == 250L)    // floor(5/20 * 1000)
    // kept must equal the deterministic law applied directly
    val expect = docs.filter(col("source") === "big")
      .filter(TextOps.deterministicSampleCol(col("doc_id"), lit(250L), "mix"))
      .count()
    assert(bigKept == expect)
  }

  test("fingerprint normalizes case and whitespace") {
    val df = Seq(("A  B\tc", 1), ("a b C", 2), ("a b d", 3)).toDF("text", "id")
    val fps = df.select(TextOps.fingerprint(col("text"))).collect().map(_.getString(0))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("jaccard: identical=1, disjoint=0, known overlap") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    val j = df.select(TextOps.jaccard(col("x"), col("y"))).head().getDouble(0)
    assert(j == 0.5) // |{b,c}| / |{a,b,c,d}|
    val same = df.select(TextOps.jaccard(col("x"), col("x"))).head().getDouble(0)
    assert(same == 1.0)
    val disj = df.select(TextOps.jaccard(col("x"), typedLit(Seq("z")))).head().getDouble(0)
    assert(disj == 0.0)
  }

  test("minhash: equal shingle sets get equal signatures; supersets keep mins") {
    val df = Seq(
      (1, Seq("x y z", "y z w")), (2, Seq("y z w", "x y z")), (3, Seq("q r s"))
    ).toDF("id", "sh")
    val sig = df.select(col("id"), TextOps.minhash(col("sh"), 0).as("m"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(sig(1) == sig(2)) // order-insensitive
    assert(sig(1) != sig(3))
  }

  test("simhash: identical docs equal; token-count invariant") {
    val df = Seq("spark makes big data small", "spark makes big data small",
      "entirely different words here now").toDF("text")
    val hs = df.select(TextOps.simhash32(TextOps.tokens(col("text")))).collect().map(_.getLong(0))
    assert(hs(0) == hs(1))
    assert(hs(0) != hs(2))
    assert(hs.forall(h => h >= 0 && h < (1L << 32)))
  }

  test("token counts: whitespace vs BPE-ish") {
    val df = Seq("hello world, 42 times!").toDF("text")
    assert(df.select(TextOps.tokenCount(col("text"))).head().getLong(0) == 4)
    // hello | world | , | 42 | times | !  = 6
    assert(df.select(TextOps.bpeishTokenCount(col("text"))).head().getLong(0) == 6)
  }

  test("rollingHash: order-sensitive, matches hand-computed value") {
    val df = Seq("ab", "ba").toDF("text")
    val hs = df.select(TextOps.rollingHash(col("text"))).collect().map(_.getLong(0))
    assert(hs(0) == 97L * 31 + 98)  // 'a'*31 + 'b'
    assert(hs(0) != hs(1))
  }

  test("clusterPairs: components labeled by min id, chains and cliques merge") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 9L), (9L, 1L)).toDF("id_a", "id_b")
    val out = TextOps.clusterPairs(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L, 8L -> 1L, 9L -> 1L))
  }

  test("clusterPairsStar == clusterPairs on chains, cliques, duplicates, and seeded random graphs") {
    // two genuinely different distributed CC algorithms (label
    // propagation with path halving vs large-star/small-star edge
    // contraction) must emit the identical (vertex, component-min)
    // frame on any input — including the 41-chain that stresses round
    // counts and a duplicate-both-ways edge
    def both(pairs: org.apache.spark.sql.DataFrame): Unit = {
      val a = TextOps.clusterPairs(pairs).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val b = TextOps.clusterPairsStar(pairs).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(a == b, s"CC algorithms disagree: ${a.diff(b).take(3)} vs ${b.diff(a).take(3)}")
    }
    both(((0L until 40L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (101L, 102L), (100L, 102L),
        (200L, 201L), (201L, 200L), (300L, 301L))).toDF("id_a", "id_b"))
    val rng = new scala.util.Random(7)
    both((1 to 150).map(_ => (rng.nextInt(70).toLong, rng.nextInt(70).toLong))
      .filter(p => p._1 != p._2).toDF("id_a", "id_b"))
  }

  test("clusterPairs: path-halving converges a 64-chain in O(log) rounds") {
    // A 64-node path graph has diameter 63: pure 1-hop min-label
    // propagation needs ~63 rounds and would NOT converge within
    // maxIter = 12. Path halving doubles label distance per round, so the
    // chain collapses in ~log2(64) + 1 rounds — this test fails if the
    // shortcut step regresses to plain propagation.
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = TextOps.clusterPairs(chain, maxIter = 12, localMaxEdges = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 64)
    assert(out.values.forall(_ == 0L), s"unconverged labels: ${out.filter(_._2 != 0L)}")
  }

  test("clusterPairs: local union-find path is identical to the iterative path") {
    // The adaptive cutover (edge count <= localMaxEdges runs a
    // single-task union-find) must be invisible in the output: both
    // paths emit (vertex, component-min) for exactly the vertices that
    // appear in pairs. Graph mixes a deep chain, a clique, a 2-cycle
    // duplicate edge, and an isolated pair.
    val pairs = ((0L until 40L).map(i => (i, i + 1)) ++       // 41-chain
      Seq((100L, 101L), (101L, 102L), (100L, 102L),           // clique
        (200L, 201L), (201L, 200L),                           // dup both ways
        (300L, 301L))).toDF("id_a", "id_b")
    val local = TextOps.clusterPairs(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val iter = TextOps.clusterPairs(pairs, localMaxEdges = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(local.sameElements(iter), "cutover paths disagree")
    assert(local.length == 48)
    val reps = local.toMap
    assert((0L to 40L).forall(reps(_) == 0L))
    assert(Seq(100L, 101L, 102L).forall(reps(_) == 100L))
    assert(reps(201L) == 200L && reps(301L) == 300L)
  }

  test("clusterPairs: one action per iteration — job count stays at the measured floor") {
    // The loop's only per-iteration action is the convergence agg over the
    // newly-cached generation; edges are pre-partitioned on the join key
    // once. For this graph the loop converges in 3 rounds and (under AQE,
    // which runs one job per shuffle stage) costs 27 jobs end-to-end on
    // Spark 4.1.2 — 23 for plain propagation plus the path-halving lookup
    // join's stage per round, which buys O(log diameter) convergence on
    // deep graphs (see the 64-chain test above). Any reintroduced
    // per-iteration action (a count(), first(), or edges re-shuffle) adds
    // at least one job per round — the tight margin (29 vs floor 27)
    // catches a +1-job-per-round regression on this 3-round graph.
    //
    // VERSION PIN: the absolute number counts AQE job scheduling on
    // Spark 4.1.2. If a Spark/AQE upgrade shifts the floor WITHOUT a
    // change to clusterPairs, re-measure and update both numbers — the
    // invariant to preserve is "constant jobs per iteration, no
    // per-round edge re-shuffle", not the literal 27.
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 9L), (9L, 1L)).toDF("id_a", "id_b")
    // localMaxEdges = 0 forces the ITERATIVE path — these pins guard the
    // distributed loop; the small-graph cutover has its own spec below.
    TextOps.clusterPairs(pairs, localMaxEdges = 0).collect() // warm-up: codegen + broadcast init
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val out = TextOps.clusterPairs(pairs, localMaxEdges = 0).collect()
      assert(out.length == 7)
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(jobs.get() <= 29, s"clusterPairs cost ${jobs.get()} jobs (floor is 27) — " +
      "a per-iteration action or edge re-shuffle crept back into the loop")
  }

  test("clusterPairs: total shuffle-read bytes stay under the measured ceiling") {
    // Wall-clock regressions on t6 under ambient load are noise (driver
    // rounds measured the same code at 4x its idle time); shuffle volume
    // is load-independent, so THIS is the regression pin. A reintroduced
    // per-round edge re-shuffle or a leaked cached generation multiplies
    // shuffle-read bytes regardless of machine load.
    //
    // VERSION PIN: measured 2715 bytes end-to-end on this 3-round graph
    // (Spark 4.1.2, AQE on — shuffle-read counts compressed record data
    // only, so even a tiny graph's regression shows as a multiple, not a
    // rounding error). Ceiling is ~3x the measurement: re-shuffling the
    // ~900-byte edge frame once per round alone would breach it;
    // re-measure and update on a Spark upgrade.
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 9L), (9L, 1L)).toDF("id_a", "id_b")
    // localMaxEdges = 0 forces the ITERATIVE path — these pins guard the
    // distributed loop; the small-graph cutover has its own spec below.
    TextOps.clusterPairs(pairs, localMaxEdges = 0).collect() // warm-up: codegen + broadcast init
    val bytes = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) { bytes.addAndGet(m.shuffleReadMetrics.totalBytesRead); () }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val total = try {
      TextOps.clusterPairs(pairs, localMaxEdges = 0).collect()
      // listener delivery is async: settle until the counter stops moving
      var prev = -1L
      var curv = bytes.get()
      var n = 0
      while (curv != prev && n < 50) { Thread.sleep(100); prev = curv; curv = bytes.get(); n += 1 }
      curv
    } finally spark.sparkContext.removeSparkListener(listener)
    info(s"clusterPairs shuffle-read bytes: $total")
    assert(total > 0, "listener recorded no shuffle at all — measurement broken")
    assert(total <= 8192L,
      s"clusterPairs shuffle-read $total bytes exceeds the 8 KB ceiling " +
        "(measured 2715) — a per-round edge re-shuffle or cache leak crept in")
  }

  test("lshPairsBounded: hot buckets emit no pairs, normal buckets are byte-identical") {
    // one spam bucket (40 docs share band value "HOT" → 780 pairs
    // uncapped) next to two normal buckets
    val hot = (1L to 40L).map(i => (i, 0, "HOT"))
    val normal = Seq((100L, 0, "n1"), (101L, 0, "n1"), (102L, 0, "n1"),
      (200L, 1, "n2"), (201L, 1, "n2"))
    val exploded = (hot ++ normal).toDF("doc_id", "band_idx", "band_val")
    val capped = TextOps.lshPairsBounded(exploded, maxBucketSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // normal buckets: all C(3,2)+C(2,2) pairs, ordered id_a < id_b
    assert(capped == Set((100L, 101L), (100L, 102L), (101L, 102L), (200L, 201L)),
      s"capped pairs wrong: $capped")
    // a cap above every bucket size reproduces the unbounded join exactly
    val unbounded = TextOps.lshPairsBounded(exploded, maxBucketSize = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unbounded.size == 780 + 4)
    assert(capped.subsetOf(unbounded))
  }

  test("lshPairsCapped: verify budget truncates per bucket deterministically, with audit") {
    // bucket "HOT" has 5 docs → 10 pairs; bucket "n1" has 2 docs → 1
    // pair; doc pair (1,2) ALSO shares bucket "n1", so it stays
    // reachable even where a cap would drop it elsewhere
    val exploded = ((1L to 5L).map(i => (i, 0, "HOT")) ++
      Seq((1L, 1, "n1"), (2L, 1, "n1"))).toDF("doc_id", "band_idx", "band_val")
    val (pairs, audit) = TextOps.lshPairsCapped(exploded, capPerBucket = 3)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // HOT keeps its first 3 pairs under (id_a, id_b): (1,2),(1,3),(1,4);
    // n1 keeps (1,2) — already present via HOT
    assert(got == Set((1L, 2L), (1L, 3L), (1L, 4L)), s"capped pairs wrong: $got")
    val a = audit.head()
    assert(a.getLong(0) == 1L, "exactly the HOT bucket truncates")
    assert(a.getLong(1) == 7L, "10 - 3 dropped candidate slots")
    // a cap above every bucket's pair count truncates nothing
    val (full, audit2) = TextOps.lshPairsCapped(exploded, capPerBucket = 100)
    assert(full.count() == 10)
    val a2 = audit2.head()
    assert(a2.getLong(0) == 0L && a2.getLong(1) == 0L)
  }

  test("bpeTrain: exact greedy merge semantics, including overlapping runs") {
    // (a,a) wins round 1 with weighted count 3+2 = 5 (abab contributes
    // (a,b)=2, (b,a)=1). Greedy left-to-right on overlap runs: aaaa →
    // [aa, aa] (positions 0 and 2 merge), aaa → [aa, a] (only position
    // 0 — position 1 was consumed), abab untouched.
    val words = Seq(("aaaa", 1L), ("aaa", 1L), ("abab", 1L)).toDF("w", "wcnt")
    val (merges, segs) = TextOps.bpeTrain(words, rounds = 1)
    assert(merges == Seq(("a", "a", 5L)), s"wrong merge: $merges")
    val got = segs.collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(got("aaaa") == Seq("aa", "aa"), s"aaaa -> ${got("aaaa")}")
    assert(got("aaa") == Seq("aa", "a"), s"aaa -> ${got("aaa")}")
    assert(got("abab") == Seq("a", "b", "a", "b"))
    // round 2 on the merged vocab: pairs are (aa,aa)=1, (aa,a)=1,
    // (a,b)=2, (b,a)=1 → (a,b) wins; abab → [ab, ab]
    val (m2, segs2) = TextOps.bpeTrain(words, rounds = 2)
    assert(m2.map(t => (t._1, t._2)) == Seq(("a", "a"), ("a", "b")), s"round-2 merges: $m2")
    val got2 = segs2.collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(got2("abab") == Seq("ab", "ab"), s"abab -> ${got2("abab")}")
    assert(got2("aaaa") == Seq("aa", "aa"))
  }

  test("lshPlan: S-curve geometry solver picks the shipped layouts; prob is monotone") {
    // 4-hash budget at threshold 0.5 must yield the gate geometry
    // (2 bands x 2 rows): inflections are 0.25 (4x1), 0.707 (2x2),
    // 1.0 (1x3, 1x4) -> 2x2 is nearest to 0.5
    val (b4, r4, s4) = TextOps.lshPlan(0.5, 4)
    assert((b4, r4) == ((2, 2)), s"got ${(b4, r4, s4)}")
    assert(math.abs(s4 - math.sqrt(0.5)) < 1e-12)
    // 16 hashes at 0.5: r=3/b=5 (s*=0.585) beats r=2/b=8 (0.354) and
    // r=4/b=4 (0.707)
    assert(TextOps.lshPlan(0.5, 16)._1 == 5 && TextOps.lshPlan(0.5, 16)._2 == 3)
    // a high threshold wants deeper bands (precision), a low one
    // shallower (recall): r must be non-decreasing in the threshold
    val rs = Seq(0.2, 0.5, 0.8).map(t => TextOps.lshPlan(t, 16)._2)
    assert(rs == rs.sorted, s"rows not monotone in threshold: $rs")
    // the candidate probability is monotone in s for any geometry and
    // hits its defining endpoints
    val ps = (0 to 10).map(i => TextOps.lshCandidateProb(i / 10.0, 5, 3))
    assert(ps == ps.sorted, s"S-curve not monotone: $ps")
    assert(math.abs(ps.head) < 1e-12 && math.abs(ps.last - 1.0) < 1e-12)
    // and the solver's s* really is where the curve crosses ~half for
    // its own geometry (inflection property: P(s*) = 1-(1-1/b)^b,
    // -> 1-1/e for large b; exact identity checked, not the limit)
    val (b, r, sStar) = TextOps.lshPlan(0.5, 16)
    val pAtStar = TextOps.lshCandidateProb(sStar, b, r)
    assert(math.abs(pAtStar - (1.0 - math.pow(1.0 - 1.0 / b, b))) < 1e-12)
  }

  test("bpe encode composition: trained segment lengths join back to exact per-doc totals") {
    // the t53 shape: train on the distinct-word vocab, then broadcast
    // the per-word final token counts onto the corpus word stream.
    // Hand-checked: (a,a) wins round 1 with weight 2*3 + 1*2 = 8, so
    // aaaa -> [aa,aa], aaa -> [aa,a], abab and xx untouched.
    val docs = Seq((1L, "aaaa abab xx"), (2L, "aaa aaaa")).toDF("doc_id", "text")
    val vocab = docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wcnt"))
    val (merges, segs) = TextOps.bpeTrain(vocab, rounds = 1)
    assert(merges == Seq(("a", "a", 8L)), s"wrong merge: $merges")
    val tokLen = segs.select(col("w"), size(col("toks")).cast("long").as("ntok"))
    val got = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .join(broadcast(tokLen), "w")
      .groupBy("doc_id").agg(count(lit(1)).as("n_words"),
        sum(col("ntok")).as("n_tokens"),
        sum(length(col("w")).cast("long")).as("n_bytes"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((3L, 8L, 10L)), s"doc 1: ${got(1L)}")   // 2 + 4 + 2 tokens
    assert(got(2L) == ((2L, 4L, 7L)), s"doc 2: ${got(2L)}")    // 2 + 2 tokens
  }

  test("pigeonholePairs: finds all Hamming<=3 pairs, misses none (losslessness)") {
    // hand-built 32-bit hashes: pairs at distance 0..3 must all surface,
    // a distance-4 pair must not, regardless of which blocks differ
    val hashes = Seq(
      1L -> 0x12345678L,
      2L -> 0x12345678L,              // d=0 vs 1
      3L -> 0x12345679L,              // d=1 vs 1 (block 0)
      4L -> (0x12345678L ^ 0x80000001L), // d=2, bits in blocks 0 and 3
      5L -> (0x12345678L ^ 0x01010100L), // d=3, spread over 3 blocks
      6L -> (0x12345678L ^ 0x01010101L)) // d=4 vs 1: must NOT pair with 1
    val df = hashes.toDF("doc_id", "sh")
    val got = TextOps.pigeonholePairs(df, blockBits = 8, nBlocks = 4, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute-force truth over the same hashes
    val want = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib, d.toLong)).toSet
    assert(got == want, s"got $got\nwant $want")
    assert(!got.exists(p => p._1 == 1L && p._2 == 6L))
  }

  test("pigeonholePairs: hot blocks emit no pairs — the t17 candidate ceiling") {
    // 30 docs share EVERY block (identical hash): with the cap at 10 the
    // whole cluster is dropped — this is the enforced ceiling that keeps
    // t17's 256-value geometry from going quadratic at a bigger sf — while
    // a small near-dup pair in cold blocks still surfaces.
    val hot = (1L to 30L).map(_ -> 0x0F0F0F0FL)
    val cold = Seq(100L -> 0x12345678L, 101L -> 0x12345679L)
    val df = (hot ++ cold).toDF("doc_id", "sh")
    val capped = TextOps.pigeonholePairs(df, blockBits = 8, nBlocks = 4,
        maxHamming = 3, maxBlockSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((100L, 101L)), s"capped pairs wrong: $capped")
    // cap above every occupancy reproduces the unguarded join: the hot
    // clique's C(30,2) pairs plus the cold pair
    val unbounded = TextOps.pigeonholePairs(df, blockBits = 8, nBlocks = 4,
        maxHamming = 3, maxBlockSize = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unbounded.size == 435 + 1)
    assert(capped.subsetOf(unbounded))
    // the losslessness precondition is enforced, not assumed
    intercept[IllegalArgumentException] {
      TextOps.pigeonholePairs(df, blockBits = 8, nBlocks = 4, maxHamming = 4)
    }
  }

  test("lshBands: empty shingle set → NULL bands, so short docs never join") {
    // <n-token docs have empty shingle arrays; every band must be NULL
    // (ANSI `||` propagation, same as the DuckDB oracle) — NOT "" — so a
    // band-equijoin can never collect all short docs into one hot bucket.
    val df = Seq((1L, "hi"), (2L, "yo"), (3L, "a b c d e")).toDF("doc_id", "text")
      .withColumn("sh", TextOps.wordNgrams(TextOps.tokens(col("text")), 3))
    val banded = df.select(col("doc_id") +: TextOps.lshBands(col("sh"), 4, 2): _*)
    val shortRows = banded.filter(col("doc_id") < 3).collect()
    assert(shortRows.forall(r => r.isNullAt(1) && r.isNullAt(2)),
      s"short docs must have NULL bands: ${shortRows.mkString(",")}")
    // and the long doc's bands are real values
    val longRow = banded.filter(col("doc_id") === 3).head()
    assert(!longRow.isNullAt(1) && !longRow.isNullAt(2))
    // a self-join on band value pairs no short docs with each other
    val a = banded.select(col("doc_id").as("ida"), col("band0"))
    val b = banded.select(col("doc_id").as("idb"), col("band0"))
    val pairs = a.join(b, Seq("band0")).filter(col("ida") < col("idb"))
    assert(pairs.count() == 0)
  }

  test("stopwordRatio + langIdHeuristic") {
    val en = Seq("the cat sat on the mat").toDF("text")
    val ratio = en.select(TextOps.stopwordRatio(TextOps.tokens(col("text")))).head().getDouble(0)
    assert(ratio == 0.5) // the, on, the of 6
    val pred = en.select(TextOps.langIdHeuristic(TextOps.tokens(col("text")))).head().getString(0)
    assert(pred == "en")
    val zz = Seq("zzz qqq www").toDF("text")
      .select(TextOps.langIdHeuristic(TextOps.tokens(col("text")))).head().getString(0)
    assert(zz == "unk")
  }

  test("countMinSketch: estimates never undercount, and collisions overcount") {
    // 200 distinct tokens into a deliberately tiny 2x16 sketch: collisions
    // are guaranteed, so some estimate must strictly overcount.
    val toks = (0 until 400).map(i => s"tok${i % 200}").toDF("tok")
    val sketch = TextOps.countMinSketch(toks, "tok", depth = 2, width = 16)
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("true_cnt"))
    val est = TextOps.cmsEstimate(sketch, exact, "tok", depth = 2, width = 16)
      .join(exact, "tok")
      .select(col("tok"), col("true_cnt"), col("est_cnt")).collect()
    assert(est.length == 200)
    assert(est.forall(r => r.getLong(2) >= r.getLong(1)), "CMS undercounted")
    assert(est.exists(r => r.getLong(2) > r.getLong(1)),
      "2x16 cells for 200 tokens must collide somewhere")
  }

  test("countMinSketch: partial sketches merge by cell addition") {
    val a = Seq("x", "y", "x").toDF("tok")
    val b = Seq("x", "z").toDF("tok")
    val whole = TextOps.countMinSketch(a.union(b), "tok", depth = 4, width = 64)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = TextOps.countMinSketch(a, "tok", depth = 4, width = 64)
      .union(TextOps.countMinSketch(b, "tok", depth = 4, width = 64))
      .groupBy("r", "cell").agg(sum("cnt").as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(whole == merged, "sum-merge of partial sketches != whole-corpus sketch")
  }

  test("charTrigrams: sliding windows, lowercase passthrough, short-string guard") {
    val t = Seq("abcd").toDF("text")
      .select(TextOps.charTrigrams(col("text"))).head().getSeq[String](0)
    assert(t == Seq("abc", "bcd"))
    // exactly 3 chars -> one trigram; under 3 -> empty, never junk from
    // a descending sequence()
    assert(Seq("abc").toDF("text").select(TextOps.charTrigrams(col("text")))
      .head().getSeq[String](0) == Seq("abc"))
    assert(Seq("ab").toDF("text").select(TextOps.charTrigrams(col("text")))
      .head().getSeq[String](0).isEmpty)
    assert(Seq("").toDF("text").select(TextOps.charTrigrams(col("text")))
      .head().getSeq[String](0).isEmpty)
  }

  test("trigram langid: separable corpus classifies perfectly; ties + unk are deterministic") {
    // two genuinely separable "languages": disjoint character inventories
    val train = Seq(
      (1L, "aaa bbb aab aba", "aa"),
      (2L, "abab baba abba", "aa"),
      (3L, "zzz yyy zzy yzz", "zz"),
      (4L, "zyzy yzyz zyyz", "zz")).toDF("doc_id", "text", "lang")
    // topN = 50 covers each language's full (small) trigram inventory —
    // at topN = 10 the count-1 ties resolve lexicographically and
    // space-led trigrams crowd out the letter-only ones the tie case uses
    val prof = TextOps.trigramProfiles(train, "text", "lang", topN = 50)
    val got = prof.collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.forall { case (l, tri) =>
      if (l == "aa") tri.forall(c => c == 'a' || c == 'b' || c == ' ')
      else tri.forall(c => c == 'z' || c == 'y' || c == ' ') },
      s"profiles mixed inventories: ${got.mkString(", ")}")
    val test = Seq(
      (10L, "abba baab abab"),  // clearly aa
      (11L, "zyyz yzzy zyzy"),  // clearly zz
      (12L, "qq"),              // sub-3-char -> zero trigrams -> unk
      (13L, "qqq www eee"))     // trigrams but zero profile overlap -> unk
      .toDF("doc_id", "text")
    val pred = TextOps.classifyByProfiles(test, "doc_id", "text", prof)
      .select("doc_id", "pred_lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred == Map(10L -> "aa", 11L -> "zz", 12L -> "unk", 13L -> "unk"), pred.toString)
    // an exact overlap tie resolves to the lexicographically smaller
    // lang: 'q' appears in no profile, so the only hits are one trigram
    // per language ("aaa" and "zzz") — 1 vs 1
    val tied = Seq((20L, "aaaqzzz")).toDF("doc_id", "text")
    val tp = TextOps.classifyByProfiles(tied, "doc_id", "text", prof).head()
    assert(tp.getAs[String]("pred_lang") == "aa")
  }

  test("scrubPii: counts, redaction, order, and the no-PII identity") {
    val docs = Seq(
      (1L, "mail a@b.io and c.d+x@e-f.org now"),
      (2L, "see https://x.y/z?a=1 and http://q.r then 10.0.0.1 ends"),
      (3L, "clean text with no matches at all"),
      (4L, "a@b.co http://a@b.co 1.2.3.4"))
      .toDF("doc_id", "text")
    val out = TextOps.scrubPii(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 2 && out(0).getLong(2) == 0 && out(0).getLong(3) == 0)
    assert(out(0).getString(4) == "mail <EMAIL> and <EMAIL> now")
    assert(out(1).getLong(2) == 2 && out(1).getLong(3) == 1)
    assert(out(1).getString(4) == "see <URL> and <URL> then <IP> ends")
    // no PII -> zero counts and the text passes through untouched
    assert(out(2).toSeq.drop(1) == Seq(0L, 0L, 0L, "clean text with no matches at all"))
    // order contract: URLs redact FIRST and counting is staged, so the
    // email inside http://a@b.co is consumed by the URL pass and only
    // the standalone a@b.co counts as an email
    assert(out(3).getLong(1) == 1, out(3).toString) // standalone a@b.co only
    assert(out(3).getLong(2) == 1 && out(3).getLong(3) == 1)
    assert(out(3).getString(4) == "<EMAIL> <URL> <IP>")
  }

  test("lmContinuation: hand-checked trigram continuation mass") {
    // corpus: "a b c" x2 and "a b d" -> c2("a b")=3, c3("a b c")=2,
    // c3("a b d")=1; doc scores: floor(1e6*2/3)=666666 for the two
    // "a b c" docs, 333333 for "a b d"
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a b d"))
      .toDF("doc_id", "text")
    val got = TextOps.lmContinuation(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 1L, 666666L), (2L, 1L, 666666L), (3L, 1L, 333333L)), got.toString)
  }
}
