package graft

import org.apache.spark.sql.functions._
import graft.queries.{RelationalQueries, Tables, VectorQueries}

/** The sketch gate entries (r21, r35) hash-match only their 10% bound
  * VERDICTS, and the approximate-ANN entries (v3, v4 — both fully
  * hash-checked for REPLAYABILITY) say nothing about retrieval QUALITY,
  * so this spec measures the raw sketch error and recall against the
  * exact twins at much tighter tolerances and publishes the numbers to
  * `docs/QUALITY.json` — a committed, driver-readable artifact. All
  * inputs/seeds are fixed, so the values are deterministic run-to-run.
  */
class QualityMetricsSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.01"

  private def gate(name: String) =
    (RelationalQueries.all ++ VectorQueries.all).find(_.name == name).get.run(spark, sf01)

  private def topkSet(name: String): Set[(Long, Long)] =
    gate(name).select(col("qid"), col("nid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("measure v3/v4/v6/v9 recall and r21/r35 sketch error; publish QUALITY.json") {
    val exactTopk = topkSet("v1_cosine_topk")
    val v3Recall = (exactTopk intersect topkSet("v3_lsh_topk")).size.toDouble / exactTopk.size
    val v4Recall = (exactTopk intersect topkSet("v4_ivf_topk")).size.toDouble / exactTopk.size
    // v9 is EXACT search over 8-bit-quantized vectors: its disagreement
    // with v1 is pure quantization error, so the agreement floor is much
    // higher than the candidate-pruning paths (v3/v4)
    val v9Agree = (exactTopk intersect topkSet("v9_sq8_topk")).size.toDouble / exactTopk.size
    // v10 is 1-bit binarization - the lossiest path; its floor documents
    // that popcount(xor) still carries real signal, not rank fidelity
    val v10Agree = (exactTopk intersect topkSet("v10_bitpack_topk")).size.toDouble / exactTopk.size
    // v11 is PQ-ADC: codebook quantization error PLUS an L2-vs-cosine
    // metric gap (the corpus is unnormalized), so its floor sits between
    // v10's binarized extreme and v9's near-exact agreement
    val v11Agree = (exactTopk intersect topkSet("v11_pq_topk")).size.toDouble / exactTopk.size
    // v28 is 4-bit affine SQ with nibble packing — 16 levels sit
    // between v9's 256 (≈ exact) and v10's 2 (sign-only); its floor
    // prices the 8×-smaller index
    val v28Agree = (exactTopk intersect topkSet("v28_sq4_topk")).size.toDouble / exactTopk.size
    // v22 is PQ-ADC at v11's exact geometry (8×8d×64) but with
    // codebooks trained to CONVERGENCE (movement-floor k-means) instead
    // of one fixed Lloyd round — the trained-codebook recall row round
    // 13 asked for; on this corpus the converged fit matches the
    // 1-round agreement while guaranteeing stable codebooks
    val v22Agree = (exactTopk intersect topkSet("v22_pq_trained")).size.toDouble / exactTopk.size
    // v24 composes BOTH approximations — v4's 3-probe candidate pruning
    // AND v22's ADC codebook quantization — so its agreement is bounded
    // above by each component's and its floor documents the compounded
    // loss of the full IVFADC layout
    val v24Agree = (exactTopk intersect topkSet("v24_ivfpq_topk")).size.toDouble / exactTopk.size
    // probes/agreement curve for the composed layout — the same knob
    // framing as v13/v15: more probed cells per query means more ADC
    // candidates and higher agreement, cost ∝ probes/cells
    def v24AgreeAtProbes(p: Int): Double = {
      val approx = graft.queries.VectorQueries.ivfPqTopK(spark, sf01, p)
        .select(col("qid"), col("nid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exactTopk intersect approx).size.toDouble / exactTopk.size
    }
    val v24Curve = Seq(2, 3, 4).map(p => p -> v24AgreeAtProbes(p))
    // v29 = v24 with RESIDUAL encoding (classic IVFADC): same coarse
    // quantizer, same code budget, same probes — the published delta
    // vs v24 at equal probes is the value of coding x − c(cell)
    // instead of x. Honest note if flat: on this corpus the coarse
    // cells may carry little of the variance.
    val v29Agree = (exactTopk intersect topkSet("v29_ivfpq_residual")).size.toDouble / exactTopk.size
    def v29AgreeAtProbes(p: Int): Double = {
      val approx = graft.queries.VectorQueries.ivfPqResidualTopK(spark, sf01, p)
        .select(col("qid"), col("nid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exactTopk intersect approx).size.toDouble / exactTopk.size
    }
    val v29Curve = Seq(2, 3, 4).map(p => p -> v29AgreeAtProbes(p))
    // v25 = exact re-rank of the 20-deep ADC shortlist: must recover
    // (essentially all of) what ADC mis-ordering cost within the
    // probed cells — the remaining gap to 1.0 is pure candidate
    // pruning (cells the 3 probes never opened)
    val v25Agree = (exactTopk intersect topkSet("v25_ivfpq_rerank")).size.toDouble / exactTopk.size
    // shortlist-depth/agreement curve for the re-rank: unlike the ADC
    // probe curve this IS provably monotone — the exact-reranked top-5
    // of a wider shortlist keeps every global-top-5 member the
    // shortlist contains (anything outscoring it by TRUE cosine is
    // itself global top-5), so agreement(depth) = |top5 ∩ shortlist|/5,
    // non-decreasing, with the 3-probe cell recall as its ceiling
    def v25AgreeAtDepth(sl: Int): Double = {
      val approx = graft.queries.VectorQueries
        .ivfPqRerank(spark, sf01, nProbe = 3, shortlist = sl, topK = 5)
        .select(col("qid"), col("nid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exactTopk intersect approx).size.toDouble / exactTopk.size
    }
    val v25Curve = Seq(10, 20, 40).map(sl => sl -> v25AgreeAtDepth(sl))

    // v6 pair recall vs the exhaustive threshold set: how many true
    // cos>=0.35 pairs does single-assignment cell blocking keep? (the
    // misses are cell-boundary pairs — the documented trade)
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("id_a"), col("id_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val emb = graft.queries.Tables.embeddings(spark, sf01)
    val prepped = graft.vector.VectorOps.prepareVectors(emb, "embedding")
    val a = prepped.select(col("vec_id").as("id_a"), col("__cd").as("va"), col("__cn").as("na"))
    val b = prepped.select(col("vec_id").as("id_b"), col("__cd").as("vb"), col("__cn").as("nb"))
    val allPairs = pairSet(a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .filter(aggregate(zip_with(col("va"), col("vb"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x) / (col("na") * col("nb")) >= 0.35))
    val v6Pairs = pairSet(gate("v6_ivf_neardup"))
    assert(v6Pairs.subsetOf(allPairs), "v6 emitted a pair below threshold")
    val v6Recall = if (allPairs.isEmpty) 1.0
      else (allPairs intersect v6Pairs).size.toDouble / allPairs.size

    // v13's 100 TB path: IVF-cell candidate generation (v4's quantizer,
    // 2-probe) feeding the SAME reciprocation join — measure how much of
    // the exact mutual-kNN edge set that approximation keeps. The gate
    // query is the exact twin; this number is the documented cost of
    // switching to the scale path (cell-boundary neighbor lists are the
    // misses, exactly v6's geometry).
    val exactEdges = pairSet(gate("v13_knn_graph"))
    val allQ = prepped.select(col("vec_id").as("qid"), col("embedding").as("qv"))
    // probe-count/recall CURVE, not a single point: the published numbers
    // are the measured knob a 100 TB operator turns (more probes = more
    // candidate cells per query = higher recall, cost ∝ probes/cells);
    // the headline operating point is 3-probe.
    def edgeRecallAtProbes(p: Int): Double = {
      val approxKnn = graft.vector.VectorOps
        .ivfTopK(allQ, emb, 5, nCentroids = 8, nProbe = p)
        .select(col("qid").as("src"), col("vec_id").as("dst"))
      val approxEdges = pairSet(approxKnn.as("f")
        .join(approxKnn.as("r"),
          col("f.src") === col("r.dst") && col("f.dst") === col("r.src"))
        .filter(col("f.src") < col("f.dst"))
        .select(col("f.src").as("id_a"), col("f.dst").as("id_b")))
      if (exactEdges.isEmpty) 1.0
      else (exactEdges intersect approxEdges).size.toDouble / exactEdges.size
    }
    val v13Curve = Seq(2, 3, 4).map(p => p -> edgeRecallAtProbes(p))
    val v13EdgeRecall = v13Curve.toMap.apply(3)

    // v15's documented scale path: norm-augmented IVF MIPS
    // (VectorOps.mipsTopKAugmented) vs the exact weighted-MIPS gate —
    // same probe-knob framing as v13's curve
    val exactMips = topkSet("v15_mips_topk")
    val wcol = lit(1.0) + (col("vec_id") % 5).cast("double")
    val wCorpus = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double") * wcol).as("embedding"))
    val mipsQ = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    def mipsRecallAtProbes(p: Int): Double = {
      val approx = graft.vector.VectorOps
        .mipsTopKAugmented(mipsQ, wCorpus, 5, nCentroids = 8, nProbe = p)
        .select(col("qid"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exactMips intersect approx).size.toDouble / exactMips.size
    }
    val v15Curve = Seq(2, 3).map(p => p -> mipsRecallAtProbes(p))
    val v15Recall = v15Curve.toMap.apply(2)

    val exactDistinct = gate("r20_distinct_count")
      .select(col("l_returnflag"), col("n_parts")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // raw sketch values, computed inline: since round 7 the r21/r35 gate
    // rows emit bound VERDICTS (hash-matchable booleans), not estimates
    val approxDistinct = Tables.lineitem(spark, sf01)
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val r21MaxRelErr = exactDistinct.map { case (k, e) =>
      math.abs(e - approxDistinct(k)).toDouble / e }.max

    val exactQ = gate("r33_median").collect().map { r =>
      r.getString(0) -> (1 to 3).map(i => r.get(i).toString.toDouble)
    }.toMap
    val approxQ = Tables.lineitem(spark, sf01)
      .groupBy("l_returnflag")
      .agg(
        expr("approx_percentile(CAST(floor(l_quantity + 0.5) AS BIGINT), 0.5, 1000)").as("am"),
        expr("approx_percentile(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT), array(0.25, 0.75), 1000)").as("aq"))
      .collect().map { r =>
        val aq = r.getSeq[Long](2)
        r.getString(0) -> Seq(r.getLong(1).toDouble, aq(0).toDouble, aq(1).toDouble)
      }.toMap
    val r35MaxRelErr = exactQ.flatMap { case (k, es) =>
      es.zip(approxQ(k)).map { case (e, a) => math.abs(e - a) / math.max(math.abs(e), 1.0) }
    }.max

    // quantitative floors for the rows-only gate entries
    assert(v3Recall >= 0.2, s"v3 recall $v3Recall")  // 4 planes = 16 buckets
    assert(v4Recall >= 0.3, s"v4 recall $v4Recall")
    assert(v9Agree >= 0.8, s"v9 top-5 agreement $v9Agree")
    assert(v10Agree >= 0.1, s"v10 top-5 agreement $v10Agree")
    assert(v11Agree >= 0.1, s"v11 top-5 agreement $v11Agree")
    assert(v22Agree >= 0.1, s"v22 top-5 agreement $v22Agree")
    assert(v24Agree >= 0.05, s"v24 top-5 agreement $v24Agree")
    assert(v24Agree <= v22Agree + 1e-9 || v24Agree <= v4Recall + 1e-9,
      s"v24 ($v24Agree) cannot beat BOTH of its components (v4 $v4Recall, v22 $v22Agree)")
    // NOT asserted monotone, deliberately: v13/v15's curves rank
    // candidates with EXACT cosine, so more probed cells is a superset
    // of candidates and agreement can only rise; v24 ranks with ADC,
    // and an extra probed cell can admit a candidate whose QUANTIZED
    // score overtakes a true top-5 item — measured here as 4-probe
    // dipping below 3-probe (0.28 vs 0.30). That interaction is a real
    // property of IVFADC (the reason production systems re-rank a
    // wider ADC shortlist with exact vectors), so the curve is
    // published as measured and only sanity-bounded.
    assert(v24Curve.forall { case (_, r) => r > 0.0 && r <= 1.0 },
      s"v24 probe/agreement curve out of range: $v24Curve")
    assert(math.abs(v24Curve.toMap.apply(3) - v24Agree) < 1e-9,
      s"curve@3 must equal the gate operating point")
    assert(v25Agree >= v24Agree - 1e-9,
      s"exact re-rank ($v25Agree) must not lose to raw ADC ($v24Agree)")
    assert(v25Agree >= 0.2, s"v25 re-ranked agreement $v25Agree")
    assert(v29Agree >= 0.05, s"v29 residual-IVFADC agreement $v29Agree")
    assert(v29Curve.forall { case (_, r) => r > 0.0 && r <= 1.0 },
      s"v29 probe/agreement curve out of range: $v29Curve")
    assert(math.abs(v29Curve.toMap.apply(3) - v29Agree) < 1e-9,
      s"v29 curve@3 must equal the gate operating point")
    assert(v25Curve.sliding(2).forall { case Seq(a, b) => b._2 >= a._2 - 1e-9 },
      s"v25 depth/agreement curve must be monotone (exact re-rank of a superset): $v25Curve")
    assert(math.abs(v25Curve.toMap.apply(20) - v25Agree) < 1e-9,
      s"v25 curve@20 must equal the gate operating point")
    assert(v25Curve.forall { case (_, r) => r <= v4Recall + 1e-9 },
      s"re-rank cannot exceed the probed-cell recall ceiling (v4 $v4Recall): $v25Curve")
    assert(v6Recall >= 0.5, s"v6 pair recall $v6Recall")
    assert(v13EdgeRecall >= 0.4, s"v13 IVF-path edge recall $v13EdgeRecall")
    assert(v15Recall >= 0.3, s"v15 augmented-IVF MIPS recall $v15Recall")
    assert(v15Curve.sliding(2).forall { case Seq(a, b) => b._2 >= a._2 - 1e-9 },
      s"v15 probe/recall curve not monotone: $v15Curve")
    // the curve must be monotone in probes — a dip means the quantizer
    // or candidate generation is broken, not just lossy
    assert(v13Curve.sliding(2).forall { case Seq(a, b) => b._2 >= a._2 - 1e-9 },
      s"v13 probe/recall curve not monotone: $v13Curve")
    assert(v28Agree >= 0.3 && v28Agree <= v9Agree + 1e-9,
      s"v28 int4 agreement $v28Agree must sit under v9's 8-bit $v9Agree")
    assert(r21MaxRelErr <= 0.05, s"r21 rel err $r21MaxRelErr") // rsd 0.02
    assert(r35MaxRelErr <= 0.01, s"r35 rel err $r35MaxRelErr")

    // v26: does cost-aware k-means‖ seeding actually beat the uniform
    // md5-ordered seeding the other fits use? Total assignment cost
    // (integer micro-units, min-dist2 over the 8 centers) on the same
    // ‰ sample, k-means‖ top-8-by-weight candidates vs the first 8
    // uniform seeds — the ratio documents the init-quality win the
    // oversampling pass buys before any Lloyd round runs.
    val embAll = spark.read.parquet(s"$sf01/embeddings.parquet")
    val kppSample = embAll
      .filter(graft.text.TextOps.deterministicSample(col("vec_id"), 200, "ivf"))
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("xd"))
      .cache()
    def costOf(centers: Seq[Seq[Double]]): Long = kppSample
      .select(floor(array_min(graft.vector.VectorOps.cellDists(col("xd"), centers))
        * lit(1000000.0) + lit(0.5)).cast("long").as("c"))
      .agg(sum("c")).head().getLong(0)
    val kppTop = graft.vector.VectorOps.kmeansParallelInit(embAll, rounds = 3, ell = 4)
      .orderBy(col("weight").desc, col("cand_id").asc).limit(8)
      .select("cand_id").collect().map(_.getLong(0))
    val kppCenters = kppSample.filter(col("vec_id").isin(kppTop: _*))
      .orderBy("vec_id").select("xd").collect().map(_.getSeq[Double](0).toSeq).toSeq
    val uniCenters = kppSample
      .withColumn("__h", md5(concat(lit("ivfseed"), col("vec_id").cast("string"))))
      .orderBy(col("__h"), col("vec_id")).limit(8)
      .select("xd").collect().map(_.getSeq[Double](0).toSeq).toSeq
    val v26Ratio = costOf(kppCenters).toDouble / costOf(uniCenters)
    kppSample.unpersist()
    assert(v26Ratio <= 1.2, s"k-means‖ init cost ratio vs uniform: $v26Ratio")

    val json =
      f"""{
         |  "sf": "$sf01",
         |  "v26_kmeanspar_init": {"init_cost_ratio_vs_uniform": $v26Ratio%.4f, "ceiling": 1.2},
         |  "v3_lsh_topk":        {"recall_at_5_vs_v1": $v3Recall%.4f, "floor": 0.2},
         |  "v4_ivf_topk":        {"recall_at_5_vs_v1": $v4Recall%.4f, "floor": 0.3},
         |  "v6_ivf_neardup":     {"pair_recall_vs_exhaustive": $v6Recall%.4f, "floor": 0.5},
         |  "v13_knn_graph":      {"edge_recall_ivf_3probe_vs_exact": $v13EdgeRecall%.4f, "floor": 0.4,
         |                         "probe_recall_curve": {${v13Curve.map { case (p, r) => f""""$p": $r%.4f""" }.mkString(", ")}}},
         |  "v15_mips_topk":      {"recall_at_5_aug_ivf_2probe_vs_exact": $v15Recall%.4f, "floor": 0.3,
         |                         "probe_recall_curve": {${v15Curve.map { case (p, r) => f""""$p": $r%.4f""" }.mkString(", ")}}},
         |  "v9_sq8_topk":        {"topk_agreement_vs_v1": $v9Agree%.4f, "floor": 0.8},
         |  "v10_bitpack_topk":   {"topk_agreement_vs_v1": $v10Agree%.4f, "floor": 0.1},
         |  "v28_sq4_topk":       {"topk_agreement_vs_v1": $v28Agree%.4f, "floor": 0.3},
         |  "v11_pq_topk":        {"topk_agreement_vs_v1": $v11Agree%.4f, "floor": 0.1},
         |  "v22_pq_trained":     {"topk_agreement_vs_v1": $v22Agree%.4f, "floor": 0.1},
         |  "v24_ivfpq_topk":     {"topk_agreement_vs_v1": $v24Agree%.4f, "floor": 0.05,
         |                         "probe_agreement_curve": {${v24Curve.map { case (p, r) => f""""$p": $r%.4f""" }.mkString(", ")}}},
         |  "v29_ivfpq_residual": {"topk_agreement_vs_v1": $v29Agree%.4f, "floor": 0.05,
         |                         "delta_vs_v24_same_probes": ${f"${v29Agree - v24Agree}%.4f"},
         |                         "probe_agreement_curve": {${v29Curve.map { case (p, r) => f""""$p": $r%.4f""" }.mkString(", ")}},
         |                         "coarse_book_sweep": "docs/V29_SWEEP_r16.json — documented negative: 8/32/64-cell sweep at fixed code budget; residuals never separate (corpus is near-isotropic, absorption is cell-mean overfit), rotation ruled out by the leading-axis share"},
         |  "v25_ivfpq_rerank":   {"topk_agreement_vs_v1": $v25Agree%.4f, "floor": 0.2,
         |                         "rerank_depth_curve": {${v25Curve.map { case (sl, r) => f""""$sl": $r%.4f""" }.mkString(", ")}}},
         |  "r21_approx_distinct": {"max_rel_err_vs_r20": $r21MaxRelErr%.4f, "bound": 0.05},
         |  "r35_approx_quantile": {"max_rel_err_vs_r33": $r35MaxRelErr%.4f, "bound": 0.01}
         |}
         |""".stripMargin
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/root/repo/docs/QUALITY.json"),
      json.getBytes("UTF-8"))
    info(json)
  }
}
