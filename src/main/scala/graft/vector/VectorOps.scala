package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity-search primitives over `array<float>` columns.
  *
  * All arithmetic is promoted to double before any reduction so results
  * are engine-portable and precision doesn't collapse on long vectors.
  * The brute-force path is the correctness baseline; the LSH path is the
  * 100 TB scale path (candidate generation by bucket join instead of a
  * cross join — cross-join cost O(|Q|·|C|) becomes O(Σ bucket²)).
  */
object VectorOps {

  private def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Cast + L2-norm a vector column ONCE: adds `cd` (array<double>) and
    * `cn` (norm). [[bruteForceTopK]], [[lshTopK]], [[ivfTopK]] and
    * [[nearDupPairs]] skip their own cast/norm when these columns are
    * already present, so a pipeline (or the gate's per-dir memo in
    * VectorQueries) can persist this projection once and share it across
    * every similarity query — at 100 TB the cast+norm pass over the
    * corpus is a real scan you pay exactly once, and on a loaded machine
    * it is the difference between re-deriving the projection per run and
    * reading a cached columnar frame.
    */
  /** Column metadata key recording which source column a prepared `__cd`
    * was derived from — [[ensurePrepared]] checks it so a frame prepared
    * from column X can't silently serve a query asking about column Y.
    */
  private[vector] val SourceColKey = "graft.vector.source"

  def prepareVectors(df: DataFrame, vecCol: String,
                     cd: String = "__cd", cn: String = "__cn"): DataFrame = {
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putString(SourceColKey, vecCol).build()
    df.withColumn(cd, asDouble(col(vecCol)).as(cd, meta))
      .withColumn(cn, sqrt(rawDot(col(cd), col(cd))))
  }

  /** Reuse an existing `cd`/`cn` projection when present, else derive it.
    * When the prepared column carries [[prepareVectors]]' source metadata
    * AND that source column is still in the frame under its original
    * name, a `vecCol` mismatch throws — passing a frame whose `__cd` came
    * from a different (still-present) column would otherwise return wrong
    * similarities with no error. A recorded source that is no longer a
    * column was renamed or dropped alongside the prepared projection
    * (e.g. `embedding→qv` with `__cd→__qd`), which the check cannot
    * adjudicate — those, and hand-built projections without the metadata,
    * are accepted on the documented contract that `cd` IS derived from
    * `vecCol`.
    */
  private def ensurePrepared(df: DataFrame, vecCol: String,
                             cd: String, cn: String): DataFrame =
    if (df.columns.contains(cd) && df.columns.contains(cn)) {
      val meta = df.schema(cd).metadata
      if (meta.contains(SourceColKey)) {
        val src = meta.getString(SourceColKey)
        require(src == vecCol || !df.columns.contains(src),
          s"prepared column $cd was derived from '$src' but the query asks about '$vecCol'")
      }
      df
    } else prepareVectors(df, vecCol, cd, cn)

  /** Dot product of two ALREADY-double arrays (no per-call cast) —
    * sequential left-to-right, engine-portable. Native codegen expression
    * ([[graft.functions.DotProductD]]): the aggregate(zip_with(...))
    * composition computes the same values but runs interpreted
    * (higher-order functions have no codegen) — a measured 1M-candidate
    * blocked join spent ~5 s on interpreted 64-dim dots alone.
    */
  def rawDot(a: Column, b: Column): Column =
    graft.functions.native.dotD(a, b)

  /** Sequential left-to-right dot product in double precision. */
  def dot(a: Column, b: Column): Column = rawDot(asDouble(a), asDouble(b))

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Squared L2 distance in double precision (casts each side first) —
    * the [[graft.functions.native.dist2D]] kernel behind a cast, the
    * companion of [[dot]] for SQL registration (`graft_l2dist2`).
    */
  def l2Dist2(a: Column, b: Column): Column =
    graft.functions.native.dist2D(asDouble(a), asDouble(b))

  /** Exact top-k neighbors for each query vector: broadcast the (small)
    * query set, stream the corpus through a map-side cross join, rank per
    * query. No corpus shuffle — the heavy side is touched exactly once.
    * Returns exactly `(qId, cId, cos, rnk)`: the scored frame is cut to
    * those four columns BEFORE the ranking window, so the per-query sort
    * exchange moves 4 scalars per candidate, never the vectors — with an
    * n×n query set (v13's kNN graph) the difference is the whole shuffle
    * (n² × 2×64 doubles ≈ GBs) vs n² × 24 bytes.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     qId: String = "qid", qVec: String = "qv",
                     cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    // cast + norm each side ONCE before the join (skipped when the caller
    // passes a [[prepareVectors]] projection); per-pair work is a single
    // dot product (same values as cosine-per-pair, 3x fewer flops)
    val q = ensurePrepared(queries, qVec, "__qd", "__qn")
    val c = ensurePrepared(corpus, cVec, "__cd", "__cn")
    val scored = broadcast(q).crossJoin(c)
      .filter(col(qId) =!= col(cId))
      .select(col(qId), col(cId),
        (rawDot(col("__qd"), col("__cd")) / (col("__qn") * col("__cn"))).as("cos"))
    val w = Window.partitionBy(qId).orderBy(col("cos").desc, col(cId).asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** Exact MAX-INNER-PRODUCT top-k (MIPS) — the recommendation-retrieval
    * ranking (user·item score), which cosine ANN does NOT answer: inner
    * product is not a metric (no triangle inequality, long vectors win
    * regardless of angle), so cosine-ranked neighbors are wrong whenever
    * norms vary. Same broadcast-queries × streamed-corpus shape and
    * 24-byte shuffle contract as [[bruteForceTopK]]. The standard ANN
    * scale path is the norm-augmentation reduction (Bachrach et al.
    * 2014): append sqrt(M² − ‖x‖²) to each corpus vector and 0 to each
    * query (M = max corpus norm) — argmax inner product becomes argmin
    * L2 / argmax cosine on the augmented space, after which the IVF
    * machinery (v4) applies unchanged.
    */
  def maxInnerProductTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                          qId: String = "qid", qVec: String = "qv",
                          cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val q = ensurePrepared(queries, qVec, "__qd", "__qn")
    val c = ensurePrepared(corpus, cVec, "__cd", "__cn")
    val scored = broadcast(q).crossJoin(c)
      .filter(col(qId) =!= col(cId))
      .select(col(qId), col(cId), rawDot(col("__qd"), col("__cd")).as("ip"))
    val w = Window.partitionBy(qId).orderBy(col("ip").desc, col(cId).asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** The MIPS ANN SCALE PATH: norm augmentation (Bachrach et al. 2014)
    * then the stock IVF machinery. Each corpus vector x becomes
    * [x, sqrt(M² − ‖x‖²)] (M = max corpus norm — ONE aggregate, exact
    * selection) and each query [q, 0]: every augmented corpus vector has
    * norm M, so cosine ranking on the augmented space EQUALS inner-
    * product ranking on the original — after which [[ivfTopK]] applies
    * unchanged (quantizer fit on the augmented vectors, probe ∝
    * nProbe/nCentroids of the corpus per query). Recall vs the exact
    * [[maxInnerProductTopK]] is measured in QualityMetricsSpec and
    * published to docs/QUALITY.json next to the cosine paths' numbers.
    */
  def mipsTopKAugmented(queries: DataFrame, corpus: DataFrame, k: Int,
                        nCentroids: Int, nProbe: Int, seed: Long = 42L,
                        qId: String = "qid", qVec: String = "qv",
                        cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val c0 = corpus.withColumn("__cd0", asDouble(col(cVec)))
      .withColumn("__n0", sqrt(rawDot(col("__cd0"), col("__cd0"))))
    val m = c0.agg(max(col("__n0"))).head().getDouble(0)
    val caug = c0.withColumn("__aug",
        concat(col("__cd0"),
          array(sqrt(greatest(lit(0.0), lit(m * m) - col("__n0") * col("__n0"))))))
      .drop("__cd0", "__n0")
    val qaug = queries.withColumn("__qaug",
      concat(asDouble(col(qVec)), array(lit(0.0))))
    ivfTopK(qaug, caug, k, nCentroids, nProbe, seed,
        qId, "__qaug", cId, "__aug")
      .drop("__qaug", "__aug")
  }

  /** Deterministic pseudo-random hyperplane coefficients (±1) for sign-LSH:
    * plane p, dim i gets the sign of the high bit of md5("p_i"). Computed
    * once on the driver, shipped as literals — no per-row hashing.
    */
  def planeCoefs(plane: Int, dims: Int): Seq[Double] = {
    val mdig = java.security.MessageDigest.getInstance("MD5")
    (0 until dims).map { i =>
      val h = mdig.digest(s"${plane}_$i".getBytes("UTF-8"))
      if ((h(0) & 0x80) != 0) 1.0 else -1.0
    }
  }

  /** Sign-LSH bucket id: one bit per hyperplane (sign of the projection),
    * concatenated to a bit-string. Vectors in the same bucket are
    * candidate neighbors; P planes → 2^P buckets.
    */
  def lshBucket(vec: Column, planes: Int, dims: Int): Column = {
    val bits = (0 until planes).map { p =>
      val proj = graft.functions.native.dotD(
        asDouble(vec), typedLit(planeCoefs(p, dims)))
      when(proj > 0, "1").otherwise("0")
    }
    concat(bits: _*)
  }

  /** Multiprobe expansion: the query's own bucket plus every bucket at
    * Hamming distance 1 (one flipped hyperplane sign). Standard LSH
    * recall lever — vectors near a hyperplane land on either side, so
    * probing the adjacent buckets recovers them without shrinking the
    * bucket count. `planes+1` probes of `2^planes` buckets.
    */
  private def lshProbes(bucket: Column, planes: Int): Column = {
    val flips = (0 until planes).map { p =>
      val flipped = when(substring(bucket, p + 1, 1) === "1", "0").otherwise("1")
      concat(substring(bucket, 1, p), flipped, substring(bucket, p + 2, planes - p - 1))
    }
    array(bucket +: flips: _*)
  }

  /** Approximate top-k: candidates limited to the query's LSH bucket and
    * (multiprobe) its Hamming-1 neighbors, then exact cosine rank within
    * the candidates. Recall trades off with `planes`; the shuffle is a
    * bucket-key join, never a cross join. Each (query, corpus) pair can
    * match at most once — the corpus side keeps a single bucket and probe
    * values are distinct.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, planes: Int, dims: Int,
              qId: String = "qid", qVec: String = "qv",
              cId: String = "vec_id", cVec: String = "embedding",
              multiprobe: Boolean = true): DataFrame = {
    val qb0 = queries.withColumn("__b0", lshBucket(col(qVec), planes, dims))
    val qb = ensurePrepared(
      (if (multiprobe)
        qb0.withColumn("bucket", explode(lshProbes(col("__b0"), planes)))
      else qb0.withColumn("bucket", col("__b0"))).drop("__b0"),
      qVec, "__qd", "__qn")
    val cb = ensurePrepared(
      corpus.withColumn("bucket", lshBucket(col(cVec), planes, dims)),
      cVec, "__cd", "__cn")
    val scored = qb.join(cb, "bucket")
      .filter(col(qId) =!= col(cId))
      .withColumn("cos", rawDot(col("__qd"), col("__cd")) / (col("__qn") * col("__cn")))
    val w = Window.partitionBy(qId).orderBy(col("cos").desc, col(cId).asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .drop("bucket", "__qd", "__qn", "__cd", "__cn")
  }

  /** Train the IVF coarse quantizer on a DETERMINISTIC sample of the
    * corpus — never the full corpus: at 100 TB the quantizer only needs a
    * representative few-hundred-per-centroid sample, and the content-hash
    * predicate ([[graft.text.TextOps.deterministicSample]]) makes the fit
    * reproducible across runs/partitionings, so the model can be persisted
    * (`model.save`) and reused by every query batch instead of refit.
    *
    * @param samplePermille sample rate in ‰; the fit falls back to the full
    *   corpus only when the sample has fewer rows than `nCentroids`
    *   (tiny-corpus guard — a cheap count on the sample, not the corpus)
    */
  def trainQuantizer(corpus: DataFrame, nCentroids: Int, seed: Long = 42L,
                     cId: String = "vec_id", cVec: String = "embedding",
                     samplePermille: Int = 200): org.apache.spark.ml.clustering.KMeansModel = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val sampled = corpus
      .filter(graft.text.TextOps.deterministicSample(col(cId), samplePermille, "ivf"))
    val train = if (sampled.limit(nCentroids).count() < nCentroids) corpus else sampled
    // cache across Lloyd iterations — KMeans re-reads the input per round
    val trainV = train.select(array_to_vector(asDouble(col(cVec))).as("__vec")).cache()
    try new KMeans().setK(nCentroids).setSeed(seed).setMaxIter(5)
      .setFeaturesCol("__vec").setPredictionCol("__cell")
      .fit(trainV)
    finally { trainV.unpersist(); () }
  }

  /** Squared L2 distances from `vec` (array<double>) to each centroid, as
    * one array column — sequential left-to-right folds in double, so the
    * values (and any argmin over them) are bit-identical across engines.
    */
  def cellDists(vec: Column, centroids: Seq[Seq[Double]]): Column =
    array(centroids.map(c =>
      graft.functions.native.dist2D(vec, typedLit(c))): _*)

  /** Nearest-centroid cell id (0-based); ties break to the lowest cell.
    * `array_position` returns the FIRST index of the min, which is the
    * same rule the oracle replays with `row_number() OVER (ORDER BY
    * dist2, cell)`.
    */
  def assignCell(vec: Column, centroids: Seq[Seq[Double]]): Column = {
    val d = cellDists(vec, centroids)
    (array_position(d, array_min(d)) - 1).cast("int")
  }

  /** Deterministic coarse quantizer: Lloyd's KMeans with md5-ordered
    * seeding and exact micro-unit centroid updates, so the fit — and every
    * downstream cell assignment — is bit-replayable in any engine:
    *
    *  - TRAIN SET: the deterministic content-hash sample
    *    ([[graft.text.TextOps.deterministicSample]], salt "ivf") — stable
    *    under repartitioning, never the full corpus.
    *  - SEEDS: the `nCentroids` sample rows with the smallest
    *    (md5("ivfseed"‖id), id) — a portable total order, unlike KMeans++
    *    whose RNG sequence is engine-private.
    *  - UPDATE: component sums in micro-unit BIGINT (exact, order-free —
    *    the same trick as the v5 centroid gate), one IEEE division at the
    *    end; empty cells keep their previous centroid.
    *  - A FIXED `iters` Lloyd rounds, not convergence-tested — replayable
    *    as a fixed CTE chain.
    *
    * Each round is one Spark job collecting `nCentroids × dims` tiny agg
    * rows to the driver; the sample is cached across rounds. Train once,
    * ship the centroids as literals to every query batch ([[ivfTopK]]
    * `centroids` overload) — at 100 TB the quantizer is fit on a ‰ sample
    * and reused, never refit per query.
    */
  def deterministicCentroids(corpus: DataFrame, nCentroids: Int, iters: Int = 2,
                             cId: String = "vec_id", cVec: String = "embedding",
                             samplePermille: Int = 200): Array[Seq[Double]] = {
    val sample = corpus
      .filter(graft.text.TextOps.deterministicSample(col(cId), samplePermille, "ivf"))
      .select(col(cId).as("__id"), asDouble(col(cVec)).as("__xd"))
      .cache()
    try {
      var centroids: Array[Seq[Double]] = sample
        .withColumn("__h", md5(concat(lit("ivfseed"), col("__id").cast("string"))))
        .orderBy(col("__h"), col("__id"))
        .limit(nCentroids)
        .select("__xd").collect().map(_.getSeq[Double](0))
      require(centroids.length == nCentroids,
        s"sample has only ${centroids.length} rows for $nCentroids centroids — raise samplePermille")
      for (_ <- 0 until iters) {
        val stats = sample
          .select(assignCell(col("__xd"), centroids.toSeq).as("__cell"),
            posexplode(col("__xd")).as(Seq("__idx", "__v")))
          .groupBy("__cell", "__idx")
          .agg(sum(floor(col("__v") * lit(1000000.0) + lit(0.5)).cast("long")).as("__sm"),
            count(lit(1)).as("__n"))
          .collect()
        val byCell = stats.groupBy(_.getInt(0))
        centroids = centroids.zipWithIndex.map { case (old, cell) =>
          byCell.get(cell).fold(old) { rows =>
            val next = old.toArray.clone()
            rows.foreach { r =>
              next(r.getInt(1)) = (r.getLong(2).toDouble / r.getLong(3).toDouble) / 1000000.0
            }
            next.toSeq
          }
        }
      }
      centroids
    } finally { sample.unpersist(); () }
  }

  /** One cell's audit row from one Lloyd iteration of
    * [[kmeansFitConverged]]: how many sample rows the cell absorbed and
    * how far its centroid moved, in exact micro-units.
    */
  case class KmeansIter(iter: Long, cell: Long, nAssigned: Long, moveE6: Long)

  /** FULL k-means fit — [[deterministicCentroids]]' fixed-round fit
    * promoted to the real algorithm: Lloyd iterations run until the
    * centroid MOVEMENT FLOOR (or a hard `maxIters` cap), and every
    * iteration emits exact integer audit rows. Everything the stopping
    * rule reads is bit-replayable cross-engine:
    *
    *  - centroids live in micro-unit BIGINTs: `c_e6 = (sm - sm % n) / n`
    *    — EXACT truncated integer division of the exact micro-unit
    *    component sums (plain `/` floor-vs-trunc differs between
    *    engines on negative sums; subtracting the C-style remainder
    *    first makes the division exact, so floor == trunc everywhere);
    *  - assignment is the [[assignCell]] argmin against `c_e6 / 1e6`
    *    doubles (one IEEE division, identical in both engines);
    *  - per-cell movement is `max |c_e6' − c_e6|` over components —
    *    pure integers — and the fit stops after the first iteration
    *    whose max movement over cells is ≤ `floorE6`; empty cells keep
    *    their centroid and report zero movement.
    *
    * Returns the fitted centroids (as doubles, `c_e6 / 1e6`) plus the
    * per-iteration per-cell audit. Scale: identical to
    * [[deterministicCentroids]] — each round is one job over the cached
    * ‰ sample collecting `nCentroids × dims` agg rows; the loop adds
    * only the driver-side integer compare, so convergence testing costs
    * nothing extra per round. Feeds v5/v8/v17 wherever a
    * fit-to-convergence quantizer replaces the fixed-round one.
    */
  def kmeansFitConverged(corpus: DataFrame, nCentroids: Int, maxIters: Int,
                         floorE6: Long, cId: String = "vec_id",
                         cVec: String = "embedding",
                         samplePermille: Int = 200)
      : (Array[Seq[Double]], Seq[KmeansIter]) = {
    require(maxIters >= 1 && floorE6 >= 0)
    val sample = corpus
      .filter(graft.text.TextOps.deterministicSample(col(cId), samplePermille, "ivf"))
      .select(col(cId).as("__id"), asDouble(col(cVec)).as("__xd"))
      .cache()
    try {
      val seeds = sample
        .withColumn("__h", md5(concat(lit("ivfseed"), col("__id").cast("string"))))
        .orderBy(col("__h"), col("__id"))
        .limit(nCentroids)
        .select("__xd").collect().map(_.getSeq[Double](0))
      require(seeds.length == nCentroids,
        s"sample has only ${seeds.length} rows for $nCentroids centroids — raise samplePermille")
      val cE6: Array[Array[Long]] =
        seeds.map(_.map(v => math.floor(v * 1e6 + 0.5).toLong).toArray)
      val audit = scala.collection.mutable.ArrayBuffer.empty[KmeansIter]
      var iter = 0
      var moving = true
      while (moving && iter < maxIters) {
        iter += 1
        val centroids: Seq[Seq[Double]] = cE6.map(_.toSeq.map(_ / 1e6)).toSeq
        val stats = sample
          .select(assignCell(col("__xd"), centroids).as("__cell"),
            posexplode(col("__xd")).as(Seq("__idx", "__v")))
          .groupBy("__cell", "__idx")
          .agg(sum(floor(col("__v") * lit(1000000.0) + lit(0.5)).cast("long")).as("__sm"),
            count(lit(1)).as("__n"))
          .collect()
        val byCell = stats.groupBy(_.getInt(0))
        val perCell = (0 until nCentroids).map { cell =>
          byCell.get(cell) match {
            case None => KmeansIter(iter, cell, 0L, 0L)
            case Some(rows) =>
              val n = rows.head.getLong(3)
              var mv = 0L
              rows.foreach { r =>
                val idx = r.getInt(1)
                val sm = r.getLong(2)
                val next = (sm - sm % n) / n
                mv = math.max(mv, math.abs(next - cE6(cell)(idx)))
                cE6(cell)(idx) = next
              }
              KmeansIter(iter, cell, n, mv)
          }
        }
        audit ++= perCell
        moving = perCell.map(_.moveE6).max > floorE6
      }
      (cE6.map(_.toSeq.map(_ / 1e6)), audit.toSeq)
    } finally { sample.unpersist(); () }
  }

  /** Dominant principal axis by POWER ITERATION over the exact integer
    * Gram matrix — the embedding-pipeline op behind whitening /
    * dimensionality reduction, built so the whole fit is bit-replayable
    * cross-engine:
    *
    *  - components quantize to micro-unit BIGINTs (`floor(x·1e6+0.5)`),
    *    and G[i][j] = Σ xmᵢ·xmⱼ is an EXACT integer sum — order-free
    *    under any partitioning (the v17 trick, 64×64-keyed);
    *  - each iteration computes w = G·v as 64 SEQUENTIAL left-to-right
    *    double folds over identical integers (the same fixed-order
    *    convention as the native dot), then re-quantizes
    *    `v'ᵢ = floor(wᵢ/max|w|·1e6+0.5)` — one IEEE division + floor,
    *    identical in both engines;
    *  - a FIXED iteration count from the all-ones start (deterministic
    *    sign), not convergence-tested — replayable as a CTE chain.
    *
    * Returns the axis in micro-units. Scale: one corpus pass producing
    * dims²-keyed partial-aggregated sums (the shuffle is model-sized,
    * never data-sized), one driver collect of the dims×dims matrix
    * (bounded, the documented model-artifact pattern; dims is derived
    * from the data, 64 for the test embeddings), and the iteration
    * itself is driver-side arithmetic on a dims-vector.
    * Integer headroom: |xm| ≤ ~1e6 ⇒ each Gram term ≤ 1e12, so the sum
    * stays inside Long past 10⁶ rows per stat — larger corpora fit on
    * a deterministic sample, like every other model fit here.
    */
  def pcaPowerAxis(corpus: DataFrame, iters: Int,
                   cVec: String = "embedding"): Array[Long] = {
    require(iters >= 1)
    val xm = corpus.select(
      expr(s"transform(`$cVec`, x -> cast(floor(cast(x as double) * 1000000.0 + 0.5) as bigint))")
        .as("__xm"))
    val g = xm
      .select(posexplode(col("__xm")).as(Seq("__i", "__xi")), col("__xm"))
      .select(col("__i"), col("__xi"), posexplode(col("__xm")).as(Seq("__j", "__xj")))
      .groupBy("__i", "__j")
      .agg(sum(col("__xi") * col("__xj")).as("__g"))
      .collect()
    // dims from the DATA (widest observed index + 1), not a hardcoded 64:
    // wider vectors previously overflowed the Gram fill and narrower ones
    // silently zero-padded the axis. Empty corpus has no axis to return.
    require(g.nonEmpty, "pcaPowerAxis: empty corpus (or all-null embeddings)")
    val dims = g.iterator.map(_.getInt(0)).max + 1
    val gd = Array.ofDim[Double](dims, dims)
    g.foreach(r => gd(r.getInt(0))(r.getInt(1)) = r.getLong(2).toDouble)
    var v = Array.fill(dims)(1000000L)
    for (_ <- 0 until iters) {
      // w_i = sequential fold over j ascending — the cross-engine order
      val w = Array.tabulate(dims) { i =>
        var acc = 0.0
        var j = 0
        while (j < dims) { acc += gd(i)(j) * v(j).toDouble; j += 1 }
        acc
      }
      val m = w.map(math.abs).max
      v = w.map(wi => math.floor(wi / m * 1e6 + 0.5).toLong)
    }
    v
  }

  /** Persist a fitted coarse quantizer (the centroid array) so the fit
    * outlives the session — at 100 TB the quantizer is a model artifact
    * trained once and shipped to every query batch, exactly like
    * `KMeansModel.save`. Plain JSON of `double[][]` via the Hadoop
    * filesystem API (works on HDFS/S3, not just local disk);
    * `Double.toString` round-trips exactly, so a reloaded quantizer
    * reproduces bit-identical cell assignments.
    */
  def saveCentroids(spark: org.apache.spark.sql.SparkSession,
                    centroids: Array[Seq[Double]], path: String): Unit = {
    import org.apache.hadoop.fs.Path
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val bytes = mapper.writeValueAsBytes(centroids.map(_.toArray))
    val out = fs.create(p, true)
    try out.write(bytes) finally out.close()
  }

  /** Load a quantizer saved by [[saveCentroids]]; None when absent. */
  def loadCentroids(spark: org.apache.spark.sql.SparkSession,
                    path: String): Option[Array[Seq[Double]]] = {
    import org.apache.hadoop.fs.Path
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val bytes = try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](8192)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        buf.toByteArray
      } finally in.close()
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      Some(mapper.readValue(bytes, classOf[Array[Array[Double]]]).map(_.toSeq))
    }
  }

  /** IVF approximate top-k against PREBUILT centroids (e.g. from
    * [[deterministicCentroids]]): corpus rows are cell-assigned by a
    * map-only argmin over centroid literals, each query probes its
    * `nProbe` nearest cells, and only those cells are brute-forced. The
    * probe set is tiny (|Q|·nProbe) and broadcast, so the corpus is
    * touched once with no shuffle — the billion-scale ANN layout with the
    * training cost paid exactly once, off the query path.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              centroids: Seq[Seq[Double]], nProbe: Int,
              qId: String, qVec: String, cId: String, cVec: String): DataFrame = {
    val assigned = ensurePrepared(corpus, cVec, "__cd", "__cn")
      .withColumn("__cell", assignCell(col("__cd"), centroids))
    val qd = ensurePrepared(queries, qVec, "__qd", "__qn")
      .select(col(qId), col("__qd"), col("__qn"),
        posexplode(cellDists(col("__qd"), centroids)).as(Seq("__cell", "__dist")))
    val wp = Window.partitionBy(qId).orderBy(col("__dist").asc, col("__cell").asc)
    val probed = qd.withColumn("__pr", row_number().over(wp))
      .filter(col("__pr") <= nProbe)
      .select(col(qId), col("__qd"), col("__qn"), col("__cell"))
    val scored = broadcast(probed).join(assigned, "__cell")
      .filter(col(qId) =!= col(cId))
      .withColumn("cos", rawDot(col("__qd"), col("__cd")) / (col("__qn") * col("__cn")))
    val w = Window.partitionBy(qId).orderBy(col("cos").desc, col(cId).asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .drop("__cell", "__qd", "__qn", "__cd", "__cn")
  }

  /** IVF (inverted-file) approximate top-k: a KMeans coarse quantizer
    * partitions the corpus into `nCentroids` cells; each query probes its
    * `nProbe` nearest cells and brute-forces only those. The standard
    * billion-scale ANN layout — candidate generation is a cell-id
    * equijoin, and the quantizer trains once on a deterministic sample
    * ([[trainQuantizer]]) or is supplied prebuilt via `model`.
    * Deterministic for a fixed seed.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nCentroids: Int, nProbe: Int, seed: Long = 42L,
              qId: String = "qid", qVec: String = "qv",
              cId: String = "vec_id", cVec: String = "embedding",
              model: Option[org.apache.spark.ml.clustering.KMeansModel] = None,
              samplePermille: Int = 200): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    import spark.implicits._

    val corpusV = corpus
      .withColumn("__cd", asDouble(col(cVec)))
      .withColumn("__vec", array_to_vector(col("__cd")))
    val m = model.getOrElse(
      trainQuantizer(corpus, nCentroids, seed, cId, cVec, samplePermille))
    val assigned = m.transform(corpusV)
      .withColumn("__cn", sqrt(rawDot(col("__cd"), col("__cd"))))
      .drop("__vec")

    val centers = m.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.toSeq) }.toSeq.toDF("__cell", "__center")

    // nearest cells per query by ||q-c||^2 = q.q - 2 q.c + c.c (q.q const)
    val qd = queries.withColumn("__qd", asDouble(col(qVec)))
      .withColumn("__qn", sqrt(rawDot(col("__qd"), col("__qd"))))
    val probes = qd.crossJoin(broadcast(centers))
      .withColumn("__score",
        rawDot(col("__center"), col("__center")) - lit(2.0) * rawDot(col("__qd"), col("__center")))
    val wp = Window.partitionBy(qId).orderBy(col("__score").asc, col("__cell").asc)
    val probed = probes.withColumn("__pr", row_number().over(wp))
      .filter(col("__pr") <= nProbe)
      .select(col(qId), col(qVec), col("__qd"), col("__qn"), col("__cell"))

    val scored = probed.join(assigned, "__cell")
      .filter(col(qId) =!= col(cId))
      .withColumn("cos", rawDot(col("__qd"), col("__cd")) / (col("__qn") * col("__cn")))
    val w = Window.partitionBy(qId).orderBy(col("cos").desc, col(cId).asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .drop("__cell", "__qd", "__qn", "__cd", "__cn")
  }

  /** Near-duplicate pairs by cosine threshold, blocked by a partition
    * column (e.g. a cluster label or LSH bucket) so the pair space is
    * O(Σ block²) instead of O(n²).
    *
    * SCALE CONTRACT — now ENFORCED, not just documented: block occupancy,
    * not input size, sets the cost, so blocks larger than `maxBlockSize`
    * contribute NO pairs (the same guard
    * [[graft.text.TextOps.lshPairsBounded]] applies to LSH buckets, and
    * for the same reason: one over-popular cluster label / bucket makes
    * the self-join O(block²) with no upper bound — at 100 TB a single
    * 100k-member hot block alone would emit ~5×10⁹ candidate pairs and
    * straggle or OOM the join stage). Normal blocks are byte-identical
    * to the unguarded form. Recall loss is confined to blocks the caller
    * should have split anyway: the contract remains that block-key
    * cardinality grows with the data (more sign-LSH bits, finer cluster
    * labels) so mean occupancy stays roughly constant; the cap converts
    * a violated contract from a runaway stage into bounded, observable
    * truncation.
    *
    * The occupancy count is one unordered window over the block key —
    * the same hash partitioning the self-join needs, so the window's
    * exchange doubles as the join's (VectorOpsSpec asserts the guarded
    * plan introduces no extra exchange over the unguarded one).
    */
  def nearDupPairs(df: DataFrame, blockCol: String, idCol: String,
                   vecCol: String, threshold: Double,
                   maxBlockSize: Int = 4096): DataFrame = {
    require(maxBlockSize >= 2, s"maxBlockSize must be >= 2, got $maxBlockSize")
    val w = Window.partitionBy("blk")
    // reuse-or-derive via ensurePrepared, which also enforces that a
    // pre-prepared __cd really came from vecCol (source metadata check)
    val base = ensurePrepared(df, vecCol, "__cd", "__cn")
      .select(col(blockCol).as("blk"), col(idCol).as("id"),
        col("__cd").as("vd"), col("__cn").as("nrm"))
    val prepped = base
      .withColumn("__n", count(lit(1)).over(w))
      .filter(col("__n") <= maxBlockSize)
      .drop("__n")
    val a = prepped.select(col("blk"), col("id").as("id_a"), col("vd").as("va"), col("nrm").as("na"))
    val b = prepped.select(col("blk"), col("id").as("id_b"), col("vd").as("vb"), col("nrm").as("nb"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", rawDot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b")
  }

  /** k-means‖ oversampling initialization (Bahmani et al., "Scalable
    * K-Means++", VLDB 2012) with the paper's RNG replaced by a portable
    * content hash, so the whole trajectory is bit-replayable in any
    * engine (the [[kmeansFit]] seeding discipline):
    *
    *  - SEED: the sample row with the smallest (md5("kppseed"‖id), id).
    *  - Each of `rounds` passes computes every sample point's COST (min
    *    dist2 to the current candidate set, floored to micro-unit
    *    BIGINT), totals it (φ, exact integer — never an order-dependent
    *    double sum), and admits point x iff
    *    `h16(x, round) · φ  <  ell · 65536 · cost(x)` — i.e.
    *    independently with probability ≈ min(1, ell·cost(x)/φ), the
    *    paper's oversampling law. Existing candidates have cost 0 and
    *    can never re-select.
    *  - WEIGHTS: each sample point votes for its nearest candidate
    *    (ties to the lowest cand_id); the weighted candidate set (size
    *    ≈ 1 + ell·rounds, independent of corpus size) is what a final
    *    driver-side weighted clustering reduces to k — the whole point
    *    of k-means‖: O(rounds) distributed passes instead of k
    *    sequential kmeans++ draws.
    *
    * Per round: one aggregate (φ) + one filter whose survivors are
    * O(ell) — collected, never corpus-sized. Returns
    * (cand_id, round_added, weight) ordered by cand_id.
    */
  def kmeansParallelInit(corpus: DataFrame, rounds: Int, ell: Int,
                         cId: String = "vec_id", cVec: String = "embedding",
                         samplePermille: Int = 200): DataFrame = {
    val spark = corpus.sparkSession
    val sample = kppSample(corpus, cId, cVec, samplePermille)
    try {
      val cands = kppCandidates(sample, rounds, ell)
      val weights = kppWeights(sample, cands)
      import spark.implicits._
      val meta = cands.zipWithIndex
        .map { case ((id, r, _), i) => (i, id, r.toLong) }
        .toDF("__c", "cand_id", "round_added")
      meta.join(weights, Seq("__c"), "left")
        .select(col("cand_id"), col("round_added"),
          coalesce(col("w"), lit(0L)).as("weight"))
        .orderBy("cand_id")
    } finally { sample.unpersist(); () }
  }

  private def kppSample(corpus: DataFrame, cId: String, cVec: String,
                        samplePermille: Int): DataFrame =
    corpus
      .filter(graft.text.TextOps.deterministicSample(col(cId), samplePermille, "ivf"))
      .select(col(cId).as("__id"), asDouble(col(cVec)).as("__xd"))
      .cache()

  /** The oversampling loop shared by [[kmeansParallelInit]] and
    * [[kmeansParallelReduce]]: returns (cand_id, round_added, vector)
    * sorted by cand_id, so assignCell's first-min tie rule IS the
    * lowest-cand_id rule.
    */
  private def kppCandidates(sample: DataFrame, rounds: Int, ell: Int)
      : Vector[(Long, Int, Seq[Double])] = {
    require(rounds >= 1 && ell >= 1)
    val seedRow = sample
      .withColumn("__h", md5(concat(lit("kppseed"), col("__id").cast("string"))))
      .orderBy(col("__h"), col("__id")).limit(1)
      .select("__id", "__xd").collect().head
    var cands = Vector(
      (seedRow.getLong(0), 0, seedRow.getSeq[Double](1)))
    for (r <- 1 to rounds) {
      val ctrs = cands.map(_._3)
      val costE6 = floor(
        array_min(cellDists(col("__xd"), ctrs)) * lit(1000000.0) + lit(0.5))
        .cast("long")
      val withCost = sample.withColumn("__ce", costE6)
      val phi = withCost.agg(sum(col("__ce"))).head().getLong(0)
      // Both sides of the selection inequality must stay in Long range:
      // LHS h16*phi (h16 <= 65535) AND RHS ell*65536*__ce (__ce <= phi).
      require(phi < Long.MaxValue / (65536L * ell),
        s"kmeansParallelInit: phi=$phi would overflow the 16-bit hash " +
          s"threshold product at ell=$ell — lower samplePermille or rescale the vectors")
      if (phi > 0L) {
        val h16 = conv(substring(
          md5(concat(lit(s"kpp$r|"), col("__id").cast("string"))), 1, 4),
          16, 10).cast("long")
        val picked = withCost
          .filter(h16 * lit(phi) < lit(ell.toLong * 65536L) * col("__ce"))
          .select("__id", "__xd").collect()
        cands = (cands ++ picked.map(row =>
          (row.getLong(0), r, row.getSeq[Double](1)))).sortBy(_._1)
      }
    }
    cands
  }

  private def kppWeights(sample: DataFrame,
                         cands: Vector[(Long, Int, Seq[Double])]): DataFrame =
    sample
      .select(assignCell(col("__xd"), cands.map(_._3)).as("__c"))
      .groupBy("__c").agg(count(lit(1)).as("w"))

  /** The second act of k-means‖: reduce the weighted candidate set to k
    * final centers by DRIVER-LOCAL weighted Lloyd (the whole point of
    * the oversampling pass — the cluster-scale problem shrinks to
    * ~1+ell·rounds weighted points, so the reduction is a local loop
    * over a dozen rows, not a distributed job), then ONE distributed
    * assignment pass reports each final center's population. Exact
    * integer arithmetic end-to-end: candidate coordinates floor to
    * micro-unit BIGINT, weighted sums divide by the remainder-
    * subtracted trick (floor == trunc cross-engine), empty centers
    * keep their previous coordinates — so the DuckDB oracle replays
    * init, reduction, and assignment bit-for-bit. Ties: candidates
    * assign to the lowest center INDEX (assignCell first-min over the
    * weight-desc-ordered center list). Returns
    * (center, seed_cand_id, n_assigned) ordered by center.
    */
  def kmeansParallelReduce(corpus: DataFrame, k: Int, initRounds: Int,
                           ell: Int, lloydRounds: Int,
                           cId: String = "vec_id", cVec: String = "embedding",
                           samplePermille: Int = 200): DataFrame = {
    require(k >= 1 && lloydRounds >= 0)
    val spark = corpus.sparkSession
    val sample = kppSample(corpus, cId, cVec, samplePermille)
    try {
      val cands = kppCandidates(sample, initRounds, ell)
      val wByIdx: Map[Int, Long] = kppWeights(sample, cands)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      // weighted candidate rows: (cand_id, weight, e6 coords)
      val rows = cands.zipWithIndex.map { case ((id, _, xd), i) =>
        (id, wByIdx.getOrElse(i, 0L),
          xd.map(v => math.floor(v * 1e6 + 0.5).toLong).toArray)
      }
      require(rows.size >= k,
        s"kmeansParallelReduce: only ${rows.size} candidates for k=$k — raise ell/rounds")
      val init = rows.sortBy { case (id, w, _) => (-w, id) }.take(k)
      val seedIds = init.map(_._1)
      val cE6: Array[Array[Long]] = init.map(_._3.clone()).toArray
      for (_ <- 1 to lloydRounds) {
        val ctrD = cE6.map(_.toSeq.map(_ / 1e6))
        // assign each weighted candidate to its nearest current center
        // (fixed-order double dist2 on the e6-rounded coords — the same
        // values the oracle computes), ties to the lowest index
        val assign = rows.map { case (_, w, xe6) =>
          val xd = xe6.map(_ / 1e6)
          val best = ctrD.indices.minBy { j =>
            val c = ctrD(j)
            var s = 0.0; var t = 0
            while (t < xd.length) { val dd = xd(t) - c(t); s += dd * dd; t += 1 }
            (s, j)
          }
          (best, w, xe6)
        }
        (0 until k).foreach { j =>
          val mine = assign.filter(_._1 == j)
          val n = mine.map(_._2).sum
          if (n > 0L) {
            cE6(j).indices.foreach { t =>
              val sm = mine.map(a => a._2 * a._3(t)).sum
              cE6(j)(t) = (sm - sm % n) / n
            }
          } // empty centers keep previous coords
        }
      }
      val finalD: Seq[Seq[Double]] = cE6.map(_.toSeq.map(_ / 1e6)).toSeq
      val counts = sample
        .select(assignCell(col("__xd"), finalD).as("__c"))
        .groupBy("__c").agg(count(lit(1)).as("n"))
      import spark.implicits._
      val meta = seedIds.zipWithIndex.map { case (id, j) => (j, j.toLong, id) }
        .toDF("__c", "center", "seed_cand_id")
      meta.join(counts, Seq("__c"), "left")
        .select(col("center"), col("seed_cand_id"),
          coalesce(col("n"), lit(0L)).as("n_assigned"))
        .orderBy("center")
    } finally { sample.unpersist(); () }
  }
}
