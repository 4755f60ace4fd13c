package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis + dedup primitives for large-scale training-data
  * pipelines. Everything here is a composition of built-in, codegen'd
  * column expressions — no UDFs — so whole-stage codegen applies and the
  * operators run at scan speed on a 1000-executor cluster.
  *
  * Cross-engine determinism: hashes are md5 hex strings (identical in any
  * engine), never JVM/engine-specific hash functions; ratios divide exact
  * integer counts in double precision (single IEEE op, bit-identical
  * across engines).
  */
object TextOps {

  /** Fan heavy per-row map work out across the cluster when the scan
    * arrives under-partitioned (round-19: every sf test file is a
    * single-row-group parquet, so a scan is ONE task however many cores
    * the session has, and an explode/hash-heavy stage serializes on one
    * core — the guide's "one huge unsplittable file" input skew).
    * Deterministic HASH repartition on `key` (never round-robin: task
    * retries under round-robin re-draw rows, SPARK-38388), targeted at
    * the session's default parallelism so the fan-out follows the core
    * count (local[N] and cluster alike, including the driver's
    * lower-core bench runs). No-op when the source already carries
    * enough partitions — at 100 TB scans arrive with thousands of
    * splits and this adds nothing; the planning peek (`rdd
    * .getNumPartitions`) runs no job.
    */
  def fanOut(df: org.apache.spark.sql.DataFrame, key: Column)
      : org.apache.spark.sql.DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target, key)
  }

  /** Whitespace tokenization, empty tokens dropped. */
  def tokens(text: Column): Column =
    filter(split(text, " "), x => x =!= "")

  /** Word n-gram shingles joined with single spaces; fewer than n tokens
    * yields an empty array.
    *
    * PERF: pass a materialized token COLUMN, not the tokens(...)
    * expression — the slice lambda references `toks` per element, and an
    * inline expression tree would re-tokenize once per shingle.
    */
  def wordNgrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + lit(1), lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Per-document duplicated-SPAN statistics — the distributed proxy for
    * exact-substring training-data dedup (Lee et al.'s "Deduplicating
    * Training Data Makes Language Models Better" dedups exact ≥50-token
    * spans with a suffix array; a suffix array is a single-machine
    * structure, so the Spark-native shape is a hashed span inverted
    * index): every n-token span is md5'd, spans whose hash occurs in ≥2
    * DISTINCT documents are "duplicated", and each document reports how
    * much of it is made of such spans. Downstream curation drops or
    * de-weights high `dup_frac` docs.
    *
    * Scale shape: one hash shuffle builds the index (`groupBy(spanHash)`
    * with partial aggregation — boilerplate spans collapse map-side), one
    * co-partitioned join carries the per-span verdict back, one doc-keyed
    * aggregation summarizes. Shuffle volume is O(total spans) — linear,
    * never pairwise; there is no quadratic candidate step anywhere, which
    * is what makes this the cheapest corpus-wide dedup signal at 100 TB.
    *
    * @return (doc_id, total_spans, dup_spans, dup_frac_e4) for every doc
    *         with ≥ n tokens; dup_frac_e4 is basis points (exact IEEE
    *         divide + floor, portable across engines)
    */
  /** (id, span-hash) pairs: every n-token span as a 60-bit integer hash
    * (top 15 hex digits of md5). The span hash is the shuffle key of
    * every span-level operator, and 8 bytes vs a 32-char hex string is
    * ~5x less shuffle volume; collisions (~n²/2^60) are noise for
    * dup/contamination SIGNALS and both engines hash identically.
    */
  def spanHashes(docs: org.apache.spark.sql.DataFrame, textCol: String,
                 idCol: String, n: Int): org.apache.spark.sql.DataFrame =
    // native one-call path: the interpreted chain (wordNgrams transform
    // lambda materializing every n-gram STRING, then one builtin md5 —
    // which allocates a fresh MessageDigest per row — plus substring +
    // conv) is replaced by graft.functions.SpanHashes60, which feeds
    // token bytes straight into a thread-local digest inside
    // whole-stage codegen. Values are identical (HashExprsSpec pins
    // byte-equivalence), so every oracle stays as-is.
    docs.select(col(idCol), tokens(col(textCol)).as("__t"))
      .select(col(idCol),
        explode(graft.functions.native.spanHashes60(col("__t"), n)).as("__h"))

  def spanDupStats(docs: org.apache.spark.sql.DataFrame, textCol: String,
                   idCol: String, n: Int): org.apache.spark.sql.DataFrame = {
    val spans = spanHashes(docs, textCol, idCol, n)
    // The span explosion (interpreted n-gram lambda + one md5 per span)
    // is the dominant cost, so it must run ONCE: fold occurrences to
    // (hash, doc) in the same shuffle that would build an inverted
    // index, then a window over the hash counts distinct docs on the
    // already-reduced frame — two shuffles of the reduced data, no
    // second scan, no index join-back carrying one row per occurrence.
    val perDoc = spans.groupBy(col("__h"), col(idCol))
      .agg(count(lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("__h")
    perDoc.withColumn("__nd", count(lit(1)).over(w))
      .groupBy(idCol)
      .agg(sum(col("__c")).as("total_spans"),
        sum(when(col("__nd") >= 2, col("__c")).otherwise(0L)).as("dup_spans"))
      .select(col(idCol), col("total_spans"), col("dup_spans"),
        floor(col("dup_spans").cast("double") / col("total_spans").cast("double")
          * lit(10000.0) + lit(0.5)).cast("long").as("dup_frac_e4"))
  }

  /** The REMOVAL half of [[spanDupStats]] (the C4/CCNet "deduplicate
    * repeated lines across documents" transform): every n-token span
    * whose hash occurs in >= `minDocs` DISTINCT documents is
    * boilerplate, and each document is rebuilt with every token covered
    * by any such span cut out (remaining tokens keep their order).
    * Emits the removal ledger + a fingerprint of the cleaned text so
    * the reconstruction itself is oracle-checkable.
    *
    * Scale shape: same inverted-index geometry as [[spanDupStats]] —
    * one span explosion folded to (hash, doc) with the doc's start
    * positions, a window on that reduced frame, then coverage expansion
    * bounded by n × boilerplate-starts and one doc-keyed join back.
    * The rebuild is row-local array arithmetic (no second corpus scan,
    * no pairwise step); per-row cost is O(doc tokens × covered), both
    * bounded by document length.
    */
  def stripBoilerplate(docs: org.apache.spark.sql.DataFrame, textCol: String,
                       idCol: String, n: Int,
                       minDocs: Int): org.apache.spark.sql.DataFrame = {
    val toked = fanOut(docs, col(idCol))
      .select(col(idCol), tokens(col(textCol)).as("__t"))
    val spans = toked
      .select(col(idCol), posexplode(wordNgrams(col("__t"), n)).as(Seq("__i", "__span")))
      .select(col(idCol), col("__i"),
        conv(substring(md5(col("__span")), 1, 15), 16, 10).cast("long").as("__h"))
    // fold to (hash, doc) keeping the doc's span-start positions, then
    // count docs per hash via a window on the reduced frame (t23's
    // one-explosion discipline — the explosion never runs twice)
    val perDoc = spans.groupBy(col("__h"), col(idCol))
      .agg(collect_list(col("__i")).as("__is"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("__h")
    val bpStarts = perDoc.withColumn("__nd", count(lit(1)).over(w))
      .filter(col("__nd") >= minDocs)
      .select(col(idCol), explode(col("__is")).as("__i"))
    val covered = bpStarts
      .select(col(idCol),
        explode(sequence(col("__i"), col("__i") + lit(n - 1))).as("__j"))
      .groupBy(idCol).agg(collect_set(col("__j")).as("__cov"))
    val kept = transform(
      filter(transform(col("__t"), (t, j) => struct(j.as("j"), t.as("t"))),
        x => !array_contains(col("__cov"), x.getField("j"))),
      x => x.getField("t"))
    toked.join(covered, Seq(idCol), "left")
      .withColumn("__cov", coalesce(col("__cov"), array().cast("array<int>")))
      .select(col(idCol),
        size(col("__t")).cast("long").as("n_tokens"),
        size(col("__cov")).cast("long").as("n_removed"),
        md5(array_join(kept, " ")).as("clean_fp"))
  }

  /** Corpus-statistics language-model score (the KenLM-filter shape in
    * integer-exact form): for every trigram position (w₁w₂w₃) the
    * continuation probability estimate c₃(w₁w₂w₃)/c₂(w₁w₂) — counts over
    * the WHOLE corpus — quantized to micro-units by integer division, and
    * rolled up per document as (n_trigrams, Σ cont_e6). High-sum docs
    * read like the corpus; low-sum docs are the gibberish/boilerplate an
    * LM-perplexity filter would drop. Integer arithmetic end-to-end
    * (floor(1e6·c₃/c₂) = (c₃·1e6) div c₂ on BIGINTs), so the score is
    * bit-identical across engines — the portable stand-in for a float
    * log-prob whose summation order would never hash-match.
    *
    * Scale shape: two token-scan explosions (bigram + trigram) each
    * folded by ONE count shuffle keyed by the n-gram, then the trigram
    * occurrences join their two count frames on the same keys and reduce
    * per doc — linear in corpus tokens, no pairwise step, counts frames
    * vocabulary²/³-bounded with map-side partial aggregation.
    */
  def lmContinuation(docs: org.apache.spark.sql.DataFrame, textCol: String,
                     idCol: String): org.apache.spark.sql.DataFrame = {
    val toked = fanOut(docs, col(idCol))
      .select(col(idCol), tokens(col(textCol)).as("__t"))
    val tri = toked
      .select(col(idCol), posexplode(wordNgrams(col("__t"), 3)).as(Seq("__p", "__g")))
    val bi = toked
      .select(col(idCol), explode(wordNgrams(col("__t"), 2)).as("__g"))
    val c3 = tri.groupBy("__g").agg(count(lit(1)).as("__c3"))
    val c2 = bi.groupBy("__g").agg(count(lit(1)).as("__c2"))
    // a trigram's context bigram = its first two tokens = the prefix up
    // to the second space boundary of the space-joined n-gram
    val ctx = expr("substring_index(__g, ' ', 2)")
    tri.join(c3, "__g")
      .withColumn("__ctx", ctx)
      .join(c2.withColumnRenamed("__g", "__ctx"), "__ctx")
      .select(col(idCol),
        expr("(__c3 * 1000000L) div __c2").as("__cont"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_trigrams"),
        sum(col("__cont")).as("sum_cont_e6"))
  }

  /** MAXIMAL duplicated-substring intervals (the Lee et al. "Deduplicating
    * Training Data Makes Language Models Better" exact-substring shape):
    * [[spanDupStats]] counts duplicated fixed-length spans; this op
    * CHAINS adjacent duplicated span starts into maximal (doc, start,
    * end) token intervals — what a surgical dedup actually cuts. A span
    * (n tokens from position p) is duplicated when its hash occurs in
    * ≥ 2 DISTINCT docs; consecutive duplicated positions p, p+1, …
    * belong to one interval, grouped by the classic run trick: within a
    * doc, `p − row_number()` is constant exactly on a run of consecutive
    * positions.
    *
    * Scale shape: one span explosion, ONE shuffle keyed by span hash
    * (the distinct-doc index and the verdict join-back co-partition on
    * it), then ONE per-doc window + same-keyed rollup — linear in total
    * spans end-to-end, no pairwise step, no per-doc state beyond the
    * window's sorted partition.
    *
    * @return (idCol, start_tok, end_tok, n_spans): inclusive token
    *         coordinates (end = last duplicated span start + n − 1)
    */
  def dupIntervals(docs: org.apache.spark.sql.DataFrame, textCol: String,
                   idCol: String, n: Int): org.apache.spark.sql.DataFrame = {
    val spans = fanOut(docs, col(idCol))
      .select(col(idCol), tokens(col(textCol)).as("__t"))
      .select(col(idCol),
        posexplode(graft.functions.native.spanHashes60(col("__t"), n))
          .as(Seq("pos", "__h")))
      .select(col(idCol), col("pos").cast("long").as("pos"), col("__h"))
    val dupH = spans.groupBy("__h")
      .agg(countDistinct(col(idCol)).as("__nd"))
      .filter(col("__nd") >= 2).select("__h")
    val dup = spans.join(dupH, "__h")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy("pos")
    dup.withColumn("__grp", col("pos") - row_number().over(w))
      .groupBy(col(idCol), col("__grp"))
      .agg(min(col("pos")).as("start_tok"),
        (max(col("pos")) + lit(n - 1).cast("long")).as("end_tok"),
        count(lit(1)).as("n_spans"))
      .select(col(idCol), col("start_tok"), col("end_tok"), col("n_spans"))
  }

  /** PII patterns shared by [[scrubPii]] and its oracle — written in the
    * regex subset Java's engine and DuckDB's RE2 match identically
    * (character classes, bounded/unbounded greedy quantifiers; no
    * backrefs, no lookaround, no \b): (name, pattern, replacement),
    * applied IN ORDER, each pass counting and redacting the text the
    * previous pass produced. Order matters and is part of the
    * contract — URLs FIRST, because a URL can legally contain both an
    * '@' (userinfo: https://user@host.com/x) and a dotted quad
    * (http://10.0.0.1/); redacting the URL whole means its innards are
    * never double-counted as a standalone email/IP. Emails next, then
    * dotted quads (the placeholder tokens contain no '@' or digits, so
    * later passes can't match inside earlier replacements).
    */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("url", "https?://[^\\s]+", "<URL>"),
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<IP>"))

  /** PII redaction — the corpus-curation transform every
    * training-data pipeline runs before anything else ships: emails,
    * URLs and dotted-quad IPs replaced by typed placeholder tokens,
    * with a per-document removal LEDGER (how many of each category) so
    * downstream filters can threshold on PII density. Purely row-local
    * (one projection, no shuffle, no UDF — `regexp_extract_all` for the
    * counts and chained `regexp_replace` for the rewrite, all codegen
    * builtins); at 100 TB this is a map-only pass that rides whatever
    * scan already runs.
    *
    * Counting is STAGED, in [[PiiPatterns]] order: each category is
    * counted on the text the previous pass redacted, so an email or
    * dotted quad living inside a URL counts (and redacts) as part of
    * that one URL, never twice.
    *
    * @return (idCol, n_emails, n_urls, n_ips, clean) — `clean` the
    *         fully redacted text
    */
  def scrubPii(docs: org.apache.spark.sql.DataFrame, textCol: String,
               idCol: String): org.apache.spark.sql.DataFrame = {
    val (counts, clean) = PiiPatterns
      .foldLeft((Seq.empty[org.apache.spark.sql.Column], col(textCol))) {
        case ((acc, cur), (name, pat, repl)) =>
          (acc :+ size(regexp_extract_all(cur, lit(pat), lit(0)))
             .cast("long").as(s"n_${name}s"),
           regexp_replace(cur, pat, repl))
      }
    // row-local but regex-heavy: fan the single-task scan out first
    fanOut(docs, col(idCol))
      .select(col(idCol) +: counts :+ clean.as("clean"): _*)
      .select(col(idCol), col("n_emails"), col("n_urls"), col("n_ips"),
        col("clean"))
  }

  /** Benchmark decontamination (the GPT-3 rule: a training document is
    * contaminated if it shares any ≥n-token span with the evaluation
    * set): emits each contaminated training doc with how many DISTINCT
    * benchmark spans it contains. Downstream either drops the doc or
    * masks the spans; the hit count is the triage signal.
    *
    * Scale shape: the benchmark side reduces to DISTINCT span hashes
    * (eval sets are corpus-tiny, so the join side Spark sees is small —
    * broadcast-eligible), the training side streams through one
    * hash-keyed semi-join-with-count, shuffle O(train spans) worst case
    * and zero when the benchmark side broadcasts. No pairwise step.
    */
  def decontaminate(train: org.apache.spark.sql.DataFrame,
                    bench: org.apache.spark.sql.DataFrame, textCol: String,
                    idCol: String, n: Int): org.apache.spark.sql.DataFrame = {
    val benchSpans = spanHashes(bench, textCol, idCol, n)
      .select(col("__h")).distinct()
    spanHashes(train, textCol, idCol, n).distinct()
      .join(benchSpans, "__h")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_hits"))
  }

  /** One MinHash component: min over the shingle set of md5(seed‖shingle).
    * Hex-string min == numeric min of the 128-bit hash, and is portable.
    * k independent components (seeds s0..s{k-1}) form the signature; at
    * scale this is a narrow map — no shuffle.
    */
  def minhash(shingles: Column, seed: Int): Column =
    array_min(transform(shingles, x => md5(concat(lit(s"s$seed"), x))))

  def minhashSignature(shingles: Column, k: Int): Seq[Column] =
    (0 until k).map(s => minhash(shingles, s).as(s"mh$s"))

  /** LSH band value: concatenation of `rowsPerBand` adjacent signature
    * components. Docs sharing any band value are dup candidates — join on
    * (band_idx, band_value) instead of all-pairs.
    *
    * NULL components (empty shingle set, i.e. a <n-token document) make
    * the whole band NULL — `concat`, not `concat_ws`, so SQL NULL
    * propagation applies. A NULL band never equijoins, which (a) matches
    * ANSI `||` semantics and (b) prevents every short document in a
    * 100 TB corpus from colliding into one quadratic hot bucket.
    */
  def lshBands(shingles: Column, k: Int, rowsPerBand: Int): Seq[Column] = {
    require(k % rowsPerBand == 0, "k must divide into bands")
    (0 until k / rowsPerBand).map { b =>
      val parts = (0 until rowsPerBand).map(r => minhash(shingles, b * rowsPerBand + r))
      concat(parts.flatMap(p => Seq(p, lit("|"))).dropRight(1): _*).as(s"band$b")
    }
  }

  /** Candidate probability of the banded-LSH S-curve: a pair with true
    * Jaccard similarity `s` shares at least one of `bands` band values
    * with probability 1 − (1 − s^rows)^bands. Driver-side arithmetic —
    * the model-selection half of the LSH family, no data touched.
    */
  def lshCandidateProb(s: Double, bands: Int, rows: Int): Double =
    1.0 - math.pow(1.0 - math.pow(s, rows), bands)

  /** Choose LSH geometry for a target similarity threshold under a hash
    * budget: among (bands b, rows r) with b·r ≤ nHashes (b = ⌊n/r⌋ —
    * fewer bands at the same r is strictly dominated), pick the r whose
    * S-curve inflection s* = (1/b)^(1/r) lies closest to `threshold`,
    * breaking ties toward more bands (recall over precision — a missed
    * dup survives the corpus forever, a false candidate costs one
    * verify). This is how the shipped geometries were chosen: 4 hashes
    * at threshold 0.5 → 2 bands × 2 rows, the t3/t20/t37 layout
    * (TextOpsSpec pins that agreement). Returns (bands, rows, sStar).
    */
  def lshPlan(threshold: Double, nHashes: Int): (Int, Int, Double) = {
    require(threshold > 0.0 && threshold < 1.0,
      s"threshold must be in (0,1), got $threshold")
    require(nHashes >= 2, s"need >= 2 hashes, got $nHashes")
    val cands = (1 to nHashes).map { r =>
      val b = nHashes / r
      val sStar = math.pow(1.0 / b, 1.0 / r)
      (b, r, sStar)
    }
    cands.minBy { case (b, _, sStar) => (math.abs(sStar - threshold), -b) }
  }

  /** 32-bit SimHash over md5 nibbles: bit j of a token votes +1/-1 by the
    * high bit of hex digit j of its md5; the document bit is the vote
    * sign. Single pass over the token array (array-accumulator aggregate),
    * integer arithmetic only.
    */
  def simhash32(toks: Column): Column = {
    val highNibble = typedLit(Seq("8", "9", "a", "b", "c", "d", "e", "f"))
    // md5 once per token (hash the array first); the per-bit lambda only
    // substrings the precomputed hex — 32x fewer md5 evaluations
    val bits: Column => Column = h =>
      transform(sequence(lit(0), lit(31)),
        j => when(array_contains(highNibble, substring(h, lit(1) + j, lit(1))), 1).otherwise(-1))
    val votes = aggregate(transform(toks, x => md5(x)),
      array_repeat(lit(0), 32),
      (acc, h) => zip_with(acc, bits(h), (a, b) => a + b))
    (0 until 32).map(j =>
      when(element_at(votes, j + 1) > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _).cast("long")
  }

  /** Jaccard similarity of two token arrays over distinct elements.
    * i = |distinct(a) ∩ b|, u = |distinct(a)| + |distinct(b)| − i.
    */
  def jaccard(a: Column, b: Column): Column = {
    val i = size(filter(array_distinct(a), x => array_contains(b, x)))
    val u = size(array_distinct(a)) + size(array_distinct(b)) - i
    when(u === 0, 0.0).otherwise(i.cast("double") / u.cast("double"))
  }

  /** English stopword list used by the language-ID heuristic and quality
    * scoring (fixed, tiny — broadcast as a literal array).
    */
  val enStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "are", "for",
      "on", "with", "as", "at", "by", "it", "this", "that", "was", "be")

  /** Fraction of tokens that are English stopwords (0 when no tokens). */
  def stopwordRatio(toks: Column): Column = {
    val sw = typedLit(enStopwords)
    val n = size(toks)
    when(n === 0, 0.0).otherwise(
      size(filter(toks, t => array_contains(sw, lower(t)))).cast("double") / n.cast("double"))
  }

  /** N-gram-free language-ID heuristic: 'en' when the stopword ratio
    * clears a threshold, else 'unk'. (A real profile-based n-gram model
    * slots in behind the same Column contract.)
    */
  def langIdHeuristic(toks: Column, threshold: Double = 0.15): Column =
    when(stopwordRatio(toks) >= threshold, "en").otherwise("unk")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish token count: runs of letters, runs of digits, or single
    * other non-space chars (the classic pre-tokenizer upper bound).
    */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]")).cast("long")

  /** Canonical-text fingerprint: lowercase, collapse whitespace, trim,
    * md5. Identical prose with different spacing/casing collides — the
    * standard exact-dup key after normalization.
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Deterministic content-hash sampling: keep a row iff the first 4 md5
    * hex digits of (salt‖id) fall under `permille`/1000 of the 16-bit
    * space. Engine- and run-independent (unlike `DataFrame.sample`), stable
    * under repartitioning, and stratification-free: the hash is uniform,
    * so any subpopulation is sampled at the same rate. The reproducible-
    * subset primitive for training-data curation.
    */
  def deterministicSample(id: Column, permille: Int, salt: String = "smp"): Column = {
    require(permille >= 0 && permille <= 1000)
    conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 4), 16, 10)
      .cast("long") * 1000 < lit(permille.toLong * 65536)
  }

  /** Column-rate variant of [[deterministicSample]]: the keep threshold
    * is a per-row COLUMN (e.g. a per-source rate joined in) under the
    * same md5 law, so heterogeneous quotas stay replayable.
    */
  def deterministicSampleCol(id: Column, permille: Column,
                             salt: String = "smp"): Column =
    conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 4), 16, 10)
      .cast("long") * 1000 < permille.cast("long") * lit(65536L)

  /** Corpus mixture rebalancing — the "data mixing" curation step: every
    * group (source/domain/language) is downsampled toward the SMALLEST
    * group's size by a derived per-group keep-rate (‰, floored), applied
    * with the deterministic content-hash law, and the result is the
    * per-group audit (total, rate, kept) a pipeline records next to the
    * sampled output.
    *
    * Scale shape: the rate derivation reads one column of the corpus
    * (count per group — column-pruned scan, partial agg), the rate table
    * is group-cardinality-sized and broadcast back, and the sampling
    * pass is a map-side filter — no corpus shuffle anywhere. Uniform
    * within-group sampling is the md5 law, so the kept set is
    * partitioning- and engine-independent.
    */
  def sourceMix(docs: org.apache.spark.sql.DataFrame, groupCol: String,
                idCol: String): org.apache.spark.sql.DataFrame = {
    val counts = docs.groupBy(groupCol).agg(count(lit(1)).as("total"))
    val target = counts.agg(min("total").as("__m"))
    val rates = counts.crossJoin(broadcast(target))
      .select(col(groupCol), col("total"),
        floor(col("__m").cast("double") / col("total").cast("double")
          * lit(1000.0)).cast("long").as("keep_pm"))
    val kept = docs.join(broadcast(rates), groupCol)
      .filter(deterministicSampleCol(col(idCol), col("keep_pm"), "mix"))
      .groupBy(groupCol).agg(count(lit(1)).as("kept"))
    rates.join(broadcast(kept), Seq(groupCol), "left")
      .select(col(groupCol), col("total"), col("keep_pm"),
        coalesce(col("kept"), lit(0L)).as("kept"))
  }

  /** Count–min sketch over a token column: `depth` md5-derived hash rows
    * × `width` counters, returned as sparse `(r, cell, cnt)` rows. The
    * sketch is (1) DETERMINISTIC — cell indices are content hashes, so
    * the same corpus gives the same sketch on any engine/partitioning
    * (the t28 oracle re-derives it in DuckDB and hash-matches); (2)
    * MERGEABLE — cells are plain sums, so partial sketches from
    * partitions, days, or streams merge by addition in any order; (3)
    * FIXED MEMORY — depth×width counters regardless of corpus size,
    * which is the 100 TB story: the exact t19 top-k needs a full-vocab
    * shuffle, the sketch needs one map-side-combined agg into ≤
    * depth×width cells.
    */
  def countMinSketch(toks: org.apache.spark.sql.DataFrame, tokCol: String,
                     depth: Int, width: Int): org.apache.spark.sql.DataFrame = {
    // Pre-aggregate by token so the depth md5 hashes run once per
    // DISTINCT token, not once per occurrence (vocab ≪ corpus: 4.7×
    // cheaper at sf0.5). Identical cells — a cell's count is the sum of
    // its tokens' counts either way. A streaming build does the same
    // per micro-batch and sum-merges the partials (merge law below).
    toks.groupBy(tokCol).agg(count(lit(1)).as("__w"))
      .select(col("__w"),
        posexplode(array((0 until depth).map(r => cmsCell(col(tokCol), r, width)): _*))
          .as(Seq("r", "cell")))
      .groupBy("r", "cell").agg(sum(col("__w")).as("cnt"))
  }

  /** CMS point estimate for each candidate token: min over the sketch's
    * `depth` counters at the token's cells. Always ≥ the true count
    * (cells only ever over-count). The sketch side is ≤ depth×width rows
    * and is broadcast; candidates can be any frame with `tokCol`.
    */
  def cmsEstimate(sketch: org.apache.spark.sql.DataFrame,
                  candidates: org.apache.spark.sql.DataFrame, tokCol: String,
                  depth: Int, width: Int): org.apache.spark.sql.DataFrame = {
    candidates
      .select(col(tokCol),
        posexplode(array((0 until depth).map(r => cmsCell(col(tokCol), r, width)): _*))
          .as(Seq("r", "cell")))
      .join(broadcast(sketch), Seq("r", "cell"))
      .groupBy(tokCol).agg(min(col("cnt")).as("est_cnt"))
  }

  /** Row-`r` CMS cell index: first 8 md5 hex chars of `"cms<r>" + tok`
    * mod width — the same md5 law every deterministic operator here uses,
    * so DuckDB replays it exactly.
    */
  private def cmsCell(tok: Column, r: Int, width: Int): Column =
    conv(substring(md5(concat(lit(s"cms$r"), tok)), 1, 8), 16, 10)
      .cast("long") % width

  /** Connected components over duplicate-candidate pairs: each vertex ends
    * labeled with the minimum doc id reachable through the pair graph —
    * the canonical representative of its dedup cluster. Each round (1)
    * propagates the per-vertex min label through the bidirected edge list
    * and (2) path-halves: a vertex additionally adopts its representative's
    * OWN representative from the previous generation, so label distance to
    * the component min doubles per round and convergence is O(log diameter)
    * instead of O(diameter) — the difference between 3 and 30+ rounds on
    * chained near-dup clusters (templated docs with gradual drift chain A~B~C
    * without A~C, so 100 TB dup graphs are NOT all shallow cliques).
    *
    * @param pairs DataFrame with two numeric id columns (idA, idB)
    * @return (doc_id, cluster_rep) for every vertex appearing in pairs
    */
  /** Edge-count ceiling for the single-task union-find path of
    * [[clusterPairs]]: 4M (bidirected) edges ≈ 64 MB of long pairs in
    * one task — comfortably inside an executor core's working memory,
    * far above any gate corpus, far below a 100 TB dup graph (which
    * takes the iterative path).
    */
  private[graft] val LocalClusterMaxEdges: Long = 4L << 20

  /** Single-task closure of a (bidirected, cached) edge frame: classic
    * union-find with path compression + union-by-min, emitting every
    * vertex with its component MINIMUM — bit-identical to the iterative
    * path's fixpoint. Output is sorted by vertex id inside the single
    * partition so the parquet bytes are replay-stable too.
    */
  private[graft] def clusterEdgesLocal(
      edges: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val sp = edges.sparkSession
    import sp.implicits._
    val idType = edges.schema("s").dataType
    edges.select(col("s").cast("long"), col("t").cast("long")).as[(Long, Long)]
      .repartition(1)
      .mapPartitions { it =>
        val parent = new java.util.HashMap[Long, Long]()
        def find(x: Long): Long = {
          var r = x
          while (parent.get(r) != r) r = parent.get(r)
          var c = x
          while (c != r) { val n = parent.get(c); parent.put(c, r); c = n }
          r
        }
        while (it.hasNext) {
          val (a, b) = it.next()
          parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
          val ra = find(a); val rb = find(b)
          if (ra < rb) parent.put(rb, ra)
          else if (rb < ra) parent.put(ra, rb)
        }
        val ids = parent.keySet.toArray(Array.empty[java.lang.Long])
          .map(_.longValue)
        java.util.Arrays.sort(ids)
        ids.iterator.map(id => (id, find(id)))
      }
      .toDF("doc_id", "cluster_rep")
      .select(col("doc_id").cast(idType), col("cluster_rep").cast(idType))
  }

  /** Connected components by ALTERNATING STAR CONTRACTION (large-star /
    * small-star — Kiveris et al., "Connected Components in MapReduce
    * and Beyond", SoCC'14) — the OTHER scalable CC discipline next to
    * [[clusterPairs]]' label propagation: each round rewrites the edge
    * set itself (every node's neighborhood hooks onto its neighborhood
    * minimum; large-star moves the strictly-greater neighbors, small-
    * star the rest plus the node), provably contracting to star graphs
    * rooted at component minima in O(log² n) rounds. Per round the
    * work is two neighborhood-min aggregations + key-partitioned joins
    * — no label frame carried between rounds and no pointer chains, so
    * edge-set SIZE (which only shrinks) bounds every shuffle; the
    * shape production MapReduce CC uses at web scale. Output is
    * byte-identical to [[clusterPairs]] — (doc_id, cluster_rep =
    * component min) for EVERY vertex of the pair graph — so the same
    * transitive-closure oracle pins both implementations against each
    * other. Termination is an EXACT edge-set comparison (count + anti
    * join), never a checksum; per-round frames are localCheckpointed
    * so lineage stays O(1).
    */
  def clusterPairsStar(pairs: org.apache.spark.sql.DataFrame,
                       idA: String = "id_a", idB: String = "id_b",
                       maxIter: Int = 25): org.apache.spark.sql.DataFrame = {
    // canonical (s > t) undirected edge set
    var e = pairs
      .select(col(idA).cast("long").as("a"), col(idB).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("s"), least(col("a"), col("b")).as("t"))
      .distinct().localCheckpoint()
    def adj(d: org.apache.spark.sql.DataFrame) =
      d.union(d.select(col("t").as("s"), col("s").as("t")))
    def neighborhoodMin(a: org.apache.spark.sql.DataFrame) =
      a.groupBy("s").agg(min("t").as("__mn"))
        .select(col("s"), least(col("s"), col("__mn")).as("m"))
    var iter = 0
    var stable = false
    while (!stable && iter < maxIter) {
      iter += 1
      // large-star: v ∈ Γ(u), v > u  →  (v, min(Γ⁺(u)));
      // every emitted edge is (bigger, smaller) since m ≤ u < v
      val a1 = adj(e)
      val ls = a1.join(neighborhoodMin(a1), "s")
        .filter(col("t") > col("s"))
        .select(col("t").as("s"), col("m").as("t"))
        .filter(col("s") =!= col("t")).distinct()
      // small-star: v ∈ Γ(u), v ≤ u  →  (v, m), plus (u, m) itself;
      // m ≤ every neighbor, so these are (bigger, smaller) too
      val a2 = adj(ls)
      val m2 = neighborhoodMin(a2)
      val next = a2.filter(col("t") <= col("s")).join(m2, "s")
        .select(col("t").as("s"), col("m").as("t"))
        .unionByName(m2.select(col("s"), col("m").as("t")))
        .filter(col("s") =!= col("t")).distinct()
        .localCheckpoint()
      // Fixed-point test by collision-resistant multiset signature
      // (count + two independent xxhash64 sums) over the two
      // checkpointed DISTINCT edge sets — two shuffle-free aggregate
      // scans instead of two counts plus a per-round anti-join shuffle
      // (round-19; the r98 signature-compare pattern)
      def esig(d: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
        val r = d.agg(count(lit(1)),
          sum(pmod(xxhash64(col("s"), col("t")), lit(2147483647L))),
          sum(pmod(xxhash64(col("t"), col("s"), lit(7)), lit(2147483629L)))).head()
        (r.getLong(0),
          if (r.isNullAt(1)) 0L else r.getLong(1),
          if (r.isNullAt(2)) 0L else r.getLong(2))
      }
      stable = esig(next) == esig(e)
      e = next
    }
    require(stable, s"clusterPairsStar did not converge in $maxIter rounds — " +
      "raise maxIter (rounds grow ~log² of the largest component)")
    // converged edges are (vertex, component-min) stars; roots self-map
    val verts = pairs
      .select(col(idA).cast("long").as("doc_id"))
      .unionByName(pairs.select(col(idB).cast("long").as("doc_id")))
      .distinct()
    verts.join(e.select(col("s").as("doc_id"), col("t").as("__rep")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("__rep"), col("doc_id")).as("cluster_rep"))
  }

  def clusterPairs(pairs: org.apache.spark.sql.DataFrame, idA: String = "id_a",
                   idB: String = "id_b", maxIter: Int = 20,
                   localMaxEdges: Long = LocalClusterMaxEdges): org.apache.spark.sql.DataFrame = {
    // Edge list is hash-partitioned ON THE JOIN KEY once and cached: every
    // round's label join reads the cached HashPartitioning(s) directly
    // (the planner inserts no Exchange for a side whose cached layout
    // already satisfies the join distribution), so only the label frame —
    // which genuinely changes each round — shuffles per iteration. The
    // explicit partition count keeps the layout AQE-stable across rounds.
    // `shuffle.partitions` can be non-numeric ("auto" under some AQE
    // setups) — fall back to the cluster's default parallelism.
    val np = scala.util.Try(
      pairs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)
      .getOrElse(pairs.sparkSession.sparkContext.defaultParallelism)
    val edges = pairs.select(col(idA).as("s"), col(idB).as("t"))
      .union(pairs.select(col(idB).as("s"), col(idA).as("t")))
      .distinct()
      .repartition(np, col("s")).cache()
    // ADAPTIVE CUTOVER (the AQE broadcast-join analogue for iterative
    // graph closure): the count below both materializes the cache and
    // sizes the problem. An edge multiset that fits one task runs as a
    // single-pass union-find — one job, no per-round scheduling floor —
    // because on a chained component the distributed loop needs O(log
    // diameter) ROUNDS of 3 shuffles each, and at small edge counts
    // those rounds are pure latency (measured: v8's 1,868-vertex chained
    // graph took 9 rounds ≈ 11 s at sf0.1; the local path is < 1 s).
    // Path choice depends only on the DATA (edge count), never on
    // parallelism, so outputs stay replay-identical across cluster
    // shapes; both paths produce exactly (vertex, component-min).
    val edgeCount = edges.count()
    if (edgeCount <= localMaxEdges) {
      // Like the loop below, the result generation stays cached (one
      // generation alive); materialize it before dropping the edge cache
      // beneath its lineage.
      val out = clusterEdgesLocal(edges).cache()
      out.count()
      edges.unpersist()
      return out
    }
    // One CACHED generation lives at a time (`cur`); the superseded one is
    // unpersisted as soon as its successor is materialized — an iterative
    // driver loop must not leak O(iters) cached frames at 100 TB. Every 3
    // rounds the generation is localCheckpoint'ed so lineage (and the plan
    // Catalyst must optimize) stays O(1) instead of growing per round.
    var cur = edges.select(col("s").as("id")).distinct()
      .withColumn("rep", col("id"))
      .withColumn("chg", lit(false)).cache()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val viaNeighbors = cur.join(edges, col("id") === col("s"))
        .groupBy(col("t")).agg(min("rep").as("nrep"))
        .select(col("t").as("id"), col("nrep"))
      val propagated = cur.select(col("id"), col("rep").as("orep"))
        .join(viaNeighbors, Seq("id"), "left")
        .select(col("id"), col("orep"),
          least(col("orep"), coalesce(col("nrep"), col("orep"))).as("rep1"))
      // Path-halving against the CACHED previous generation: rep1 is a
      // vertex id, so cur already holds its representative — one hash
      // join against the cached labels, no recompute of the propagate
      // step. Using the previous generation (not this round's) keeps the
      // lookup side cached and is still monotone-correct: labels only
      // ever decrease toward the component min.
      val lookup = cur.select(col("id").as("__rid"), col("rep").as("__rrep"))
      // chg rides along in the same frame, so convergence costs no extra
      // join/count job: the single agg action below both materializes the
      // cache and answers "did any label move?".
      val stepped = propagated
        .join(lookup, propagated("rep1") === lookup("__rid"), "left")
        .select(col("id"),
          least(col("rep1"), coalesce(col("__rrep"), col("rep1"))).as("rep"),
          (least(col("rep1"), coalesce(col("__rrep"), col("rep1"))) < col("orep")).as("chg"))
      // localCheckpoint persists its RDD itself — caching on top would
      // double-store the checkpointed generations.
      val next =
        if ((i + 1) % 3 == 0) stepped.localCheckpoint(false) else stepped.cache()
      val changed = next.agg(coalesce(max(col("chg")), lit(false))).first().getBoolean(0)
      cur.unpersist()
      cur = next
      converged = !changed
      if (sys.env.contains("GRAFT_CC_DEBUG")) println(s"[cc] round=$i changed=$changed t=${System.nanoTime}")
      i += 1
    }
    edges.unpersist()
    cur.select(col("id").as("doc_id"), col("rep").as("cluster_rep"))
  }

  /** LSH candidate pairs from an exploded `(id, band_idx, band_val)`
    * frame, with a hot-bucket guard: buckets larger than `maxBucketSize`
    * contribute NO pairs. At 100 TB a band value shared by 100k
    * boilerplate/spam documents would alone emit ~5×10⁹ candidate pairs
    * (O(bucket²)) and straggle or OOM the join stage — and those pairs
    * carry no information LSH is needed for, because documents that
    * collide on every band that hard are caught by exact/fingerprint
    * dedup upstream. The cap bounds the worst bucket's cost at
    * maxBucketSize² while leaving every normal bucket's output
    * byte-identical; skipped-bucket recall loss is confined to clusters
    * exact dedup already collapses. (The same guard ships in production
    * LSH systems, e.g. spark.ml's MinHashLSH users bound join keys the
    * same way.)
    *
    * The bucket size is computed with one unordered window count over
    * the band key — a single shuffle shared with the self-join's own
    * partitioning, no extra aggregation pass.
    */
  def lshPairsBounded(exploded: org.apache.spark.sql.DataFrame,
                      maxBucketSize: Int, idCol: String = "doc_id",
                      bandIdx: String = "band_idx",
                      bandVal: String = "band_val"): org.apache.spark.sql.DataFrame = {
    require(maxBucketSize >= 2, s"maxBucketSize must be >= 2, got $maxBucketSize")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(bandIdx, bandVal)
    val ok = exploded
      .withColumn("__n", count(lit(1)).over(w))
      .filter(col("__n") <= maxBucketSize)
      .drop("__n")
    ok.alias("a").join(ok.alias("b"),
        col(s"a.$bandIdx") === col(s"b.$bandIdx") &&
          col(s"a.$bandVal") === col(s"b.$bandVal") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  /** CLASSIC BPE TRAINING, the real iterative algorithm (t40 counts the
    * first round's candidates; this RUNS the loop): operate on the
    * DISTINCT-word frequency table — the standard tokenizer-training
    * formulation, which also bounds every round by VOCABULARY size, not
    * corpus size — and per round (1) count adjacent token pairs
    * weighted by word frequency, (2) pick the argmax pair under the
    * total order (count desc, a asc, b asc), (3) apply the merge to
    * every word with EXACT greedy left-to-right semantics.
    *
    * Greedy merge without a sequential scan: within a word, mark match
    * positions (tᵢ=a ∧ tᵢ₊₁=b), group CONSECUTIVE match positions into
    * runs (pos − running-match-count is constant within a run), and
    * select every other position from each run's start — precisely the
    * positions a left-to-right scan would merge (after a merge the
    * next overlapping candidate is consumed). Selected positions emit
    * a‖b, the following position drops, everything else passes
    * through. All window logic is per-word (the vocab-keyed shuffle),
    * integer-exact, and replays verbatim in SQL — the oracle re-runs
    * the whole loop INCLUDING each round's argmax as scalar
    * subqueries, so the training trajectory itself is cross-checked.
    *
    * Returns the learned merges (a, b, weighted count) and the final
    * segmented vocabulary (w, wcnt, toks). Each round localCheckpoints
    * the vocab-sized frame (the t32 lesson — 3 rounds referencing a
    * deep lineage would re-run upstream rounds per reference).
    */
  def bpeTrain(words: org.apache.spark.sql.DataFrame, rounds: Int)
      : (Seq[(String, String, Long)], org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    require(rounds >= 1)
    var segs = words
      .select(col("w"), col("wcnt"),
        expr("filter(split(w, ''), x -> x != '')").as("toks"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    for (_ <- 1 to rounds) {
      val top = segs.filter(size(col("toks")) >= 2)
        .select(col("wcnt"), explode(expr(
          "transform(sequence(1, size(toks) - 1), " +
            "i -> struct(element_at(toks, i) as a, element_at(toks, i + 1) as b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("wcnt")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
        .collect()
      require(top.nonEmpty, "bpeTrain: no pairs left to merge")
      val (a, b, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      merges += ((a, b, cnt))
      val wPos = Window.partitionBy("w").orderBy("pos")
      val ex = segs
        .select(col("w"), col("wcnt"), posexplode(col("toks")).as(Seq("pos", "t")))
        .withColumn("nxt", lead(col("t"), 1).over(wPos))
        .withColumn("m", col("t") === lit(a) && col("nxt") === lit(b))
        // run id: pos − (# matches so far) is constant across a run of
        // CONSECUTIVE match positions; null for non-matches so their
        // rows can never pollute a run's min(pos)
        .withColumn("grp", when(col("m"), col("pos") -
          sum(when(col("m"), 1L).otherwise(0L))
            .over(wPos.rowsBetween(Window.unboundedPreceding, 0))))
        .withColumn("sel", col("m") &&
          (col("pos") - min(col("pos")).over(Window.partitionBy("w", "grp"))) % 2 === 0)
        .withColumn("dropNext", coalesce(lag(col("sel"), 1).over(wPos), lit(false)))
        .filter(!col("dropNext"))
        .withColumn("tokOut", when(col("sel"), concat(col("t"), col("nxt"))).otherwise(col("t")))
      segs = ex.groupBy("w", "wcnt")
        .agg(array_sort(collect_list(struct(col("pos"), col("tokOut")))).as("ps"))
        .select(col("w"), col("wcnt"),
          expr("transform(ps, x -> x.tokOut)").as("toks"))
        .localCheckpoint(true)
    }
    (merges.toSeq, segs)
  }

  /** Candidate pairs under a per-bucket VERIFY budget — the downstream
    * half of the LSH cost story. [[lshPairsBounded]]'s occupancy cap
    * bounds pair GENERATION (a bucket hotter than `maxBucketSize`
    * contributes nothing); this bounds pair VERIFICATION: within each
    * surviving bucket only the first `capPerBucket` pairs under the
    * deterministic (id_a, id_b) order go on to the expensive exact
    * check (full-shingle Jaccard, edit distance, …), because the
    * round-11 sf0.5 sweep showed candidate COUNT — not candidate
    * generation — is what grows. Truncation is observable, not silent:
    * the audit frame counts truncated buckets and dropped candidate
    * slots, the same enforced-contract pattern as every other LSH cap.
    * A pair reachable through ANY un-truncated slot is still verified
    * (the distinct is after the cap).
    */
  def lshPairsCapped(exploded: org.apache.spark.sql.DataFrame,
                     capPerBucket: Int, idCol: String = "doc_id",
                     bandIdx: String = "band_idx", bandVal: String = "band_val")
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    require(capPerBucket >= 1, s"capPerBucket must be >= 1, got $capPerBucket")
    val raw = exploded.alias("a").join(exploded.alias("b"),
        col(s"a.$bandIdx") === col(s"b.$bandIdx") &&
          col(s"a.$bandVal") === col(s"b.$bandVal") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$bandIdx").as("band_idx"), col(s"a.$bandVal").as("band_val"),
        col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
    val wB = org.apache.spark.sql.expressions.Window
      .partitionBy("band_idx", "band_val").orderBy("id_a", "id_b")
    val ranked = raw.withColumn("__rnk", row_number().over(wB))
    val pairs = ranked.filter(col("__rnk") <= capPerBucket)
      .select("id_a", "id_b").distinct()
    val audit = ranked.filter(col("__rnk") > capPerBucket)
      .agg(countDistinct(col("band_idx"), col("band_val")).as("truncated_buckets"),
        count(lit(1)).as("dropped_candidates"))
    (pairs, audit)
  }

  /** Incremental near-dup gate against a PERSISTED band index — the
    * streaming-ingest half of [[lshPairsBounded]]'s batch self-join: a
    * new document is a duplicate-of-history when ANY of its LSH bands
    * equijoins an index entry, so batch N+1 dedups against everything
    * ever kept WITHOUT re-banding the historical corpus. `index` and
    * `newBands` share the exploded `(idCol, band_idx, band_val)`
    * contract (NULL bands must already be dropped — they never match).
    *
    * Returns the rows of `newDocs` that survive. Scale shape: the match
    * is a LEFT SEMI join on the band key — one hash shuffle keyed by
    * (band_idx, band_val), no pair materialization at all — and the
    * same `maxBucketSize` occupancy guard as every LSH path bounds a
    * spam band's bucket: entries of hotter buckets contribute no
    * matches (bounded, observable truncation instead of an O(bucket)
    * per-new-doc probe amplification). The index itself is band rows —
    * bands-per-doc × docs — appended per batch; at 100 TB it lives as
    * a snapshot-versioned table (Scale.writeSnapshot) partitionable by
    * band_idx and compacted like any other lakehouse table.
    */
  def dedupAgainstIndex(newDocs: org.apache.spark.sql.DataFrame,
                        newBands: org.apache.spark.sql.DataFrame,
                        index: org.apache.spark.sql.DataFrame,
                        maxBucketSize: Int,
                        idCol: String = "doc_id"): org.apache.spark.sql.DataFrame = {
    require(maxBucketSize >= 1, s"maxBucketSize must be >= 1, got $maxBucketSize")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("band_idx", "band_val")
    val okIdx = index
      .withColumn("__n", count(lit(1)).over(w))
      .filter(col("__n") <= maxBucketSize)
    val matched = newBands.alias("n").join(okIdx.alias("i"),
        col("n.band_idx") === col("i.band_idx") &&
          col("n.band_val") === col("i.band_val"),
        "left_semi")
      .select(col(s"n.$idCol")).distinct()
    newDocs.join(matched, Seq(idCol), "left_anti")
  }

  /** SimHash pigeonhole near-dup pairs: split `hashCol` into `nBlocks`
    * disjoint `blockBits`-bit blocks; any pair within Hamming distance
    * `maxHamming` < nBlocks agrees EXACTLY on ≥1 block (pigeonhole), so
    * candidates come from a block-value equijoin — never all-pairs — and
    * the exact `bit_count(xor) <= maxHamming` check runs only inside
    * blocks. Blocking is lossless for the threshold (the require below),
    * approximate only through the occupancy cap: blocks hotter than
    * `maxBlockSize` contribute NO pairs — the same enforced contract as
    * [[lshPairsBounded]] and `VectorOps.nearDupPairs`, turning saturating
    * block geometry into bounded, observable truncation instead of an
    * O(occupancy²) runaway join. The occupancy window's hash exchange is
    * the self-join's own partitioning.
    *
    * GEOMETRY IS THE SCALE KNOB: candidates grow as n²/2^blockBits per
    * block, so blockBits must grow with the corpus. The gate runs this
    * twice — t17 (32-bit hash, 8-bit blocks: the saturating-geometry
    * oracle twin, measured 18× wall-clock at 5× data before the cap) and
    * t22 (64-bit hash, 16-bit blocks: the scale path, 256× more block
    * values) — the r33↔r35 exact-vs-scale pairing applied to blocking
    * geometry.
    */
  def pigeonholePairs(hashed: org.apache.spark.sql.DataFrame,
                      blockBits: Int, nBlocks: Int, maxHamming: Int,
                      maxBlockSize: Int = 1000,
                      idCol: String = "doc_id",
                      hashCol: String = "sh"): org.apache.spark.sql.DataFrame = {
    require(maxHamming < nBlocks,
      s"pigeonhole is lossless only for maxHamming < nBlocks, got $maxHamming >= $nBlocks")
    require(maxBlockSize >= 2, s"maxBlockSize must be >= 2, got $maxBlockSize")
    val blocked = hashed.select(col(idCol), col(hashCol),
      explode(array((0 until nBlocks).map { b =>
        val mask = (((1L << blockBits) - 1) << (blockBits * b))
        struct(lit(b).as("blk_idx"),
          col(hashCol).bitwiseAND(lit(mask)).as("blk_val"))
      }: _*)).as("blk"))
      .select(col(idCol), col(hashCol), col("blk.blk_idx"), col("blk.blk_val"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("blk_idx", "blk_val")
    val ok = blocked
      .withColumn("__n", count(lit(1)).over(w))
      .filter(col("__n") <= maxBlockSize)
      .drop("__n")
    ok.alias("a").join(ok.alias("b"),
        col("a.blk_idx") === col("b.blk_idx") &&
          col("a.blk_val") === col("b.blk_val") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        bit_count(col(s"a.$hashCol").bitwiseXOR(col(s"b.$hashCol"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Karp-Rabin rolling polynomial hash (base 31, mod 1e9+7) over the
    * document's characters — order-sensitive unlike [[fingerprint]].
    * Engine-native integer arithmetic, single pass; the modulus keeps
    * acc*31 far below Long overflow (ANSI mode would throw on wrap).
    */
  def rollingHash(text: Column): Column = {
    val mod = lit(1000000007L)
    aggregate(filter(split(text, ""), ch => ch =!= ""),
      lit(0L),
      (acc, ch) => pmod(acc * 31 + ascii(ch).cast("long"), mod))
  }

  /** Character trigrams of a pre-materialized text column; fewer than 3
    * chars yields an empty array. The guard is load-bearing:
    * `sequence(1, n)` runs DESCENDING for n < 1 and would fabricate
    * junk shingles for short strings. Pass a materialized COLUMN (the
    * [[wordNgrams]] rule) — the lambda references it per element.
    */
  def charTrigrams(text: Column): Column =
    // native one-call path (codegen'd char-indexed substring loop) —
    // value-identical to the interpreted
    // `when(len>=3, transform(sequence(1, len-2), i -> substr(text,i,3)))
    //  .otherwise(array())` chain this replaced (HashExprsSpec pins it);
    // coalesce keeps the NULL-text → empty-array convention
    coalesce(graft.functions.native.charTrigrams(text),
      array().cast("array<string>"))

  /** Per-language character-trigram profiles: the top `topN` trigrams of
    * `lower(textCol)` per `langCol` value by frequency (ties by trigram
    * asc — a total order, so the profile is deterministic). Returns
    * (plang, tri). Scale: the trigram explosion is one linear pass; the
    * counts frame it reduces to is trigram-VOCABULARY-bounded (charset³
    * per language), independent of corpus row count, so the top-N
    * window runs over a frame that stays small at any corpus scale.
    */
  def trigramProfiles(docs: org.apache.spark.sql.DataFrame, textCol: String,
                      langCol: String, topN: Int): org.apache.spark.sql.DataFrame = {
    // fan key = the text itself (high cardinality; langCol has a
    // handful of values and would collapse the fan-out to nLangs tasks)
    val tris = fanOut(docs, col(textCol))
      .select(col(langCol).as("plang"), lower(col(textCol)).as("__lt"))
      .select(col("plang"), explode(charTrigrams(col("__lt"))).as("tri"))
    val counts = tris.groupBy("plang", "tri").agg(count(lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("plang").orderBy(col("__c").desc, col("tri").asc)
    counts.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= topN).select("plang", "tri")
  }

  /** Classify each row of `docs` by trigram-profile SET overlap: the
    * predicted language is the profile sharing the most distinct
    * trigrams with `lower(textCol)` (ties by language asc; zero overlap
    * — including sub-3-char texts — predicts 'unk'). Appends
    * `pred_lang`; all input columns pass through. Scale: the profile
    * frame (nLangs × topN) BROADCASTS, so the raw trigram stream is
    * filtered to profile matches BEFORE any keyed shuffle — the
    * distinct and the (id, lang) rollup see only matched rows, and the
    * argmax window partitions by the unique id. No corpus-sized
    * shuffle.
    */
  def classifyByProfiles(docs: org.apache.spark.sql.DataFrame, idCol: String,
                         textCol: String, profiles: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val tris = fanOut(docs, col(idCol))
      .select(col(idCol).as("__id"), lower(col(textCol)).as("__lt"))
      .select(col("__id"), explode(charTrigrams(col("__lt"))).as("tri"))
    // countDistinct, not distinct().count(): the dedup rides the same
    // (id, lang)-keyed exchange as the rollup — one shuffle, not two
    val hits = tris.join(broadcast(profiles), "tri")
      .groupBy("__id", "plang").agg(countDistinct(col("tri")).as("__h"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__id").orderBy(col("__h").desc, col("plang").asc)
    val pred = hits.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).select(col("__id"), col("plang").as("__p"))
    docs.join(pred.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .withColumn("pred_lang", coalesce(col("__p"), lit("unk")))
      .drop("__p")
  }

  /** Integer-exact BATCH PERCEPTRON over hashed sparse features — the
    * trained MODEL-BASED quality/domain filter (the DCLM/FineWeb
    * fastText-classifier slot; every other quality op here is a fixed
    * heuristic). All arithmetic is BIGINT, so training replays
    * bit-for-bit in any engine:
    *
    *   w⁰ = 0;  for each epoch:  mᵢ = Σ_b xᵢᵦ·wᵦ,
    *   M = {i : yᵢ·mᵢ ≤ 0} (ties misclassify — deterministic),
    *   wᵦ += Σ_{i∈M} yᵢ·xᵢᵦ   (classic batch update, learning rate 1).
    *
    * `feats` is the sparse design matrix (idCol, b, x) — one row per
    * (doc, feature-bucket) with integer count x; encode the BIAS as a
    * constant pseudo-bucket (e.g. b = -1, x = 1) so every doc has ≥1
    * row and the intercept trains like any weight. `labels` is
    * (idCol, y) with y ∈ {+1, −1}. Returns the weight frame (b, w).
    *
    * Scale shape: per epoch, one broadcast join of the corpus-sized
    * feature frame against the B-bounded weight frame, one doc-keyed
    * margin rollup (map-side partials), one doc-keyed semi-join for the
    * misclassified set, and one b-keyed delta rollup whose RESULT is
    * B-bounded — no all-pairs, no driver materialization beyond the
    * model itself (the per-epoch weight frame is localCheckpointed: B
    * rows, the "model size" a parameter server would hold). Epoch count
    * is fixed and small, exactly like the BPE rounds of [[bpeTrain]],
    * so an oracle unrolls it as a CTE chain.
    */
  def perceptronTrain(feats: org.apache.spark.sql.DataFrame,
                      labels: org.apache.spark.sql.DataFrame,
                      idCol: String, epochs: Int)
      : org.apache.spark.sql.DataFrame = {
    require(epochs >= 1)
    val spark = feats.sparkSession
    import spark.implicits._
    // (id, b, x, y) — train rows only. Materialized ONCE: every epoch
    // reads the training rows twice (margins + delta), so without this
    // the join lineage re-runs 2x per epoch (round-20: 6 recomputes at
    // 3 epochs). Caching the training set across epochs is the
    // standard iterative-training shape (guide §5).
    val t = feats.join(labels, idCol).localCheckpoint()
    var w = Seq.empty[(Long, Long)].toDF("b", "w")
    for (epoch <- 1 to epochs) {
      // epoch 1: the weight frame is empty, every margin is 0 and every
      // train row is misclassified by construction — the first update
      // is exactly sum(y·x) per bucket, no join/margin pass needed
      val delta =
        if (epoch == 1) t.groupBy("b").agg(sum(col("y") * col("x")).as("w"))
        else {
          val margins = t.join(broadcast(w), Seq("b"), "left")
            .groupBy(col(idCol), col("y"))
            .agg(sum(col("x") * coalesce(col("w"), lit(0L))).as("m"))
          val mis = margins.filter(col("y") * col("m") <= 0).select(idCol)
          t.join(mis, idCol)
            .groupBy("b").agg(sum(col("y") * col("x")).as("w"))
        }
      w = w.unionByName(delta).groupBy("b").agg(sum("w").as("w"))
        .localCheckpoint()
      // Overflow guard (the kmeansParallelInit phi-check discipline):
      // the margin Σ_b x·w wraps silently once max|w| × per-doc feature
      // mass nears Long range. 2^40 leaves 2^23 ≈ 8.4M of Σ|x| headroom
      // per doc — far beyond any real corpus row; a violating corpus
      // must fail loudly, not diverge quietly from the oracle.
      val maxRow = w.agg(max(abs(col("w")))).head
      val maxAbsW = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
      require(maxAbsW < (1L << 40),
        s"perceptronTrain weight overflow risk: max|w|=$maxAbsW ≥ 2^40 — " +
          "margins could wrap; rescale features or reduce epochs")
    }
    w
  }

  /** Apply a [[perceptronTrain]] model: per-doc integer margin
    * Σ_b xᵢᵦ·wᵦ over the broadcast weight frame. Returns (idCol, m).
    * Every doc with at least one feature row appears (the bias
    * pseudo-bucket guarantees that for all docs).
    */
  def perceptronScore(feats: org.apache.spark.sql.DataFrame,
                      weights: org.apache.spark.sql.DataFrame,
                      idCol: String): org.apache.spark.sql.DataFrame =
    feats.join(broadcast(weights), Seq("b"), "left")
      .groupBy(col(idCol))
      .agg(sum(col("x") * coalesce(col("w"), lit(0L))).as("m"))
}
