package graft.queries

import org.apache.spark.sql.functions._
import graft.pipeline.TextPipeline

/** The end-to-end curation DAG as a single gate entry: p1 runs the real
  * [[TextPipeline]] (checkpointed parquet stages and all) and emits one
  * row per stage — surviving row count plus a deterministic signature —
  * so the PIPELINE composition, not just its constituent operators
  * (t1/t3/t6/t7/t9/t16), is oracle-pinned. The DuckDB oracle re-derives
  * every stage as one CTE chain.
  *
  * Signatures are scale-safe: doc stages sign with `sum(doc_id)` (which
  * docs survived is exactly the stage's semantic), the chunk stage signs
  * content with `sum(md5-prefix % 1e9+7)` — commutative sums, so both
  * engines agree regardless of partitioning/order, and the modulus keeps
  * the sum far from BIGINT overflow at any corpus size.
  */
object PipelineQueries {

  private val tokSql = "list_filter(string_split(text, ' '), x -> x != '')"
  private val swSql =
    s"""CASE WHEN len($tokSql) = 0 THEN 0.0
        ELSE CAST(len(list_filter($tokSql, x -> list_contains(
             ['the','a','an','of','and','to','in','is','are','for','on','with','as','at','by','it','this','that','was','be'],
             lower(x)))) AS DOUBLE) / CAST(len($tokSql) AS DOUBLE) END"""
  private def minhashSql(seed: Int) =
    s"list_aggregate(list_transform(sh, x -> md5('s$seed' || x)), 'min')"
  private val shingleSql =
    s"""CASE WHEN len($tokSql) >= 3
        THEN list_transform(range(len($tokSql) - 2),
               i -> array_to_string(list_slice($tokSql, i + 1, i + 3), ' '))
        ELSE [] END"""

  /** Gate config: the default thresholds keep 12/500 docs at sf0.01 (the
    * synthetic corpus is stopword-light), which would starve the dedup
    * stages of input — langThreshold 0.05 keeps ~62%, so every stage does
    * real work AND really filters.
    */
  private val gateCfg = TextPipeline.Config(
    minTokens = 5, minStopwordRatio = 0.05, langThreshold = 0.05)

  /** One shared parent for every p1 checkpoint tree, reaped by ONE JVM
    * shutdown hook — a per-invocation hook would grow the hook registry
    * (and the orphaned trees) without bound in a long-lived session that
    * re-runs the gate. RAM-backed `/dev/shm` is preferred when writable:
    * the checkpoints are rewritten-then-discarded scratch whose only
    * consumer is the stage signature query, so routing them off the disk
    * removes p1's 5-stage write amplification from ambient-I/O exposure
    * (round 7: 7.9 s idle vs 37.2 s under interference). Durability is
    * irrelevant — a crashed JVM reaps them by definition.
    */
  private[graft] lazy val checkpointParent: java.nio.file.Path = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    val base =
      if (java.nio.file.Files.isDirectory(shm) && java.nio.file.Files.isWritable(shm)) shm
      else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val root = java.nio.file.Files.createTempDirectory(base, "graft_p1_root_")
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(root.toFile)
    }
    root
  }

  val all: Seq[Q] = Seq(

    Q("p1_curation_pipeline",
      (s, d) => {
        // the returned frame lazily re-reads the checkpoints, so each
        // invocation gets its own subtree under the shared reaped parent
        val out = java.nio.file.Files.createTempDirectory(checkpointParent, "run_").toString
        val p = new TextPipeline(s, s"$d/documents.parquet", out, gateCfg)
        p.runAll()
        def docStage(name: String) = s.read.parquet(s"$out/$name")
          .agg(count(lit(1)).as("n_rows"), sum(col("doc_id")).as("sig"))
          .select(lit(name).as("stage"), col("n_rows"), col("sig"))
        val chunkStage = s.read.parquet(s"$out/chunks")
          .agg(count(lit(1)).as("n_rows"),
            sum(conv(substring(md5(col("chunk_text")), 1, 10), 16, 10)
              .cast("long") % lit(1000000007L)).as("sig"))
          .select(lit("chunks").as("stage"), col("n_rows"), col("sig"))
        Seq("quality", "exact_dedup", "near_dedup", "sample")
          .map(docStage).reduce(_.union(_)).union(chunkStage)
      },
      Some(s"""
        WITH RECURSIVE
        quality AS (
          SELECT doc_id, text FROM documents
          WHERE len($tokSql) >= ${gateCfg.minTokens}
            AND $swSql >= ${gateCfg.minStopwordRatio}
            AND $swSql >= ${gateCfg.langThreshold}),
        exact_dedup AS (
          SELECT doc_id, text FROM (
            SELECT doc_id, text, row_number() OVER (
              PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
              ORDER BY doc_id) AS rn
            FROM quality) WHERE rn = 1),
        sig AS (
          SELECT doc_id,
                 ${minhashSql(0)} || '|' || ${minhashSql(1)} AS band0,
                 ${minhashSql(2)} || '|' || ${minhashSql(3)} AS band1
          FROM (SELECT doc_id, $shingleSql AS sh FROM exact_dedup)),
        bands AS (
          SELECT doc_id, 0 AS band_idx, band0 AS band_val FROM sig
          UNION ALL
          SELECT doc_id, 1, band1 FROM sig),
        bcnt AS (
          SELECT band_idx, band_val, count(*) AS c FROM bands
          WHERE band_val IS NOT NULL GROUP BY 1, 2),
        okbands AS (
          SELECT b.doc_id, b.band_idx, b.band_val
          FROM bands b JOIN bcnt USING (band_idx, band_val)
          WHERE c <= ${gateCfg.maxBucketSize}),
        pairs AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM okbands a JOIN okbands b
            ON a.band_idx = b.band_idx AND a.band_val = b.band_val
          WHERE a.doc_id < b.doc_id),
        edges AS (
          SELECT id_a AS s, id_b AS t FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
        reach(src, node) AS (
          SELECT s, s FROM (SELECT DISTINCT s FROM edges) v
          UNION
          SELECT r.src, e.t FROM reach r JOIN edges e ON r.node = e.s),
        reps AS (
          SELECT src AS doc_id, min(node) AS rep FROM reach GROUP BY src),
        near_dedup AS (
          SELECT doc_id, text FROM exact_dedup
          WHERE doc_id NOT IN (SELECT doc_id FROM reps WHERE doc_id != rep)),
        smp AS (
          SELECT doc_id, text FROM near_dedup
          WHERE ('0x' || substr(md5('smp' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT * 1000
                < ${gateCfg.samplePermille} * 65536),
        ct AS (
          SELECT doc_id, $tokSql AS toks FROM smp WHERE len($tokSql) > 0),
        chunks AS (
          SELECT doc_id,
                 array_to_string(list_slice(toks, start + 1, start + ${gateCfg.chunkSize}), ' ') AS chunk_text
          FROM (SELECT doc_id, toks,
                  unnest(range(0, len(toks), ${gateCfg.chunkStride})) AS start FROM ct))
        SELECT stage, n_rows, sig FROM (
          SELECT 'quality' AS stage, count(*) AS n_rows, CAST(sum(doc_id) AS BIGINT) AS sig FROM quality
          UNION ALL
          SELECT 'exact_dedup', count(*), CAST(sum(doc_id) AS BIGINT) FROM exact_dedup
          UNION ALL
          SELECT 'near_dedup', count(*), CAST(sum(doc_id) AS BIGINT) FROM near_dedup
          UNION ALL
          SELECT 'sample', count(*), CAST(sum(doc_id) AS BIGINT) FROM smp
          UNION ALL
          SELECT 'chunks', count(*),
                 CAST(sum(('0x' || substr(md5(chunk_text), 1, 10))::BIGINT % 1000000007) AS BIGINT)
          FROM chunks)
        ORDER BY stage""")),

    // p2: INCREMENTAL curation refresh — the t48 snapshot-index
    // composition of p1 (see IncrementalPipeline's scaladoc for the
    // semantics and the incremental-vs-one-shot caveat). History
    // (doc_id % 4 != 3) bootstraps quality + exact-dedup and commits
    // fingerprint + LSH band indexes as snapshot v0; the delta
    // (doc_id % 4 = 3) then runs O(delta) stages: gate, exact-vs-index,
    // LSH probe-vs-index, within-delta cluster pass, index commit v1,
    // sample, chunks. The oracle replays BOTH batches in one statement
    // (t48's discipline), so a band row dropped/duplicated/time-traveled
    // by the snapshot plumbing, or a probe that re-banded history,
    // diverges a signature. O(delta) evidence: the per-stage durations
    // land in the bench `stages` artifact (delta_* wall « hist_* wall).
    Q("p2_incremental_curation",
      (s, d) => {
        val out = java.nio.file.Files.createTempDirectory(checkpointParent, "run_").toString
        val p = new graft.pipeline.IncrementalPipeline(
          s, s"$d/documents.parquet", out, gateCfg)
        p.run()
        // every stage signature arrived as OBSERVED METRICS riding the
        // stage writes (zero extra jobs — the round-19 diet); only the
        // committed index snapshots are re-read, in ONE union-aggregate
        // job, because the gate's claim is about what is ON DISK
        val idxRows = Seq(
            ("index_v0", p.bandIdxPath, 0L), ("index_v1", p.bandIdxPath, 1L),
            ("fp_index_v1", p.fpIdxPath, 1L))
          .map { case (tag, path, v) =>
            graft.operators.Scale.readSnapshot(s, path, Some(v))
              .select(lit(tag).as("stage"), col("doc_id")) }
          .reduce(_.unionByName(_))
          .groupBy("stage")
          .agg(count(lit(1)), coalesce(sum(col("doc_id")), lit(0L)))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        val rows =
          Seq("hist_quality", "hist_exact", "delta_quality", "delta_exact",
              "delta_probe", "delta_near", "delta_sample", "delta_chunks")
            .map(n => (n, p.sigs(n)._1, p.sigs(n)._2)) ++ idxRows
        val sp = s; import sp.implicits._
        rows.toDF("stage", "n_rows", "sig").orderBy("stage")
      },
      Some(s"""
        WITH RECURSIVE
        hist AS (SELECT doc_id, text FROM documents WHERE doc_id % 4 != 3),
        delta AS (SELECT doc_id, text FROM documents WHERE doc_id % 4 = 3),
        hq AS (
          SELECT doc_id, text FROM hist
          WHERE len($tokSql) >= ${gateCfg.minTokens}
            AND $swSql >= ${gateCfg.minStopwordRatio}
            AND $swSql >= ${gateCfg.langThreshold}),
        he AS (
          SELECT doc_id, text FROM (
            SELECT doc_id, text, row_number() OVER (
              PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
              ORDER BY doc_id) AS rn
            FROM hq) WHERE rn = 1),
        hfp AS (
          SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
          FROM he),
        hsig AS (
          SELECT doc_id,
                 ${minhashSql(0)} || '|' || ${minhashSql(1)} AS band0,
                 ${minhashSql(2)} || '|' || ${minhashSql(3)} AS band1
          FROM (SELECT doc_id, $shingleSql AS sh FROM he)),
        idx0 AS (
          SELECT doc_id, band_idx, band_val FROM (
            SELECT doc_id, 0 AS band_idx, band0 AS band_val FROM hsig
            UNION ALL SELECT doc_id, 1, band1 FROM hsig)
          WHERE band_val IS NOT NULL),
        dq AS (
          SELECT doc_id, text FROM delta
          WHERE len($tokSql) >= ${gateCfg.minTokens}
            AND $swSql >= ${gateCfg.minStopwordRatio}
            AND $swSql >= ${gateCfg.langThreshold}),
        de AS (
          SELECT doc_id, text FROM (
            SELECT doc_id, text, fp,
                   row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
            FROM (SELECT doc_id, text,
                    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
                  FROM dq))
          WHERE rn = 1 AND fp NOT IN (SELECT fp FROM hfp)),
        dsig AS (
          SELECT doc_id,
                 ${minhashSql(0)} || '|' || ${minhashSql(1)} AS band0,
                 ${minhashSql(2)} || '|' || ${minhashSql(3)} AS band1
          FROM (SELECT doc_id, $shingleSql AS sh FROM de)),
        dbands AS (
          SELECT doc_id, band_idx, band_val FROM (
            SELECT doc_id, 0 AS band_idx, band0 AS band_val FROM dsig
            UNION ALL SELECT doc_id, 1, band1 FROM dsig)
          WHERE band_val IS NOT NULL),
        icnt AS (
          SELECT band_idx, band_val, count(*) AS c FROM idx0 GROUP BY 1, 2),
        okidx AS (
          SELECT i.doc_id, i.band_idx, i.band_val
          FROM idx0 i JOIN icnt USING (band_idx, band_val)
          WHERE c <= ${gateCfg.maxBucketSize}),
        matched AS (
          SELECT DISTINCT db.doc_id FROM dbands db
          JOIN okidx USING (band_idx, band_val)),
        dp AS (
          SELECT doc_id, text FROM de
          WHERE doc_id NOT IN (SELECT doc_id FROM matched)),
        pbands AS (
          SELECT * FROM dbands WHERE doc_id IN (SELECT doc_id FROM dp)),
        pcnt AS (
          SELECT band_idx, band_val, count(*) AS c FROM pbands GROUP BY 1, 2),
        okp AS (
          SELECT b.doc_id, b.band_idx, b.band_val
          FROM pbands b JOIN pcnt USING (band_idx, band_val)
          WHERE c <= ${gateCfg.maxBucketSize}),
        pairs AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM okp a JOIN okp b
            ON a.band_idx = b.band_idx AND a.band_val = b.band_val
          WHERE a.doc_id < b.doc_id),
        edges AS (
          SELECT id_a AS s, id_b AS t FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
        reach(src, node) AS (
          SELECT s, s FROM (SELECT DISTINCT s FROM edges) v
          UNION
          SELECT r.src, e.t FROM reach r JOIN edges e ON r.node = e.s),
        reps AS (
          SELECT src AS doc_id, min(node) AS rep FROM reach GROUP BY src),
        dn AS (
          SELECT doc_id, text FROM dp
          WHERE doc_id NOT IN (SELECT doc_id FROM reps WHERE doc_id != rep)),
        dnbands AS (
          SELECT * FROM dbands WHERE doc_id IN (SELECT doc_id FROM dn)),
        idx1 AS (
          SELECT * FROM idx0 UNION ALL SELECT * FROM dnbands),
        smp AS (
          SELECT doc_id, text FROM dn
          WHERE ('0x' || substr(md5('smp' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT * 1000
                < ${gateCfg.samplePermille} * 65536),
        ct AS (
          SELECT doc_id, $tokSql AS toks FROM smp WHERE len($tokSql) > 0),
        chunks AS (
          SELECT doc_id,
                 array_to_string(list_slice(toks, start + 1, start + ${gateCfg.chunkSize}), ' ') AS chunk_text
          FROM (SELECT doc_id, toks,
                  unnest(range(0, len(toks), ${gateCfg.chunkStride})) AS start FROM ct))
        SELECT stage, n_rows, sig FROM (
          SELECT 'hist_quality' AS stage, count(*) AS n_rows,
                 CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS sig FROM hq
          UNION ALL SELECT 'hist_exact', count(*),
                 CAST(coalesce(sum(doc_id), 0) AS BIGINT) FROM he
          UNION ALL SELECT 'index_v0', count(*),
                 CAST(coalesce(sum(doc_id), 0) AS BIGINT) FROM idx0
          UNION ALL SELECT 'delta_quality', count(*),
                 CAST(coalesce(sum(doc_id), 0) AS BIGINT) FROM dq
          UNION ALL SELECT 'delta_exact', count(*),
                 CAST(coalesce(sum(doc_id), 0) AS BIGINT) FROM de
          UNION ALL SELECT 'delta_probe', count(*),
                 CAST(coalesce(sum(doc_id), 0) AS BIGINT) FROM dp
          UNION ALL SELECT 'delta_near', count(*),
                 CAST(coalesce(sum(doc_id), 0) AS BIGINT) FROM dn
          UNION ALL SELECT 'index_v1', count(*),
                 CAST(coalesce(sum(doc_id), 0) AS BIGINT) FROM idx1
          UNION ALL SELECT 'fp_index_v1', count(*),
                 CAST(coalesce(sum(doc_id), 0) AS BIGINT)
          FROM (SELECT doc_id FROM he UNION ALL SELECT doc_id FROM dn)
          UNION ALL SELECT 'delta_sample', count(*),
                 CAST(coalesce(sum(doc_id), 0) AS BIGINT) FROM smp
          UNION ALL SELECT 'delta_chunks', count(*),
                 CAST(coalesce(sum(('0x' || substr(md5(chunk_text), 1, 10))::BIGINT % 1000000007), 0) AS BIGINT)
          FROM chunks)
        ORDER BY stage""")),

    // d1: the §2.6 DQ ruleset surface as an ORACLE-CHECKED gate row
    // (previously spec-only): the reference's Glue-DSL ruleset evaluated
    // over documents, one audit row per rule with the evaluator's exact
    // observed-metric semantics (IsComplete observes the NULL count,
    // IsUnique the distinct count with SQL UNIQUE-constraint null
    // handling, ColumnCount the schema width — the oracle derives it
    // from the documents view via DESCRIBE, so an additive testdata
    // regeneration that passes the drift-tolerant preflight keeps both
    // sides in lockstep). IsUnique "text" FAILS by design (the
    // corpus carries the duplicate texts t1 dedups), so the false branch
    // of the evaluator is under oracle too. BEST_EFFORT semantics: the
    // audit frame is the product; nothing throws. One aggregate job for
    // all metric rules — the evaluator's one-scan contract.
    Q("d1_dq_audit",
      (s, d) => {
        import s.implicits._
        val ruleset = """Rules = [ ColumnCount > 0, RowCount > 100,
          IsComplete "doc_id", IsUnique "doc_id",
          IsComplete "text", IsUnique "text" ]"""
        graft.quality.DataQuality.evaluate(Tables.documents(s, d), ruleset)
          .results.map(r => (r.rule, r.passed, r.observed))
          .toDF("rule", "passed", "observed")
          .orderBy("rule")
      },
      Some("""
        SELECT * FROM (
          SELECT 'ColumnCount > 0' AS rule, TRUE AS passed,
                 (SELECT CAST(count(*) AS BIGINT) FROM (DESCRIBE documents)) AS observed
          UNION ALL
          SELECT 'RowCount > 100', count(*) > 100, count(*) FROM documents
          UNION ALL
          SELECT 'IsComplete "doc_id"', count(doc_id) = count(*),
                 count(*) - count(doc_id) FROM documents
          UNION ALL
          SELECT 'IsUnique "doc_id"', count(DISTINCT doc_id) = count(doc_id),
                 count(DISTINCT doc_id) FROM documents
          UNION ALL
          SELECT 'IsComplete "text"', count(text) = count(*),
                 count(*) - count(text) FROM documents
          UNION ALL
          SELECT 'IsUnique "text"', count(DISTINCT text) = count(text),
                 count(DISTINCT text) FROM documents)
        ORDER BY rule""")),

    // d2: ROW-LEVEL DQ QUARANTINE — d1 renders dataset-level verdicts;
    // a pipeline also needs Glue DQ's other half: per-row `ColumnValues`
    // outcomes that split the frame into clean rows and a quarantine
    // table tagged with WHICH rules each row violates. The audit emitted
    // here is one row per rule (violation count + the min/max violating
    // doc_id as the triage sample) plus the `(clean)` summary row; the
    // `matches` rule passes for every row, putting the zero-violation
    // branch under oracle next to the two failing rules. Scale: the
    // annotation is a pure projection (zero jobs — every rule predicate
    // evaluates per row in one pass), the audit is explode → one
    // partial-agg shuffle keyed by rule text, and the clean count rides
    // the same annotated frame; nothing here is quadratic or
    // driver-side at any corpus size.
    Q("d2_dq_quarantine",
      (s, d) => {
        val ruleset = """Rules = [ ColumnValues "n_chars" > 100,
          ColumnValues "lang" in ["en", "de", "fr", "es"],
          ColumnValues "text" matches "^[ -~]*$" ]"""
        val annotated = graft.quality.DataQuality
          .annotate(Tables.documents(s, d), ruleset)
        val perRule = annotated
          .select(col("doc_id"), explode(col("dq_failed")).as("rule"))
          .groupBy("rule")
          .agg(count(lit(1)).as("n_violations"),
            min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
        val ruleNames = graft.quality.DataQuality.parse(ruleset)
          .map(r => lit(r.text))
        // every rule gets an audit row even at zero violations (a rule
        // silently vanishing from the audit is itself a DQ bug)
        val allRules = s.range(1)
          .select(explode(array(ruleNames: _*)).as("rule"))
          .join(perRule, Seq("rule"), "left")
          .select(col("rule"),
            coalesce(col("n_violations"), lit(0L)).as("n_violations"),
            col("min_doc"), col("max_doc"))
        val clean = annotated.filter(size(col("dq_failed")) === 0)
          .agg(count(lit(1)).as("n_violations"),
            min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
          .select(lit("(clean)").as("rule"), col("n_violations"),
            col("min_doc"), col("max_doc"))
        allRules.unionByName(clean).orderBy("rule")
      },
      Some("""
        WITH ann AS (
          SELECT doc_id,
                 n_chars > 100 AS p1,
                 lang IN ('en', 'de', 'fr', 'es') AS p2,
                 regexp_matches(text, '^[ -~]*$') AS p3
          FROM documents)
        SELECT * FROM (
          SELECT 'ColumnValues "n_chars" > 100' AS rule,
                 CAST(count(*) FILTER (p1 IS NOT TRUE) AS BIGINT) AS n_violations,
                 min(doc_id) FILTER (p1 IS NOT TRUE) AS min_doc,
                 max(doc_id) FILTER (p1 IS NOT TRUE) AS max_doc
          FROM ann
          UNION ALL
          SELECT 'ColumnValues "lang" in ["en", "de", "fr", "es"]',
                 CAST(count(*) FILTER (p2 IS NOT TRUE) AS BIGINT),
                 min(doc_id) FILTER (p2 IS NOT TRUE),
                 max(doc_id) FILTER (p2 IS NOT TRUE)
          FROM ann
          UNION ALL
          SELECT 'ColumnValues "text" matches "^[ -~]*$"',
                 CAST(count(*) FILTER (p3 IS NOT TRUE) AS BIGINT),
                 min(doc_id) FILTER (p3 IS NOT TRUE),
                 max(doc_id) FILTER (p3 IS NOT TRUE)
          FROM ann
          UNION ALL
          SELECT '(clean)',
                 CAST(count(*) FILTER (p1 AND p2 AND p3) AS BIGINT),
                 min(doc_id) FILTER (p1 AND p2 AND p3),
                 max(doc_id) FILTER (p1 AND p2 AND p3)
          FROM ann)
        ORDER BY rule""")),

    // d3: DQ DRIFT between snapshot versions — the lakehouse ops
    // composition of d1's evaluator with r60's time travel: evaluate the
    // same ruleset against snapshot v0 ("yesterday's load": n_chars >
    // 100 docs only) and the latest commit, emit per-rule observed
    // metrics side by side with the delta. This is the "did quality
    // move between loads" audit a pipeline alerts on — here RowCount
    // grows by the short docs and the ColumnValues violation count goes
    // 0 → 37, both under oracle. Each evaluation is the evaluator's
    // one-aggregate scan over an immutable snapshot dir; the audit
    // frame is rule-count-sized.
    Q("d3_dq_drift",
      (s, d) => {
        import s.implicits._
        val ruleset = """Rules = [ RowCount > 100,
          IsComplete "text", ColumnValues "n_chars" > 100 ]"""
        val p = graft.queries.IoQueries.snapshotDocs(s, d)
        val v0 = graft.quality.DataQuality
          .evaluate(graft.operators.Scale.readSnapshot(s, p, Some(0L)), ruleset)
        val v1 = graft.quality.DataQuality
          .evaluate(graft.operators.Scale.readSnapshot(s, p), ruleset)
        v0.results.zip(v1.results)
          .map { case (a, b) =>
            (a.rule, a.observed, b.observed, b.observed - a.observed) }
          .toDF("rule", "observed_v0", "observed_v1", "delta")
          .orderBy("rule")
      },
      Some("""
        SELECT * FROM (
          SELECT 'RowCount > 100' AS rule,
                 (SELECT count(*) FROM documents WHERE n_chars > 100) AS observed_v0,
                 (SELECT count(*) FROM documents) AS observed_v1,
                 (SELECT count(*) FROM documents)
                   - (SELECT count(*) FROM documents WHERE n_chars > 100) AS delta
          UNION ALL
          SELECT 'IsComplete "text"',
                 (SELECT count(*) - count(text) FROM documents WHERE n_chars > 100),
                 (SELECT count(*) - count(text) FROM documents),
                 (SELECT count(*) - count(text) FROM documents)
                   - (SELECT count(*) - count(text) FROM documents WHERE n_chars > 100)
          UNION ALL
          SELECT 'ColumnValues "n_chars" > 100',
                 (SELECT count(*) FROM documents WHERE n_chars > 100
                    AND n_chars <= 100),
                 (SELECT count(*) FROM documents WHERE n_chars <= 100),
                 (SELECT count(*) FROM documents WHERE n_chars <= 100)
                   - (SELECT count(*) FROM documents WHERE n_chars > 100
                        AND n_chars <= 100))
        ORDER BY rule""")),

    // d4: DQ RULE RECOMMENDATION — the reference surface's other mode
    // (Glue's recommendation run): PROFILE the table once, SYNTHESIZE
    // a ruleset from the observations (completeness, uniqueness,
    // numeric bounds, low-cardinality value sets, the half-rows
    // RowCount floor), then EVALUATE the recommendation against the
    // same data — every rule passes by construction, and that
    // self-consistency (plus the exact synthesized rule TEXTS,
    // including the sorted lang value-set and the observed min/max
    // literals) is what the oracle pins: it re-derives each rule
    // string, its observed metric, AND its emission CONDITION from raw
    // documents in SQL — each candidate row carries the same WHERE the
    // recommender's branch tests, so the oracle stays faithful at any
    // scale factor's data shape. (On this corpus raw `text` is
    // byte-unique — the duplicates t1 dedups are fingerprint-level,
    // normalized-whitespace/case copies — so IsUnique "text" IS
    // correctly recommended; lang gets the in-list but never
    // uniqueness.)
    Q("d4_dq_recommend",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val rules = graft.quality.DataQuality.recommend(
          docs, Seq("doc_id", "lang", "n_chars", "text"))
        graft.quality.DataQuality
          .evaluate(docs, "Rules = [ " + rules.mkString(", ") + " ]")
          .results.map(r => (r.rule, r.passed, r.observed))
          .toDF("rule", "passed", "observed")
          .orderBy("rule")
      },
      Some("""
        WITH s AS (
          SELECT count(*) AS rows_,
                 CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_id,
                 CAST(count(DISTINCT doc_id) AS BIGINT) AS ndv_id,
                 min(doc_id) AS mn_id, max(doc_id) AS mx_id,
                 CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_lang,
                 CAST(count(DISTINCT lang) AS BIGINT) AS ndv_lang,
                 CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_nc,
                 CAST(count(DISTINCT n_chars) AS BIGINT) AS ndv_nc,
                 min(n_chars) AS mn_nc, max(n_chars) AS mx_nc,
                 CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_t,
                 CAST(count(DISTINCT text) AS BIGINT) AS ndv_t
          FROM documents),
        langs AS (
          SELECT string_agg(DISTINCT '"' || lang || '"', ', ' ORDER BY '"' || lang || '"') AS ll
          FROM documents)
        SELECT rule, passed, observed FROM (
          SELECT 'RowCount > ' || CAST(rows_ // 2 AS VARCHAR) AS rule,
                 TRUE AS passed, rows_ AS observed FROM s
          UNION ALL SELECT 'IsComplete "doc_id"', TRUE, nn_id FROM s WHERE nn_id = 0
          UNION ALL SELECT 'IsUnique "doc_id"', TRUE, ndv_id FROM s
                 WHERE nn_id = 0 AND ndv_id = rows_
          UNION ALL SELECT 'ColumnValues "doc_id" >= ' || CAST(mn_id AS VARCHAR),
                 TRUE, 0 FROM s WHERE nn_id = 0 AND rows_ > 0
          UNION ALL SELECT 'ColumnValues "doc_id" <= ' || CAST(mx_id AS VARCHAR),
                 TRUE, 0 FROM s WHERE nn_id = 0 AND rows_ > 0
          UNION ALL SELECT 'IsComplete "lang"', TRUE, nn_lang FROM s WHERE nn_lang = 0
          UNION ALL SELECT 'IsUnique "lang"', TRUE, ndv_lang FROM s
                 WHERE nn_lang = 0 AND ndv_lang = rows_
          UNION ALL SELECT 'ColumnValues "lang" in [' || ll || ']', TRUE, 0
                 FROM langs, s WHERE nn_lang = 0 AND ndv_lang <= 10
          UNION ALL SELECT 'IsComplete "n_chars"', TRUE, nn_nc FROM s WHERE nn_nc = 0
          UNION ALL SELECT 'IsUnique "n_chars"', TRUE, ndv_nc FROM s
                 WHERE nn_nc = 0 AND ndv_nc = rows_
          UNION ALL SELECT 'ColumnValues "n_chars" >= ' || CAST(mn_nc AS VARCHAR),
                 TRUE, 0 FROM s WHERE nn_nc = 0 AND rows_ > 0
          UNION ALL SELECT 'ColumnValues "n_chars" <= ' || CAST(mx_nc AS VARCHAR),
                 TRUE, 0 FROM s WHERE nn_nc = 0 AND rows_ > 0
          UNION ALL SELECT 'IsComplete "text"', TRUE, nn_t FROM s WHERE nn_t = 0
          UNION ALL SELECT 'IsUnique "text"', TRUE, ndv_t FROM s
                 WHERE nn_t = 0 AND ndv_t = rows_)
        ORDER BY rule""")),

    // d5: REFERENTIAL INTEGRITY — the Glue DQ rule family d1–d4 could
    // not cover because it crosses datasets: every lineitem FK audited
    // against its dimension's key set, one audit row per rule. Three
    // rules pass (the TPC-H FKs hold); the fourth audits l_suppkey
    // against NATION keys and fails with the exact violation count, so
    // the false branch and the observed metric are both under oracle.
    // Scale: each rule is distinct(reference-key) — a partial-agg
    // shuffle on the dimension, tiny — then a keyed LEFT ANTI join
    // counted; AQE broadcasts the distinct side in the usual FK case,
    // so at 100 TB the fact side is scanned once per rule with no
    // pairwise or driver-side step. A NULL FK never matches an anti
    // join, so Glue's nulls-fail semantics cost nothing extra.
    Q("d5_dq_referential",
      (s, d) => {
        import s.implicits._
        val ruleset = """Rules = [
          ReferentialIntegrity "l_orderkey" "orders.o_orderkey",
          ReferentialIntegrity "l_partkey" "part.p_partkey",
          ReferentialIntegrity "l_suppkey" "supplier.s_suppkey",
          ReferentialIntegrity "l_suppkey" "nation.n_nationkey" ]"""
        val refs = Map(
          "orders" -> Tables.orders(s, d),
          "part" -> Tables.part(s, d),
          "supplier" -> Tables.supplier(s, d),
          "nation" -> Tables.nation(s, d))
        graft.quality.DataQuality
          .evaluate(Tables.lineitem(s, d), ruleset, refs)
          .results.map(r => (r.rule, r.passed, r.observed))
          .toDF("rule", "passed", "observed")
          .orderBy("rule")
      },
      Some("""
        WITH v1 AS (SELECT count(*) AS n FROM lineitem
                    WHERE l_orderkey IS NULL
                       OR l_orderkey NOT IN (SELECT o_orderkey FROM orders)),
        v2 AS (SELECT count(*) AS n FROM lineitem
               WHERE l_partkey IS NULL
                  OR l_partkey NOT IN (SELECT p_partkey FROM part)),
        v3 AS (SELECT count(*) AS n FROM lineitem
               WHERE l_suppkey IS NULL
                  OR l_suppkey NOT IN (SELECT s_suppkey FROM supplier)),
        v4 AS (SELECT count(*) AS n FROM lineitem
               WHERE l_suppkey IS NULL
                  OR l_suppkey NOT IN (SELECT n_nationkey FROM nation))
        SELECT rule, passed, observed FROM (
          SELECT 'ReferentialIntegrity "l_orderkey" "orders.o_orderkey"' AS rule,
                 n = 0 AS passed, CAST(n AS BIGINT) AS observed FROM v1
          UNION ALL
          SELECT 'ReferentialIntegrity "l_partkey" "part.p_partkey"',
                 n = 0, CAST(n AS BIGINT) FROM v2
          UNION ALL
          SELECT 'ReferentialIntegrity "l_suppkey" "supplier.s_suppkey"',
                 n = 0, CAST(n AS BIGINT) FROM v3
          UNION ALL
          SELECT 'ReferentialIntegrity "l_suppkey" "nation.n_nationkey"',
                 n = 0, CAST(n AS BIGINT) FROM v4)
        ORDER BY rule""")),

    // d7: DQ METRICS REPOSITORY — the Deequ MetricsRepository pattern
    // that makes d1-style audits longitudinal: yesterday's metric frame
    // (the corpus before today's arrivals — doc_id % 3 != 0) COMMITS as
    // snapshot v0, today's full-corpus frame as v1, and the gate reads
    // both versions BACK FROM THE COMMITTED TABLE and reports per-rule
    // deltas plus the regression verdict (passed yesterday, failing
    // today). Storing metrics, not data, is the point: the repository
    // is rules-sized, a re-audit never re-scans history, and the same
    // snapshot protocol as r60/t48/v23 gives time-travel over quality
    // itself. The oracle recomputes both evaluations directly, so a
    // snapshot that dropped/duplicated/crossed a metric row breaks the
    // hash.
    Q("d7_dq_metrics_repository",
      (s, d) => {
        import s.implicits._
        val ruleset = """Rules = [ RowCount > 100,
          IsComplete "doc_id", IsUnique "doc_id", IsUnique "text" ]"""
        def metrics(df: org.apache.spark.sql.DataFrame) =
          graft.quality.DataQuality.evaluate(df, ruleset)
            .results.map(r => (r.rule, r.passed, r.observed))
            .toDF("rule", "passed", "observed")
        val docs = Tables.documents(s, d)
        val table = java.nio.file.Files.createTempDirectory(
          graft.streaming.StreamExec.scratchParent, "dqrepo_").toString + "/t"
        graft.operators.Scale.writeSnapshot(s, table,
          metrics(docs.filter(col("doc_id") % 3 =!= 0)))
        graft.operators.Scale.writeSnapshot(s, table, metrics(docs))
        val v0 = graft.operators.Scale.readSnapshot(s, table, Some(0L))
          .select(col("rule"), col("passed").as("passed_v0"),
            col("observed").as("observed_v0"))
        val v1 = graft.operators.Scale.readSnapshot(s, table, Some(1L))
          .select(col("rule"), col("passed").as("passed_v1"),
            col("observed").as("observed_v1"))
        v0.join(v1, "rule")
          .withColumn("delta", col("observed_v1") - col("observed_v0"))
          .withColumn("regressed", col("passed_v0") && !col("passed_v1"))
          .orderBy("rule")
      },
      Some("""
        WITH y AS (SELECT * FROM documents WHERE doc_id % 3 <> 0),
        v0 AS (
          SELECT 'RowCount > 100' AS rule, count(*) > 100 AS passed,
                 CAST(count(*) AS BIGINT) AS observed FROM y
          UNION ALL
          SELECT 'IsComplete "doc_id"', count(doc_id) = count(*),
                 count(*) - count(doc_id) FROM y
          UNION ALL
          SELECT 'IsUnique "doc_id"', count(DISTINCT doc_id) = count(doc_id),
                 count(DISTINCT doc_id) FROM y
          UNION ALL
          SELECT 'IsUnique "text"', count(DISTINCT text) = count(text),
                 count(DISTINCT text) FROM y),
        v1 AS (
          SELECT 'RowCount > 100' AS rule, count(*) > 100 AS passed,
                 CAST(count(*) AS BIGINT) AS observed FROM documents
          UNION ALL
          SELECT 'IsComplete "doc_id"', count(doc_id) = count(*),
                 count(*) - count(doc_id) FROM documents
          UNION ALL
          SELECT 'IsUnique "doc_id"', count(DISTINCT doc_id) = count(doc_id),
                 count(DISTINCT doc_id) FROM documents
          UNION ALL
          SELECT 'IsUnique "text"', count(DISTINCT text) = count(text),
                 count(DISTINCT text) FROM documents)
        SELECT v0.rule, v0.passed AS passed_v0, v0.observed AS observed_v0,
               v1.passed AS passed_v1, v1.observed AS observed_v1,
               v1.observed - v0.observed AS delta,
               v0.passed AND NOT v1.passed AS regressed
        FROM v0 JOIN v1 ON v0.rule = v1.rule
        ORDER BY v0.rule""")),

    // d6: VOLUME ANOMALY DETECTION — the time-series half of the DQ
    // surface (Deequ's anomaly checks): d1–d5 judge a snapshot against
    // static rules; d6 judges each day's per-type event volume against
    // that type's OWN trailing-7-observed-day history, flagging 'low'
    // under 50% of the trailing mean and 'high' above 200% (pure
    // integer cross-multiplication — the detector replays exactly in
    // any engine), with a 3-day warmup. This is the check that catches
    // an upstream outage or a double-ingest the snapshot rules can't
    // see. Scale: one partial-agg shuffle to the (type, day) frame —
    // output-sized — then a per-type window with a bounded ROWS frame.
    Q("d6_dq_volume_anomaly",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"), to_date(col("ts_ts")).as("day"))
          .agg(count(lit(1)).as("cnt"))
        graft.quality.DataQuality
          .volumeAnomalies(daily, "event_type", "day", "cnt")
          .select("event_type", "day", "cnt", "hist_n", "hist_sum", "status")
          .orderBy("event_type", "day")
      },
      Some("""
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
          FROM events GROUP BY 1, 2),
        wd AS (
          SELECT event_type, day, cnt,
                 count(cnt) OVER (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS hist_n,
                 coalesce(sum(cnt) OVER (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING), 0) AS hist_sum
          FROM daily)
        SELECT event_type, day, CAST(cnt AS BIGINT) AS cnt,
               CAST(hist_n AS BIGINT) AS hist_n,
               CAST(hist_sum AS BIGINT) AS hist_sum,
               CASE WHEN hist_n < 3 THEN 'warmup'
                    WHEN cnt * hist_n * 10000 < hist_sum * 5000 THEN 'low'
                    WHEN cnt * hist_n * 10000 > hist_sum * 20000 THEN 'high'
                    ELSE 'ok' END AS status
        FROM wd ORDER BY event_type, day"""))
  )
}
