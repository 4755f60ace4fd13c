package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook exposing the native expressions to SQL:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)            // or
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * ...
  * spark.sql("SELECT graft_simhash32(tokens), graft_minhash(sh, 0) FROM t")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.all.foreach(ext.injectFunction)
    // conf-gated (spark.graft.rangeJoin.binWidth); a no-op until set
    ext.injectOptimizerRule(graft.plans.BinnedRangeJoinRule(_))
    // completes the USING graft SQL surface over merge-on-read,
    // renamed, and version-pinned tables: rewrites the source's marker
    // leaf into the full read plan (pruned scan + delete anti-join +
    // column-mapping aliases); no-op otherwise
    ext.injectResolutionRule(graft.plans.GraftTableRewrite(_))
    // SQL DML (MERGE/UPDATE/DELETE/INSERT) on graft targets, routed
    // through the snapshot/MoR commit protocol; no-op otherwise
    ext.injectResolutionRule(graft.plans.GraftDmlRule(_))
    // SQL introspection: graft_history / graft_files table functions
    graft.plans.GraftMeta.allTvfs.foreach(ext.injectTableFunction)
    // SQL maintenance: VACUUM GRAFT / OPTIMIZE GRAFT statements via a
    // delegating parser (non-graft SQL passes through verbatim)
    ext.injectParser((s, delegate) => new graft.plans.GraftSqlParser(s, delegate))
  }
}

object GraftExtensions {
  private type FnDesc =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val simhash32: FnDesc = (
    FunctionIdentifier("graft_simhash32"),
    new ExpressionInfo(classOf[SimHash32].getName, "graft_simhash32"),
    (args: Seq[Expression]) => args match {
      case Seq(one) => SimHash32(one)
      case other => throw new IllegalArgumentException(
        s"graft_simhash32(array<string>) — got ${other.length} args")
    })

  val simhash64: FnDesc = (
    FunctionIdentifier("graft_simhash64"),
    new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
    (args: Seq[Expression]) => args match {
      case Seq(one) => SimHash64(one)
      case other => throw new IllegalArgumentException(
        s"graft_simhash64(array<string>) — got ${other.length} args")
    })

  val minhash: FnDesc = (
    FunctionIdentifier("graft_minhash"),
    new ExpressionInfo(classOf[MinHash].getName, "graft_minhash"),
    (args: Seq[Expression]) => args match {
      case Seq(arr, org.apache.spark.sql.catalyst.expressions.Literal(seed: Int, _)) =>
        MinHash(arr, seed)
      case Seq(arr) => MinHash(arr, 0)
      case other => throw new IllegalArgumentException(
        s"graft_minhash(array, [int seed]) — got ${other.length} args")
    })

  val yyyymmddToDate: FnDesc = (
    FunctionIdentifier("graft_yyyymmdd_to_date"),
    new ExpressionInfo(classOf[YyyymmddToDate].getName, "graft_yyyymmdd_to_date"),
    // widen any integral SQL argument to the expression's int domain
    (args: Seq[Expression]) => args match {
      case Seq(one) => YyyymmddToDate(
        org.apache.spark.sql.catalyst.expressions.Cast(
          one, org.apache.spark.sql.types.IntegerType))
      case other => throw new IllegalArgumentException(
        s"graft_yyyymmdd_to_date(int) — got ${other.length} args")
    })

  // ---- text/quality curation family ---------------------------------
  // These are Column-composed operators (graft.text.TextOps), exposed to
  // SQL through the Column↔Expression bridge so TextOps stays the single
  // source of truth — the SQL form and the Column form are the SAME
  // expression tree, not a re-implementation that could drift. Builders
  // run at analysis time, so the unresolved lambda/function nodes inside
  // resolve through the normal analyzer pass.
  import org.apache.spark.sql.{graft => sqlgraft}
  import graft.text.TextOps
  import org.apache.spark.sql.catalyst.expressions.Literal

  private val textOpsClass = "graft.text.TextOps"

  private def unary(name: String,
                    f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): FnDesc = (
    FunctionIdentifier(name),
    new ExpressionInfo(textOpsClass, name),
    (args: Seq[Expression]) => args match {
      case Seq(one) =>
        sqlgraft.bridge.toExpression(f(sqlgraft.bridge.column(one)))
      case other => throw new IllegalArgumentException(
        s"$name(expr) — got ${other.length} args")
    })

  /** md5 over lowercased, whitespace-collapsed, trimmed text (t1/t12). */
  val fingerprint: FnDesc = unary("graft_fingerprint", TextOps.fingerprint)

  /** Whitespace tokenization, empty tokens dropped (the token column the
    * ratio/ID functions consume).
    */
  val tokens: FnDesc = unary("graft_tokens", TextOps.tokens)

  /** Fraction of tokens that are English stopwords (t9/t10). */
  val stopwordRatio: FnDesc = unary("graft_stopword_ratio", TextOps.stopwordRatio)

  /** BPE-ish pre-tokenizer upper-bound count (t10/t11). */
  val bpeishTokenCount: FnDesc =
    unary("graft_bpeish_token_count", TextOps.bpeishTokenCount)

  /** Whitespace token count (t11). */
  val tokenCount: FnDesc = unary("graft_token_count", TextOps.tokenCount)

  /** Karp-Rabin rolling hash (t12). */
  val rollingHash: FnDesc = unary("graft_rolling_hash", TextOps.rollingHash)

  /** 'en'/'unk' by stopword-ratio threshold; threshold must be a literal
    * (it parameterizes the expression tree, same contract as
    * graft_minhash's seed).
    */
  val langId: FnDesc = (
    FunctionIdentifier("graft_lang_id"),
    new ExpressionInfo(textOpsClass, "graft_lang_id"),
    (args: Seq[Expression]) => args match {
      case Seq(toks) => sqlgraft.bridge.toExpression(
        TextOps.langIdHeuristic(sqlgraft.bridge.column(toks)))
      case Seq(toks, Literal(th: Double, _)) => sqlgraft.bridge.toExpression(
        TextOps.langIdHeuristic(sqlgraft.bridge.column(toks), th))
      case other => throw new IllegalArgumentException(
        s"graft_lang_id(tokens, [double literal threshold]) — got ${other.length} args")
    })

  /** Deterministic content-hash sample predicate (t7/t8): permille (and
    * the optional salt) must be literals.
    */
  val deterministicSample: FnDesc = (
    FunctionIdentifier("graft_deterministic_sample"),
    new ExpressionInfo(textOpsClass, "graft_deterministic_sample"),
    (args: Seq[Expression]) => args match {
      case Seq(id, Literal(pm: Int, _)) => sqlgraft.bridge.toExpression(
        TextOps.deterministicSample(sqlgraft.bridge.column(id), pm))
      case Seq(id, Literal(pm: Int, _), Literal(salt, _)) if salt != null =>
        sqlgraft.bridge.toExpression(TextOps.deterministicSample(
          sqlgraft.bridge.column(id), pm, salt.toString))
      case other => throw new IllegalArgumentException(
        "graft_deterministic_sample(id, int literal permille, [string literal salt])" +
          s" — got ${other.length} args")
    })

  // ---- vector similarity family --------------------------------------
  // The native codegen kernels (DotProductD / L2Dist2D) behind the same
  // Column↔Expression bridge: VectorOps stays the single source of truth
  // and each side is cast to array<double> first, so `graft_dot(emb_a,
  // emb_b)` works directly on the array<float> embeddings table. Without
  // these, an analyst on spark.sql had no path to the similarity surface
  // (round-7 verdict, missing #2).

  import graft.vector.VectorOps

  private def binaryVec(name: String,
                        f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column): FnDesc = (
    FunctionIdentifier(name),
    new ExpressionInfo("graft.vector.VectorOps", name),
    (args: Seq[Expression]) => args match {
      case Seq(a, b) => sqlgraft.bridge.toExpression(
        f(sqlgraft.bridge.column(a), sqlgraft.bridge.column(b)))
      case other => throw new IllegalArgumentException(
        s"$name(array, array) — got ${other.length} args")
    })

  /** Sequential left-to-right dot product in double (v1–v4's kernel). */
  val dot: FnDesc = binaryVec("graft_dot", VectorOps.dot)

  /** Squared L2 distance in double (the IVF assignment kernel). */
  val l2dist2: FnDesc = binaryVec("graft_l2dist2", VectorOps.l2Dist2)

  /** Cosine similarity in double — dot over the product of L2 norms. */
  val cosine: FnDesc = binaryVec("graft_cosine", VectorOps.cosine)

  /** Bounded top-k AGGREGATE: `graft_topk(struct(score, id), 5)` keeps
    * the k smallest values by struct order with map-side partials — the
    * v10/t45 kernel, now reachable from pure SQL (sort descending by
    * negating the score). k must be a literal: it sizes the heap.
    */
  val topk: FnDesc = (
    FunctionIdentifier("graft_topk"),
    new ExpressionInfo(classOf[TopK].getName, "graft_topk"),
    (args: Seq[Expression]) => args match {
      case Seq(child, Literal(k: Int, _)) => TopK(child, k)
      case Seq(_, notLit) => throw new IllegalArgumentException(
        s"graft_topk's k must be an INT literal (it sizes the heap); got ${notLit.sql}")
      case other => throw new IllegalArgumentException(
        s"graft_topk(expr, int literal k) — got ${other.length} args")
    })

  /** Every injectable function — the single list both the extensions
    * class and imperative registration drain.
    */
  val all: Seq[FnDesc] = Seq(simhash32, simhash64, minhash, yyyymmddToDate,
    fingerprint, tokens, stopwordRatio, bpeishTokenCount, tokenCount,
    rollingHash, langId, deterministicSample, dot, l2dist2, cosine, topk)

  /** Imperative registration for an already-built session (scalar
    * functions AND the [[graft.plans.GraftMeta]] table functions; the
    * parser, which has no live-session hook, only arrives via
    * `spark.sql.extensions` at session build).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    all.foreach { case (id, info, builder) =>
      registry.registerFunction(id, info, builder)
    }
    val tvfs = spark.sessionState.tableFunctionRegistry
    graft.plans.GraftMeta.allTvfs.foreach { case (id, info, builder) =>
      tvfs.registerFunction(id, info, builder)
    }
  }
}
