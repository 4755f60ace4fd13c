package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftExtensions
import graft.text.TextOps

class ExtensionsSpec extends SparkSpec {

  test("native functions callable from SQL after registration") {
    GraftExtensions.register(spark)
    spark.read.parquet(s"$sf001/documents.parquet").limit(50)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      .createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_simhash32(t) AS sh, graft_simhash64(t) AS sh64, graft_minhash(t, 1) AS mh FROM ext_docs")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val viaApi = spark.table("ext_docs")
      .select(col("doc_id"), graft.functions.native.simhash32(col("t")).as("sh"),
        graft.functions.native.simhash64(col("t")).as("sh64"),
        graft.functions.native.minhash(col("t"), 1).as("mh"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(viaSql == viaApi)
    // default seed form
    assert(spark.sql("SELECT graft_minhash(array('a','b'))").head().getString(0) ==
      spark.sql("SELECT graft_minhash(array('a','b'), 0)").head().getString(0))
    // date repair from SQL, including the NULL-on-invalid arm
    val dates = spark.sql(
      "SELECT graft_yyyymmdd_to_date(20200229), graft_yyyymmdd_to_date(20190230)").head()
    assert(dates.getDate(0) == java.sql.Date.valueOf("2020-02-29"))
    assert(dates.isNullAt(1))
  }

  test("text/quality family from SQL matches the Column API exactly") {
    GraftExtensions.register(spark)
    spark.read.parquet(s"$sf001/documents.parquet").limit(50)
      .createOrReplaceTempView("ext_docs2")
    val viaSql = spark.sql("""
      SELECT doc_id,
             graft_fingerprint(text) AS fp,
             graft_rolling_hash(text) AS roll,
             graft_token_count(text) AS n_ws,
             graft_bpeish_token_count(text) AS n_bp,
             graft_stopword_ratio(graft_tokens(text)) AS sw,
             graft_lang_id(graft_tokens(text)) AS lang,
             graft_deterministic_sample(doc_id, 500) AS keep
      FROM ext_docs2""").collect().map(_.toSeq).toSeq
    val t = TextOps.tokens(col("text"))
    val viaApi = spark.table("ext_docs2").select(
      col("doc_id"),
      TextOps.fingerprint(col("text")).as("fp"),
      TextOps.rollingHash(col("text")).as("roll"),
      TextOps.tokenCount(col("text")).as("n_ws"),
      TextOps.bpeishTokenCount(col("text")).as("n_bp"),
      TextOps.stopwordRatio(t).as("sw"),
      TextOps.langIdHeuristic(t).as("lang"),
      TextOps.deterministicSample(col("doc_id"), 500).as("keep"))
      .collect().map(_.toSeq).toSeq
    assert(viaSql == viaApi)
    // explicit threshold and salt forms
    // stopword ratio of the array is 2/3 ≈ 0.667
    assert(spark.sql("SELECT graft_lang_id(array('the','of','xyz'), 0.8D)").head().getString(0) == "unk")
    assert(spark.sql("SELECT graft_lang_id(array('the','of','xyz'), 0.5D)").head().getString(0) == "en")
    assert(spark.sql("SELECT graft_deterministic_sample(7, 1000, 'x')").head().getBoolean(0))
    // arity misuse fails with a usage message, not a bare head-of-empty
    val err = intercept[Exception] {
      spark.sql("SELECT graft_fingerprint()").collect()
    }
    assert(err.getMessage.contains("graft_fingerprint") ||
      err.getCause != null && err.getCause.getMessage.contains("graft_fingerprint"))
    val err2 = intercept[Exception] {
      spark.sql("SELECT graft_yyyymmdd_to_date()").collect()
    }
    assert(err2.getMessage.contains("graft_yyyymmdd_to_date") ||
      err2.getCause != null && err2.getCause.getMessage.contains("graft_yyyymmdd_to_date"))
  }

  test("vector family from SQL matches the Column API bit-exactly") {
    GraftExtensions.register(spark)
    spark.read.parquet(s"$sf001/embeddings.parquet").limit(40)
      .createOrReplaceTempView("ext_emb")
    // self-join a float-typed embedding column: the SQL functions must
    // cast exactly like VectorOps (array<float> → array<double> then the
    // native sequential fold), so values compare with ==, not tolerance
    val viaSql = spark.sql("""
      SELECT a.vec_id, b.vec_id,
             graft_dot(a.embedding, b.embedding) AS d,
             graft_l2dist2(a.embedding, b.embedding) AS l2,
             graft_cosine(a.embedding, b.embedding) AS cos
      FROM ext_emb a JOIN ext_emb b ON b.vec_id = a.vec_id + 1""")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val a = spark.table("ext_emb")
    val b = spark.table("ext_emb").select(col("vec_id").as("vid2"), col("embedding").as("emb2"))
    val viaApi = a.join(b, col("vid2") === col("vec_id") + 1)
      .select(col("vec_id"), col("vid2"),
        graft.vector.VectorOps.dot(col("embedding"), col("emb2")).as("d"),
        graft.vector.VectorOps.l2Dist2(col("embedding"), col("emb2")).as("l2"),
        graft.vector.VectorOps.cosine(col("embedding"), col("emb2")).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(viaSql.nonEmpty && viaSql == viaApi)
    // sanity anchors: cos(v,v)≈1 (sqrt(d)·sqrt(d) is an ulp off d in
    // IEEE, so not ==), l2dist2(v,v)=0 exactly
    val self = spark.sql(
      "SELECT graft_cosine(embedding, embedding), graft_l2dist2(embedding, embedding) FROM ext_emb LIMIT 1").head()
    assert(math.abs(self.getDouble(0) - 1.0) < 1e-12 && self.getDouble(1) == 0.0)
  }

  test("GraftExtensions class wires every function through SparkSessionExtensions") {
    // the spark.sql.extensions path: session construction instantiates the
    // class and drains its injections into the session's FunctionRegistry.
    // A shared-session suite can't rebuild the session, so replay exactly
    // that drain against a fresh registry and prove both functions land
    // and build working expressions.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val reg = org.apache.spark.sql.graft.bridge.registerInjectedFunctions(
      ext, org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin.clone())
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    assert(GraftExtensions.all.forall { case (id, _, _) => reg.functionExists(id) },
      "an injected function is missing from the drained registry")
    // builders produce evaluable expressions (not just registry entries)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val arr = Literal.create(
      ArrayData.toArrayData(Array(UTF8String.fromString("a"), UTF8String.fromString("b"))),
      ArrayType(StringType))
    val mh = reg.lookupFunction(FunctionIdentifier("graft_minhash"), Seq(arr))
    assert(mh.eval(null) == graft.functions.HashAlgos.minhash(
      ArrayData.toArrayData(Array(UTF8String.fromString("a"), UTF8String.fromString("b"))),
      UTF8String.fromString("s0")))
  }

  test("BinnedRangeJoinRule: range join becomes an equijoin, same rows, loud guard") {
    import graft.plans.BinnedRangeJoinRule
    import org.apache.spark.sql.functions._
    val sq = spark
    import sq.implicits._
    // negative points included: truncating div is monotone, so binning
    // stays correct below zero as long as BOTH sides use the same formula
    val points = (-100L until 2000L).map(i => (i, i % 7)).toDF("p", "v")
    val ivs = Seq((1L, 100L, 160L), (2L, 500L, 900L), (3L, 1990L, 2050L),
      (4L, -80L, -20L)).toDF("id", "lo", "hi")
    def q = points.join(ivs, col("p") >= col("lo") && col("p") < col("hi"))
      .select("id", "p", "v")
    val plain = q.collect().map(_.toSeq).toSet
    assert(plain.size == 60 + 400 + 10 + 60)
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[BinnedRangeJoinRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ BinnedRangeJoinRule(spark)
    spark.conf.set(BinnedRangeJoinRule.WidthConf, "64")
    try {
      val df = q
      val got = df.collect().map(_.toSeq).toSet
      assert(got == plain, "rewrite changed the join's rows")
      val s = df.queryExecution.executedPlan.toString
      assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"),
        s"rule did not remove the nested loop:\n$s")
      assert(s.contains("Generate"), s"expected the bin explode in:\n$s")
      // an interval spanning >= maxBins bins must raise, not explode
      spark.conf.set(BinnedRangeJoinRule.MaxBinsConf, "4")
      val err = intercept[Exception] { q.collect() }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(err).exists(_.contains("graft.rangeJoinRule")),
        s"guard raised the wrong error: ${messages(err).mkString(" | ")}")
    } finally {
      spark.conf.unset(BinnedRangeJoinRule.WidthConf)
      spark.conf.unset(BinnedRangeJoinRule.MaxBinsConf)
    }
  }

  test("graft_topk aggregate from pure SQL: k smallest structs per group, map-side partials") {
    import spark.implicits._
    graft.functions.GraftExtensions.register(spark)
    Seq(("a", 5L), ("a", 1L), ("a", 3L), ("a", 2L), ("b", 9L), ("b", 7L))
      .toDF("g", "v").createOrReplaceTempView("topk_in")
    val rows = spark.sql(
      """SELECT g, transform(graft_topk(struct(v), 2), x -> x.v) AS top2
        |FROM topk_in GROUP BY g ORDER BY g""".stripMargin).collect()
    assert(rows(0).getSeq[Long](1) == Seq(1L, 2L))
    assert(rows(1).getSeq[Long](1) == Seq(7L, 9L))
    // non-literal k must fail loudly, not mis-size the heap
    intercept[Exception](spark.sql(
      "SELECT graft_topk(struct(v), v) FROM topk_in").collect())
  }

  test("Sessions.local wires GraftExtensions into its builder") {
    // the extension MECHANISM (builder.withExtensions -> functions
    // resolve) is exercised live by this suite's other tests; what they
    // cannot see is whether the library's own session factory uses it —
    // and a live check would need to stop the suite's shared session.
    // A source-level pin keeps the wiring from silently regressing.
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/core/Sessions.scala")),
      "UTF-8")
    assert(src.contains("withExtensions(new graft.functions.GraftExtensions)"),
      "Sessions.local must wire GraftExtensions")
  }
}
