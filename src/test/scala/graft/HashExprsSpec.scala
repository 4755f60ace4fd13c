package graft

import org.apache.spark.sql.functions._
import graft.text.TextOps
import graft.functions.native

/** The native codegen expressions must be value-identical to the portable
  * builtin compositions (which the DuckDB oracles mirror).
  */
class HashExprsSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sf001/documents.parquet")

  test("native simhash32 == builtin simhash32 on real documents") {
    val toks = TextOps.tokens(col("text"))
    val diff = docs.select(
      TextOps.simhash32(toks).as("b"), native.simhash32(toks).as("n"))
      .filter(col("b") =!= col("n"))
    assert(diff.count() == 0)
  }

  test("native minhash == builtin minhash across seeds, incl. empty arrays") {
    val withSh = docs.select(
      TextOps.wordNgrams(TextOps.tokens(col("text")), 3).as("sh"))
    (0 until 4).foreach { seed =>
      val diff = withSh.select(
        TextOps.minhash(col("sh"), seed).as("b"),
        native.minhash(col("sh"), seed).as("n"))
        .filter(!(col("b") <=> col("n")))
      assert(diff.count() == 0, s"seed $seed")
    }
    // empty-array behavior: both null
    import spark.implicits._
    val empty = Seq(Seq.empty[String]).toDF("sh")
    val r = empty.select(TextOps.minhash(col("sh"), 0), native.minhash(col("sh"), 0)).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("native spanHashes60 == builtin conv(substring(md5(ngram)))::long on real documents") {
    // the exact chain spanHashes used before the native rewrite — the
    // DuckDB oracles still compute THIS, so equivalence here is what
    // keeps every span-family oracle valid
    val toks = TextOps.tokens(col("text"))
    for (n <- Seq(3, 13)) {
      val builtin = docs.select(posexplode(
          TextOps.wordNgrams(toks, n)).as(Seq("i", "span")))
        .select(col("i"),
          conv(substring(md5(col("span")), 1, 15), 16, 10).cast("long").as("b"))
      val nat = docs.select(posexplode(
          native.spanHashes60(toks, n)).as(Seq("i", "n")))
      assert(builtin.count() == nat.count(), s"n=$n span counts differ")
      val joined = builtin.groupBy("b").count().as("x")
        .join(nat.groupBy("n").count().as("y"), col("b") === col("n"), "full_outer")
        .filter(col("b").isNull || col("n").isNull || col("x.count") =!= col("y.count"))
      assert(joined.count() == 0, s"n=$n hash multisets differ")
    }
    // sub-n token arrays yield an empty array (wordNgrams' rule)
    import spark.implicits._
    val short = Seq("one two").toDF("text")
      .select(native.spanHashes60(TextOps.tokens(col("text")), 3).as("h"))
    assert(short.head().getSeq[Long](0).isEmpty)
    // null elements skip with their separator, array_join's rule
    val withNull = Seq(1).toDF("x").select(
      native.spanHashes60(
        array(lit("a"), lit(null).cast("string"), lit("b")), 3).as("h"),
      conv(substring(md5(array_join(
        array(lit("a"), lit(null).cast("string"), lit("b")), " ")), 1, 15),
        16, 10).cast("long").as("b"))
    val r = withNull.head()
    assert(r.getSeq[Long](0) == Seq(r.getLong(1)))
  }

  test("fused minhashSigArr == per-seed minhash; fused bands == per-seed lshBands") {
    val toks = TextOps.tokens(col("text"))
    val sig = docs.select(toks.as("t"))
      .select(native.minhashSigArr(col("t"), 3, 4).as("mh"),
        TextOps.wordNgrams(col("t"), 3).as("sh"))
    for (seed <- 0 until 4) {
      val diff = sig.select(element_at(col("mh"), seed + 1).as("f"),
          native.minhash(col("sh"), seed).as("p"))
        .filter(!(col("f") <=> col("p")))
      assert(diff.count() == 0, s"fused signature diverges at seed $seed")
    }
    // band concat over the fused signature == per-seed lshBands,
    // including NULL propagation for sub-3-token docs
    val bandDiff = sig.select(
        native.lshBandsFromSig(col("mh"), 4, 2).zipWithIndex.map {
          case (c, i) => c.as(s"f$i") }: _*)
      .collect().map(_.toSeq)
    val perSeed = sig.select(
        native.lshBands(col("sh"), 4, 2).zipWithIndex.map {
          case (c, i) => c.as(s"p$i") }: _*)
      .collect().map(_.toSeq)
    assert(bandDiff.toSeq == perSeed.toSeq, "fused bands diverge from per-seed bands")
  }

  test("native charTrigrams == builtin transform(sequence)/substr chain") {
    val builtin = when(length(lower(col("text"))) >= 3,
      transform(sequence(lit(1), length(lower(col("text"))) - 2),
        i => lower(col("text")).substr(i, lit(3))))
      .otherwise(array().cast("array<string>"))
    val diff = docs.select(builtin.as("b"),
        TextOps.charTrigrams(lower(col("text"))).as("n"))
      .filter(!(col("b") <=> col("n")))
    assert(diff.count() == 0)
    // short and NULL inputs both yield the empty array
    import spark.implicits._
    val edge = Seq(("ab"), (null: String)).toDF("t")
      .select(TextOps.charTrigrams(col("t")).as("n"))
      .collect().map(_.getSeq[String](0))
    assert(edge.forall(_.isEmpty))
    // multi-byte code points are CHAR-indexed, not byte-indexed
    val uni = Seq("aßc∂e").toDF("t")
      .select(TextOps.charTrigrams(col("t")).as("n")).head().getSeq[String](0)
    assert(uni == Seq("aßc", "ßc∂", "c∂e"))
  }

  test("native simhash32 == builtin simhash32 when the token array has NULL elements") {
    // builtin: md5(NULL) propagates NULL into when(...).otherwise(-1), so a
    // NULL token votes -1 on all 32 bits; the native expr must match.
    val toks = array(lit("alpha"), lit(null).cast("string"), lit("beta"))
    val r = spark.range(1).select(
      TextOps.simhash32(toks).as("b"), native.simhash32(toks).as("n")).head()
    assert(r.getLong(0) == r.getLong(1), s"builtin=${r.getLong(0)} native=${r.getLong(1)}")
    val allNull = array(lit(null).cast("string"))
    val r2 = spark.range(1).select(
      TextOps.simhash32(allNull).as("b"), native.simhash32(allNull).as("n")).head()
    assert(r2.getLong(0) == r2.getLong(1))
  }

  test("native expressions run inside whole-stage codegen") {
    val plan = docs.select(native.simhash32(TextOps.tokens(col("text"))))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"not codegen'd:\n$plan")
  }

  test("native dotD/dist2D == interpreted aggregate(zip_with) folds") {
    // the vector kernels replaced the portable higher-order folds in
    // VectorOps.rawDot/cellDists — pin value identity (same sequential
    // left-to-right order; doubles are sum-order-sensitive) on real
    // embeddings, plus the null contract the composition implies
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
      .select(transform(col("embedding"), _.cast("double")).as("a"))
    val pairs = emb.withColumn("b", reverse(col("a")))
    def interpDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    def interpDist2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)
    val diff = pairs.select(
        interpDot(col("a"), col("b")).as("id"), native.dotD(col("a"), col("b")).as("nd"),
        interpDist2(col("a"), col("b")).as("i2"), native.dist2D(col("a"), col("b")).as("n2"))
      .filter(col("id") =!= col("nd") || col("i2") =!= col("n2"))
    assert(diff.count() == 0)
    // null element or length mismatch → null, matching zip_with padding
    val edge = spark.range(1).select(
      native.dotD(array(lit(1.0), lit(null).cast("double")), array(lit(2.0), lit(3.0))).as("n1"),
      native.dotD(array(lit(1.0)), array(lit(2.0), lit(3.0))).as("n2"),
      native.dist2D(array(lit(1.0)), array(lit(2.0), lit(3.0))).as("n3")).head()
    assert(edge.isNullAt(0) && edge.isNullAt(1) && edge.isNullAt(2))
    val plan = pairs.select(native.dotD(col("a"), col("b")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"not codegen'd:\n$plan")
  }

  test("simhash64: deterministic, content-sensitive, 64-bit range, codegen'd") {
    // no builtin twin exists (the 64-bit form is native-only; DuckDB
    // re-derives it in the t22 oracle) — pin the algebraic contract:
    // equal token arrays hash equal, a one-token change moves few bits,
    // and the sign bit is reachable (the hash uses all 64 bits).
    val a = Seq("the", "quick", "brown", "fox").map(lit(_))
    val r = spark.range(1).select(
      native.simhash64(array(a: _*)).as("h1"),
      native.simhash64(array(a: _*)).as("h2"),
      native.simhash64(array((a :+ lit("jumps")): _*)).as("h3")).head()
    assert(r.getLong(0) == r.getLong(1))
    assert(r.getLong(0) != r.getLong(2))
    val hams = docs.select(TextOps.tokens(col("text")).as("t"))
      .filter(size(col("t")) > 0)
      .select(native.simhash64(col("t")).as("h")).collect().map(_.getLong(0))
    assert(hams.exists(_ < 0), "sign bit never set across the corpus — bit 63 unreachable?")
    val plan = docs.select(native.simhash64(TextOps.tokens(col("text"))))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"not codegen'd:\n$plan")
  }
}
