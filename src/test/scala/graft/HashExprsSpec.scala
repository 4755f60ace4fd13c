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
