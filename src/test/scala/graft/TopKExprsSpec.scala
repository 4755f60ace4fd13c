package graft

import org.apache.spark.sql.functions._
import graft.functions.native
import graft.operators.Relational

/** The bounded TopK aggregate and PackSignBits must be value-identical to
  * the builtin compositions they replace (which the DuckDB oracles mirror).
  */
class TopKExprsSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sf001/embeddings.parquet")

  test("packSigns == chained when(element_at) masks on real embeddings") {
    def builtinMask(lo: Int) =
      (0 until 32).map { j =>
        when(element_at(col("embedding"), lo + j + 1).cast("double") > 0.0,
          lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    val diff = emb.select(
      builtinMask(0).as("b0"), native.packSigns(col("embedding"), 0, 32).as("n0"),
      builtinMask(32).as("b1"), native.packSigns(col("embedding"), 32, 32).as("n1"))
      .filter(col("b0") =!= col("n0") || col("b1") =!= col("n1"))
    assert(diff.count() == 0)
  }

  test("packSigns edge cases: NULL array, null elements, short arrays") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, -1.0, null, 0.0)), // null elem -> bit 0
      (2L, Seq[java.lang.Double](2.0)),                  // shorter than len
      (3L, null)                                         // NULL array -> NULL
    ).toDF("id", "v")
    val rows = df.select(col("id"), native.packSigns(col("v"), 0, 8).as("m"))
      .orderBy("id").collect()
    assert(rows(0).getLong(1) == 1L)  // only v[0] > 0
    assert(rows(1).getLong(1) == 1L)  // out-of-range dims are 0 bits
    assert(rows(2).isNullAt(1))
  }

  test("topNPerKeyAgg == window topNPerKey on a skewed keyed frame") {
    import spark.implicits._
    val rows = (0 until 5000).map { i =>
      (i % 7L, (i * 2654435761L) % 1000, i.toLong) // key, score (ties!), uid
    }
    val df = rows.toDF("k", "score", "uid")
    val viaWindow = Relational.topNPerKey(
        df, Seq("k"), Seq(col("score").asc, col("uid").asc), 5)
      .select("k", "rnk", "score", "uid")
    val viaAgg = Relational.topNPerKeyAgg(
        df, Seq("k"), Seq("score", "uid"), 5)
      .select(col("k"), col("rnk").cast("int").as("rnk"), col("score"), col("uid"))
    assert(viaWindow.exceptAll(viaAgg).isEmpty && viaAgg.exceptAll(viaWindow).isEmpty)
  }

  test("TopK survives serialize/merge across many input partitions") {
    import spark.implicits._
    val df = (0 until 10000).map(i => (i % 3L, i.toLong)).toDF("k", "v")
      .repartition(23) // force partial buffers + merges + serde
    val got = df.groupBy("k").agg(native.topK(col("v"), 4).as("top"))
      .orderBy("k").collect()
    assert(got.length == 3)
    got.foreach { r =>
      val k = r.getLong(0)
      assert(r.getSeq[Long](1) == Seq(k, k + 3, k + 6, k + 9))
    }
  }

  test("TopK skips null inputs and handles groups smaller than k") {
    import spark.implicits._
    val df = Seq((1L, java.lang.Long.valueOf(5L)), (1L, null.asInstanceOf[java.lang.Long]),
      (1L, java.lang.Long.valueOf(2L))).toDF("k", "v")
    val got = df.groupBy("k").agg(native.topK(col("v"), 10).as("top")).head()
    assert(got.getSeq[Long](1) == Seq(2L, 5L))
  }
}
