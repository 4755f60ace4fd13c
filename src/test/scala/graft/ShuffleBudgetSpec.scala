package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.LongAdder

/** Quantitative scale guards: PlanSpec pins plan SHAPES (what shuffles on
  * what key); this spec pins shuffle VOLUME. A regression that reintroduces
  * payload columns into a keyed exchange keeps the same plan shape but
  * multiplies bytes-written by the payload width — a listener summing
  * shuffle-write bytes catches it numerically. Budgets carry ~10×
  * headroom over measured values so AQE/codegen drift doesn't flake them,
  * while the payload-regression each guards against is 40-100× the
  * measurement.
  */
class ShuffleBudgetSpec extends SparkSpec {

  /** Total shuffle bytes written across all tasks while `body` runs. */
  private def shuffleBytes(body: => Unit): Long = {
    val bytes = new LongAdder
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) bytes.add(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      // listener events are delivered async; drain before reading
      org.apache.spark.graft.listenerBridge
        .waitUntilListenerBusEmpty(spark.sparkContext, 30000)
    } finally spark.sparkContext.removeSparkListener(listener)
    bytes.sum()
  }

  private def run(name: String): Unit =
    (graft.queries.VectorQueries.all ++ graft.queries.TextQueries.all)
      .find(_.name == name).get.run(spark, sf001)
      .write.format("noop").mode("overwrite").save()

  test("v13 edge build: ranking shuffle moves ids+scores, never the 64-dim vectors") {
    // measure the BUILD, not the memo: clear the cache so the kNN scoring
    // actually runs inside the listener window
    graft.queries.VectorQueries.clearKnnEdgeCache()
    val b = shuffleBytes(run("v13_knn_graph"))
    // sf0.001: 500 queries × 500 candidates × ~24 B ≈ 6 MB through the
    // ranking exchange; with vectors in the shuffle it would be ~100×.
    // 64 MB = ~10× headroom.
    assert(b < (64L << 20), s"v13 build shuffled ${b >> 20} MB — payload in the exchange?")
    assert(b > 0, "expected a nonzero ranking shuffle in the edge build")
  }

  test("t39 fuzzy join: blocked candidate shuffle stays head-sized") {
    val b = shuffleBytes(run("t39_fuzzy_join"))
    // blocks + 32-char heads at sf0.001 measure well under 1 MB; 32 MB
    // headroom still catches an unblocked (cartesian-scale) regression
    assert(b < (32L << 20), s"t39 shuffled ${b >> 20} MB — blocking cap broken?")
  }

  test("t1 exact dedup: shuffle carries fingerprints, never document text") {
    val b = shuffleBytes(run("t1_exact_dedup"))
    // the corpus at sf0.001 is ~125 KB of text; the fingerprint shuffle
    // is a fraction of it. 16 MB catches a text-through-shuffle rewrite.
    assert(b < (16L << 20), s"t1 shuffled ${b >> 20} MB — text in the exchange?")
  }

  test("grouped top-k: both bounded paths shuffle a fraction of the unlimited window") {
    // Spark 4's WindowGroupLimit pushes a PARTIAL rank-limit below the
    // exchange for row_number()<=k filters, so the window path's shuffle
    // is bounded too (k rows per task x key), same as topNPerKeyAgg's
    // map-side partials; the aggregate's remaining edge is skipping the
    // full per-task sort WindowGroupLimit still needs. This guard pins
    // BOTH bounded shapes against the unlimited window (the shape you
    // get when the rank filter stops being pushable, e.g. a later
    // filter or a changed rank function): 20x headroom vs a measured
    // ~300x gap.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(200000).select(
      (col("id") % 5).cast("string").as("lang"),
      col("id").as("doc_id"), (col("id") % 997).as("n_chars"),
      conv(substring(md5(concat(lit("strat"), col("id").cast("string"))),
        1, 8), 16, 10).cast("long").as("h"))
    val aggBytes = shuffleBytes {
      graft.operators.Relational.topNPerKeyAgg(df, Seq("lang"), Seq("h", "doc_id"), 10)
        .write.format("noop").mode("overwrite").save()
    }
    val winBytes = shuffleBytes {
      graft.operators.Relational.topNPerKey(df, Seq("lang"),
          Seq(col("h").asc, col("doc_id").asc), 10)
        .write.format("noop").mode("overwrite").save()
    }
    val unlimitedBytes = shuffleBytes {
      df.withColumn("rnk", org.apache.spark.sql.functions.row_number().over(
          Window.partitionBy("lang").orderBy(col("h").asc, col("doc_id").asc)))
        .write.format("noop").mode("overwrite").save()
    }
    assert(aggBytes > 0 && winBytes > 0 && unlimitedBytes > 0)
    assert(aggBytes * 20 < unlimitedBytes,
      s"TopK aggregate shuffled $aggBytes B vs unlimited window $unlimitedBytes B")
    assert(winBytes * 20 < unlimitedBytes,
      s"rank-limited window shuffled $winBytes B vs unlimited $unlimitedBytes B - WindowGroupLimit pushdown lost")
  }
}
