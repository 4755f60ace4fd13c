package graft.queries

/** LAYOUT-BUILD ACCOUNTING (round-18 gate-runtime hygiene): the
  * memoized gate tables (CDF commit chains, MoR layouts, IVF/PQ
  * models, LSH pair frames) are built ONCE per (sf, table
  * fingerprint) and amortize across queries — but on a cold
  * Verify/Bench run their full cost lands inside whichever query
  * touches them first, invisibly mixing layout cost into query cost
  * (t61's 4-commit corpus pays ~9 s on first build vs ~1 s warm).
  * Every memoized builder now routes through a [[LayoutCache]], which
  * times cache MISSES only; Bench emits the totals as
  * `layout_build_sec` + per-layout `layouts` in bench_out.json, so
  * cold-vs-warm comparisons across rounds can subtract layout cost
  * instead of mistaking it for a plan regression.
  */
object LayoutBuild {
  private val nanos =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  def timed[T](name: String)(body: => T): T = {
    val t0 = System.nanoTime()
    try body
    finally {
      nanos.merge(name, java.lang.Long.valueOf(System.nanoTime() - t0),
        (a, b) => java.lang.Long.valueOf(a.longValue() + b.longValue()))
      ()
    }
  }

  /** Seconds spent building each layout so far (cache misses only). */
  def perLayoutSec: Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    nanos.asScala.map { case (k, v) => k -> v.longValue() / 1e9 }.toMap
  }

  def totalSec: Double = perLayoutSec.values.sum

  /** Wall seconds of the concurrent [[prewarmAll]] phase (0 when it
    * never ran). Distinct from [[totalSec]]: per-layout build spans
    * OVERLAP under the prewarm pool, so their sum no longer equals the
    * wall-clock the gate actually spends on layout.
    */
  @volatile var prewarmWallSec: Double = 0.0

  /** Build every registered independent layout CONCURRENTLY (guide
    * §2.6: the builds are mostly small driver-latency-bound jobs whose
    * tails leave the session idle — serial first-touch building cost
    * ~43 s of gate wall at sf0.1; 8-way overlap cuts that to roughly
    * the longest chain). Idempotent: every hook is a memoized
    * computeIfAbsent, so a layout a query touches later is simply
    * already present. Failures are swallowed here — the owning query
    * will rebuild (and report) them on first touch.
    */
  def prewarmAll(spark: org.apache.spark.sql.SparkSession, sfDir: String,
                 threads: Int = 8): Unit = {
    val hooks = IoQueries.prewarmLayouts(spark, sfDir) ++
      TextQueries.prewarmLayouts(spark, sfDir) ++
      VectorQueries.prewarmLayouts(spark, sfDir)
    val t0 = System.nanoTime()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    try {
      import scala.jdk.CollectionConverters._
      val tasks: java.util.List[java.util.concurrent.Callable[Unit]] =
        hooks.map { case (name, fn) =>
          new java.util.concurrent.Callable[Unit] {
            override def call(): Unit =
              try { spark.sparkContext.setJobDescription(s"layout: $name"); fn() }
              catch { case e: Throwable =>
                System.err.println(s"[layout-prewarm] $name failed (query will rebuild): $e")
              } finally spark.sparkContext.setJobDescription(null)
          }
        }.asJava
      pool.invokeAll(tasks)
      ()
    } finally {
      pool.shutdown()
      prewarmWallSec = (System.nanoTime() - t0) / 1e9
    }
  }
}

/** A memoizing cache whose MISSES are charged to a named layout in
  * [[LayoutBuild]] — drop-in for the raw ConcurrentHashMap the gate
  * builders used (same `computeIfAbsent` shape).
  */
final class LayoutCache[V](name: String) {
  private val m = new java.util.concurrent.ConcurrentHashMap[String, V]()
  def computeIfAbsent(key: String, fn: java.util.function.Function[String, V]): V =
    m.computeIfAbsent(key,
      (k: String) => LayoutBuild.timed(name)(fn.apply(k)))
  def compute(key: String,
              fn: java.util.function.BiFunction[String, V, V]): V =
    m.compute(key,
      (k: String, prev: V) => LayoutBuild.timed(name)(fn.apply(k, prev)))
  // pass-throughs for the session-liveness sweeps and test hooks
  def values: java.util.Collection[V] = m.values
  def clear(): Unit = m.clear()
  def forEach(f: java.util.function.BiConsumer[String, V]): Unit = m.forEach(f)
  def remove(key: String, value: V): Boolean = m.remove(key, value)
}
