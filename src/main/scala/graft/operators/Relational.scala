package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Named reusable relational operators distilled from the reference's
  * window patterns (SURVEY.md §2.7). All are pure DataFrame => DataFrame —
  * composable, unit-testable, and plan-transparent (each is a single
  * window + filter that Catalyst compiles to Exchange+Sort+Window).
  */
object Relational {

  /** Dedup-by-recency (W1): keep the first row per key under `order`.
    * Reference: row_number() OVER (PARTITION BY cst_id ORDER BY
    * cst_create_date DESC) + filter row_num=1 + drop
    * (silver/crm_cust_info_silver.py:55,72-74).
    *
    * Callers should pass a total order (append unique tiebreakers) — the
    * reference leaves ties nondeterministic (SURVEY.md §7.4.2); we don't.
    * Scale: one hash exchange on `keys`; window sort is per-key, spill-safe.
    */
  def dedupLatest(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** SCD-2 end-dating (W2): a version's end = day before the next version's
    * start within its key; the last (current) version gets NULL.
    * Reference: lead(prd_start_dt) OVER (PARTITION BY prd_key ORDER BY
    * prd_start_dt) - INTERVAL 1 DAY (silver/crm_prd_info_silver.py:51,67-69).
    */
  def scd2EndDate(df: DataFrame, keys: Seq[String], startCol: String,
                  endCol: String, tiebreak: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(startCol) +: tiebreak: _*)
    df.withColumn(endCol, date_sub(lead(col(startCol), 1).over(w), 1))
  }

  /** Surrogate key (W3/W4): deterministic dense 1..N by sort key.
    * Reference: row_number() OVER (ORDER BY cst_id) with no partition
    * (dim_customers_gold.py:36-40) — a single-partition exchange. That is
    * the reference's semantics and is fine for dimension-sized data; do NOT
    * use for fact-sized tables.
    */
  def surrogateKey(df: DataFrame, keyCol: String, order: Seq[Column]): DataFrame =
    df.withColumn(keyCol, row_number().over(Window.orderBy(order: _*)).cast("long"))

  /** Batch upsert (CDC merge): base snapshot ∪ update rows, keep the
    * newest version per key — dedup-by-recency over the union. Callers
    * pass a total `order` (version/timestamp desc + tiebreaks). At scale
    * this is the standard snapshot-merge: one shuffle on the key,
    * update-heavy keys spread like any other window partition.
    */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String],
             order: Seq[Column]): DataFrame =
    dedupLatest(base.unionByName(updates), keys, order)

  /** CDC merge with DELETE tombstones: update rows whose `deleteCol` is
    * true are deletion markers — when the tombstone is the key's newest
    * version under `order`, the key disappears from the output (Delta
    * MERGE's WHEN MATCHED DELETE; a stale tombstone loses to a newer
    * upsert like any other stale row). `deleteCol` is transport metadata,
    * not table content: it is defaulted to false on a base that lacks it
    * and dropped from the output, so stored snapshots stay tombstone-free.
    *
    * TRADEOFF (same as Delta's tombstone retention window): because the
    * snapshot does not retain applied tombstones, a STALE update arriving
    * in a LATER merge than the tombstone that out-versioned it will
    * resurrect the key — within one merge the tombstone wins, across
    * merges the evidence is gone. Feed merges from an in-order or
    * watermarked change stream (e.g. [[graft.streaming.StreamOps
    * .latestByKey]] upstream) when late stale updates are possible.
    */
  def upsertCdc(base: DataFrame, updates: DataFrame, keys: Seq[String],
                order: Seq[Column], deleteCol: String): DataFrame = {
    val base2 = if (base.columns.contains(deleteCol)) base
                else base.withColumn(deleteCol, lit(false))
    dedupLatest(base2.unionByName(updates), keys, order)
      .filter(!coalesce(col(deleteCol).cast("boolean"), lit(false)))
      .drop(deleteCol)
  }

  /** Grouped top-N: the n best rows per key under `order` (total order
    * required for determinism). One hash exchange + per-partition sort;
    * rank filter applies before any downstream shuffle.
    */
  def topNPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column], n: Int,
                 rankCol: String = "rnk"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= n)
  }

  /** Grouped top-N, aggregate path: same contract as [[topNPerKey]]
    * (ascending on `orderCols`, rank 1..n, deterministic given a total
    * order) but via the bounded [[graft.functions.TopK]] aggregate, so
    * map-side partial aggregation caps both task state and shuffle bytes
    * at n rows per (task × key). Honest comparison vs the window form on
    * Spark 4: WindowGroupLimit pushes a partial rank-limit below the
    * exchange for a `row_number() <= n` filter, bounding ITS shuffle
    * identically — but only after fully sorting each task's rows; the
    * aggregate replaces that O(rows·log rows) sort with an O(rows·log n)
    * bounded heap, and keeps its bound even in shapes the rank-limit
    * rewrite can't see (rank exposed to later operators, non-rank
    * predicates). ShuffleBudgetSpec pins all three shapes numerically.
    * Descending dims: negate the numeric column before calling
    * (lexicographic struct order is ascending-only).
    */
  def topNPerKeyAgg(df: DataFrame, keys: Seq[String], orderCols: Seq[String],
                    n: Int, rankCol: String = "rnk"): DataFrame = {
    val payload = df.columns.toSeq.filterNot(c => keys.contains(c) || orderCols.contains(c))
    val structCols = orderCols ++ payload
    val agged = df.groupBy(keys.map(col): _*)
      .agg(graft.functions.native.topK(
        struct(structCols.map(col): _*), n).as("__top"))
    agged
      .select(keys.map(col) :+ posexplode(col("__top")): _*)
      .select(keys.map(col) ++
        structCols.map(c => col("col").getField(c).as(c)) :+
        (col("pos") + 1).as(rankCol): _*)
  }

  /** As-of (backward) join: for each left row, attach the single right row
    * with the greatest right-time <= left-time within the same key — the
    * canonical time-series enrichment Spark has no native operator for.
    *
    * Composition (preference (a) of the extension ladder — no custom
    * plan needed): union both sides tagged, sort per key by (time,
    * right-first), carry the last-seen right payload forward with
    * last_value(ignoreNulls) over an unbounded-preceding window, keep left
    * rows. ONE hash exchange on the key + one per-partition sort — same
    * shuffle shape as a sort-merge join, no range explosion.
    *
    * @param left      probe side; must contain `key` and `leftTime`
    * @param right     reference side; must contain `key`, `rightTime`, payload
    * @param key       equi-key column name (both sides)
    * @param leftTime  left ordering column (numeric/date/timestamp)
    * @param rightTime right ordering column (same type)
    * @param payload   right columns to carry (become nullable on the output)
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // The payload travels as ONE struct through a single
    // last(ignoreNulls) window — whole-row semantics. Per-column windows
    // would mix fields from DIFFERENT right rows whenever the most recent
    // right row has a NULL in one payload field but an older row doesn't
    // (DuckDB/pandas ASOF keep the matched row intact; so do we).
    val payStruct = org.apache.spark.sql.types.StructType(
      payload.map(p => right.schema(p)))
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__isL", lit(1))
      .select(Seq(col(key), col("__t"), col("__isL")) ++
        leftCols.filter(_ != key).map(col) :+
        lit(null).cast(payStruct).as("__pay"): _*)
    val r = right
      .withColumn("__t", col(rightTime))
      .withColumn("__isL", lit(0))
      .select(Seq(col(key), col("__t"), col("__isL")) ++
        leftCols.filter(_ != key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payload.map(col): _*).as("__pay"): _*)
    // right rows sort BEFORE left rows at equal time => ties are inclusive
    // (right-at-same-instant is visible to the left row)
    val w = Window.partitionBy(key).orderBy(col("__t").asc, col("__isL").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = l.unionByName(r)
      .withColumn("__m", last(col("__pay"), ignoreNulls = true).over(w))
    carried.filter(col("__isL") === 1)
      .select(leftCols.map(col) ++ payload.map(p => col("__m").getField(p).as(p)): _*)
  }

  /** Gap-based sessionization: assign a per-key session index that
    * increments whenever the gap to the previous event exceeds
    * `gapMicros`. Batch twin of the streaming
    * flatMapGroupsWithState sessionizer — two windows over one hash
    * exchange on `key`.
    */
  def sessionize(df: DataFrame, key: String, tsMicros: String,
                 gapMicros: Long, order: Seq[Column] = Nil): DataFrame = {
    val ord = if (order.nonEmpty) order else Seq(col(tsMicros).asc)
    val w = Window.partitionBy(key).orderBy(ord: _*)
    df.withColumn("__prev", lag(col(tsMicros), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull || col(tsMicros) - col("__prev") > gapMicros, 1)
          .otherwise(0))
      .withColumn("session_idx",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__prev", "__new")
  }

  /** Scalable exact prefix sum: running total of `valueCol` in `orderCol`
    * order (inclusive), WITHOUT the global single-partition window a naive
    * `Window.orderBy(orderCol)` costs. Rows are bucketed by range over
    * `orderCol` (span derived from one bounded min/max agg), each bucket
    * computes its local cumsum in parallel, and per-bucket prefix offsets
    * — `buckets` rows, model-sized, not data-sized — are broadcast back.
    * The only global sort is over the offsets frame. `orderCol` must be
    * unique (the usual id column) so the prefix order is total.
    *
    * This is the building block for running-offset layouts at 100 TB:
    * shard packing (m7), byte-offset manifests, cumulative token budgets.
    */
  def prefixSumScalable(df: DataFrame, orderCol: String, valueCol: String,
                        outCol: String, buckets: Int = 64): DataFrame = {
    val mm = df.agg(min(col(orderCol)).cast("long").as("lo"),
      max(col(orderCol)).cast("long").as("hi")).head()
    if (mm.isNullAt(0)) return df.withColumn(outCol, lit(null).cast("long"))
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    // hi - lo in raw Long arithmetic wraps for ranges wider than
    // Long.MaxValue (hash-derived keys spanning both extremes), which
    // would silently scramble bucket order — fail loudly instead; such
    // keys should be range-bucketed on their high bits by the caller
    require(hi - lo >= 0,
      s"prefixSumScalable: $orderCol range [$lo, $hi] exceeds Long.MaxValue; " +
        "pre-bucket wide hash keys before computing a running total")
    val span = math.max(1L, (hi - lo) / buckets + 1)
    // `div` (integer division), not `/`: Column `/` on longs is double
    // division then truncation, whose boundaries drift from the integer
    // geometry for order-key spans above 2^53
    val bucketed = df.withColumn("__b",
      expr(s"(cast(`$orderCol` as bigint) - ${lo}L) div ${span}L"))
    val wLocal = Window.partitionBy("__b").orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val local = bucketed.withColumn("__cum", sum(col(valueCol)).over(wLocal))
    val wOff = Window.partitionBy(lit(0)).orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy("__b")
      .agg(sum(col(valueCol)).as("__bsum"))
      .withColumn("__off", coalesce(sum(col("__bsum")).over(wOff), lit(0L)))
      .select("__b", "__off")
    local.join(broadcast(offsets), "__b")
      .withColumn(outCol, col("__cum") + col("__off"))
      .drop("__b", "__cum")
  }

  /** Exact `ntile(k)` over a global order WITHOUT the single-partition
    * sort `ntile(k).over(Window.orderBy(...))` costs — at 100 TB that
    * naive frame is billions of rows sorted in one task. Same geometry
    * as [[prefixSumScalable]]: rows are range-bucketed on `rankKey`
    * (a long column monotone ASCENDING in the desired total order —
    * pass the negated score for a descending sort), each bucket
    * row_numbers locally in parallel under `order` (the full
    * tie-broken order), and per-bucket row counts — `buckets` rows,
    * model-sized, not data-sized — are broadcast back as prefix
    * offsets. Every row then knows its exact global rank, and the tile
    * is pure arithmetic on (rank, n): the first `n mod k` tiles carry
    * `n div k + 1` rows, the rest `n div k` — bit-identical to SQL
    * `ntile`. The only global sort is over the `buckets`-row offsets
    * frame.
    *
    * Ties in `rankKey` always land in one range bucket (ranges are
    * disjoint in the key), so the per-bucket sort — not a cross-bucket
    * merge — breaks them under `order`; a fully degenerate key (every
    * row equal) degrades to one bucket, i.e. the caller's rank key
    * must carry real entropy, which an LM score at 1e-6 granularity
    * does.
    */
  def ntileScalable(df: DataFrame, k: Int, rankKey: Column, order: Seq[Column],
                    outCol: String, buckets: Int = 64): DataFrame = {
    require(k >= 1, s"ntileScalable: k must be >= 1, got $k")
    val in = df.withColumn("__ntk", rankKey.cast("long"))
    // null-key count rides the same single aggregate as min/max: a NULL
    // rankKey would land in a null range bucket that the offsets frame
    // counts (Window.orderBy sorts nulls first) but the null-unsafe
    // equi-join on __b then drops — silently shifting every surviving
    // row's global rank by the null count. SQL ntile has a defined
    // nulls-first answer; this operator's contract requires a total
    // order carried by a NON-NULL key, so a null key is a caller error
    // surfaced loudly, not a silent divergence.
    val mm = in.agg(min(col("__ntk")).as("lo"), max(col("__ntk")).as("hi"),
      sum(when(col("__ntk").isNull, 1L).otherwise(0L)).as("nulls")).head()
    if (mm.isNullAt(0)) return df.withColumn(outCol, lit(null).cast("long"))
    require(mm.getAs[Long]("nulls") == 0L,
      s"ntileScalable: rankKey has ${mm.getAs[Long]("nulls")} NULL values; " +
        "coalesce the key to a sentinel (or filter nulls) before tiling — " +
        "null keys cannot be range-bucketed into a total order")
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    // same Long-wrap guard as prefixSumScalable: a key range wider than
    // Long.MaxValue would silently scramble bucket order
    require(hi - lo >= 0,
      s"ntileScalable: rankKey range [$lo, $hi] exceeds Long.MaxValue; " +
        "pre-bucket wide hash keys before tiling")
    val span = math.max(1L, (hi - lo) / buckets + 1)
    val bucketed = in.withColumn("__b", expr(s"(__ntk - ${lo}L) div ${span}L"))
    val wLocal = Window.partitionBy("__b").orderBy(order: _*)
    val local = bucketed.withColumn("__rn", row_number().over(wLocal).cast("long"))
    // offsets frame: per-bucket counts, exclusive prefix sum, and the
    // grand total n — all over the bucket-count-sized frame, where a
    // global window is bounded by construction. Counts are read off the
    // LOCAL window's row_number (max == count), so this side shares the
    // window's exchange instead of re-scanning the input lineage under
    // a second aggregate (round-20; see surrogateKeyScalable).
    val wOff = Window.partitionBy(lit(0)).orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(lit(0)).orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = local.groupBy("__b").agg(max(col("__rn")).as("__bc"))
      .withColumn("__off", coalesce(sum(col("__bc")).over(wOff), lit(0L)))
      .withColumn("__n", sum(col("__bc")).over(wAll))
      .select("__b", "__off", "__n")
    local.join(broadcast(offsets), "__b")
      .withColumn("__gr", col("__off") + col("__rn"))
      // SQL ntile split: rem = n mod k tiles of size+1 first, then size
      .withColumn(outCol, expr(
        s"""CASE WHEN __gr <= (__n % $k) * ((__n div $k) + 1)
            THEN (__gr - 1) div ((__n div $k) + 1) + 1
            ELSE (__n % $k) + (__gr - 1 - (__n % $k) * ((__n div $k) + 1)) div (__n div $k) + 1
            END""").cast("long"))
      .drop("__ntk", "__b", "__rn", "__off", "__n", "__gr")
  }

  /** Scalable surrogate key: same contract (dense 1..N following the sort
    * order) without the global single-partition sort — the
    * [[prefixSumScalable]]/[[ntileScalable]] value-bucket geometry:
    * rows range-bucket on `rankKey` (a long column monotone ASCENDING in
    * the desired total order; pass a negated key for descending),
    * row_number locally per bucket under the full tie-broken `order`,
    * and per-bucket counts — `buckets` rows, model-sized — broadcast
    * back as exclusive prefix offsets. Entirely DataFrame-native: rows
    * never leave Tungsten (the previous `rdd.zipWithIndex` round-trip
    * deserialized every row and broke columnar scans downstream), and
    * value-derived buckets are deterministic even when upstream row
    * order is not (a partitioner-sampling split could drift between the
    * count job and the data job). Equal rankKey values always share a
    * bucket, so `order`'s tie-break never straddles a boundary.
    *
    * NULL contract: rows whose `rankKey` is NULL (or whose long cast
    * yields NULL) are NOT dropped — they land in a dedicated bucket
    * that sorts before all value buckets, i.e. NULLS FIRST, matching
    * Spark's default ASC sort; `order` tie-breaks within it. An
    * all-NULL rankKey input therefore still keys every row.
    */
  def surrogateKeyScalable(df: DataFrame, keyCol: String, rankKey: Column,
                           order: Seq[Column], buckets: Int = 64): DataFrame = {
    val in = df.withColumn("__skk", rankKey.cast("long"))
    val mm = in.agg(min(col("__skk")).as("lo"), max(col("__skk")).as("hi"),
      count(lit(1)).as("n")).head()
    if (mm.getLong(2) == 0L) // empty input: keep the schema, no rows
      return df.withColumn(keyCol, lit(0L)).where(lit(false))
    // non-empty but all-NULL rankKey: every row goes to the null bucket
    val (lo, hi) = if (mm.isNullAt(0)) (0L, 0L)
                   else (mm.getLong(0), mm.getLong(1))
    require(hi - lo >= 0,
      s"surrogateKeyScalable: rankKey range [$lo, $hi] exceeds Long.MaxValue; " +
        "pre-bucket wide hash keys before keying")
    val span = math.max(1L, (hi - lo) / buckets + 1)
    // NULL __skk → bucket -1: sorts first everywhere __b is ordered, so
    // null-key rows receive the lowest surrogate keys instead of being
    // silently dropped by the inner join below.
    val bucketed = in.withColumn("__b",
      coalesce(expr(s"(__skk - ${lo}L) div ${span}L"), lit(-1L)))
    val wLocal = Window.partitionBy("__b").orderBy(order: _*)
    val local = bucketed.withColumn("__rn", row_number().over(wLocal).cast("long"))
    val wOff = Window.partitionBy(lit(0)).orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    // per-bucket count read off the LOCAL window's row_number (max ==
    // count — row_number is dense 1..n per bucket), so the offsets side
    // shares the window's exchange instead of re-scanning the whole
    // input lineage under a second aggregate (round-20: the old
    // groupBy(bucketed) duplicated the input plan — for the gold dims
    // that meant the silver join lineage computed twice per keying)
    val offsets = local.groupBy("__b").agg(max(col("__rn")).as("__bc"))
      .withColumn("__off", coalesce(sum(col("__bc")).over(wOff), lit(0L)))
      .select("__b", "__off")
    local.join(broadcast(offsets), "__b")
      .withColumn(keyCol, col("__off") + col("__rn"))
      .drop("__skk", "__b", "__rn", "__off")
  }
}
