package graft

import org.apache.spark.sql.functions._
import graft.queries.{RelationalQueries, TextQueries, VectorQueries, Tables, Q}

/** Invariants of the round-8 curation/maintenance gate queries that the
  * DuckDB hash-match cannot express on its own: internal consistency of
  * the outputs (the oracle proves cross-engine equality; these prove the
  * numbers mean what they claim).
  */
class CurationQueriesSpec extends SparkSpec {

  private def gate(name: String) =
    (RelationalQueries.all ++ TextQueries.all ++ VectorQueries.all)
      .find(_.name == name).getOrElse(fail(s"no gate query $name"))
      .run(spark, sf001)

  test("r54: merged partials equal a direct one-shot aggregation") {
    val merged = gate("r54_incremental_agg")
    val ev = Tables.events(spark, sf001)
      .select(col("event_type"), Q.cents(col("value")).as("v_c"))
    val direct = ev.groupBy("event_type").agg(
      count(lit(1)).as("n"), sum("v_c").as("sum_c"),
      min("v_c").as("min_c"), max("v_c").as("max_c"))
    val joined = merged.join(direct.withColumnRenamed("n", "dn")
        .withColumnRenamed("sum_c", "dsum").withColumnRenamed("min_c", "dmin")
        .withColumnRenamed("max_c", "dmax"), "event_type")
    assert(joined.count() == merged.count())
    assert(joined.filter(col("n") =!= col("dn") || col("sum_c") =!= col("dsum")
      || col("min_c") =!= col("dmin") || col("max_c") =!= col("dmax")).count() == 0)
  }

  test("r55: profiler counts are internally consistent") {
    val prof = gate("r55_column_profile").collect()
    assert(prof.length == 3)
    val nRows = prof.head.getAs[Long]("n_rows")
    prof.foreach { r =>
      assert(r.getAs[Long]("n_rows") == nRows) // same table, same row count
      assert(r.getAs[Long]("n_nulls") >= 0 && r.getAs[Long]("n_nulls") <= nRows)
      val ndv = r.getAs[Long]("ndv")
      assert(ndv >= 1 && ndv <= nRows - r.getAs[Long]("n_nulls"))
    }
  }

  test("t34: rebalance keeps at most the source volume and all of the smallest language") {
    val out = gate("t34_mix_rebalance").collect()
    val minCnt = out.map(_.getAs[Long]("cnt")).min
    out.foreach { r =>
      val (cnt, thr, kept) = (r.getAs[Long]("cnt"), r.getAs[Long]("thr_pm"),
        r.getAs[Long]("kept"))
      assert(kept <= cnt)
      assert(thr >= 1 && thr <= 1000)
      if (cnt == minCnt) {
        assert(thr == 1000)   // smallest language: threshold keeps everything
        assert(kept == cnt)
      }
    }
  }

  test("t35: terciles partition the scored corpus with balanced sizes and ordered score ranges") {
    val b = gate("t35_quality_buckets").orderBy("bucket").collect()
    assert(b.map(_.getAs[Long]("bucket")).toSeq == Seq(1L, 2L, 3L))
    val sizes = b.map(_.getAs[Long]("n_docs"))
    assert(sizes.max - sizes.min <= 1) // ntile size contract
    // bucket 1 holds the highest scores; ranges must not interleave
    // (ties at a cut may straddle, so compare min of better vs max of worse)
    b.sliding(2).foreach { case Array(hi, lo) =>
      assert(hi.getAs[Long]("min_score_e6") >= lo.getAs[Long]("max_score_e6") - 1)
    }
  }

  test("t36: textrank emits a full top-20 of positive damped ranks, sorted") {
    val r = gate("t36_textrank").collect()
    assert(r.length == 20)
    val ranks = r.map(_.getAs[Long]("rank_e6"))
    // every rank carries at least the undamped base mass (0.15 * 1e6)
    assert(ranks.forall(_ >= 150000L))
    assert(ranks.sameElements(ranks.sorted(Ordering[Long].reverse)))
  }

  test("r56: arms partition the user base and rates are consistent") {
    val arms = gate("r56_ab_metrics").collect()
    assert(arms.map(_.getAs[Long]("variant")).toSeq == Seq(0L, 1L))
    val users = Tables.events(spark, sf001).select("user_id").distinct().count()
    assert(arms.map(_.getAs[Long]("n_users")).sum == users)
    arms.foreach { a =>
      assert(a.getAs[Long]("n_converted") <= a.getAs[Long]("n_users"))
      assert(a.getAs[Long]("n_purchases") >= a.getAs[Long]("n_converted"))
      val expect = a.getAs[Long]("n_converted") * 1000000L / a.getAs[Long]("n_users")
      assert(math.abs(a.getAs[Long]("conv_e6") - expect) <= 1)
    }
  }

  test("r57: lag chain is consistent day to day") {
    val days = gate("r57_dod_growth").orderBy("day").collect()
    assert(days.head.isNullAt(days.head.fieldIndex("prev_c"))) // no day before the first
    days.sliding(2).foreach { case Array(prev, cur) =>
      assert(cur.getAs[Long]("prev_c") == prev.getAs[Long]("rev_c"))
      assert(cur.getAs[Long]("delta_c") ==
        cur.getAs[Long]("rev_c") - cur.getAs[Long]("prev_c"))
    }
  }

  test("t37: estimate is k-quantized and the error column is honest") {
    gate("t37_minhash_accuracy").collect().foreach { r =>
      val (est, exact, err) = (r.getAs[Long]("est_e4"),
        r.getAs[Long]("exact_e4"), r.getAs[Long]("err_e4"))
      assert(est % 1250 == 0 && est >= 0 && est <= 10000)
      assert(exact >= 0 && exact <= 10000)
      assert(err == math.abs(est - exact))
    }
  }

  test("m6: scenes = cuts + 1 and scene lengths sum to the frame count") {
    val m = gate("m6_scene_cuts")
    assert(m.filter(col("n_scenes") =!= col("n_cuts") + 1).count() == 0)
    assert(m.filter(col("max_scene_len") > col("n_frames")).count() == 0)
    // frame counts match m4's sampling rule on the same corpus
    val expected = Tables.documents(spark, sf001)
      .select(col("doc_id"), ((length(col("text")) + 63) / 64).cast("long").as("nf"))
      .filter(col("nf") > 0)
    val j = m.join(expected, m("media_id") === expected("doc_id"))
    assert(j.count() == m.count())
    assert(j.filter(col("n_frames") =!= col("nf")).count() == 0)
  }
}
