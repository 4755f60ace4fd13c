package graft

import org.apache.spark.sql.functions._
import graft.operators.{GraftTable, Scale}

/** SQL DML on `USING graft` views: every statement must route through
  * the snapshot/MoR commit protocol (versioned dirs, CDF feed, OCC),
  * never Spark's default file-relation write path.
  */
object SqlDmlSpec {
  // latches for the deterministic mid-statement OCC interleave (object
  // fields: the UDF body runs on executor threads of the same JVM)
  @volatile var sourceEvaluated: java.util.concurrent.CountDownLatch = _
  @volatile var rivalCommitted: java.util.concurrent.CountDownLatch = _
}

class SqlDmlSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  private def view(name: String, path: String): Unit =
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW $name USING graft OPTIONS (path '$path')")

  test("MERGE INTO: upsert + conditional delete == programmatic CDC merge; feed rows recorded") {
    val t = freshTable("graft_sqlmerge")
    Scale.writeSnapshotCdf(spark, t,
      Seq((1L, 10L, "a"), (2L, 20L, "b"), (4L, 40L, "d")).toDF("k", "v", "s"), "k")
    view("m_t", t)
    Seq((2L, 21L, "b2", "U"), (3L, 30L, "c", "I"), (4L, 0L, "", "D"), (9L, 90L, "x", "D"))
      .toDF("k", "v", "s", "op").createOrReplaceTempView("m_s")
    spark.sql("""
      MERGE INTO m_t t USING m_s s ON t.k = s.k
      WHEN MATCHED AND s.op = 'D' THEN DELETE
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT *""")
    val got = Scale.readSnapshot(spark, t).collect().map(_.toSeq).toSet
    assert(got == Set(Seq(1L, 10L, "a"), Seq(2L, 21L, "b2"), Seq(3L, 30L, "c")),
      s"post-merge contents wrong: $got")
    // the commit went through the CDF writer: feed records the merge
    val feed = Scale.readChangesBetween(spark, t, 0L, 1L)
    val byType = feed.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("insert" -> 1L, "delete" -> 1L,
      "update_preimage" -> 1L, "update_postimage" -> 1L),
      s"merge must emit CDF rows, got $byType")
  }

  test("MERGE INTO: first-match-wins conditions, not-matched-by-source clause") {
    val t = freshTable("graft_sqlmerge2")
    Scale.writeSnapshotCdf(spark, t,
      (1L to 6L).map(k => (k, k * 10L)).toDF("k", "v"), "k")
    view("m2_t", t)
    Seq((1L, 100L), (2L, 200L), (3L, 300L)).toDF("k", "v")
      .createOrReplaceTempView("m2_s")
    spark.sql("""
      MERGE INTO m2_t t USING m2_s s ON t.k = s.k
      WHEN MATCHED AND s.v > 250 THEN DELETE
      WHEN MATCHED AND t.k = 1 THEN UPDATE SET v = s.v + 1
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED BY SOURCE AND t.k >= 6 THEN DELETE
      WHEN NOT MATCHED BY SOURCE AND t.k = 5 THEN UPDATE SET v = t.v + 7""")
    val got = Scale.readSnapshot(spark, t).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // k=1: second clause (101); k=2: third (200); k=3: deleted (300>250);
    // k=4: untouched; k=5: by-source update (57); k=6: by-source delete
    assert(got == Set((1L, 101L), (2L, 200L), (4L, 40L), (5L, 57L)),
      s"merge clause precedence wrong: $got")
  }

  test("MERGE INTO rebases onto the current version: a commit BEFORE the statement is not a conflict") {
    val t = freshTable("graft_sqlmerge3")
    Scale.writeSnapshotCdf(spark, t, Seq((1L, 10L)).toDF("k", "v"), "k")
    view("m3_t", t) // binds v=0
    Seq((1L, 11L)).toDF("k", "v").createOrReplaceTempView("m3_s")
    // a writer advances the table to v=1 between CREATE VIEW and MERGE:
    // statement semantics apply the merge to the CURRENT table
    Scale.writeSnapshotCdf(spark, t, Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), "k")
    spark.sql("""
      MERGE INTO m3_t t USING m3_s s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *""")
    assert(Scale.readSnapshot(spark, t).collect().map(_.toSeq).toSet ==
      Set(Seq(1L, 11L), Seq(2L, 20L)),
      "the merge must apply to v=1 (k=2 preserved), not the view's bound v=0")
    assert(Scale.latestSnapshot(spark, t).contains(2L))
  }

  test("MERGE INTO: OCC — a writer interleaving DURING the statement conflicts loudly") {
    val t = freshTable("graft_sqlmerge_occ")
    Scale.writeSnapshotCdf(spark, t, Seq((1L, 10L)).toDF("k", "v"), "k")
    view("occ_t", t)
    // the source blocks mid-evaluation until a rival commit lands, so
    // the interleave is deterministic: MERGE rebases onto v=0, evaluates
    // its source (wakes the rival, waits), rival commits v=1, MERGE
    // resumes and its commit CAS must fail
    SqlDmlSpec.sourceEvaluated = new java.util.concurrent.CountDownLatch(1)
    SqlDmlSpec.rivalCommitted = new java.util.concurrent.CountDownLatch(1)
    spark.udf.register("occ_block", (k: Long) => {
      SqlDmlSpec.sourceEvaluated.countDown()
      SqlDmlSpec.rivalCommitted.await(60, java.util.concurrent.TimeUnit.SECONDS)
      k
    })
    Seq((1L, 11L)).toDF("k", "v")
      .selectExpr("occ_block(k) AS k", "v").createOrReplaceTempView("occ_s")
    val rival = new Thread(() => {
      SqlDmlSpec.sourceEvaluated.await(60, java.util.concurrent.TimeUnit.SECONDS)
      Scale.writeSnapshotCdf(spark, t,
        Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), "k", Some(0L))
      SqlDmlSpec.rivalCommitted.countDown()
    })
    rival.start()
    val e = intercept[Scale.CommitConflictException] {
      spark.sql("""
        MERGE INTO occ_t t USING occ_s s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET *""")
    }
    rival.join(60000)
    assert(e.getMessage.contains("conflict"))
    // nothing half-committed: the rival's v=1 is the table
    assert(Scale.readSnapshot(spark, t).collect().map(_.toSeq).toSet ==
      Set(Seq(1L, 10L), Seq(2L, 20L)))
    // and the SQL commit participates in the CAS protocol from the other
    // side too: a stale programmatic writer now conflicts
    view("occ_t", t)
    spark.sql("""
      MERGE INTO occ_t t USING m3_s s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *""")
    intercept[Scale.CommitConflictException] {
      Scale.writeSnapshotCdf(spark, t, Seq((9L, 9L)).toDF("k", "v"), "k",
        expectedVersion = Some(1L))
    }
  }

  test("DML through an explicitly version-pinned view is rejected loudly") {
    val t = freshTable("graft_sqlpin")
    Scale.writeSnapshotCdf(spark, t, Seq((1L, 10L)).toDF("k", "v"), "k")
    Scale.writeSnapshotCdf(spark, t, Seq((1L, 11L)).toDF("k", "v"), "k")
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW pin_t USING graft " +
      s"OPTIONS (path '$t', version '0')")
    val e = intercept[IllegalArgumentException] {
      spark.sql("DELETE FROM pin_t WHERE k = 1")
    }
    assert(e.getMessage.contains("time-travel"))
    assert(Scale.latestSnapshot(spark, t).contains(1L), "nothing committed")
  }

  test("MERGE INTO: non-unique source keys fail loudly (cardinality guard)") {
    val t = freshTable("graft_sqlmerge4")
    Scale.writeSnapshotCdf(spark, t, Seq((1L, 10L)).toDF("k", "v"), "k")
    view("m4_t", t)
    Seq((1L, 11L), (1L, 12L)).toDF("k", "v").createOrReplaceTempView("m4_s")
    val e = intercept[IllegalArgumentException] {
      spark.sql("""
        MERGE INTO m4_t t USING m4_s s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET *""")
    }
    assert(e.getMessage.contains("not unique"))
  }

  test("UPDATE and DELETE commit new snapshot versions with feed rows; NULL predicates select nothing") {
    val t = freshTable("graft_sqlupd")
    Scale.writeSnapshotCdf(spark, t,
      Seq((1L, 10L, "en"), (2L, 20L, "de"), (3L, 30L, null)).toDF("k", "v", "lang"), "k")
    view("u_t", t)
    spark.sql("UPDATE u_t SET v = v + 1 WHERE lang = 'en'")
    // lang NULL row: predicate NULL -> not updated (and not deleted below)
    spark.sql("DELETE FROM u_t WHERE lang = 'de'")
    assert(Scale.latestSnapshot(spark, t).contains(2L),
      "each statement is one versioned commit")
    val got = Scale.readSnapshot(spark, t).collect().map(_.toSeq).toSet
    assert(got == Set(Seq(1L, 11L, "en"), Seq(3L, 30L, null)), s"got $got")
    val upd = Scale.readChangesBetween(spark, t, 0L, 1L)
    assert(upd.filter(col("_change_type") === "update_postimage").count() == 1L)
    val del = Scale.readChangesBetween(spark, t, 1L, 2L)
    assert(del.filter(col("_change_type") === "delete").count() == 1L)
  }

  test("INSERT INTO appends through the commit protocol; never writes into the bound v= dir") {
    val t = freshTable("graft_sqlins")
    Scale.writeSnapshotCdf(spark, t, Seq((1L, 10L, "a")).toDF("k", "v", "s"), "k")
    view("i_t", t)
    spark.sql("INSERT INTO i_t VALUES (2, 20, 'b'), (3, 30, 'c')")
    assert(Scale.latestSnapshot(spark, t).contains(1L),
      "INSERT must be a new snapshot commit")
    assert(Scale.readSnapshot(spark, t).collect().map(_.toSeq).toSet ==
      Set(Seq(1L, 10L, "a"), Seq(2L, 20L, "b"), Seq(3L, 30L, "c")))
    // v=0 still holds exactly the original row (no files smuggled in)
    assert(Scale.readSnapshot(spark, t, version = Some(0L))
      .collect().map(_.toSeq).toSet == Set(Seq(1L, 10L, "a")))
    // the feed recorded the two inserts
    assert(Scale.readChangesBetween(spark, t, 0L, 1L)
      .filter(col("_change_type") === "insert").count() == 2L)
    // INSERT OVERWRITE replaces contents as the next version
    spark.sql("INSERT OVERWRITE i_t VALUES (9, 90, 'z')")
    assert(Scale.readSnapshot(spark, t).collect().map(_.toSeq).toSet ==
      Set(Seq(9L, 90L, "z")))
    assert(Scale.readSnapshot(spark, t, version = Some(1L)).count() == 3L,
      "overwrite must not destroy history")
  }

  test("MoR lineage: SQL DELETE appends an equality-delete file, INSERT an append commit; UPDATE/MERGE stay loud") {
    val t = freshTable("graft_sqlmor")
    Scale.writeMorBase(spark, t,
      (1L to 10L).map(i => (i, i * 10L)).toDF("k", "v"))
    GraftTable.buildIndex(spark, t, zoneCols = Seq("k"), morKey = Some("k"))
    view("mor_t", t)
    spark.sql("DELETE FROM mor_t WHERE v >= 80")
    // no base rewrite: still exactly one base generation, one delete file
    assert(new java.io.File(s"$t/_deletes").list().count(_.startsWith("d=")) == 1)
    assert(Scale.readMergeOnRead(spark, t, "k").count() == 7)
    spark.sql("INSERT INTO mor_t VALUES (20, 200)")
    assert(new java.io.File(s"$t/_appends").list().count(_.startsWith("a=")) == 1)
    assert(Scale.readMergeOnRead(spark, t, "k").count() == 8)
    val e = intercept[IllegalArgumentException] {
      spark.sql("UPDATE mor_t SET v = 0 WHERE k = 1")
    }
    assert(e.getMessage.contains("DELETE FROM + INSERT INTO"))
  }

  test("plain-committed snapshot tables (no _cdf_key) commit DML via plain versioned writes") {
    val t = freshTable("graft_sqlplain")
    Scale.writeSnapshot(spark, t, Seq((1L, 10L), (2L, 20L)).toDF("k", "v"))
    view("p_t", t)
    spark.sql("DELETE FROM p_t WHERE k = 2")
    assert(Scale.latestSnapshot(spark, t).contains(1L))
    assert(Scale.readSnapshot(spark, t).collect().map(_.toSeq).toSet ==
      Set(Seq(1L, 10L)))
  }

  test("DML on a renamed table speaks logical names end to end") {
    val t = freshTable("graft_sqlren")
    Scale.writeSnapshotCdf(spark, t,
      Seq((1L, 10L), (2L, 20L)).toDF("k", "n"), "k")
    Scale.renameSnapshotColumn(spark, t, "n", "len")
    view("r_t", t)
    assert(spark.table("r_t").columns.toSeq == Seq("k", "len"),
      "the SQL view must surface logical names")
    spark.sql("UPDATE r_t SET len = len + 5 WHERE k = 1")
    assert(Scale.readSnapshot(spark, t).orderBy("k").collect().map(_.toSeq).toSeq ==
      Seq(Seq(1L, 15L), Seq(2L, 20L)))
  }

  test("SQL time travel: version-pinned view == programmatic read, across a rename") {
    val t = freshTable("graft_sqltt")
    Scale.writeSnapshotCdf(spark, t,
      Seq((1L, 10L), (2L, 20L)).toDF("k", "n"), "k")
    Scale.writeSnapshotCdf(spark, t,
      Seq((1L, 11L), (3L, 30L)).toDF("k", "n"), "k")
    Scale.renameSnapshotColumn(spark, t, "n", "len")
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW tt_v0 USING graft " +
      s"OPTIONS (path '$t', version '0')")
    val sqlRows = spark.sql("SELECT k, len FROM tt_v0 ORDER BY k")
      .collect().map(_.toSeq).toSeq
    val progRows = GraftTable.read(spark, t, Some(0L))
      .select("k", "len").orderBy("k").collect().map(_.toSeq).toSeq
    assert(sqlRows == progRows && sqlRows == Seq(Seq(1L, 10L), Seq(2L, 20L)),
      s"pinned SQL read must equal programmatic time travel: $sqlRows vs $progRows")
  }
}
