package graft

import org.apache.spark.sql.functions._
import graft.operators.Scale

/** SQL change-feed reads: `USING graft OPTIONS (changesFrom, changesTo)`
  * must BE `Scale.readChangesBetween` as a view — same rows, same
  * checkpoint anchoring, same logical-name mapping — and stay strictly
  * read-only.
  */
class SqlChangesSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  test("changes view == readChangesBetween byte-for-byte, logical names after rename") {
    val t = freshTable("graft_sqlcdf")
    Scale.writeSnapshotCdf(spark, t,
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v"), "k")
    Scale.writeSnapshotCdf(spark, t,
      Seq((1L, 11L), (3L, 30L), (4L, 40L)).toDF("k", "v"), "k") // upd 1, del 2, ins 4
    Scale.writeSnapshotCdf(spark, t,
      Seq((1L, 11L), (4L, 41L)).toDF("k", "v"), "k")            // upd 4, del 3
    Scale.renameSnapshotColumn(spark, t, "v", "val")
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW cdf_v USING graft " +
      s"OPTIONS (path '$t', changesFrom '0', changesTo '2')")
    val cols = Seq("k", "val", "_change_type", "_commit_version")
    val got = spark.sql(
      "SELECT * FROM cdf_v ORDER BY _commit_version, _change_type, k")
      .select(cols.map(col): _*).collect().toSeq
    val want = Scale.readChangesBetween(spark, t, 0L, 2L)
      .orderBy("_commit_version", "_change_type", "k")
      .select(cols.map(col): _*).collect().toSeq
    assert(got == want, s"SQL view drifted from readChangesBetween:\n$got\nvs\n$want")
    assert(got.exists(r => r.getString(2) == "update_postimage" && r.getLong(1) == 11L),
      "updates surface both images under the logical name")
    // composes like any table
    assert(spark.sql(
      "SELECT count(*) FROM cdf_v WHERE _change_type = 'delete'")
      .head().getLong(0) == 2L)
  }

  test("checkpoint-anchored serving and loud option validation") {
    val t = freshTable("graft_sqlcdf_ck")
    (0 to 3).foreach { i =>
      Scale.writeSnapshotCdf(spark, t,
        (1L to (3L + i)).map(k => (k, k * 10 + i)).toDF("k", "v"), "k")
    }
    Scale.squashFeed(spark, t, "k", 0L, 2L)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW cdf_ck USING graft " +
      s"OPTIONS (path '$t', changesFrom '0', changesTo '3')")
    // checkpoint rows are stamped at its upper bound (2), tail at 3 —
    // never the per-commit stamps 1 and 2 separately
    assert(spark.sql("SELECT DISTINCT _commit_version FROM cdf_ck")
      .collect().map(_.getLong(0)).toSet == Set(2L, 3L))
    // half-specified range
    val half = intercept[Exception](spark.sql(
      s"CREATE TEMPORARY VIEW bad1 USING graft OPTIONS (path '$t', changesFrom '0')"))
    assert(half.getMessage.contains("come together"), half.getMessage)
    // a changes read cannot also pin a version
    val pinned = intercept[Exception](spark.sql(
      s"CREATE TEMPORARY VIEW bad2 USING graft " +
        s"OPTIONS (path '$t', changesFrom '0', changesTo '1', version '1')"))
    assert(pinned.getMessage.contains("cannot also pin"), pinned.getMessage)
    // empty/inverted range and not-yet-committed bound fail at CREATE
    val inverted = intercept[Exception](spark.sql(
      s"CREATE TEMPORARY VIEW bad3 USING graft " +
        s"OPTIONS (path '$t', changesFrom '2', changesTo '2')"))
    assert(inverted.getMessage.contains("fromV < toV"), inverted.getMessage)
    val future = intercept[Exception](spark.sql(
      s"CREATE TEMPORARY VIEW bad4 USING graft " +
        s"OPTIONS (path '$t', changesFrom '0', changesTo '9')"))
    assert(future.getMessage.contains("not committed"), future.getMessage)
  }

  test("a changes view is read-only: DML is rejected, the table untouched") {
    val t = freshTable("graft_sqlcdf_ro")
    Scale.writeSnapshotCdf(spark, t, Seq((1L, 10L)).toDF("k", "v"), "k")
    Scale.writeSnapshotCdf(spark, t, Seq((1L, 11L)).toDF("k", "v"), "k")
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW cdf_ro USING graft " +
      s"OPTIONS (path '$t', changesFrom '0', changesTo '1')")
    intercept[Exception](spark.sql("DELETE FROM cdf_ro WHERE k = 1"))
    intercept[Exception](spark.sql("UPDATE cdf_ro SET k = 2 WHERE k = 1"))
    assert(Scale.listSnapshots(spark, t) == Seq(0L, 1L),
      "rejected DML must not have committed anything")
    assert(Scale.readSnapshot(spark, t).collect().toSeq.map(_.toSeq) ==
      Seq(Seq(1L, 11L)))
  }
}
