package graft

import org.apache.spark.sql.functions._
import graft.operators.{GraftTable, Scale}

/** SQL introspection (graft_history / graft_files TVFs) and SQL
  * maintenance (VACUUM GRAFT / OPTIMIZE GRAFT via the injected
  * delegating parser): the SQL spellings must call the same library
  * entry points, return queryable status rows, and never change the
  * meaning of SQL they don't own.
  */
class SqlMetaSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  test("graft_history: snapshot lineage rows agree with independent observables") {
    val t = freshDir("graft_hist_snap")
    Scale.writeSnapshotCdf(spark, t,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s"), "k")
    Scale.writeSnapshotCdf(spark, t,
      Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("k", "s"), "k")
    val hist = spark.sql(
      s"SELECT * FROM graft_history('$t') ORDER BY kind, version").collect()
    val snaps = hist.filter(_.getString(0) == "snapshot")
    assert(snaps.map(_.getLong(1)).toSeq == Scale.listSnapshots(spark, t))
    assert(snaps.filter(_.getBoolean(5)).map(_.getLong(1)).toSeq == Seq(1L),
      "is_current marks exactly the pointer target")
    assert(hist.filter(_.getString(0) == "feed").map(_.getLong(1)).toSeq ==
      Seq(0L, 1L), "one feed row per CDF commit")
    assert(snaps.forall(r => r.getInt(3) > 0 && r.getLong(4) > 0L),
      "file/byte counts are populated from the data listing")
  }

  test("graft_history: merge-on-read kinds, fence-aware is_current") {
    val t = freshDir("graft_hist_mor")
    Scale.writeMorBase(spark, t, (1L to 8L).map(k => (k, k * 10L)).toDF("k", "v"))
    Scale.appendDeletes(spark, t, Seq(2L, 4L).toDF("k"))
    graft.operators.Scale.appendMorRows(spark, t, Seq((9L, 90L)).toDF("k", "v"))
    val hist = spark.sql(
      s"SELECT * FROM graft_history('$t') ORDER BY kind, version").collect()
    def of(kind: String) = hist.filter(_.getString(0) == kind).toSeq
    assert(of("base").map(r => (r.getLong(1), r.getBoolean(5))) == Seq((0L, true)))
    assert(of("delete").size == 1 && of("delete").head.getBoolean(5),
      "live delete commit (at/above the fence) is current")
    assert(of("append").size == 1 && of("append").head.getBoolean(5),
      "live append commit is current")
    // files TVF: the pre-pruning read set = base + live appends
    val files = spark.sql(s"SELECT * FROM graft_files('$t')").collect()
    val tags = files.map(_.getString(0)).toSet
    assert(tags.exists(_.startsWith("base_v=")) && tags.exists(_.startsWith("a=")),
      s"read set spans base and appends, got $tags")
    assert(files.forall(r => r.getString(1).nonEmpty &&
      !r.getString(1).startsWith("/")), "rel_path is root-relative")
  }

  test("graft_history: plain parquet dir and loud errors") {
    val d = freshDir("graft_hist_plain")
    (1L to 4L).toDF("k").write.parquet(d)
    val hist = spark.sql(s"SELECT * FROM graft_history('$d')").collect()
    assert(hist.map(_.getString(0)).toSeq == Seq("plain") &&
      hist.head.getBoolean(5))
    val miss = intercept[Exception](
      spark.sql(s"SELECT * FROM graft_history('$d/nope')").collect())
    assert(miss.getMessage.contains("no table at"), miss.getMessage)
    val notString = intercept[Exception](
      spark.sql("SELECT * FROM graft_history(123)").collect())
    assert(notString.getMessage.contains("string literal"), notString.getMessage)
  }

  test("VACUUM GRAFT / OPTIMIZE GRAFT SQUASH FEED: SQL == library semantics") {
    val t = freshDir("graft_sql_vacuum")
    (0 to 3).foreach { i =>
      Scale.writeSnapshotCdf(spark, t,
        (1L to (4L + i)).map(k => (k, k + i)).toDF("k", "v"), "k")
    }
    val ck = spark.sql(
      s"OPTIMIZE GRAFT '$t' SQUASH FEED KEY k FROM 0 TO 3").collect()
    assert(ck.map(_.getString(0)).toSeq == Seq("c=0_3"))
    val removed = spark.sql(s"VACUUM GRAFT '$t' RETAIN 1 VERSIONS")
      .collect().map(_.getLong(0)).toSeq
    assert(removed == Seq(0L, 1L, 2L))
    assert(Scale.listSnapshots(spark, t) == Seq(3L))
    // the checkpoint the SQL statement wrote serves anchored reads
    val viaCkpt = Scale.readChangesBetween(spark, t, 0L, 3L)
    assert(viaCkpt.select("_commit_version").distinct()
      .collect().map(_.getLong(0)).toSeq == Seq(3L))
    // history surfaces both effects
    val hist = spark.sql(s"SELECT kind, detail FROM graft_history('$t')").collect()
    assert(hist.count(_.getString(0) == "snapshot") == 1)
    assert(hist.exists(r => r.getString(0) == "feed_checkpoint" &&
      r.getString(1) == "0..3"))
  }

  test("OPTIMIZE GRAFT COMPACT DELETES / REINDEX: status rows match table state") {
    val t = freshDir("graft_sql_compact")
    Scale.writeMorBase(spark, t, (1L to 20L).map(k => (k, k * 2L)).toDF("k", "v"))
    GraftTable.buildIndex(spark, t, zoneCols = Seq("v"), morKey = Some("k"))
    Scale.appendDeletes(spark, t, Seq(3L, 5L).toDF("k"))
    Scale.appendDeletes(spark, t, Seq(7L).toDF("k"))
    val st = spark.sql(s"OPTIMIZE GRAFT '$t' COMPACT DELETES KEY k").collect()
    assert(st.length == 1)
    assert((st.head.getLong(0), st.head.getLong(1)) ==
      Scale.morPointer(spark, t).get, "reported state == pointer state")
    assert(GraftTable.read(spark, t).count() == 17L)
    val spec = spark.sql(s"OPTIMIZE GRAFT '$t' REINDEX").collect()
    assert(spec.map(_.getString(0)).toSeq == Seq("v"),
      s"REINDEX reports the zone spec, got ${spec.toSeq}")
  }

  test("the delegating parser owns ONLY the graft grammar") {
    // ordinary SQL is untouched
    assert(spark.sql("SELECT 1 + 1 AS two").head().getInt(0) == 2)
    // a malformed graft statement falls through to the stock parser,
    // which rejects it loudly — never a silent no-op
    val bad = intercept[Exception](
      spark.sql("VACUUM GRAFT '/tmp/x' RETAIN VERSIONS"))
    assert(bad.getMessage.toLowerCase.contains("syntax") ||
      bad.getMessage.contains("PARSE"), bad.getMessage)
    // quoted-path escapes and backquoted key identifiers parse
    val t = freshDir("graft_sql_parse")
    Scale.writeSnapshotCdf(spark, t, Seq((1L, 2L)).toDF("k", "v"), "k")
    Scale.writeSnapshotCdf(spark, t, Seq((1L, 3L)).toDF("k", "v"), "k")
    val ck = spark.sql(
      s"optimize graft '$t' squash feed key `k` from 0 to 1;").collect()
    assert(ck.map(_.getString(0)).toSeq == Seq("c=0_1"),
      "case-insensitive keywords, backquoted identifier, trailing semicolon")
  }

  test("registerTableFunctions drains the TVFs; register() covers live sessions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
    val reg = org.apache.spark.sql.catalyst.analysis.TableFunctionRegistry.builtin.clone()
    org.apache.spark.sql.graft.bridge.registerInjectedTableFunctions(ext, reg)
    assert(graft.plans.GraftMeta.allTvfs.forall { case (id, _, _) =>
      reg.functionExists(id) },
      "every TVF must be injected through SparkSessionExtensions")
  }
}
