package graft

import org.apache.spark.sql.functions._
import graft.operators.{GraftTable, Scale}

/** The unified self-pruning read path: pointer resolution + MoR deletes
  * + manifest-driven file skipping from PUSHED-DOWN predicates, with no
  * explicit prune call at the read site.
  */
class GraftTableSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("t").toString

  // 4k rows, v clustered across 8 files by repartitionByRange
  private def clusteredDf = spark.range(4000)
    .select(col("id").as("k"), (col("id") % 4000).as("v"),
      concat(lit("cat"),
        lpad((col("id") / 500).cast("long").cast("string"), 2, "0")).as("s"))
    .repartitionByRange(8, col("v"))
    .sortWithinPartitions("v")

  test("snapshot table: plain filtered read prunes files via pushed-down range") {
    val path = tmp("gt_snap")
    Scale.writeSnapshot(spark, path, clusteredDf)
    GraftTable.buildIndex(spark, path, zoneCols = Seq("v"))
    val df = GraftTable.read(spark, path).filter(col("v") >= 100 && col("v") <= 400)
    val (read, total) = GraftTable.scanFiles(df)
    assert(total == 8, s"expected 8 files, saw $total")
    assert(read <= 2, s"zone pruning must skip files: read $read of $total")
    val got = df.select("k").as[Long].collect().sorted
    assert(got.toSeq == (100L to 400L).toSeq)
  }

  test("snapshot table: read resolves the LATEST version; time travel pins v0") {
    val path = tmp("gt_vers")
    Scale.writeSnapshot(spark, path, Seq((1L, 10L)).toDF("k", "v"))
    Scale.writeSnapshot(spark, path, Seq((2L, 20L), (3L, 30L)).toDF("k", "v"))
    val got = GraftTable.read(spark, path).select("k").as[Long].collect().sorted
    assert(got.toSeq == Seq(2L, 3L))
    val v0 = GraftTable.read(spark, path, Some(0L)).select("k").as[Long].collect()
    assert(v0.toSeq == Seq(1L))
    val e = intercept[IllegalArgumentException] {
      GraftTable.read(spark, path, Some(9L))
    }
    assert(e.getMessage.contains("does not exist"))
  }

  test("string zone pruning compares unsigned UTF-8, conservatively") {
    val path = tmp("gt_str")
    Scale.writeSnapshot(spark, path, clusteredDf
      .repartitionByRange(8, col("s")).sortWithinPartitions("s"))
    GraftTable.buildIndex(spark, path, zoneCols = Seq("s"))
    val df = GraftTable.read(spark, path).filter(col("s") === "cat03")
    val (read, total) = GraftTable.scanFiles(df)
    assert(total >= 7 && read <= 2, s"string zone must prune: $read of $total")
    assert(df.count() == 500)
  }

  test("bloom manifest prunes IN-list lookups on a scattered key") {
    val path = tmp("gt_bloom")
    // cluster by v but probe k — k scatters, zones on k are useless
    Scale.writeSnapshot(spark, path, spark.range(4000)
      .select((col("id") * 2654435761L % 4000).as("k"), col("id").as("v"))
      .repartitionByRange(8, col("v")))
    GraftTable.buildIndex(spark, path, bloomCols = Seq("k"))
    val probe = GraftTable.read(spark, path)
      .filter(col("k").isin(2L, 1338L, 3002L))
    val (read, total) = GraftTable.scanFiles(probe)
    assert(total == 8 && read <= 6, s"bloom must skip files: read $read of $total")
    val expected = spark.read.parquet(s"$path/v=0")
      .filter(col("k").isin(2L, 1338L, 3002L)).count()
    assert(probe.count() == expected)
  }

  test("merge-on-read: deletes applied AND pruning fires beneath the anti-join") {
    val path = tmp("gt_mor")
    Scale.writeMorBase(spark, path, clusteredDf)
    Scale.appendDeletes(spark, path, Seq(150L, 200L, 9999L).toDF("k"))
    GraftTable.buildIndex(spark, path, zoneCols = Seq("v"), morKey = Some("k"))
    val df = GraftTable.read(spark, path).filter(col("v").between(100, 400))
    val (read, total) = GraftTable.scanFiles(df)
    assert(total == 8 && read <= 2,
      s"zone pruning must push through the left-anti join: read $read of $total")
    val got = df.select("k").as[Long].collect().sorted
    assert(got.toSeq == ((100L to 400L).toSet -- Set(150L, 200L)).toSeq.sorted)
  }

  test("no index: full scan, correct rows (pruning is pure optimization)") {
    val path = tmp("gt_noidx")
    Scale.writeSnapshot(spark, path, clusteredDf)
    val df = GraftTable.read(spark, path).filter(col("v") < 50)
    val (read, total) = GraftTable.scanFiles(df)
    assert(read == total)
    assert(df.count() == 50)
  }

  test("stale manifest (files rewritten in place) fails loudly") {
    val path = tmp("gt_stale")
    Scale.writeSnapshot(spark, path, clusteredDf)
    GraftTable.buildIndex(spark, path, zoneCols = Seq("v"))
    // rewrite the generation dir in place with DIFFERENT file layout
    clusteredDf.coalesce(2).write.mode("overwrite").parquet(s"$path/v=0")
    val e = intercept[IllegalArgumentException] {
      GraftTable.read(spark, path).filter(col("v") < 50).count()
    }
    assert(e.getMessage.contains("stale index manifest"))
  }

  test("unsupported predicate shapes keep all files (conservative)") {
    val path = tmp("gt_cons")
    Scale.writeSnapshot(spark, path, clusteredDf)
    GraftTable.buildIndex(spark, path, zoneCols = Seq("v"))
    // v % 2 is opaque to the interpreter — must read everything, return exact
    val df = GraftTable.read(spark, path).filter(pmod(col("v"), lit(797)) === 3)
    val (read, total) = GraftTable.scanFiles(df)
    assert(read == total)
    assert(df.count() == clusteredDf.filter(pmod(col("v"), lit(797)) === 3).count())
  }

  test("prefix predicate (startsWith) prunes string zones as [p, succ(p))") {
    val path = tmp("gt_prefix")
    Scale.writeSnapshot(spark, path, clusteredDf
      .repartitionByRange(8, col("s")).sortWithinPartitions("s"))
    GraftTable.buildIndex(spark, path, zoneCols = Seq("s"))
    val df = GraftTable.read(spark, path).filter(col("s").startsWith("cat03"))
    val (read, total) = GraftTable.scanFiles(df)
    assert(read < total, s"prefix pruning must skip files: $read of $total")
    assert(df.count() == 500)
    // LIKE 'p%' simplifies to StartsWith and prunes the same way
    val one = GraftTable.read(spark, path).filter(col("s").like("cat05%"))
    val (r1, t1) = GraftTable.scanFiles(one)
    assert(r1 < t1 && one.count() == 500)
  }

  test("USING graft SQL source: plain SQL over a view prunes files") {
    val path = tmp("gt_sql")
    Scale.writeSnapshot(spark, path, clusteredDf)
    GraftTable.buildIndex(spark, path, zoneCols = Seq("v"))
    // programmatic format("graft")
    val df = spark.read.format("graft").load(path)
      .filter(col("v").between(100, 400))
    val (read, total) = GraftTable.scanFiles(df)
    assert(total == 8 && read <= 2, s"format(graft) must prune: $read of $total")
    // pure-SQL surface: CREATE VIEW ... USING graft, filter in SQL
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW gt_sql_view " +
      s"USING graft OPTIONS (path '$path')")
    val viaSql = spark.sql(
      "SELECT count(*) AS n FROM gt_sql_view WHERE v BETWEEN 100 AND 400")
    val (r2, t2) = org.apache.spark.sql.graft.bridge.scanFileCounts(viaSql)
    assert(t2 == 8 && r2 <= 2, s"SQL view must prune: $r2 of $t2")
    assert(viaSql.head.getLong(0) == 301)
    // version pin through the source options
    Scale.writeSnapshot(spark, path, clusteredDf.limit(10))
    val pinned = spark.read.format("graft")
      .option("version", "0").load(path)
    assert(pinned.count() == 4000)
    // merge-on-read tables must reject loudly, never skip deletes
    val morPath = tmp("gt_sql_mor")
    Scale.writeMorBase(spark, morPath, clusteredDf)
    Scale.appendDeletes(spark, morPath, Seq(1L).toDF("k"))
    GraftTable.buildIndex(spark, morPath, morKey = Some("k"))
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft").load(morPath).count()
    }
    assert(e.getMessage.contains("merge-on-read"))
  }

  test("disjunction prunes to the union of branch survivors") {
    val path = tmp("gt_or")
    Scale.writeSnapshot(spark, path, clusteredDf)
    GraftTable.buildIndex(spark, path, zoneCols = Seq("v"))
    val df = GraftTable.read(spark, path)
      .filter(col("v") === 10 || col("v") === 3900)
    val (read, total) = GraftTable.scanFiles(df)
    assert(total == 8 && read <= 3, s"OR pruning: read $read of $total")
    assert(df.count() == 2)
  }
}
