package graft.plans

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan}
import org.apache.spark.sql.types._
import graft.operators.{GraftTable, Scale}

/** SQL introspection over graft tables — the `DESCRIBE HISTORY` /
  * `inspect files` surface Delta and Iceberg users reach for first when
  * a table misbehaves, spelled as TABLE-VALUED functions so they
  * compose with ordinary SQL (`WHERE kind = 'snapshot'`, joins against
  * monitoring tables) instead of being bespoke commands with
  * unqueryable output:
  *
  * {{{
  * SELECT * FROM graft_history('<table root>')   -- every commit object
  * SELECT * FROM graft_files('<table root>')     -- current read set
  * }}}
  *
  * Both enumerate METADATA (commit dirs, pointers, manifests) — one
  * driver-side listing of O(commits) / O(files) entries, never a data
  * scan, the same cost class as the pointer reads every graft read
  * already does. Rows are deterministic for a given table state (no
  * wall-clock columns), so gate queries can hash them.
  *
  * `graft_history` rows — one per commit-protocol object at the root:
  *
  *  - `snapshot`/`base`: committed generations (`v=N` / `base_v=N`);
  *    `is_current` marks the pointer target.
  *  - `append`/`delete`: merge-on-read commits (`_appends/a=c`,
  *    `_deletes/d=c`) on the shared commit sequence; `is_current` =
  *    still live (commit at or above the base's fence).
  *  - `feed`: per-commit change feeds (`_cdf/v=N`).
  *  - `feed_checkpoint`: squashed feed ranges (`_cdf_ckpt/c=F_T`,
  *    `detail` = "F..T", `version` = F).
  *  - `rename`: one row per `_colmap` entry, `detail` =
  *    "logical<-physical" (version -1: renames are unversioned
  *    metadata).
  *  - `index`: skipping-index manifests (`_index/<tag>`, `detail` =
  *    the generation tag they describe).
  *  - `plain`: an unversioned parquet dir (no pointer protocol).
  *
  * `graft_files` rows — the CURRENT generation's data files exactly as
  * [[GraftTable.read]] would list them before predicate pruning:
  * `(tag, rel_path, bytes)` with paths relative to the table root (so
  * results are stable across scratch dirs).
  */
object GraftMeta {

  // ---- graft_history ------------------------------------------------

  private def historyAttrs(): Seq[AttributeReference] = Seq(
    AttributeReference("kind", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("detail", StringType, nullable = false)(),
    AttributeReference("files", IntegerType, nullable = false)(),
    AttributeReference("bytes", LongType, nullable = false)(),
    AttributeReference("is_current", BooleanType, nullable = false)())

  private def fsFor(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Parquet data files directly under `dir` (same filter as the read
    * path: dotfiles and `_` metadata excluded). */
  private def dataFiles(spark: SparkSession, dir: Path): Seq[FileStatus] = {
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq.filter(st =>
      st.isFile && st.getPath.getName.endsWith(".parquet") &&
        !st.getPath.getName.startsWith(".") &&
        !st.getPath.getName.startsWith("_"))
  }

  private def sizeOf(spark: SparkSession, dir: Path): (Int, Long) = {
    val fs = dataFiles(spark, dir)
    (fs.size, fs.map(_.getLen).sum)
  }

  /** All history rows for the table at `path`, deterministically
    * ordered. Driver-side and O(commit objects) — the history IS the
    * metadata, there is nothing distributed to do. */
  def history(spark: SparkSession, path: String): Seq[Row] = {
    val fs = fsFor(spark, path)
    val root = new Path(path)
    require(fs.exists(root), s"graft_history: no table at $path")
    val children = fs.listStatus(root).toSeq
    def childDirs(name: String, prefix: String): Seq[(Long, Path)] = {
      val d = new Path(root, name)
      if (!fs.exists(d)) Nil
      else fs.listStatus(d).toSeq.map(_.getPath)
        .collect { case p if p.getName.startsWith(prefix) =>
          (p.getName.stripPrefix(prefix).toLong, p) }
        .sortBy(_._1)
    }

    val latest = Scale.latestSnapshot(spark, path)
    val mor = Scale.morPointer(spark, path)
    val fence = mor.map(_._2).getOrElse(Long.MaxValue)

    val snapshots = children.map(_.getPath)
      .collect { case p if p.getName.startsWith("v=") =>
        (p.getName.stripPrefix("v=").toLong, p) }
      .sortBy(_._1)
      .map { case (v, p) =>
        val (n, b) = sizeOf(spark, p)
        Row("snapshot", v, "", n, b, latest.contains(v))
      }
    val bases = children.map(_.getPath)
      .collect { case p if p.getName.startsWith("base_v=") =>
        (p.getName.stripPrefix("base_v=").toLong, p) }
      .sortBy(_._1)
      .map { case (v, p) =>
        val (n, b) = sizeOf(spark, p)
        Row("base", v, "", n, b, mor.exists(_._1 == v))
      }
    val appends = childDirs("_appends", "a=").map { case (c, p) =>
      val (n, b) = sizeOf(spark, p)
      Row("append", c, "", n, b, c >= fence)
    }
    val deletes = childDirs("_deletes", "d=").map { case (c, p) =>
      val (n, b) = sizeOf(spark, p)
      Row("delete", c, "", n, b, c >= fence)
    }
    val feeds = childDirs("_cdf", "v=").map { case (v, p) =>
      val (n, b) = sizeOf(spark, p)
      Row("feed", v, "", n, b, false)
    }
    val ckpts = {
      val d = new Path(root, "_cdf_ckpt")
      if (!fs.exists(d)) Nil
      else fs.listStatus(d).toSeq.map(_.getPath)
        .collect { case p if p.getName.startsWith("c=") =>
          val Array(f, t) = p.getName.stripPrefix("c=").split("_")
          (f.toLong, t.toLong, p) }
        .sortBy(x => (x._1, x._2))
        .map { case (f, t, p) =>
          val (n, b) = sizeOf(spark, p)
          Row("feed_checkpoint", f, s"$f..$t", n, b, false)
        }
    }
    val renames = Scale.snapshotColMap(spark, path).toSeq
      .map { case (phys, logical) => s"$logical<-$phys" }
      .sorted
      .map(d => Row("rename", -1L, d, 0, 0L, false))
    val indexes = {
      val d = new Path(root, "_index")
      if (!fs.exists(d)) Nil
      else fs.listStatus(d).toSeq.map(_.getPath).map(_.getName).sorted
        .map { tag =>
          val st = fs.listStatus(new Path(d, tag)).toSeq
          Row("index", -1L, tag, st.size, st.map(_.getLen).sum, false)
        }
    }
    val plain =
      if (snapshots.nonEmpty || bases.nonEmpty) Nil
      else {
        val (n, b) = sizeOf(spark, root)
        if (n == 0) Nil else Seq(Row("plain", -1L, "", n, b, true))
      }

    (snapshots ++ bases ++ appends ++ deletes ++ feeds ++ ckpts ++
      renames ++ indexes ++ plain)
      .sortBy(r => (r.getString(0), r.getLong(1), r.getString(2)))
  }

  // ---- graft_files --------------------------------------------------

  private def filesAttrs(): Seq[AttributeReference] = Seq(
    AttributeReference("tag", StringType, nullable = false)(),
    AttributeReference("rel_path", StringType, nullable = false)(),
    AttributeReference("bytes", LongType, nullable = false)())

  /** The current generation's data-file manifest, paths relative to the
    * table root. Exactly the pre-pruning read set of
    * [[GraftTable.read]]: snapshot/base dir + live MoR append dirs. */
  def files(spark: SparkSession, path: String): Seq[Row] = {
    val rootUri = new Path(path).toUri.getPath.stripSuffix("/")
    GraftTable.currentDataFiles(spark, path).map { case (tag, p, len) =>
      val rel = p.toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
      Row(tag, rel, len)
    }.sortBy(r => (r.getString(0), r.getString(1)))
  }

  // ---- TVF registration ---------------------------------------------

  type TvfDesc =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan)

  private def pathArg(name: String, args: Seq[Expression]): String = {
    require(args.length == 1,
      s"$name('<table root>') — got ${args.length} args")
    val e = args.head
    require(e.foldable && e.dataType == StringType,
      s"$name('<table root>') — the path must be a string literal")
    val v = e.eval(null)
    require(v != null, s"$name: path must not be NULL")
    v.toString
  }

  /** `graft_history('<root>')`: builder runs at analysis; the listing
    * is driver-side metadata, so materializing it into a LocalRelation
    * is the honest plan (there is no scan to defer). */
  val historyTvf: TvfDesc = (
    FunctionIdentifier("graft_history"),
    new ExpressionInfo(GraftMeta.getClass.getName, "graft_history"),
    (args: Seq[Expression]) => {
      val spark = SparkSession.active
      LocalRelation.fromExternalRows(
        historyAttrs(), history(spark, pathArg("graft_history", args)))
    })

  /** `graft_files('<root>')`. */
  val filesTvf: TvfDesc = (
    FunctionIdentifier("graft_files"),
    new ExpressionInfo(GraftMeta.getClass.getName, "graft_files"),
    (args: Seq[Expression]) => {
      val spark = SparkSession.active
      LocalRelation.fromExternalRows(
        filesAttrs(), files(spark, pathArg("graft_files", args)))
    })

  val allTvfs: Seq[TvfDesc] = Seq(historyTvf, filesTvf)
}
