package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Blocking-key occupancy diagnostic: prints, for a data dir, the v6
  * IVF-cell occupancy distribution against the 1000-member block cap —
  * the measurement behind the growing-keyspace contract (SCALING.md).
  * A healthy corpus shows max occupancy well under the cap and ZERO
  * capped cells; a pinned cell count (round 7's k=8) shows the opposite.
  *
  * Usage: sbt -batch 'runMain graft.Occupancy /root/testdata/sf0.1'
  */
object Occupancy {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val occ = graft.queries.VectorQueries.ivfAssignedCells(spark, dir)
      .groupBy("__cell").count()
    val row = occ.agg(
      count(lit(1)).as("cells"),
      max("count").as("max_occ"),
      expr("percentile(count, 0.5)").as("p50_occ"),
      sum(when(col("count") > 1000, 1L).otherwise(0L)).as("capped_cells"),
      sum(when(col("count") > 1000, col("count")).otherwise(0L)).as("rows_in_capped"))
      .head()
    val total = graft.queries.Tables.embeddings(spark, dir).count()
    println(s"""OCCUPANCY {"dir":"$dir","vectors":$total,""" +
      s""""cells":${row.getLong(0)},"max_occ":${row.getLong(1)},""" +
      s""""p50_occ":${row.getDouble(2)},"capped_cells":${row.getLong(3)},""" +
      s""""rows_in_capped":${row.getLong(4)}}""")
    spark.stop()
  }
}
