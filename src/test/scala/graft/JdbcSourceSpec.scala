package graft

import org.apache.spark.sql.functions._
import graft.io.Sources

/** End-to-end JDBC source test against embedded Derby (ships with Spark) —
  * the runnable stand-in for the reference's crawler-backed RDS reads
  * (SURVEY.md §2.1 S1).
  */
class JdbcSourceSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  override def beforeAll(): Unit = {
    super.beforeAll()
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE crm_cust (cst_id INT, cst_key VARCHAR(50), bal DOUBLE)")
    val ps = conn.prepareStatement("INSERT INTO crm_cust VALUES (?, ?, ?)")
    (1 to 100).foreach { i =>
      ps.setInt(1, i); ps.setString(2, s"AW$i"); ps.setDouble(3, i * 1.5)
      ps.addBatch()
    }
    ps.executeBatch()
    conn.close()
  }

  test("jdbc read: full table, explicit driver options") {
    val df = Sources.jdbc(spark, url, "crm_cust",
      props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
    assert(df.count() == 100)
    assert(df.schema.fieldNames.map(_.toLowerCase).toSeq == Seq("cst_id", "cst_key", "bal"))
  }

  test("jdbc read: partitioned into parallel range queries") {
    val df = Sources.jdbc(spark, url, "crm_cust",
      props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"),
      partitionColumn = Some("CST_ID"), lowerBound = Some(1L), upperBound = Some(101L),
      numPartitions = 4)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 100)
    assert(df.agg(sum(col("CST_ID"))).head().getLong(0) == 5050)
  }

  test("jdbc read: filters push down into the remote query") {
    val df = Sources.jdbc(spark, url, "crm_cust",
      props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
      .filter(col("CST_ID") > 90)
    assert(df.count() == 10)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("CST_ID"), plan)
  }

  test("jdbc scan node: predicate compiled into the remote WHERE, columns pruned") {
    // The reference's catalog scans (SURVEY.md §2.1 S1) rely on the JDBC
    // relation doing the filtering/projection REMOTELY. Spark does not
    // expose the generated SQL string, but the scan node carries the
    // contract: a filter the relation accepted into its WHERE clause is
    // rendered STARRED (*) in PushedFilters — unhandled filters appear
    // unstarred and are re-evaluated Spark-side — and the relation's
    // SELECT list is exactly the scan's pruned output columns.
    val df = Sources.jdbc(spark, url, "crm_cust",
      props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
      .filter(col("CST_ID") > 90)
      .select("CST_KEY")
    assert(df.count() == 10)
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.RowDataSourceScanExec => s
    }
    assert(scans.nonEmpty, df.queryExecution.executedPlan.toString)
    val scan = scans.head
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("*GreaterThan(CST_ID,90)"),
      s"predicate not compiled into the remote query (unstarred = Spark-side): $pushed")
    // column pruning: the remote SELECT list is the scan output — the
    // filter column is consumed remotely, so only CST_KEY comes back
    assert(scan.output.map(_.name) == Seq("CST_KEY"),
      s"remote projection not pruned: ${scan.output.map(_.name)}")
  }
}
