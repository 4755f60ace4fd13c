package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftExtensions
import graft.text.TextOps

class ExtensionsSpec extends SparkSpec {

  test("native functions callable from SQL after registration") {
    GraftExtensions.register(spark)
    spark.read.parquet(s"$sf001/documents.parquet").limit(50)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      .createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_simhash32(t) AS sh, graft_minhash(t, 1) AS mh FROM ext_docs")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val viaApi = spark.table("ext_docs")
      .select(col("doc_id"), graft.functions.native.simhash32(col("t")).as("sh"),
        graft.functions.native.minhash(col("t"), 1).as("mh"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(viaSql == viaApi)
    // default seed form
    assert(spark.sql("SELECT graft_minhash(array('a','b'))").head().getString(0) ==
      spark.sql("SELECT graft_minhash(array('a','b'), 0)").head().getString(0))
  }
}
