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
    // date repair from SQL, including the NULL-on-invalid arm
    val dates = spark.sql(
      "SELECT graft_yyyymmdd_to_date(20200229), graft_yyyymmdd_to_date(20190230)").head()
    assert(dates.getDate(0) == java.sql.Date.valueOf("2020-02-29"))
    assert(dates.isNullAt(1))
  }

  test("GraftExtensions class wires every function through SparkSessionExtensions") {
    // the spark.sql.extensions path: session construction instantiates the
    // class and drains its injections into the session's FunctionRegistry.
    // A shared-session suite can't rebuild the session, so replay exactly
    // that drain against a fresh registry and prove both functions land
    // and build working expressions.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val reg = org.apache.spark.sql.graft.bridge.registerInjectedFunctions(
      ext, org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin.clone())
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    assert(GraftExtensions.all.forall { case (id, _, _) => reg.functionExists(id) },
      "an injected function is missing from the drained registry")
    // builders produce evaluable expressions (not just registry entries)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val arr = Literal.create(
      ArrayData.toArrayData(Array(UTF8String.fromString("a"), UTF8String.fromString("b"))),
      ArrayType(StringType))
    val mh = reg.lookupFunction(FunctionIdentifier("graft_minhash"), Seq(arr))
    assert(mh.eval(null) == graft.functions.HashAlgos.minhash(
      ArrayData.toArrayData(Array(UTF8String.fromString("a"), UTF8String.fromString("b"))),
      UTF8String.fromString("s0")))
  }
}
