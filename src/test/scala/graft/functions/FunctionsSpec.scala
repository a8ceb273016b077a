package graft.functions

import graft.SparkTestBase
import graft.ops.Text
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("midquote rewrites to built-in arithmetic via the extension") {
    val got = spark.sql("SELECT midquote(10.0, 11.0) AS m")
      .as[Double].head()
    assert(got == 10.5)
    // registered through spark.sql.extensions, so plain SQL text works
    val onTable = spark.sql(
      "SELECT midquote(1, 2) AS m").as[Double].head()
    assert(onTable == 1.5)
  }

  test("winnow_fingerprint: custom expression matches the relational form") {
    val docs = graft.Catalog
      .load(spark, "/root/testdata/sf0.001", "documents")
    val viaExpr = docs.select(col("doc_id"),
        call_function("winnow_fingerprint", Text.words(col("text")))
          .as("fingerprint"))
      .where(col("fingerprint").isNotNull)
    val viaRelational = Text.fingerprint(docs, "doc_id", "text")
    assert(viaExpr.exceptAll(viaRelational).isEmpty &&
      viaRelational.exceptAll(viaExpr).isEmpty)
    assert(viaExpr.count() == docs.count()) // all fixture docs >= 5 words
  }

  test("winnow_fingerprint: NULL below k words, deterministic above") {
    val got = Seq("a b c", "a b c d e", "a b c d e").toDF("text")
      .select(call_function("winnow_fingerprint",
        split(col("text"), " ")).as("f"))
      .collect().map(r => Option(r.get(0)))
    assert(got(0).isEmpty)
    assert(got(1).isDefined && got(1) == got(2))
  }
}
