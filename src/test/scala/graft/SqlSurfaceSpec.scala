package graft

import org.apache.spark.sql.functions._

/** S1's SQL surface: every fixture table registered as a temp view, the
  * same names the DuckDB oracle uses, queryable through spark.sql —
  * including the extension-registered functions.
  */
class SqlSurfaceSpec extends SparkTestBase {

  test("registerAll exposes the catalog to spark.sql") {
    Catalog.registerAll(spark, "/root/testdata/sf0.001")
    val n = spark.sql(
      """SELECT count(*) FROM events e
         JOIN customer c ON e.user_id = c.c_custkey
         WHERE e.value > 100""").head().getLong(0)
    assert(n > 0)
    // extension function over a view column, pure SQL text
    val mq = spark.sql(
      """SELECT midquote(min(value), max(value)) AS m FROM events""")
      .head().getDouble(0)
    assert(mq > 0)
    // the derived ts column is a real timestamp through the SQL surface
    val d = spark.sql(
      "SELECT date_format(min(ts), 'yyyy-MM-dd') FROM events")
      .head().getString(0)
    assert(d == "2024-01-01")
  }
}
