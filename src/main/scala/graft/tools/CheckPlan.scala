// Dev scratch: inspect optimized plan shape of a derived-ts filter.
package graft.tools
import org.apache.spark.sql.functions._
object CheckPlan {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.build("check")
    val ev = graft.Catalog.load(spark, "/root/testdata/sf0.001", "events")
    val q = ev.where(col("ts") >= timestamp_seconds(lit(1704153600L)) &&
        col("ts") < timestamp_seconds(lit(1704240000L)))
      .select("event_id", "value")
    println(q.queryExecution.optimizedPlan.treeString)
    println(q.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("PushedFilters") || l.contains("ReadSchema"))
      .mkString("\n"))
    spark.stop()
  }
}
