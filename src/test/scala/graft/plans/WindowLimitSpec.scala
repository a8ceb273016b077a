package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grouped top-k must not move each group's full volume to one reducer.
  * Spark's WindowGroupLimit rewrite turns `row_number() <= k` into a
  * per-map-task top-k BEFORE the shuffle (Partial mode), so a group's
  * reducer receives (map partitions × k) pre-pruned rows — the
  * two-phase top-k a hand-written job would do. w8_cross_rank (daily
  * leaderboard) leans on this; the spec pins the rewrite to the
  * physical plan so a regression (e.g. a filter shape the rule stops
  * recognizing) is caught here, not at 100 TB.
  */
class WindowLimitSpec extends SparkTestBase {
  import spark.implicits._

  test("row_number <= k plans a pre-shuffle WindowGroupLimit") {
    val df = (0 until 20000)
      .map(i => (i % 25, i.toLong, (i * 37 % 1000) * 1.0))
      .toDF("grp", "id", "v")
      .repartition(8)
    val w = Window.partitionBy("grp").orderBy(col("v").desc, col("id"))
    val top = df.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 10)
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected the grouped top-k rewrite in:\n$plan")
    assert(plan.contains("Partial"),
      s"expected a pre-shuffle partial group limit in:\n$plan")
    assert(top.count() === 250L)
  }
}
