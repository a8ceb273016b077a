package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Bucketing is the lake-layout half of the 100 TB join story: two fact
  * tables bucketed (and sorted) by the join key join WITHOUT any
  * exchange — the shuffle is paid once at write time and amortized over
  * every subsequent join/aggregation on that key. This spec proves the
  * claim on the physical plan, not by assertion in prose.
  */
class BucketingSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed+sorted tables join with zero shuffle exchanges") {
    val dir = scratchDir("graft_bucket_")
    val left = (0 until 1000).map(i => (i.toLong % 50, i.toLong, i * 1.5))
      .toDF("user_id", "event_id", "value")
    val right = (0 until 500).map(i => (i.toLong % 50, s"tag$i"))
      .toDF("user_id", "tag")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      left.write.bucketBy(8, "user_id").sortBy("user_id")
        .option("path", s"$dir/ev_b").saveAsTable("ev_b")
      right.write.bucketBy(8, "user_id").sortBy("user_id")
        .option("path", s"$dir/tag_b").saveAsTable("tag_b")
      // force a sort-merge join so the exchange question is real
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("ev_b").join(spark.table("tag_b"), "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      // and the result is still correct
      assert(joined.count() ==
        left.join(right, "user_id").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS ev_b")
      spark.sql("DROP TABLE IF EXISTS tag_b")
    }
  }

  test("aggregation on the bucket key reuses the bucketing: no exchange") {
    val dir = scratchDir("graft_bucket_")
    val df = (0 until 1000).map(i => (i.toLong % 50, i * 2.0))
      .toDF("user_id", "value")
    try {
      df.write.bucketBy(8, "user_id")
        .option("path", s"$dir/agg_b").saveAsTable("agg_b")
      val agg = spark.table("agg_b").groupBy("user_id")
        .agg(count(lit(1)).as("n"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"group-by on the bucket key must not shuffle:\n$plan")
      assert(agg.count() == 50)
    } finally {
      spark.sql("DROP TABLE IF EXISTS agg_b")
    }
  }
}
