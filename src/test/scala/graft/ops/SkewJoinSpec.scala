package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The join half of the skew story (Skew.saltedAgg covers aggregation):
  * AQE's OptimizeSkewedJoin splits oversized shuffle partitions at run
  * time, so a hot join key does not pin one reducer. The thresholds are
  * lowered to fixture scale here; the assertion is on the executed plan
  * (`isSkew=true` on the sort-merge join), not on folklore.
  */
class SkewJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("AQE splits a skewed sort-merge join partition (isSkew=true)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // 200k rows on ONE key vs a near-uniform right side
      val left = spark.range(200000)
        .select(lit(1L).as("k"), col("id").as("payload"))
        .union(spark.range(1000).select((col("id") % 50 + 2).as("k"),
          col("id").as("payload")))
      val right = spark.range(52).select(col("id").as("k"),
        concat(lit("tag"), col("id")).as("tag"))
      val joined = left.join(right, "k")
      // force execution through THIS QueryExecution (a write would spawn
      // its own), so the AQE final plan is observable on `joined`
      assert(joined.collect().length == 201000)
      val plan = joined.queryExecution.executedPlan.toString
      // the strict OptimizeSkewedJoin marker ON THE JOIN NODE itself —
      // a loose "skewed" substring could match config echoes and let
      // the gate rot (it did: Spark 4 prints `SortMergeJoin(skew=true)`)
      assert(plan.contains("SortMergeJoin(skew=true)") ||
        plan.contains("ShuffledHashJoin(skew=true)"),
        s"AQE must mark the hot join with (skew=true):\n$plan")
      // and the hot side's shuffle read must carry the skew split
      assert(plan.contains("AQEShuffleRead coalesced and skewed") ||
        plan.contains("AQEShuffleRead skewed"),
        s"the skewed partition must be split at the shuffle read:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
