package graft.plans

import java.nio.file.Files
import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

class PushdownRuleSpec extends SparkTestBase {

  test("derived-ts range filters reach the parquet reader") {
    val ev = graft.Catalog.load(spark, "/root/testdata/sf0.001", "events")
      .where(col("ts") >= timestamp_seconds(lit(1704153600L)) &&
             col("ts") < timestamp_seconds(lit(1704240000L)))
      .select("event_id", "value")
    val scan = ev.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no scan"))
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(ts,") &&
      pushed.contains("LessThan(ts,"),
      s"range not pushed to parquet: $pushed")
  }

  test("rewrite is exact across truncation boundaries, incl. negatives") {
    // raw nanos around the div-1000 boundaries and below zero: the rule
    // must return exactly the rows the unrewritten predicate returns
    val nanos = Seq(-1500L, -1000L, -999L, -1L, 0L, 1L, 999L, 1000L,
      1001L, 1999L, 2000L, 999999L, 1000000L, 1000001L)
    val dir = scratchDir("graft_rule_")
    import spark.implicits._
    nanos.toDF("ts").write.mode("overwrite").parquet(dir)
    val raw = spark.read
      .schema("ts LONG").parquet(dir)
      .withColumn("raw", col("ts"))
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

    // brute-force truth via the unoptimizable CASE form
    def expectFor(op: String, micros: Long): Set[Long] = nanos.filter { n =>
      val us = n / 1000L // JVM division truncates toward zero, like Spark
      op match {
        case ">=" => us >= micros
        case ">" => us > micros
        case "<" => us < micros
        case "<=" => us <= micros
      }
    }.toSet

    for (op <- Seq(">=", ">", "<", "<=");
         micros <- Seq(0L, 1L, 1000L)) {
      val cond = op match {
        case ">=" => col("ts") >= timestamp_micros(lit(micros))
        case ">" => col("ts") > timestamp_micros(lit(micros))
        case "<" => col("ts") < timestamp_micros(lit(micros))
        case "<=" => col("ts") <= timestamp_micros(lit(micros))
      }
      val got = raw.where(cond).select("raw")
        .collect().map(_.getLong(0)).toSet
      assert(got == expectFor(op, micros),
        s"op=$op micros=$micros: got $got want ${expectFor(op, micros)}")
    }
  }
}
