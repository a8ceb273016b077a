package graft.sources

import java.nio.file.Files
import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

class PartitionPruningSpec extends SparkTestBase {

  test("date-partitioned layout prunes to one directory (S3 semantics)") {
    val out = scratchDir("graft_prune_")
    graft.Catalog.load(spark, "/root/testdata/sf0.001", "events")
      .withColumn("date", date_format(col("ts"), "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("date").parquet(out)
    val nDates = new java.io.File(out).listFiles()
      .count(_.getName.startsWith("date="))
    assert(nDates > 1, "fixture should span multiple days")

    val pruned = spark.read.parquet(out).where(col("date") === "2024-01-03")
    assert(pruned.collect().length > 0)
    // inspect the plan instance that actually executed (descending into
    // the AQE-finalized subtree), so scan metrics are populated
    def findScan(p: org.apache.spark.sql.execution.SparkPlan)
        : Option[FileSourceScanExec] = p match {
      case f: FileSourceScanExec => Some(f)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        findScan(a.executedPlan)
      case other => other.children.view.flatMap(findScan).headOption
    }
    val scan = findScan(pruned.queryExecution.executedPlan)
      .getOrElse(fail("no file scan in plan"))
    // the partition filter must reach the scan and prune to exactly the
    // one date directory's files before any parquet IO (numFiles metric
    // is populated by the count above)
    assert(scan.partitionFilters.nonEmpty, "partition filter not pushed")
    val jan3Files = new java.io.File(out, "date=2024-01-03").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(scan.metrics("numFiles").value == jan3Files,
      s"scan read ${scan.metrics("numFiles").value} files, " +
        s"the pruned partition has $jan3Files")
  }

  test("parquet scan prunes columns and pushes predicates (read contract)") {
    val ev = graft.Catalog.load(spark, "/root/testdata/sf0.001", "events")
      .where(col("user_id") === 7).select("user_id", "value")
    val scan = ev.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no file scan in plan"))
    val readCols = scan.requiredSchema.fieldNames.toSet
    assert(readCols == Set("user_id", "value"),
      s"column pruning failed: read $readCols")
    assert(scan.metadata.get("PushedFilters").exists(_.contains("user_id")),
      "predicate not pushed to parquet")
  }
}
