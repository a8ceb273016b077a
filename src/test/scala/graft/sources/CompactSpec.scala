package graft.sources

import java.nio.file.Files
import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CompactSpec extends SparkTestBase {
  import spark.implicits._

  test("compactParquet collapses small files and preserves every row") {
    val dir = scratchDir("graft_compact_")
    // simulate micro-batch accretion: 12 tiny appends
    (1 to 12).foreach { i =>
      Seq.tabulate(50)(j => (i.toLong * 1000 + j, s"v$i-$j"))
        .toDF("id", "v").coalesce(1)
        .write.mode("append").parquet(dir)
    }
    val beforeRows = spark.read.parquet(dir)
      .orderBy("id").as[(Long, String)].collect().toSeq
    val (nBefore, nAfter) =
      Sinks.compactParquet(spark, dir, targetBytes = 1L << 30)
    assert(nBefore == 12)
    assert(nAfter == 1)
    val afterRows = spark.read.parquet(dir)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(afterRows == beforeRows)
  }

  test("compactParquet REFUSES a bucketed table's data directory — a " +
      "flat rewrite would corrupt the bucket-to-file mapping the " +
      "catalog still advertises (wrong joins, not just lost pruning)") {
    val dir = scratchDir("graft_compact_bkrefuse_")
    spark.sql("DROP TABLE IF EXISTS compact_refuse_t")
    spark.range(1000).selectExpr("id AS k", "id * 2 AS v")
      .write.bucketBy(4, "k").sortBy("k")
      .option("path", s"$dir/t").format("parquet")
      .saveAsTable("compact_refuse_t")
    val e = intercept[IllegalArgumentException] {
      Sinks.compactParquet(spark, s"$dir/t", targetBytes = 1L << 30)
    }
    assert(e.getMessage.contains("BUCKETED"), e.getMessage)
    // and nothing was touched: the table still reads in full
    assert(spark.table("compact_refuse_t").count() == 1000)
  }

  test("compactBucketedTable rewrites through the catalog: file count " +
      "drops to one per bucket, rows survive, and a post-compact join " +
      "keyed on the bucket columns still plans ZERO shuffle exchanges") {
    val dir = scratchDir("graft_compact_bk_")
    spark.sql("DROP TABLE IF EXISTS compact_bk_t")
    spark.sql("DROP TABLE IF EXISTS compact_bk_dim")
    // micro-batch accretion: 6 appends × 4 buckets = up to 24 files
    spark.range(0).selectExpr("id AS k", "CAST(id AS STRING) AS v")
      .write.bucketBy(4, "k").sortBy("k")
      .option("path", s"$dir/t").format("parquet")
      .saveAsTable("compact_bk_t")
    (1 to 6).foreach { i =>
      spark.range(i * 1000L, i * 1000L + 500).repartition(2)
        .selectExpr("id AS k", "CAST(id AS STRING) AS v")
        .write.mode("append").bucketBy(4, "k").sortBy("k")
        .format("parquet").saveAsTable("compact_bk_t")
    }
    val beforeRows = spark.table("compact_bk_t")
      .orderBy("k").as[(Long, String)].collect().toSeq
    val (nBefore, nAfter) =
      Sinks.compactBucketedTable(spark, "compact_bk_t")
    assert(nBefore > 4, s"accretion produced only $nBefore files")
    assert(nAfter <= 4, s"compacted to $nAfter files (> numBuckets)")
    val afterRows = spark.table("compact_bk_t")
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(afterRows == beforeRows)
    // the zero-exchange property downstream plans rely on survives:
    // same-bucketed join in the cluster shape (broadcasts disabled)
    spark.range(1000L, 8000L, 1L).selectExpr("id AS k", "id % 7 AS grp")
      .repartition(4)
      .write.bucketBy(4, "k").sortBy("k")
      .option("path", s"$dir/dim").format("parquet")
      .saveAsTable("compact_bk_dim")
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val j = spark.table("compact_bk_t")
        .join(spark.table("compact_bk_dim"), Seq("k"))
      val p = planOf(j)
      assert(p.contains("Bucketed: true"), p)
      assert(!p.contains("Exchange"),
        s"post-compact bucketed join plans an exchange:\n$p")
      assert(j.count() == beforeRows.size)
    } finally spark.conf.set(key, prev)
  }

  test("compactPartitionedParquet compacts within each partition " +
      "directory: layout preserved, rows preserved, and the e4b-style " +
      "statically-pruned probe still reads only the probed cells with " +
      "zero exchanges above the lake scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.Exchange
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val dir = scratchDir("graft_compact_part_")
    val lakeDir = s"$dir/ivf"
    // 5 appends × 8 cells: every cell dir accretes small files
    (1 to 5).foreach { i =>
      spark.range(i * 10000L, i * 10000L + 2000)
        .selectExpr("id AS vec_id",
          "transform(sequence(1, 4), p -> id % (p + 13)) AS q",
          "id % 997 + 1 AS sq", "CAST(id % 8 AS INT) AS cell")
        .coalesce(1)
        .write.mode("append").partitionBy("cell").parquet(lakeDir)
    }
    val rowsBefore = spark.read.parquet(lakeDir).count()
    val dirsBefore = new java.io.File(lakeDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      .map(_.getName).sorted.toSeq
    assert(dirsBefore.size == 8)
    val (nBefore, nAfter) =
      Sinks.compactPartitionedParquet(spark, lakeDir, 1L << 30)
    assert(nBefore == 40 && nAfter == 8,
      s"expected 40 -> 8 files, got $nBefore -> $nAfter")
    val dirsAfter = new java.io.File(lakeDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      .map(_.getName).sorted.toSeq
    assert(dirsAfter == dirsBefore, "partition directories changed")
    val lake = spark.read.parquet(lakeDir)
    assert(lake.count() == rowsBefore)
    // the post-compact probe: a static literal cell filter must still
    // prune the file listing to the probed cells and plan no exchange
    // above the lake scan (the e4b/e11b property, CompactSpec's charge)
    val probeCells = spark.range(2).selectExpr(
      "id AS qid", "CAST(id + 3 AS INT) AS cell")
    val probesV = spark.range(2).selectExpr("id AS qid",
      "transform(sequence(1, 4), p -> id % (p + 13)) AS qa",
      "(id % 997) + 1 AS qsq")
    val top = graft.ops.Similarity.ivfLakeTopK(lake, probesV,
      probeCells, 2)
    val root = top.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    val scans = root.collect { case f: FileSourceScanExec
        if f.metadata.get("Location").exists(_.contains("ivf")) => f }
    assert(scans.nonEmpty)
    assert(scans.forall(_.selectedPartitions.partitionCount == 2),
      s"pruned to ${scans.map(_.selectedPartitions.partitionCount).toSeq} " +
        "partitions, expected 2")
    def lakeScanBelow(p: org.apache.spark.sql.execution.SparkPlan)
        : Boolean = p match {
      case f: FileSourceScanExec =>
        f.metadata.get("Location").exists(_.contains("ivf"))
      case _: org.apache.spark.sql.execution.joins.BaseJoinExec => false
      case other => other.children.exists(lakeScanBelow)
    }
    val offenders = root.collect {
      case e: Exchange if lakeScanBelow(e.child) => e.nodeName }
    assert(offenders.isEmpty,
      s"post-compact probe shuffles the lake: $offenders")
    assert(top.count() > 0)
  }
}
