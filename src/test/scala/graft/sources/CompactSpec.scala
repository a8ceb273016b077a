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
}
