// Dev tool: measure how the bench micro canary decays after a query —
// distinguishes ambient host load (flat elevation) from query-induced
// JVM residue (decaying elevation: GC debt, ContextCleaner broadcast
// cleanup storms, code-cache churn). Drives the Bench suspect-flag
// design; see SCALE.md's measurement section.
// Run: sbt "runMain graft.tools.CanaryProbe /root/testdata/sf0.1 t10_bpe_tokenize g1_edges"
package graft.tools

import graft.{Sessions, SparkEntry}

object CanaryProbe {

  private def canary(spark: org.apache.spark.sql.SparkSession): Double = {
    import org.apache.spark.sql.functions.{col, lit, pmod, sum, xxhash64}
    val t0 = System.nanoTime()
    spark.range(0L, 100000000L, 1L)
      .select(pmod(xxhash64(col("id")), lit(1000000L)).as("h"))
      .agg(sum(col("h"))).write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("graft-canary-probe")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.tail.toSeq
      else Seq("a1_group_mean", "t10_bpe_tokenize", "g1_edges")
    // steady-state the canary's own codegen
    canary(spark)
    (1 to 5).foreach { i =>
      System.gc(); Thread.sleep(50)
      println(f"[probe] baseline $i: ${canary(spark)}%.3f")
    }
    names.foreach { n =>
      (1 to 2).foreach { _ =>
        graft.ops.Time.unpersistPanels(); spark.catalog.clearCache()
        SparkEntry.queries(n)(spark, sf)
          .write.format("noop").mode("overwrite").save()
      }
      graft.ops.Time.unpersistPanels(); spark.catalog.clearCache()
      (1 to 5).foreach { i =>
        System.gc(); Thread.sleep(50)
        println(f"[probe] after $n $i: ${canary(spark)}%.3f")
      }
    }
    spark.stop()
  }
}
