// Dev tool: measure how the bench micro canary decays after a query —
// distinguishes ambient host load (flat elevation) from query-induced
// JVM residue (decaying elevation: GC debt, ContextCleaner broadcast
// cleanup storms, code-cache churn). Drives the Bench suspect-flag
// design; see SCALE.md's measurement section. The reading is
// Bench.microCanaryReading ITSELF (shared, not copied) — the probe
// calibrates exactly the workload the suspect detector runs.
// Run: sbt "runMain graft.tools.CanaryProbe /root/testdata/sf0.1 t10_bpe_tokenize g1_edges"
package graft.tools

import graft.{Bench, Sessions, SparkEntry}

object CanaryProbe {

  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("graft-canary-probe")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.tail.toSeq
      else Seq("a1_group_mean", "t10_bpe_tokenize", "g1_edges")
    // steady-state the canary's own codegen
    Bench.microCanaryReading(spark)
    (1 to 5).foreach { i =>
      println(f"[probe] baseline $i: ${Bench.microCanaryReading(spark)}%.3f")
    }
    names.foreach { n =>
      (1 to 2).foreach { _ =>
        graft.ops.Time.unpersistPanels(); spark.catalog.clearCache()
        SparkEntry.queries(n)(spark, sf)
          .write.format("noop").mode("overwrite").save()
      }
      graft.ops.Time.unpersistPanels(); spark.catalog.clearCache()
      (1 to 5).foreach { i =>
        println(f"[probe] after $n $i: ${Bench.microCanaryReading(spark)}%.3f")
      }
    }
    spark.stop()
  }
}
