// Dev scratch: steady-state timing of a3d's two subtrees (candidate
// generation vs exact-pearson verify) and a3c's wide UDAF, each measured
// like Bench (clearCache + noop sink, 3 runs).
// Run: sbt "runMain graft.tools.ProfileA3d2 /root/testdata/sf0.1"
package graft.tools

import org.apache.spark.sql.functions._
import graft.{Sessions, SparkEntry}
import graft.ops.CorrPrune

object ProfileA3d2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.build("profile-a3d2")
    val jan1 = SparkEntry.sec("2024-01-01T00:00:00")
    val jan2 = SparkEntry.sec("2024-01-02T00:00:00")
    def time(label: String)(f: => Unit): Unit = (1 to 3).foreach { i =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      f
      println(f"[a3d2] $label%-24s run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def panel = SparkEntry.resampled(spark, sfDir, 300, jan1, jan2, 600)
      .withColumn("pos", ((col("bucket") - jan1) / 600 + 1).cast("int"))
    time("candidates only") {
      CorrPrune.corrCandidates(panel, "user_id", "pos", "value",
        144, 8, 5).write.format("noop").mode("overwrite").save()
    }
    time("full candidateRho") {
      CorrPrune.candidateRho(panel, "user_id", "pos", "value",
        144, 8, 5).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
