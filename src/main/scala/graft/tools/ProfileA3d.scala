// Dev scratch: phase timing of a3d_corr_pruned (panel build, bucketing,
// candidate count, exact-pearson verification).
// Run: sbt "runMain graft.tools.ProfileA3d /root/testdata/sf0.1"
package graft.tools

import org.apache.spark.sql.functions._
import graft.{Sessions, SparkEntry}
import graft.ops.CorrPrune

object ProfileA3d {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.build("profile-a3d")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[a3d] $label%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val jan1 = SparkEntry.sec("2024-01-01T00:00:00")
    val jan3 = SparkEntry.sec("2024-01-03T00:00:00")
    val panel = SparkEntry.resampled(spark, sfDir, 300, jan1, jan3, 600)
      .withColumn("pos", ((col("bucket") - jan1) / 600 + 1).cast("int"))
      .cache()
    time("panel")(panel.count())
    val cand = CorrPrune.corrCandidates(panel, "user_id", "pos", "value",
      288, 8, 5).cache()
    time("candidates")(println("[a3d] ncand=" + cand.count()))
    val a = panel.select(col("user_id").as("i"), col("pos"),
      col("value").as("va"))
    val b = panel.select(col("user_id").as("j"), col("pos"),
      col("value").as("vb"))
    val rho = cand.join(a, Seq("i")).join(b, Seq("j", "pos"))
      .groupBy("i", "j")
      .agg(graft.ops.Stats.pearson(col("va"), col("vb")).as("rho"))
    time("verify pearson")(println("[a3d] nrho=" + rho.count()))
    spark.stop()
  }
}
