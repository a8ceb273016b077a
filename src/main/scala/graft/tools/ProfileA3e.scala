// Dev tool: phase-split a3e (the forced-pruned selector route) against
// a3d (the direct pruned query) to attribute the selector's overhead.
// Run: sbt "runMain graft.tools.ProfileA3e /root/testdata/sf0.1"
package graft.tools

import org.apache.spark.sql.functions._
import graft.{Sessions, SparkEntry}

object ProfileA3e {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.build("profile-a3e")
    def time(label: String)(f: => Unit): Unit = (1 to 3).foreach { i =>
      graft.ops.Time.unpersistPanels()
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      f
      println(f"[p] $label%-28s run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val jan1 = SparkEntry.jan1
    val jan2 = SparkEntry.jan2
    time("widePanel users only") {
      val (users, _) = SparkEntry.widePanel(spark, sfDir, 300, jan1, jan2, 600)
      println(s"[p]   k=${users.size}")
    }
    time("a3d full") {
      SparkEntry.queries("a3d_corr_pruned")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    time("panelRho pruned edges only") {
      val (_, e) = SparkEntry.panelRho(spark, sfDir, 300, jan1, jan2, 600,
        roundThenFilter = Some((4, 0.5)), onePassMaxK = 1)
      e.write.format("noop").mode("overwrite").save()
    }
    time("a3e full") {
      SparkEntry.queries("a3e_corr_auto_pruned")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    // bisect: candidateRho directly (a3d's core), no widePanel, no vid
    def prunedCore() = {
      val p = SparkEntry.resampled(spark, sfDir, 300, jan1, jan2, 600)
        .withColumn("pos", ((col("bucket") - jan1) / 600 + 1).cast("int"))
      graft.ops.CorrPrune.candidateRho(p, "user_id", "pos", "value",
        dims = 144, bands = 8, bits = 5)
    }
    time("v1 core+round only") {
      prunedCore().select(col("i"), col("j"), round(col("rho"), 4).as("rho"))
        .write.format("noop").mode("overwrite").save()
    }
    time("v2 v1 + vid array_position") {
      val (users, _) = SparkEntry.widePanel(spark, sfDir, 300, jan1, jan2, 600)
      def vid(c: org.apache.spark.sql.Column) =
        (array_position(typedLit(users), c) - 1).cast("int")
      prunedCore().select(col("i"), col("j"), vid(col("i")).as("ii"),
          vid(col("j")).as("jj"), round(col("rho"), 4).as("rho"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
