// Dev scratch: isolate where a3d_corr_pruned's bench time goes by timing
// the query with pieces removed (noop sink, clearCache, 3 runs each).
// Run: sbt "runMain graft.tools.ProfileA3d3 /root/testdata/sf0.1"
package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{Sessions, SparkEntry}
import graft.ops.CorrPrune

object ProfileA3d3 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.build("profile-a3d3")
    val jan1 = SparkEntry.sec("2024-01-01T00:00:00")
    val jan2 = SparkEntry.sec("2024-01-02T00:00:00")
    def time(label: String)(f: => DataFrame): Unit = (1 to 3).foreach { i =>
      spark.catalog.clearCache()
      graft.ops.Time.unpersistPanels()
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"[v] $label%-28s run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def rho = {
      val panel = SparkEntry.resampled(spark, sfDir, 300, jan1, jan2, 600)
        .withColumn("pos", ((col("bucket") - jan1) / 600 + 1).cast("int"))
      CorrPrune.candidateRho(panel, "user_id", "pos", "value",
        dims = 144, bands = 8, bits = 5)
    }
    time("rho only")(rho)
    time("rho+round+filter")(rho
      .select(col("i"), col("j"), round(col("rho"), 4).as("rho"))
      .where(col("rho") >= 0.5))
    time("full (with orderBy)")(rho
      .select(col("i"), col("j"), round(col("rho"), 4).as("rho"))
      .where(col("rho") >= 0.5)
      .orderBy("i", "j"))
    time("exact query fn")(SparkEntry.queries("a3d_corr_pruned")(spark, sfDir))
    time("cache before orderBy") {
      val r = rho
        .select(col("i"), col("j"), round(col("rho"), 4).as("rho"))
        .where(col("rho") >= 0.5).cache()
      r.count()
      r.orderBy("i", "j")
    }
    time("coalesce(1) sortWithin")(rho
      .select(col("i"), col("j"), round(col("rho"), 4).as("rho"))
      .where(col("rho") >= 0.5)
      .coalesce(1).sortWithinPartitions("i", "j"))
    spark.stop()
  }
}
