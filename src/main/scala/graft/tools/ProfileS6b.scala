// Dev tool: phase-split timing of s6b_wide_corr_matrix — panel+UDAF
// long form vs the square-CSV pivot write vs the 501-column read-back —
// so the bench's top line can be attributed and attacked precisely.
// Run: sbt "runMain graft.tools.ProfileS6b /root/testdata/sf0.1"
package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{Sessions, SparkEntry}
import graft.sources.Sinks

object ProfileS6b {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.build("profile-s6b")
    val jan1 = SparkEntry.jan1
    val jan3 = SparkEntry.jan3
    def time[T](label: String)(f: => T): Unit = (1 to 3).foreach { i =>
      spark.catalog.clearCache()
      graft.ops.Time.unpersistPanels()
      val t0 = System.nanoTime()
      f match {
        case df: DataFrame =>
          df.write.format("noop").mode("overwrite").save()
        case _ => ()
      }
      println(f"[p] $label%-28s run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def pairs = {
      val (users, panel) = SparkEntry.widePanel(spark, sfDir, 500,
        jan1, jan3, 600)
      val k = users.size
      val nBuckets = (jan3 - jan1) / 600
      panel
        .coalesce(graft.ops.Relational.boundedPartitions(nBuckets, 256))
        .agg(graft.functions.CorrMatrix.corrMatrix(k)(col("vals"))
          .as("cells"))
        .select(explode(col("cells")).as("c"))
        .select(element_at(typedLit(users), col("c.i") + 1).as("i"),
          element_at(typedLit(users), col("c.j") + 1).as("j"),
          round(col("c.rho"), 4).as("rho"))
    }
    // phase attribution for the a3c-family (~5 s in bench): resample
    // materialization (the users.collect side effect), panel, UDAF,
    // explode+project, sort
    time("resample+users collect") {
      val (users, _) = SparkEntry.widePanel(spark, sfDir, 500, jan1, jan3,
        600)
      println(s"[p]   k=${users.size}")
      null
    }
    time("panel rows only") {
      val (_, panel) = SparkEntry.widePanel(spark, sfDir, 500, jan1, jan3,
        600)
      panel
    }
    time("panel+udaf long form")(pairs)
    time("a3c full (with sort)")(
      SparkEntry.queries("a3c_corr_onepass_wide")(spark, sfDir))
    // partition sweep for the UDAF stage: update parallelism (more
    // partitions = more threads on the O(k²)-per-bucket update loop) vs
    // merge serialization (each partial buffer is ~10 MB at k=500)
    for (nPart <- Seq(1, 2, 4, 8, 16, 32)) {
      val (users, panel) = SparkEntry.widePanel(spark, sfDir, 500,
        jan1, jan3, 600)
      val k = users.size
      time(s"udaf @ $nPart partitions")(panel.coalesce(nPart)
        .agg(graft.functions.CorrMatrix.corrMatrix(k)(col("vals"))
          .as("cells")))
    }
    val out = "/tmp/profile_s6b_matrix"
    var ids: Seq[Long] = Nil
    time("+ writeWideMatrixCsv") {
      ids = Sinks.writeWideMatrixCsv(pairs, "i", "j", "rho", out)
      null
    }
    time("read-back 501-col unpivot")(
      Sinks.readWideMatrixCsvLong(spark, out, ids))
    time("full s6b query")(
      SparkEntry.queries("s6b_wide_corr_matrix")(spark, sfDir))
    spark.stop()
  }
}
