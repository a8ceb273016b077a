// Dev scratch: d6 phase split — d2 pair build vs CC loop vs final shape.
// Run: sbt "runMain graft.tools.ProfileCC2 /root/testdata/sf0.1"
package graft.tools

import org.apache.spark.sql.functions._
import graft.Sessions

object ProfileCC2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.build("profile-cc2")
    (1 to 2).foreach { run =>
      spark.catalog.clearCache()
      graft.ops.Time.unpersistPanels()
      var t0 = System.nanoTime()
      def lap(label: String): Unit = {
        println(f"[cc2] run$run $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
        t0 = System.nanoTime()
      }
      val pairs = graft.SparkEntry.queries("d2_minhash_lsh")(spark, sfDir)
        .select("i", "j").cache()
      pairs.count()
      lap("d2 pairs cached")
      val comp = graft.ops.Components.connectedComponents(pairs, "i", "j")
      lap("cc loop")
      comp.withColumn("sz", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("component")))
        .write.format("noop").mode("overwrite").save()
      lap("final window+noop")
    }
    spark.stop()
  }
}
