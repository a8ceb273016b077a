// Dev scratch: steady-state phase timing of the 300-user resample panel
// (the shared input of a3c/a3d) to localize their ~6 s bench cost.
// Run: sbt "runMain graft.tools.ProfilePanel /root/testdata/sf0.1"
package graft.tools

import org.apache.spark.sql.functions._
import graft.{Sessions, SparkEntry}
import graft.ops.{Exact, Time}

object ProfilePanel {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.build("profile-panel")
    val jan1 = SparkEntry.sec("2024-01-01T00:00:00")
    val jan2 = SparkEntry.sec("2024-01-02T00:00:00")
    def time(label: String)(f: => Long): Unit = (1 to 3).foreach { i =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = f
      println(f"[panel] $label%-28s run$i ${(System.nanoTime() - t0) / 1e9}%.2f s  (n=$n)")
    }
    val ev = graft.Catalog.load(spark, sfDir, "events")
      .where(col("user_id") < 300)
    time("scan+filter") {
      ev.select("user_id", "ts", "value").write
        .format("noop").mode("overwrite").save(); 0L
    }
    time("bucket-agg") {
      ev.groupBy((unix_timestamp(col("ts")) - unix_timestamp(col("ts")) % 600)
          .as("bucket"), col("user_id"))
        .agg(Exact.davg(col("value")).as("value")).count()
    }
    time("full resampleFfill") {
      Time.resampleFfill(spark, ev, "user_id", "ts", "value",
        jan1, jan2, 600, Exact.davg(col("value"))).count()
    }
    time("resampleFfill no-cache-reuse") {
      val f = Time.resampleFfill(spark, ev, "user_id", "ts", "value",
        jan1, jan2, 600, Exact.davg(col("value")))
      f.write.format("noop").mode("overwrite").save(); 0L
    }
    spark.stop()
  }
}
