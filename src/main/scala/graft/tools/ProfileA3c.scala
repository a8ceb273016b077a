// Dev scratch: phase timing of a3c_corr_onepass_wide (panel → wide rows →
// UDAF → explode) to find its dominant cost at sf0.1.
// Run: sbt "runMain graft.tools.ProfileA3c /root/testdata/sf0.1"
package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{Sessions, SparkEntry}

object ProfileA3c {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.build("profile-a3c")
    import spark.implicits._
    val jan1 = SparkEntry.sec("2024-01-01T00:00:00")
    val jan3 = SparkEntry.sec("2024-01-03T00:00:00")
    def time(label: String)(f: => DataFrame): Unit = (1 to 3).foreach { i =>
      spark.catalog.clearCache()
      graft.ops.Time.unpersistPanels()
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"[c] $label%-24s run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val users: Seq[Long] = graft.Catalog.load(spark, sfDir, "events")
      .where(col("user_id") < 300)
      .select("user_id").distinct().orderBy("user_id").as[Long]
      .collect().toSeq
    val k = users.size
    println(s"[c] k=$k")
    def filled = SparkEntry.resampled(spark, sfDir, 300, jan1, jan3, 600)
    def wide = filled.groupBy("bucket").agg(
      map_from_entries(collect_list(struct(col("user_id").cast("int"),
        coalesce(col("value"), lit(Double.NaN))))).as("m"))
      .select(array(users.map(u =>
        coalesce(element_at(col("m"), lit(u.toInt)), lit(Double.NaN))): _*)
        .as("vals"))
    time("wide rows only")(wide)
    time("+ udaf coalesce(1)")(wide.coalesce(1)
      .agg(graft.functions.CorrMatrix.corrMatrix(k)(col("vals")).as("cells")))
    time("+ udaf 32 parts")(wide
      .agg(graft.functions.CorrMatrix.corrMatrix(k)(col("vals")).as("cells")))
    time("+ explode")(wide.coalesce(1)
      .agg(graft.functions.CorrMatrix.corrMatrix(k)(col("vals")).as("cells"))
      .select(explode(col("cells")).as("c")))
    spark.stop()
  }
}
