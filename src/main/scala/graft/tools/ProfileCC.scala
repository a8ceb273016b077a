// Dev scratch: per-round timing of Components.connectedComponents over
// d2's sf0.1 pair graph, to localize d6's cost.
// Run: sbt "runMain graft.tools.ProfileCC /root/testdata/sf0.1"
package graft.tools

import org.apache.spark.sql.functions._
import graft.Sessions

object ProfileCC {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.build("profile-cc")
    val t00 = System.nanoTime()
    val pairs = graft.SparkEntry.queries("d2_minhash_lsh")(spark, sfDir)
      .select("i", "j").cache()
    println(f"[cc] pairs=${pairs.count()} build ${(System.nanoTime() - t00) / 1e9}%.2f s")
    val sym = pairs.select(col("i").as("a"), col("j").as("b"))
      .unionByName(pairs.select(col("j").as("a"), col("i").as("b")))
      .distinct().cache()
    println(s"[cc] sym=${sym.count()}")
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("lbl", col("id")).localCheckpoint()
    println(s"[cc] nodes=${labels.count()}")
    var changed = 1L
    var round = 0
    while (changed > 0) {
      round += 1
      val t0 = System.nanoTime()
      val prop = sym.join(labels, col("a") === col("id"))
        .groupBy(col("b").as("id")).agg(min("lbl").as("nlbl"))
      val next = labels.join(prop, Seq("id"), "left")
        .select(col("id"), col("lbl"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("nl"))
      val stepped = next.localCheckpoint()
      changed = stepped.where(col("nl") < col("lbl")).count()
      labels = stepped.select(col("id"), col("nl").as("lbl"))
      println(f"[cc] round $round changed=$changed ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
