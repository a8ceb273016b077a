// Dev tool: time named SparkEntry queries in isolation (same noop-sink
// methodology as Bench) to localize a regression without a full bench run.
// Run: sbt "runMain graft.tools.TimeQuery <sfDir> <n> <name> [name...]"
package graft.tools

import graft.{Sessions, SparkEntry}

object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = Sessions.build("graft-time-query")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to n).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[time] $name%-28s ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
