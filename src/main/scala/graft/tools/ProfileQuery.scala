// Dev tool: time named SparkEntry queries (median of 3 after a warm
// pass, cache cleared per run — Bench's methodology without the full
// sweep), so a single query's optimization can be measured in isolation.
// Run: sbt "runMain graft.tools.ProfileQuery /root/testdata/sf0.1 a11_approx_distinct [more...]"
package graft.tools

import graft.{Sessions, SparkEntry}

object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    require(names.nonEmpty, "usage: ProfileQuery <sfDir> <query> [query...]")
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown: ${unknown.mkString(", ")}")
    val spark = Sessions.build("profile-query")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        println(s"[q] $name warm FAILED: ${e.getMessage}")
      }
      val times = (1 to 3).map { _ =>
        graft.ops.Time.unpersistPanels()
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[q] $name%-28s median ${times(1)}%.2f s  min ${times.head}%.2f s")
    }
    spark.stop()
  }
}
