// Dev tool: dump explain("formatted") for NAMED queries into per-query
// files — the optimization rounds' before/after plan evidence
// (plans/r<N>/<query>_<suffix>.txt), where PlanAudit's PLANS.md is the
// one consolidated audit document.
// Run: sbt "runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> <q> [q...]"
package graft.tools

import java.nio.file.{Files, Paths}
import graft.{Sessions, SparkEntry}

object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PlanDump <sfDir> <outDir> <suffix> <query> [query...]")
    val sfDir = args(0)
    val outDir = Paths.get(args(1))
    val suffix = args(2)
    val names = args.drop(3).toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    Files.createDirectories(outDir)
    val spark = Sessions.build("graft-plan-dump")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        .replace(graft.sources.Materialize.root, "<scratch>")
      Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), txt)
      println(s"[plandump] wrote ${name}_$suffix.txt")
    }
    spark.stop()
  }
}
