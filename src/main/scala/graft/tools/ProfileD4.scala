// Dev scratch: phase timing of d4_ngram_jaccard (shingle explode+hash,
// df cut, posting self-join, size joins).
// Run: sbt "runMain graft.tools.ProfileD4 /root/testdata/sf0.1"
package graft.tools

import org.apache.spark.sql.functions._
import graft.{Catalog, Sessions}
import graft.ops.Text

object ProfileD4 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("profile-d4")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[d4] $label%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = Catalog.load(spark, d, "documents")
    val ex = docs.select(col("lang"), col("doc_id"),
        explode(Text.shingles(col("text"), 2)).as("sh"))
      .select(col("lang"), col("doc_id"), Text.hash60(col("sh")).as("h"))
    val keep = ex.groupBy("lang", "h").agg(count(lit(1)).as("df"))
      .where(col("df") <= 64).select("lang", "h")
    val exf = ex.join(keep, Seq("lang", "h")).cache()
    time("explode+df+join")(println("[d4] nexf=" + exf.count()))
    val sizes = exf.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = exf.select(col("lang"), col("doc_id").as("i"), col("h"))
      .join(exf.select(col("lang"), col("doc_id").as("j"), col("h")),
        Seq("lang", "h"))
      .where(col("i") < col("j"))
      .groupBy("lang", "i", "j").agg(count(lit(1)).as("inter"))
    time("self-join+count")(println("[d4] ninter=" + inter.cache().count()))
    val out = inter
      .join(broadcast(sizes.select(col("doc_id").as("i"), col("sz").as("sa"))), Seq("i"))
      .join(broadcast(sizes.select(col("doc_id").as("j"), col("sz").as("sb"))), Seq("j"))
      .withColumn("jac", round(col("inter") / (col("sa") + col("sb") - col("inter")), 6))
      .where(col("jac") >= 0.10)
    time("sizes+filter")(println("[d4] nout=" + out.count()))
    spark.stop()
  }
}
