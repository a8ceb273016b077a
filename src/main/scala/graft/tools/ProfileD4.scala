// Dev scratch: phase timing of d4_ngram_jaccard (array-domain shape:
// per-doc bigram-hash sets, broadcast hot cut, prefix candidate join,
// array_intersect verify).
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
    val w = Text.words(col("text"))
    val hs = array_distinct(
      when(size(w) >= 2,
        zip_with(slice(w, lit(1), size(w) - 1),
          slice(w, lit(2), size(w) - 1),
          (a, b) => xxhash64(a, b)))
        .otherwise(array().cast("array<bigint>")))
    val docsets = docs.select(col("lang"), col("doc_id"), hs.as("hs"))
      .cache()
    time("docsets build")(println("[d4] ndocs=" + docsets.count()))
    val hot = docsets
      .select(col("lang"), explode(col("hs")).as("h"))
      .groupBy("lang", "h").agg(count(lit(1)).as("df"))
      .where(col("df") > 64)
      .groupBy("lang").agg(collect_list("h").as("hot"))
    val setsF = docsets.join(broadcast(hot), Seq("lang"), "left")
      .withColumn("hsf", array_sort(array_except(col("hs"),
        coalesce(col("hot"), array().cast("array<bigint>")))))
      .withColumn("szf", size(col("hsf")))
      .where(col("szf") > 0)
      .select("lang", "doc_id", "hsf", "szf")
      .cache()
    time("hot cut + setsF")(println("[d4] nsets=" + setsF.count()))
    val pref = setsF.select(col("lang"), col("doc_id"),
      explode(slice(col("hsf"), lit(1),
        (col("szf") - ceil(col("szf") * 0.10) + 1).cast("int")))
        .as("h"))
    time("pref explode")(println("[d4] npref=" + pref.count()))
    val cand = pref.select(col("lang"), col("doc_id").as("i"), col("h"))
      .join(pref.select(col("lang"), col("doc_id").as("j"), col("h")),
        Seq("lang", "h"))
      .where(col("i") < col("j"))
      .select("lang", "i", "j").distinct().cache()
    time("cand join+distinct")(println("[d4] ncand=" + cand.count()))
    val out = cand
      .join(setsF.select(col("doc_id").as("i"),
        col("hsf").as("ha"), col("szf").as("sa")), Seq("i"))
      .join(setsF.select(col("doc_id").as("j"),
        col("hsf").as("hb"), col("szf").as("sb")), Seq("j"))
      .withColumn("inter", size(array_intersect(col("ha"), col("hb"))))
      .withColumn("jac", round(col("inter") /
        (col("sa") + col("sb") - col("inter")), 6))
      .where(col("jac") >= 0.10)
    time("verify+filter")(println("[d4] nout=" + out.count()))
    spark.stop()
  }
}
