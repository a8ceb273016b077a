// Dev scratch main: stage-by-stage timing of d2_minhash_lsh at a given SF
// (mirrors the current hashed-postings form of the query).
// Run: SPARK_GRAFT_CPUS=8 sbt "runMain graft.tools.ProfileD2 /root/testdata/sf0.1"
package graft.tools

import org.apache.spark.sql.functions._
import graft.{Catalog, Sessions}
import graft.ops.Text

object ProfileD2 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("profile-d2")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = Catalog.load(spark, d, "documents")
    val sh = Text.explodeShingles(docs, "doc_id", "text", 1)
      .select(col("doc_id"), Text.hash60(col("shingle")).as("h"))
      .cache()
    time("explode+hash")(sh.count())
    val sig = Text.minhashSignature(sh, "doc_id", 12).cache()
    time("signatures")(sig.count())
    val bands = Text.bandKeys(sig, "doc_id", 2, 6)
    val a = bands.select(col("band"), col("bkey"), col("doc_id").as("i"))
    val b = bands.select(col("band"), col("bkey"), col("doc_id").as("j"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val cand = a
      .join(broadcast(sizes.select(col("doc_id").as("i"), col("sz").as("sa"))), Seq("i"))
      .join(b.join(broadcast(sizes.select(col("doc_id").as("j"), col("sz").as("sb"))), Seq("j")),
        Seq("band", "bkey"))
      .where(col("i") < col("j") &&
        least(col("sa"), col("sb")) * 1000000L >= greatest(col("sa"), col("sb")) * 949999L)
      .select("i", "j", "sa", "sb").distinct().cache()
    time("candidates")(println("n_cand=" + cand.count()))
    val out = cand
      .join(sh.select(col("doc_id").as("i"), col("h")), Seq("i"))
      .join(sh.select(col("doc_id").as("j"), col("h")), Seq("j", "h"))
      .groupBy("i", "j", "sa", "sb").agg(count(lit(1)).as("inter"))
      .withColumn("jac", round(col("inter") / (col("sa") + col("sb") - col("inter")), 6))
      .where(col("jac") >= 0.95)
    time("verify count-join")(println("n_out=" + out.count()))
    // alternative: per-pair set intersection on the doc's hash ARRAY —
    // |cand| rows carrying two ~|doc|-long arrays, one interpreted
    // array_intersect each, no wide join + aggregation
    val sets = sh.groupBy("doc_id").agg(array_sort(collect_list("h")).as("hs"))
      .cache()
    time("sets")(sets.count())
    val out2 = cand
      .join(sets.select(col("doc_id").as("i"), col("hs").as("ha")), Seq("i"))
      .join(sets.select(col("doc_id").as("j"), col("hs").as("hb")), Seq("j"))
      .withColumn("inter", size(array_intersect(col("ha"), col("hb"))))
      .withColumn("jac", round(col("inter") / (col("sa") + col("sb") - col("inter")), 6))
      .where(col("jac") >= 0.95)
    time("verify array-intersect")(println("n_out2=" + out2.count()))
    spark.stop()
  }
}
