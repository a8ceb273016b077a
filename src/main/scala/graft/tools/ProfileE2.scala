// Dev scratch: phase-by-phase timing of the RELATIONAL (exploded)
// bucketing form — the fallback CorrPrune uses for long panels. NOTE:
// e2 itself now buckets via the map-only bandBucketsFromSigns path, so
// this measures the legacy form, not e2's production plan.
// Run: sbt "runMain graft.tools.ProfileE2 /root/testdata/sf0.1"
package graft.tools

import org.apache.spark.sql.functions._
import graft.{Catalog, Sessions}
import graft.ops.Similarity

object ProfileE2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.build("profile-e2")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[e2] $label%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val emb = Catalog.load(spark, sfDir, "embeddings")
    val n = time("count")(emb.count())
    val bits = Similarity.bitsFor(n)
    val bands = Similarity.bandsFor(bits)
    println(s"[e2] n=$n bits=$bits bands=$bands")
    val ex = Similarity.exploded(emb, "vec_id")
    val planes = Similarity.hyperplanes(spark, bands, bits, 64)
    val bk = Similarity.bandBuckets(ex, "vec_id", planes, bits).cache()
    time("bucketing")(bk.count())
    val probes = bk.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("band"), col("bucket"))
    val cand = bk.select(col("vec_id").as("tid"), col("band"), col("bucket"))
      .join(broadcast(probes), Seq("band", "bucket"))
      .where(col("tid") =!= col("qid"))
      .select("qid", "tid").distinct()
    time("candidates")(println("[e2] ncand=" + cand.count()))
    val q = Similarity.withSqNorm(emb, "vec_id").cache()
    time("embq")(q.count())
    val cos = cand
      .join(q.select(col("vec_id").as("qid"), col("q").as("qa"),
        col("sq").as("sqa")), Seq("qid"))
      .join(q.select(col("vec_id").as("tid"), col("q").as("qb"),
        col("sq").as("sqb")), Seq("tid"))
      .withColumn("cosine",
        Similarity.dotq(col("qa"), col("qb")).cast("double") /
          sqrt(col("sqa").cast("double") * col("sqb").cast("double")))
    time("cosine+topk") {
      Similarity.topK(cos.select("qid", "tid", "cosine"), 3)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
