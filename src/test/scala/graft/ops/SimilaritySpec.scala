package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  test("bitsFor: smallest b >= 3 with target * 2^b >= n, monotone in n") {
    assert(Similarity.bitsFor(1L) == 3)
    assert(Similarity.bitsFor(512L) == 3)
    assert(Similarity.bitsFor(513L) == 4)
    assert(Similarity.bitsFor(2000L) == 5)
    assert(Similarity.bitsFor(64L << 19) == 19)
    assert(Similarity.bitsFor(Long.MaxValue / 4) == Similarity.MaxBits)
    val ns = Seq(1L, 100L, 1000L, 10000L, 1000000L)
    assert(ns.map(Similarity.bitsFor(_)) == ns.map(Similarity.bitsFor(_)).sorted)
  }

  test("bandsFor ramps linearly with the bit width") {
    assert(Similarity.bandsFor(3) == 16)
    assert(Similarity.bandsFor(5) == 24)
  }

  test("hyperplanes: deterministic ±1 Rademacher relation of full shape") {
    val p1 = Similarity.hyperplanes(spark, 2, 3, 4).orderBy("band", "bit", "pos")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val p2 = Similarity.hyperplanes(spark, 2, 3, 4).orderBy("band", "bit", "pos")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(p1 == p2, "md5-seeded planes must be reproducible")
    assert(p1.size == 2 * 3 * 4)
    assert(p1.map(_._4).forall(s => s == 1L || s == -1L))
    // not degenerate: both signs occur
    assert(p1.map(_._4).distinct.size == 2)
  }

  test("planeSigns matches the relational hyperplanes derivation") {
    val rel = Similarity.hyperplanes(spark, 3, 4, 7)
      .orderBy("band", "bit", "pos").select("s").as[Long].collect().toSeq
    val lit = Similarity.planeSigns(3, 4, 7).flatten.flatten
    assert(rel == lit)
  }

  test("bandBucketsFromSigns is bit-identical to relational bandBuckets") {
    val emb = Seq(
      (0L, Array(0.3f, -1.2f, 0.7f)), (1L, Array(-0.5f, 0.1f, 2.0f)),
      (2L, Array(1.5f, 1.1f, -0.2f)), (3L, Array(-0.1f, -0.4f, -0.9f)))
      .toDF("vec_id", "embedding")
    val bands = 4; val bits = 3
    val rel = Similarity.bandBuckets(
        Similarity.exploded(emb, "vec_id"), "vec_id",
        Similarity.hyperplanes(spark, bands, bits, 3), bits)
      .orderBy("vec_id", "band")
      .as[(Long, Long, Long)].collect().toSeq
    val lit = Similarity.bandBucketsFromSigns(
        Similarity.withSqNorm(emb, "vec_id"), "vec_id",
        Similarity.planeSigns(bands, bits, 3))
      .select("vec_id", "band", "bucket")
      .orderBy("vec_id", "band")
      .as[(Long, Long, Long)].collect().toSeq
    assert(rel == lit)
  }

  test("bandBuckets: bucket bit b set iff the signed projection is positive") {
    // 2-dim vectors, 1 band, 2 bits: check buckets against a hand
    // computation from the actual plane signs
    val emb = Seq((0L, Array(1.0f, 2.0f)), (1L, Array(-1.0f, 0.5f)))
      .toDF("vec_id", "embedding")
    val ex = Similarity.exploded(emb, "vec_id")
    val planes = Similarity.hyperplanes(spark, 1, 2, 2)
    val s = planes.orderBy("bit", "pos").select("s").as[Long].collect()
    // quantized micros components
    val x = Map(0L -> Seq(1000000L, 2000000L), 1L -> Seq(-1000000L, 500000L))
    val want = x.map { case (id, v) =>
      val b0 = if (s(0) * v(0) + s(1) * v(1) > 0) 1L else 0L
      val b1 = if (s(2) * v(0) + s(3) * v(1) > 0) 2L else 0L
      id -> (b0 + b1)
    }
    val got = Similarity.bandBuckets(ex, "vec_id", planes, 2)
      .select("vec_id", "bucket").as[(Long, Long)].collect().toMap
    assert(got == want)
  }
}
