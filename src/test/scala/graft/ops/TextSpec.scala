package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextSpec extends SparkTestBase {
  import spark.implicits._

  test("shingles: distinct n-grams; short docs yield empty, not garbage") {
    val df = Seq("a b c b c", "a", "").toDF("text")
    val got = df.select(Text.shingles(col("text"), 2).as("s"))
      .as[Seq[String]].collect().toSeq
    assert(got(0) == Seq("a b", "b c", "c b"))
    assert(got(1) == Seq.empty)
  }

  test("hash60 is a stable 60-bit value (15 hex chars of md5)") {
    val got = Seq("abc").toDF("w").select(Text.hash60(col("w")))
      .as[Long].head()
    // md5("abc") = 900150983cd24fb0... -> 0x900150983cd24fb BIGINT
    assert(got == java.lang.Long.parseLong("900150983cd24fb", 16))
  }

  test("minhash signature: identical shingle sets -> identical signature") {
    val docs = Seq((1L, "x y z"), (2L, "z y x x"), (3L, "totally different"))
      .toDF("doc_id", "text")
    val sh = Text.explodeShingles(docs, "doc_id", "text", 1)
      .select(col("doc_id"), Text.hash60(col("shingle")).as("h"))
    val sig = Text.minhashSignature(sh, "doc_id", 4).orderBy("doc_id")
      .collect()
    assert(sig(0).toSeq.tail == sig(1).toSeq.tail) // same word set
    assert(sig(0).toSeq.tail != sig(2).toSeq.tail)
  }

  test("capBandKeys drops only band keys over maxDf, broadcasts the " +
    "hot list") {
    // one boilerplate key carrying 4 docs, one normal key carrying 2 —
    // at maxDf 3 the hot bucket's rows vanish and the normal bucket is
    // untouched (the skew guard must never cost real near-dup recall)
    val bands = (Seq.tabulate(4)(i => (i.toLong, 0, "hot")) ++
      Seq((10L, 0, "ok"), (11L, 0, "ok")))
      .toDF("doc_id", "band", "bkey")
    val capped = Text.capBandKeys(bands, 3)
    assert(capped.where(col("bkey") === "hot").count() == 0)
    assert(capped.where(col("bkey") === "ok").count() == 2)
    // the same call with the cap above the hot df is the identity
    assert(Text.capBandKeys(bands, 4).count() == 6)
    // the hot-list side is dimension-sized and must broadcast
    assert(planOf(capped).contains("BroadcastHashJoin"),
      planOf(capped))
  }

  test("simhash: identical term vectors match; disjoint vocab differs") {
    val docs = Seq((1L, "p q r p"), (2L, "p p q r"), (3L, "s t u v w"))
      .toDF("doc_id", "text")
    val sh = Text.simhash(docs, "doc_id", "text").orderBy("doc_id")
      .select("simhash").as[Long].collect()
    assert(sh(0) == sh(1)) // same multiset, order-independent
    assert(sh(0) != sh(2))
  }

  test("fingerprint: deterministic and sensitive to word order") {
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e f"),
        (3L, "f e d c b a")).toDF("doc_id", "text")
    val fp = Text.fingerprint(docs, "doc_id", "text").orderBy("doc_id")
      .select("fingerprint").as[Long].collect()
    assert(fp(0) == fp(1))
    assert(fp(0) != fp(2))
    // docs shorter than the 5-word window produce no fingerprint
    val short = Text.fingerprint(Seq((9L, "a b c")).toDF("doc_id", "text"),
      "doc_id", "text")
    assert(short.count() == 0)
  }
}
