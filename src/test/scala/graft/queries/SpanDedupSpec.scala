package graft.queries

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.functions._

/** t6_span_dedup semantics on a crafted corpus: global keep-first at span
  * granularity, byte-exact reassembly of survivors (including the partial
  * tail span), and disappearance of fully-duplicate documents. The DuckDB
  * oracle grades the same query on the fixture corpus; this spec pins the
  * edge cases the fixture may not contain.
  */
class SpanDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def mkWords(tag: String, n: Int): String =
    (0 until n).map(i => s"$tag$i").mkString(" ")

  test("span dedup keeps first occurrences and reassembles exactly") {
    val dir = scratchDir("graft_span_")
    val spanA = mkWords("a", 16) // doc0 span 0
    val spanB = mkWords("b", 16) // doc0 span 1
    val spanC = mkWords("c", 16) // doc2's unique second span
    val tail = mkWords("t", 4) //  doc3's partial tail span
    val docs = Seq(
      (0L, s"$spanA $spanB"), //   2 unique spans
      (1L, s"$spanA $spanB"), //   exact copy: vanishes entirely
      (2L, s"$spanA $spanC"), //   first span duplicate, second unique
      (3L, s"$spanC $tail") //     16+4 words: partial tail span, C is dup
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src1"))
      .withColumn("n_chars", length(col("text")))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = SparkEntry.queries("t6_span_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

    def sig(s: String) =
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    assert(out(0L) == ((2L, 2L, sig(s"$spanA $spanB"))))
    assert(!out.contains(1L), "fully-duplicate doc must vanish")
    assert(out(2L) == ((2L, 1L, sig(spanC))))
    // doc3: spanC already seen (doc2), tail span survives alone
    assert(out(3L) == ((2L, 1L, sig(tail))))
  }
}
