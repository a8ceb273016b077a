package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PackSpec extends SparkTestBase {
  import spark.implicits._

  test("globalCumSum matches a single-partition reference, exclusive") {
    val df = (1L to 200L).map(i => (i, (i % 7 + 1).toInt)).toDF("id", "tok")
      .repartition(8)
    val got = Pack.globalCumSum(df, "id", "tok", "off")
      .orderBy("id").select("id", "off").as[(Long, Long)].collect()
    var acc = 0L
    val want = (1L to 200L).map { i =>
      val r = (i, acc); acc += (i % 7 + 1).toInt; r
    }
    assert(got.toSeq == want)
  }

  test("concatChunk golden: seq ids and straddle flags") {
    // budget 10; tokens 4,4,4 -> third doc starts at 8, crosses into seq 1
    val df = Seq((1L, 4), (2L, 4), (3L, 4), (4L, 10), (5L, 1))
      .toDF("id", "tok")
    val got = Pack.concatChunk(df, "id", "tok", 10)
      .orderBy("id").select("id", "offset", "seq_id", "straddles")
      .as[(Long, Long, Long, Int)].collect().toSeq
    assert(got == Seq((1L, 0L, 0L, 0), (2L, 4L, 0L, 0), (3L, 8L, 0L, 1),
      (4L, 12L, 1L, 1), (5L, 22L, 2L, 0)))
  }

  test("concatChunk: a zero-token doc on a chunk boundary never straddles") {
    // doc 1 fills chunk 0 exactly; doc 2 is empty and sits at offset 10
    // (the boundary) — it occupies no tokens, so straddles must be 0
    // (the unguarded formula evaluates floor(9/10)=0 != seq_id 1)
    val df = Seq((1L, 10), (2L, 0), (3L, 3)).toDF("id", "tok")
    val got = Pack.concatChunk(df, "id", "tok", 10)
      .orderBy("id").select("id", "offset", "seq_id", "straddles")
      .as[(Long, Long, Long, Int)].collect().toSeq
    assert(got == Seq((1L, 0L, 0L, 0), (2L, 10L, 1L, 0), (3L, 10L, 1L, 0)))
  }

  test("greedyPack golden: new bin on overflow, oversized doc isolated") {
    val df = Seq(("a", 1L, 6), ("a", 2L, 3), ("a", 3L, 4), // 6+3 | 4
      ("a", 4L, 25),                                        // oversized alone
      ("a", 5L, 2),
      ("b", 1L, 10))                                        // exact fit
      .toDF("g", "id", "tok")
    val got = Pack.greedyPack(spark, df, "g", "id", "tok", 10)
      .orderBy("group", "doc_id")
      .select("group", "doc_id", "bin").as[(String, Long, Int)]
      .collect().toSeq
    assert(got == Seq(("a", 1L, 0), ("a", 2L, 0), ("a", 3L, 1),
      ("a", 4L, 2), ("a", 5L, 3), ("b", 1L, 0)))
  }

  test("greedyPack properties: budget respected, bins contiguous in order") {
    val rnd = new scala.util.Random(42)
    val rows = for (g <- Seq("x", "y", "z"); i <- 1 to 120)
      yield (g, i.toLong, rnd.nextInt(40) + 1)
    val out = Pack.greedyPack(spark, rows.toDF("g", "id", "tok"),
      "g", "id", "tok", 100)
      .select("group", "doc_id", "n_tokens", "bin")
      .as[(String, Long, Int, Int)].collect()
    out.groupBy(r => (r._1, r._4)).foreach { case ((_, _), docs) =>
      val total = docs.map(_._3).sum
      // a bin only exceeds the budget when it holds one oversized doc
      assert(total <= 100 || docs.length == 1)
    }
    out.groupBy(_._1).foreach { case (_, docs) =>
      val byId = docs.sortBy(_._2).map(_._4)
      // bins are assigned in id order without gaps
      assert(byId.head == 0)
      assert(byId.zip(byId.tail).forall { case (a, b) => b == a || b == a + 1 })
    }
    // every input row came back exactly once
    assert(out.length == rows.length)
  }
}
