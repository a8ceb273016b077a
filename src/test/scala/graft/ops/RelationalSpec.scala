package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkTestBase {
  import spark.implicits._

  test("joinValid keeps only facts inside the dimension validity window") {
    val fact = Seq((1L, 5), (1L, 15), (2L, 5)).toDF("k", "d")
    val dim = Seq((1L, 10, 20, "x")).toDF("k", "from", "to", "payload")
    val got = Relational.joinValid(fact, dim, "k", "d", "from", "to")
      .select(fact("k"), col("d")).as[(Long, Int)].collect().toSeq
    assert(got == Seq((1L, 15)))
  }

  test("asofBackward: latest right row at or before left, per key") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 10L, "c"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 5L, 1L, 100.0), (1L, 20L, 2L, 200.0),
        (1L, 25L, 3L, 300.0))
      .toDF("k", "t", "seq", "payload")
    val got = Relational.asofBackward(left, right, "k", "t", "seq", "payload")
      .orderBy("k", "t")
      .select("tag", "payload").collect()
      .map(r => (r.getString(0), Option(r.get(1)))).toSeq
    // t=10 sees the t=5 row; t=20 sees the equal-ts t=20 row (<= visible);
    // key 2 has no right rows at all -> null
    assert(got == Seq(("a", Some(100.0)), ("b", Some(200.0)), ("c", None)))
  }

  test("asofBackward tie-break: among equal-ord right rows, max seq wins") {
    val left = Seq((1L, 10L, "x")).toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 1L, 111.0), (1L, 10L, 2L, 222.0))
      .toDF("k", "t", "seq", "payload")
    val got = Relational.asofBackward(left, right, "k", "t", "seq", "payload")
      .select("payload").as[Double].head()
    assert(got == 222.0)
  }

  test("asofBackward: a latest right row with NULL payload wins as null " +
    "(merge_asof), never resurrecting an older value") {
    val left = Seq((1L, 6L, "x")).toDF("k", "t", "tag")
    val right = Seq((1L, 3L, 1L, Some(7.0)), (1L, 5L, 2L, None))
      .toDF("k", "t", "seq", "payload")
    val got = Relational.asofBackward(left, right, "k", "t", "seq", "payload")
      .select("payload").collect().map(r => Option(r.get(0))).toSeq
    // the t=5 row IS the as-of match; its null payload is the answer —
    // skipping it and returning 7.0 would be silently wrong data
    assert(got == Seq(None))
  }

  test("keepFirst is deterministic under the given order") {
    val df = Seq((1L, 3L, "c"), (1L, 1L, "a"), (1L, 2L, "b"), (2L, 9L, "z"))
      .toDF("k", "o", "v")
    val got = Relational.keepFirst(df, Seq("k"), Seq(col("o"), col("v")))
      .orderBy("k").select("v").as[String].collect().toSeq
    assert(got == Seq("a", "z"))
  }

  test("globalRowIds: dense 0-based ids in order, across partitions") {
    // enough rows to span several range partitions; scrambled input order
    val keys = scala.util.Random.shuffle((0 until 1000).toList)
    val df = keys.map(k => (k * 7L, s"p$k")).toDF("key", "payload")
      .repartition(8)
    val got = Relational.globalRowIds(df, "key", "gid")
      .select("key", "gid").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq == (0L until 1000L),
      "ids must be dense, 0-based, and follow ascending key order")
    // and no single-partition WindowExec: the only window in the plan is
    // partitioned by the range-partition id
    val plan = Relational.globalRowIds(df, "key", "gid")
      .queryExecution.executedPlan.toString
    assert(plan.contains("__pid"),
      "the row-number window must be partitioned by the partition id")
  }
}
