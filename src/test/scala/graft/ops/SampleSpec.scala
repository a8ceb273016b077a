package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SampleSpec extends SparkTestBase {
  import spark.implicits._

  test("hashBucket is stable, in range, and salt-independent") {
    val df = (0L until 2000L).toDF("id")
    val b1 = df.select(col("id"),
      Sample.hashBucket("s1", col("id"), 100).as("b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b2 = df.repartition(13).select(col("id"),
      Sample.hashBucket("s1", col("id"), 100).as("b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // identical under repartitioning (pure function of the key)
    assert(b1 == b2)
    assert(b1.values.forall(b => b >= 0 && b < 100))
    // a different salt decorrelates: not all assignments can agree
    val b3 = df.select(col("id"),
      Sample.hashBucket("s2", col("id"), 100).as("b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b1.count { case (k, v) => b3(k) == v } < 200)
  }

  test("hashBucket is roughly uniform") {
    val counts = (0L until 10000L).toDF("id")
      .groupBy(Sample.hashBucket("u", col("id"), 10).as("b"))
      .count().as[(Long, Long)].collect().toMap
    assert(counts.size == 10)
    // 10k keys over 10 buckets: each within ±15% of 1000
    counts.values.foreach(n => assert(n > 850 && n < 1150, counts))
  }

  test("splitColumn covers every bucket and respects the cuts") {
    val cuts = Seq("train" -> 80, "val" -> 90, "test" -> 100)
    val got = (0L until 5000L).toDF("id")
      .select(Sample.hashBucket("split", col("id"), 100).as("b"),
        Sample.splitColumn("split", col("id"), cuts).as("s"))
      .as[(Long, String)].collect()
    got.foreach { case (b, s) =>
      val want = if (b < 80) "train" else if (b < 90) "val" else "test"
      assert(s == want, s"bucket $b -> $s")
    }
  }

  test("splitColumn and hashBucket validate their parameters") {
    intercept[IllegalArgumentException](
      Sample.splitColumn("x", col("id"), Seq("a" -> 50)))
    intercept[IllegalArgumentException](
      Sample.splitColumn("x", col("id"), Seq("a" -> 60, "b" -> 40)))
    intercept[IllegalArgumentException](
      Sample.hashBucket("x", col("id"), 0))
  }
}
