package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class TimeSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketSec floors to epoch-anchored multiples") {
    val df = Seq(("2024-01-01T00:00:59", 1L), ("2024-01-01T00:01:00", 2L))
      .toDF("iso", "id")
      .select(to_timestamp(col("iso"), "yyyy-MM-dd'T'HH:mm:ss").as("ts"))
    val got = df.select(Time.bucketSec(col("ts"), 60).as("b"))
      .as[Long].collect().toSeq
    val jan1 = java.time.LocalDateTime.parse("2024-01-01T00:00:00")
      .toEpochSecond(java.time.ZoneOffset.UTC)
    assert(got == Seq(jan1, jan1 + 60))
  }

  test("grid is the [start, end) x keys product, distributed") {
    val keys = Seq(1L, 2L).toDF("user_id")
    val g = Time.grid(spark, 100, 400, 100, keys)
    assert(g.count() == 6)
    assert(g.select(min("bucket"), max("bucket")).as[(Long, Long)].head() ==
      (100L, 300L))
    // leaf must be a parallel Range scan, not a single-row explode
    assert(g.queryExecution.executedPlan.toString.contains("Range"))
  }

  test("ffill carries last non-null forward; leading nulls survive") {
    val df = Seq((1L, 1L, None), (1L, 2L, Some(10.0)), (1L, 3L, None),
        (1L, 4L, Some(20.0)), (1L, 5L, None))
      .toDF("k", "o", "v")
    val got = Time.ffill(df, "k", "o", "v").orderBy("o")
      .select("v").collect().map(r => Option(r.get(0))).toSeq
    assert(got == Seq(None, Some(10.0), Some(10.0), Some(20.0), Some(20.0)))
  }

  test("bfill mirrors ffill backwards; trailing nulls survive") {
    val df = Seq((1L, 1L, None), (1L, 2L, Some(10.0)), (1L, 3L, None),
        (1L, 4L, Some(20.0)), (1L, 5L, None))
      .toDF("k", "o", "v")
    val got = Time.bfill(df, "k", "o", "v").orderBy("o")
      .select("v").collect().map(r => Option(r.get(0))).toSeq
    assert(got == Seq(Some(10.0), Some(10.0), Some(20.0), Some(20.0), None))
  }

  test("ffill does not leak across series keys") {
    val df = Seq((1L, 1L, Some(1.0)), (2L, 2L, None))
      .toDF("k", "o", "v")
    val got = Time.ffill(df, "k", "o", "v")
      .where(col("k") === 2).select("v").head()
    assert(got.isNullAt(0))
  }

  test("resampleFfill: empty input produces an empty grid (no keys)") {
    val empty = Seq.empty[(java.sql.Timestamp, Long, Double)]
      .toDF("ts", "user_id", "value")
    val out = Time.resampleFfill(spark, empty, "user_id", "ts", "value",
      0, 600, 60, avg(col("value")))
    assert(out.count() == 0)
  }

  test("resampleFfill golden: two keys, gaps filled, window clipped") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val ticks = Seq(
      (ts(65), 1L, 10.0), (ts(70), 1L, 30.0),  // same bucket -> mean 20
      (ts(190), 1L, 40.0),                      // gap at 120 -> ffill 20
      (ts(10), 2L, 5.0),
      (ts(999), 2L, 99.0))                      // outside [0, 240) -> clipped
    val out = Time.resampleFfill(spark, ticks.toDF("ts", "user_id", "value"),
        "user_id", "ts", "value", 0, 240, 60, avg(col("value")))
      .orderBy("user_id", "bucket")
      .select("user_id", "bucket", "value").collect().toSeq
    val want = Seq(
      Row(1L, 0L, null), Row(1L, 60L, 20.0), Row(1L, 120L, 20.0),
      Row(1L, 180L, 40.0),
      Row(2L, 0L, 5.0), Row(2L, 60L, 5.0), Row(2L, 120L, 5.0),
      Row(2L, 180L, 5.0))
    assert(out == want)
  }

  /** The in-array fill (FillGrid) against the relational grid-join +
    * window form on the same gapped fixture — the two paths must be
    * row-for-row identical, including null-VALUE buckets (ticks whose
    * aggregate is null occupy a slot but never interrupt the fill:
    * `ignoreNulls` semantics) and leading/trailing nulls.
    */
  private def fillFixture = {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    Seq(
      (ts(65), 1L, Some(10.0)), (ts(70), 1L, Some(30.0)),
      (ts(130), 1L, None), // null-value bucket: slot kept, fill carries
      (ts(190), 1L, Some(40.0)),
      (ts(10), 2L, Some(5.0)),
      (ts(200), 3L, Some(7.0))) // leading-null series
      .toDF("ts", "user_id", "value")
  }

  private def bothPaths(f: => org.apache.spark.sql.DataFrame)
      : (Seq[Row], Seq[Row]) = {
    val vec = f.collect().toSeq
    val prev = Time.VectorFillMaxBuckets
    Time.VectorFillMaxBuckets = 0 // force the relational window path
    try {
      Time.unpersistPanels()
      val win = f.collect().toSeq
      (vec, win)
    } finally {
      Time.VectorFillMaxBuckets = prev
      Time.unpersistPanels()
    }
  }

  test("in-array ffill ≡ window ffill row-for-row (null buckets, " +
    "leading nulls, gaps)") {
    val (vec, win) = bothPaths(
      Time.resampleFfill(spark, fillFixture, "user_id", "ts", "value",
          0, 240, 60, avg(col("value")))
        .orderBy("user_id", "bucket")
        .select("user_id", "bucket", "value"))
    assert(vec == win, s"vector path:\n$vec\nwindow path:\n$win")
    assert(vec.size == 12) // 3 series x 4 buckets
  }

  test("in-array bfill ≡ window bfill row-for-row") {
    val (vec, win) = bothPaths(
      Time.resampleBfill(spark, fillFixture, "user_id", "ts", "value",
          0, 240, 60, avg(col("value")))
        .orderBy("user_id", "bucket")
        .select("user_id", "bucket", "value"))
    assert(vec == win, s"vector path:\n$vec\nwindow path:\n$win")
    // trailing nulls survive bfill: series 2 has nothing after 0
    assert(win.count(_.isNullAt(2)) > 0)
  }

  test("resampleFfillMs golden: 250 ms buckets, sub-second fills") {
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val ticks = Seq(
      (ts(120), 1L, 10.0), (ts(240), 1L, 30.0), // both bucket 0 -> mean 20
      (ts(610), 1L, 40.0),                      // bucket 500; 250 ffills 20
      (ts(1750), 1L, 50.0))                     // outside [0, 1000) -> clipped
    val out = Time.resampleFfillMs(spark,
        ticks.toDF("ts", "user_id", "value"),
        "user_id", "ts", "value", 0L, 1000L, 250L, avg(col("value")))
      .orderBy("bucket")
      .select("bucket", "value").collect().toSeq
    val want = Seq(
      Row(0L, 20.0), Row(250L, 20.0), Row(500L, 40.0), Row(750L, 40.0))
    assert(out == want)
  }
}
