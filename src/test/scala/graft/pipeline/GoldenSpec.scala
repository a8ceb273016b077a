package graft.pipeline

import graft.SparkTestBase
import graft.ops.{Exact, Stats, Time}
import org.apache.spark.sql.functions._

/** End-to-end goldens with hand-computed constants (SURVEY §5 item 4):
  * tiny synthetic tick series through the full resample→ffill→corr chain.
  */
class GoldenSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  test("E1 chain golden: perfectly correlated and anti-correlated series") {
    // user 1 rises 10,20,30; user 2 rises 1,2,3 (rho=+1 with 1);
    // user 3 falls 30,20,10 (rho=-1 with both)
    val ticks = Seq(
      (ts(30), 1L, 10.0), (ts(90), 1L, 20.0), (ts(150), 1L, 30.0),
      (ts(30), 2L, 1.0), (ts(90), 2L, 2.0), (ts(150), 2L, 3.0),
      (ts(30), 3L, 30.0), (ts(90), 3L, 20.0), (ts(150), 3L, 10.0)
    ).toDF("ts", "user_id", "value")
    val filled = Time.resampleFfill(spark, ticks, "user_id", "ts", "value",
      0, 180, 60, Exact.davg(col("value")))
    val a = filled.select(col("bucket"), col("user_id").as("i"),
      col("value").as("va"))
    val b = filled.select(col("bucket"), col("user_id").as("j"),
      col("value").as("vb"))
    val rho = a.join(b, Seq("bucket")).where(col("i") < col("j"))
      .groupBy("i", "j")
      .agg(round(Stats.pearson(col("va"), col("vb")), 6).as("rho"))
      .orderBy("i", "j")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    assert(rho((1L, 2L)) == 1.0)
    assert(rho((1L, 3L)) == -1.0)
    assert(rho((2L, 3L)) == -1.0)
  }

  test("E1 chain golden: constant series correlates as NULL, not +-1") {
    val ticks = Seq(
      (ts(30), 1L, 10.0), (ts(90), 1L, 20.0),
      (ts(30), 2L, 7.0), (ts(90), 2L, 7.0) // constant
    ).toDF("ts", "user_id", "value")
    val filled = Time.resampleFfill(spark, ticks, "user_id", "ts", "value",
      0, 120, 60, Exact.davg(col("value")))
    val a = filled.select(col("bucket"), col("user_id").as("i"),
      col("value").as("va"))
    val b = filled.select(col("bucket"), col("user_id").as("j"),
      col("value").as("vb"))
    val out = a.join(b, Seq("bucket")).where(col("i") < col("j"))
      .groupBy("i", "j")
      .agg(Stats.pearson(col("va"), col("vb")).as("rho"))
      .collect()
    assert(out.length == 1 && out(0).isNullAt(2))
  }

  test("one-pass aggregator agrees with the pair-join tier on fixtures") {
    val e = graft.SparkEntry.queries
    val pair = e("a3_corr_matrix")(spark, "/root/testdata/sf0.001")
    val onepass = e("a3b_corr_onepass")(spark, "/root/testdata/sf0.001")
    assert(pair.exceptAll(onepass).isEmpty &&
      onepass.exceptAll(pair).isEmpty)
  }
}
