package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  test("salted two-phase aggregation equals the direct aggregation") {
    // one hot key (90% of rows) + a uniform tail
    val rows = (1 to 900).map(i => ("hot", i.toDouble)) ++
      (1 to 100).map(i => (s"k${i % 10}", i.toDouble))
    val df = rows.toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n"), Exact.dsum(col("v")).as("s"))
      .orderBy("k")
    val salted = Skew.saltedAgg(df, Seq("k"), salt = 8,
      partial = Seq(count(lit(1)).as("pn"), Exact.dsum(col("v")).as("ps")),
      fin = Seq(sum(col("pn")).as("n"),
        Exact.dsum(col("ps")).as("s")))
      .orderBy("k")
    assert(direct.collect().toSeq == salted.collect().toSeq)
    // the partial stage really fans the hot key out across salts
    val fanout = df.withColumn("__salt",
        pmod(monotonically_increasing_id(), lit(8L)))
      .where(col("k") === "hot")
      .select("__salt").distinct().count()
    assert(fanout > 1)
  }

  test("salted aggregation fans out even when the hot rows are IDENTICAL") {
    // the canonical hot-key workload: the same row repeated — a content
    // hash would map every copy to one salt and spread nothing
    val rows = Seq.fill(1000)(("viral", 1.0)) ++
      (1 to 50).map(i => (s"k$i", i.toDouble))
    val df = rows.toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n"), Exact.dsum(col("v")).as("s"))
      .orderBy("k")
    val salted = Skew.saltedAgg(df, Seq("k"), salt = 8,
      partial = Seq(count(lit(1)).as("pn"), Exact.dsum(col("v")).as("ps")),
      fin = Seq(sum(col("pn")).as("n"), Exact.dsum(col("ps")).as("s")))
      .orderBy("k")
    assert(direct.collect().toSeq == salted.collect().toSeq)
    val fanout = df.withColumn("__salt",
        pmod(monotonically_increasing_id(), lit(8L)))
      .where(col("k") === "viral")
      .select("__salt").distinct().count()
    assert(fanout > 1, "identical hot rows must still spread across salts")
  }
}
