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
        pmod(hash(df.columns.map(col): _*), lit(8)))
      .where(col("k") === "hot")
      .select("__salt").distinct().count()
    assert(fanout > 1)
  }
}
