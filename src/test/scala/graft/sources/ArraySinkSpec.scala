package graft.sources

import java.nio.file.Files
import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** S8: the graph-sample sink contract — ArrayType feature columns must
  * survive a parquet write/read round-trip bit-for-bit (the engine's
  * replacement for the reference's torch.save tensor sink,
  * pyg_graphs.py:197-206).
  */
class ArraySinkSpec extends SparkTestBase {

  test("graph features array column round-trips through parquet") {
    val out = scratchDir("graft_s8_")
    val types = Seq("click", "error", "purchase", "signup", "view")
    val ev = graft.Catalog.load(spark, "/root/testdata/sf0.001", "events")
      .where(col("user_id") < 10)
    val g = ev.groupBy("user_id").pivot("event_type", types)
      .agg(graft.ops.Exact.davg(col("value")))
      .withColumn("features",
        array(types.map(t => coalesce(col(t), lit(0.0))): _*))
      .select("user_id", "features")
    g.write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.schema("features").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType, containsNull = true))
    assert(back.exceptAll(g).isEmpty && g.exceptAll(back).isEmpty)
    // array lambda ops work on the read-back column (F15 surface)
    val norms = back.select(
      aggregate(transform(col("features"), x => x * x), lit(0.0),
        (acc, x) => acc + x).as("sq")).collect()
    assert(norms.forall(!_.isNullAt(0)))
  }
}
