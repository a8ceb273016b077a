package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Runtime bloom-filter pruning (Spark's InjectRuntimeFilter): a
  * selective filter on the dimension side of a shuffle join becomes a
  * bloom filter applied to the fact side BEFORE its shuffle — the
  * Spark-native semi-join pre-filter. At 100 TB this is the difference
  * between shuffling the whole fact table and shuffling only the
  * ~matching fraction. The spec proves on the optimized plan that the
  * rewrite fires under the engine's sessions (the production-size
  * thresholds are lowered because the fixture fact side is tiny; the
  * 10 GB default application-side threshold exists precisely because
  * the rewrite only pays off at scale).
  */
class RuntimeFilterSpec extends SparkTestBase {
  import spark.implicits._

  test("selective dim filter injects a bloom filter on the fact side") {
    val dir = scratchDir("graft_rtf_")
    (0 until 200000).map(i => (i.toLong % 1000, i.toLong))
      .toDF("k", "v").write.parquet(s"$dir/fact")
    (0 until 1000).map(i => (i.toLong, i % 7)).toDF("k", "grp")
      .write.parquet(s"$dir/dim")
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        -> "0")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").where(col("grp") === 3)
      val joined = fact.join(dim, "k")
      val opt = joined.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain"),
        s"expected an injected bloom runtime filter in:\n$opt")
      // the filter is a pruning aid, never a correctness change
      assert(joined.count() === 200L * (1000 / 7 + 1))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
