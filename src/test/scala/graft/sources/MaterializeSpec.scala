package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MaterializeSpec extends SparkTestBase {
  import spark.implicits._

  test("table builds once per (dir, name) and reads back identically") {
    var builds = 0
    def build = {
      builds += 1
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    }
    // distinct per-run name so reruns in one test JVM never collide;
    // registered for deletion at JVM exit (the per-process scratch root
    // self-deletes too — this covers a GRAFT_SCRATCH-overridden root)
    val name = s"spec_tbl_${System.nanoTime()}"
    SparkTestBase.registerCleanup(
      java.nio.file.Paths.get(Materialize.path("/spec/fixture", name)))
    val first = Materialize.table(spark, "/spec/fixture", name)(build)
    val second = Materialize.table(spark, "/spec/fixture", name)(build)
    assert(builds == 1) // second call must NOT re-build
    assert(first.orderBy("id").collect().toSeq ==
      second.orderBy("id").collect().toSeq)
    assert(second.orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // the read is a plain parquet scan — no trace of the builder plan
    assert(second.queryExecution.optimizedPlan.treeString
      .toLowerCase.contains("relation"))
  }

  test("value memoizes per (dir, name); keys do not collide across dirs") {
    var builds = 0
    val name = s"spec_val_${System.nanoTime()}"
    def get(dir: String) =
      Materialize.value(dir, name) { builds += 1; builds }
    assert(get("/spec/a") == 1 && get("/spec/a") == 1)
    assert(get("/spec/b") == 2) // different dir → its own build
    assert(builds == 2)
  }

  test("isBuilt is namespace-aware: a bucketed build registers under " +
    "the bucketed family with its bare name, and nowhere else") {
    // regression for the round-14 key-namespace change: LlmQueries'
    // build guard asked isBuilt(dir, "bucketed_<name>") against the
    // default "table" family, which can never match a bucketedTable
    // registration — the guard was dead and every dedup query re-entered
    // the build branch (cache/unpersist churn on the shingle relation)
    val name = s"spec_bkt_${System.nanoTime()}"
    val dir = "/spec/fixture"
    assert(!Materialize.isBuilt(dir, name, "bucketed"))
    Materialize.bucketedTable(spark, dir, name, 2, Seq("id")) {
      Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    }
    assert(Materialize.isBuilt(dir, name, "bucketed"))
    // the shapes the dead guard used — and sibling families — stay false
    assert(!Materialize.isBuilt(dir, s"bucketed_$name"))
    assert(!Materialize.isBuilt(dir, name))
    assert(!Materialize.isBuilt(dir, name, "process"))
  }

  test("boundedPartitions: 1 at fixture scale, grows with input, capped") {
    import graft.ops.Relational.boundedPartitions
    assert(boundedPartitions(0L, 256) == 1)
    assert(boundedPartitions(500L, 256) == 1)
    assert(boundedPartitions(512L, 256) == 2)
    assert(boundedPartitions(1_000_000L, 256) == 3906)
    assert(boundedPartitions(Long.MaxValue, 1) == 4096) // runaway cap
    intercept[IllegalArgumentException](boundedPartitions(10L, 0))
  }
}
