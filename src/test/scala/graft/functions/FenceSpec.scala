package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Direct unit coverage for [[OptimizerFence]] — the zero-cost barrier
  * whose guarantees PlanGuardSpec pins at the plan level. Here: the
  * identity/null semantics on both eval paths, and EVIDENCE for the
  * scaladoc's "bounded blast radius" claim — the declared
  * non-determinism must change only which plan rewrites Catalyst
  * applies, not Spark's stage-retry semantics. The concrete 100 TB
  * risk: if the scheduler treated a fenced stage's output as
  * INDETERMINATE, a fetch failure would cascade into recomputing all
  * consumer stages rather than just the lost partitions. Measured
  * below: expression determinism does NOT feed RDD determinism —
  * fenced and unfenced twins report the same outputDeterministicLevel
  * (UNORDERED post-shuffle, like every aggregate in the engine;
  * DETERMINATE on shuffle-free plans; never INDETERMINATE). SCALE.md
  * cites this spec.
  */
class FenceSpec extends SparkTestBase {

  test("eval is the identity, including null propagation") {
    val f = OptimizerFence(Literal(3.5d, DoubleType))
    assert(f.eval(InternalRow.empty) == 3.5d)
    val n = OptimizerFence(Literal(null, DoubleType))
    assert(n.eval(InternalRow.empty) == null)
    // type surface forwards verbatim — a fence must be droppable
    // without any cast appearing or disappearing
    assert(f.dataType == DoubleType && n.nullable)
    assert(!f.deterministic && !f.foldable)
  }

  test("codegen path returns bit-identical results to the bare column, " +
    "nulls included") {
    import spark.implicits._
    val df = Seq[(Long, Option[Double])](
      (1L, Some(2.5)), (2L, None), (3L, Some(-0.0)), (4L, Some(7.25)))
      .toDF("k", "v")
    val bare = df.select(col("k"), (col("v") * 3 + 1).as("y"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
    val fenced = df.select(col("k"),
        graft.ops.Stats.fenced(col("v") * 3 + 1).as("y"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
    assert(fenced == bare)
    // and through an aggregate + array shape like the real call site
    val arr = df.groupBy(lit(1)).agg(collect_list("k").as("a"))
      .select(graft.ops.Stats.fenced(size(col("a"))).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(arr == Seq(4))
  }

  test("a fenced plan keeps its unfenced RDD determinism level — the " +
    "fence cannot turn fetch-failure retries into cascading recomputes") {
    import spark.implicits._
    // post-shuffle plan with the fence in the final projection — the
    // shape candidateRhoVectors produces (join/agg shuffle below, the
    // fenced kernel Project above)
    val base = (0 until 1000).map(i => (i % 7L, i.toDouble)).toDF("k", "v")
      .groupBy("k").agg(sum("v").as("s"))
    def level(df: org.apache.spark.sql.DataFrame): String = {
      val rdd = df.queryExecution.toRdd
      // outputDeterministicLevel is private[spark] (public in
      // bytecode): reflection keeps this spec compiling against the
      // stock jars while still reading the scheduler's actual view
      rdd.getClass.getMethod("outputDeterministicLevel")
        .invoke(rdd).toString
    }
    val fencedLevel =
      level(base.select(col("k"), graft.ops.Stats.fenced(col("s") * 2)
        .as("y")))
    val bareLevel =
      level(base.select(col("k"), (col("s") * 2).as("y")))
    assert(fencedLevel == bareLevel,
      s"fence changed the scheduler's determinism view: " +
        s"fenced=$fencedLevel bare=$bareLevel")
    // any post-shuffle SQL stage reports UNORDERED (same rows on
    // retry, partition-internal order unpledged) — the level every
    // aggregate in the engine runs at, fence or no fence. What the
    // fence must never cause is INDETERMINATE, the level that makes a
    // fetch failure roll back and recompute all consumer stages
    assert(fencedLevel != "INDETERMINATE",
      s"post-shuffle fenced stage reports $fencedLevel — Spark has " +
        "started deriving RDD determinism from expression determinism; " +
        "re-price the fence's retry semantics in SCALE.md")
    // and on a shuffle-free scan+project plan the fence likewise
    // leaves the level untouched (DETERMINATE end to end)
    val flat = (0 until 10).map(i => (i.toLong, i.toDouble)).toDF("k", "v")
    val flatFenced =
      level(flat.select(graft.ops.Stats.fenced(col("v") + 1).as("y")))
    assert(flatFenced == level(flat.select((col("v") + 1).as("y"))) &&
      flatFenced == "DETERMINATE",
      s"shuffle-free fenced plan reports $flatFenced")
  }
}
