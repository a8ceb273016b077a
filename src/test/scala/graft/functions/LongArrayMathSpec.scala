package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins [[DotLongs]]/[[SqDistLongs]] to the higher-order-function forms
  * they replaced (`aggregate(zip_with(...))`), including the null and
  * length-mismatch propagation the scaladoc promises.
  */
class LongArrayMathSpec extends SparkTestBase {
  import spark.implicits._

  private val rows = Seq(
    (Seq(1L, 2L, 3L), Seq(4L, -5L, 6L)),          // plain
    (Seq(-1000000L, 7L), Seq(999999L, -8L)),      // micros-scale negatives
    (Seq.empty[Long], Seq.empty[Long]))           // empty → 0
    .toDF("a", "b")

  test("dot_longs ≡ aggregate(zip_with(a·b)) on aligned arrays") {
    val got = rows.select(
      call_function("dot_longs", col("a"), col("b")).as("k"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, v) => acc + v).as("h"))
      .collect()
    got.foreach(r => assert(r.get(0) == r.get(1), r.toString))
  }

  test("sqdist_longs ≡ aggregate(zip_with((a−b)²)) on aligned arrays") {
    val got = rows.select(
      call_function("sqdist_longs", col("a"), col("b")).as("k"),
      aggregate(zip_with(col("a"), col("b"), (x, c) => (x - c) * (x - c)),
        lit(0L), (acc, d) => acc + d).as("h"))
      .collect()
    got.foreach(r => assert(r.get(0) == r.get(1), r.toString))
  }

  test("null array, null element, and length mismatch all yield null") {
    val df = Seq(
      (Some(Seq(Some(1L), Some(2L))), None: Option[Seq[Option[Long]]]),
      (Some(Seq(Some(1L), None)), Some(Seq(Some(1L), Some(2L)))),
      (Some(Seq(Some(1L))), Some(Seq(Some(1L), Some(2L)))))
      .toDF("a", "b")
    Seq("dot_longs", "sqdist_longs").foreach { fn =>
      val got = df.select(call_function(fn, col("a"), col("b"))).collect()
      assert(got.forall(_.isNullAt(0)), fn)
    }
  }
}
