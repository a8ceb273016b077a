package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Oracle-exact numeric aggregation helpers.
  *
  * Double-precision `sum`/`avg` are not associative, so a partial-aggregated
  * Spark sum and a single-threaded DuckDB sum can disagree in the last ulp
  * (and a Spark re-run can disagree with itself across shuffles). The
  * fixtures' doubles are money-like (≤ 4-6 decimal places), so summing via
  * decimal is exact, deterministic, and identical across engines; the final
  * cast back to double is a single well-defined conversion.
  */
object Exact {

  /** Exact sum of a money-like double column; result as double. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast("double")

  /** Exact mean of a money-like double column, rounded to 6 dp.
    * `try_divide` keeps the all-null group case NULL under ANSI mode
    * (matching SQL sum/count semantics) instead of throwing.
    */
  def davg(c: Column): Column = round(try_divide(dsum(c), count(c)), 6)

  /** Integer cents (x*100 rounded) — exact revenue arithmetic without
    * double multiplication drift: round() collapses the ~1e-13 double
    * representation error before the bigint cast.
    */
  def cents(c: Column): Column = round(c * 100, 0).cast("long")
}
