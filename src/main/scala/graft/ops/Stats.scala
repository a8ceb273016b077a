package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Statistical aggregate expressions. */
object Stats {

  /** Pairwise-complete Pearson correlation as a null-safe aggregate
    * expression over 6-dp-quantized inputs (everything the engine
    * correlates is an [[Exact.davg]] output).
    *
    * Why not built-in `corr`: under ANSI mode (the Spark 4 default) it
    * throws DIVIDE_BY_ZERO whenever a pair has zero variance — e.g. any
    * forward-filled series that is constant inside a window — while SQL
    * semantics (and the DuckDB oracle) yield NULL/NaN there.
    *
    * Why integer co-moments: with double sums, a constant series leaves a
    * ~1e-9 cancellation residue in n·Σx²−(Σx)², so a `vx > 0` guard
    * produces a garbage ±1 instead of NULL. Scaling the quantized inputs
    * to exact integer micros (DECIMAL(38,0)) makes every co-moment exact:
    * zero variance is exactly zero, the guard is sound, and the final
    * ρ = cov/√(vx·vy) is one deterministic double expression. Bounds:
    * the largest intermediates are n·Σx² and (Σx)², both ≤ n²·(|x|·1e6)²,
    * so 38 digits hold while |x| ≤ 1e13/n — e.g. |x| ≤ 1e7 at n = 1e6
    * rows per group. The engine's inputs (6-dp-quantized values ≲ 1e6
    * over windows of ≤ ~1e5 buckets) sit four orders inside that; past
    * it, ANSI mode fails loudly with a Decimal overflow rather than
    * returning silently wrong values.
    *
    * All sums are codegen'd built-ins — map-side partial aggregation and
    * whole-stage codegen apply as usual.
    */
  def pearson(x: Column, y: Column): Column = {
    val I = DecimalType(38, 0)
    val both = x.isNotNull && y.isNotNull
    val xi = when(both, round(x * 1e6, 0).cast(I))
    val yi = when(both, round(y * 1e6, 0).cast(I))
    val n = count(xi).cast(I)
    val sx = sum(xi)
    val sy = sum(yi)
    val sxx = sum(xi * xi)
    val syy = sum(yi * yi)
    val sxy = sum(xi * yi)
    val cov = (n * sxy - sx * sy).cast("double")
    val vx = (n * sxx - sx * sx).cast("double")
    val vy = (n * syy - sy * sy).cast("double")
    when(n >= 2 && vx > 0 && vy > 0, cov / sqrt(vx * vy))
  }

  /** [[pearson]] over a PAIR OF ALIGNED ARRAYS, one scalar result per
    * row — for consumers that hold both series of a pair in array
    * columns (the pruned-corr vector verify). Bit-identical arithmetic
    * to the aggregate form inside its documented envelope; see
    * [[graft.functions.PearsonArrays]] for the exactness contract and
    * why this is a native kernel expression rather than any
    * explode/HOF composition (every built-in shape pays µs-scale
    * per-slot machinery; the kernel is one JIT-compiled primitive
    * loop per pair).
    */
  def pearsonArrays(va: Column, vb: Column): Column =
    call_function("pearson_arrays", va, vb)

  /** [[graft.functions.OptimizerFence]] as a column: pins an expensive
    * aliased expression to its Project so alias inlining cannot
    * re-evaluate it downstream — the zero-cost form of a cache barrier.
    */
  def fenced(c: Column): Column = call_function("optimizer_fence", c)
}
