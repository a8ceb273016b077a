package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One cell of the correlation matrix in long form; `rho` is None where
  * the pair has fewer than two complete observations or zero variance
  * (pandas emits NaN there).
  */
case class CorrCell(i: Int, j: Int, rho: Option[Double])

/** One-pass pairwise-complete Pearson correlation matrix aggregate — the
  * engine's replacement for the O(k²)-shuffle self-join tier of the
  * flagship query (reference `data.corr()`,
  * TAQpipeline/correlation_matrix_exporter.py:163,209).
  *
  * Input: one `Array[Double]` per time bucket — the k-wide panel row (a
  * primitive array: the O(k²) inner loop indexes it 13M+ times per input
  * row at k=300, so a boxed or non-array-backed Seq dominated the whole
  * query before this was primitive), with
  * NaN marking missing observations. For every unordered pair (i, j) the
  * buffer keeps ten slots — n, Σx, Σy, Σx², Σy², Σxy, min/max of each
  * side — accumulated ONLY over rows where both sides are present:
  * exactly pandas' pairwise-complete semantics, which row-complete
  * one-pass methods (assembling vectors and dropping any row with a NaN)
  * get wrong.
  *
  * Numerics: the buffer holds Welford/Chan state — running means plus
  * CENTERED second moments (M2x, M2y, Cxy) — not raw power sums. The
  * raw-sum form finishes with n·Σx²−(Σx)², whose catastrophic
  * cancellation at magnitude |x| wipes out all variance signal below
  * ~|x|²·n²·1e-16: a 6-dp-quantized price series hovering one
  * quantization step around 100 (exactly what forward-fill produces)
  * has true variance ~1e-10 against ~1e-7 of cancellation noise — a
  * sign-random vx and garbage ρ. The centered update pays one divide
  * per accumulate and is exact to the scale of the deviations
  * themselves. Exactly-constant detection additionally uses the min/max
  * slots (exact on quantized inputs): those pairs are None, matching
  * the NULL/NaN SQL engines emit.
  *
  * Scale shape: the panel is shuffled once (groupBy bucket to form rows);
  * the aggregate then runs as map-side partials + a merge of
  * k(k-1)/2 × 10 doubles per partition — co-moment state, not data,
  * crosses the wire. At k=500 the buffer is ~10 MB; compare the
  * self-join tier, which shuffles k² rows per bucket. The O(k²) buffer
  * caps this tier near k≈1-2000 series; beyond that the pair-join tier
  * wins again. The Chan merge is commutative and associative up to fp
  * rounding (~1e-12 — property-checked merge/commute laws with
  * tolerance in the test suite), so partial aggregation order cannot
  * change any 4-6-dp-rounded result.
  */
class CorrMatrixAgg(k: Int)
    extends Aggregator[Array[Double], Array[Double], Seq[CorrCell]] {

  private val nPairs = k * (k - 1) / 2
  private val S = 10 // slots per pair
  // layout per pair p=(i,j), i<j, p = i*k - i*(i+1)/2 + (j-i-1):
  // [n, meanx, meany, M2x, M2y, Cxy, minx, maxx, miny, maxy]
  override def zero: Array[Double] = {
    val b = new Array[Double](S * nPairs)
    var p = 0
    while (p < nPairs) {
      b(S * p + 6) = Double.PositiveInfinity
      b(S * p + 7) = Double.NegativeInfinity
      b(S * p + 8) = Double.PositiveInfinity
      b(S * p + 9) = Double.NegativeInfinity
      p += 1
    }
    b
  }

  override def reduce(buf: Array[Double], row: Array[Double]): Array[Double] = {
    var i = 0
    var p = 0
    while (i < k) {
      val x = row(i)
      val xOk = !x.isNaN
      var j = i + 1
      while (j < k) {
        if (xOk) {
          val y = row(j)
          if (!y.isNaN) {
            val b = S * p
            val n1 = buf(b) + 1
            buf(b) = n1
            val dx = x - buf(b + 1)
            buf(b + 1) += dx / n1
            val dx2 = x - buf(b + 1)
            val dy = y - buf(b + 2)
            buf(b + 2) += dy / n1
            val dy2 = y - buf(b + 2)
            buf(b + 3) += dx * dx2
            buf(b + 4) += dy * dy2
            buf(b + 5) += dx * dy2
            if (x < buf(b + 6)) buf(b + 6) = x
            if (x > buf(b + 7)) buf(b + 7) = x
            if (y < buf(b + 8)) buf(b + 8) = y
            if (y > buf(b + 9)) buf(b + 9) = y
          }
        }
        j += 1
        p += 1
      }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var p = 0
    while (p < nPairs) {
      val o = S * p
      val na = a(o)
      val nb = b(o)
      if (nb > 0) {
        if (na == 0) {
          var t = 0
          while (t < 6) { a(o + t) = b(o + t); t += 1 }
        } else {
          // Chan's parallel combine of centered moments
          val n = na + nb
          val dX = b(o + 1) - a(o + 1)
          val dY = b(o + 2) - a(o + 2)
          val f = na * nb / n
          a(o + 3) += b(o + 3) + dX * dX * f
          a(o + 4) += b(o + 4) + dY * dY * f
          a(o + 5) += b(o + 5) + dX * dY * f
          a(o + 1) += dX * nb / n
          a(o + 2) += dY * nb / n
          a(o) = n
        }
      }
      if (b(o + 6) < a(o + 6)) a(o + 6) = b(o + 6)
      if (b(o + 7) > a(o + 7)) a(o + 7) = b(o + 7)
      if (b(o + 8) < a(o + 8)) a(o + 8) = b(o + 8)
      if (b(o + 9) > a(o + 9)) a(o + 9) = b(o + 9)
      p += 1
    }
    a
  }

  override def finish(buf: Array[Double]): Seq[CorrCell] = {
    val out = new Array[CorrCell](nPairs)
    var i = 0
    var p = 0
    while (i < k) {
      var j = i + 1
      while (j < k) {
        val b = S * p
        val n = buf(b)
        val rho =
          if (n < 2 || buf(b + 6) == buf(b + 7) || buf(b + 8) == buf(b + 9))
            None // too few obs, or exactly-constant side: undefined
          else {
            val vx = buf(b + 3)
            val vy = buf(b + 4)
            val cov = buf(b + 5)
            if (vx <= 0 || vy <= 0) None
            else Some(cov / math.sqrt(vx * vy))
          }
        out(p) = CorrCell(i, j, rho)
        j += 1
        p += 1
      }
      i += 1
    }
    out.toSeq
  }

  override def bufferEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Seq[CorrCell]] =
    ExpressionEncoder[Seq[CorrCell]]()
}

object CorrMatrix {
  /** Column form: `corrMatrix(k)(panelRow)` aggregates panel rows (k-wide
    * Seq[Double], NaN = missing) to the long-form correlation cells.
    */
  def corrMatrix(k: Int): Column => Column =
    udaf(new CorrMatrixAgg(k), ExpressionEncoder[Array[Double]]()).apply(_)
}
