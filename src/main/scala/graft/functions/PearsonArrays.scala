package graft.functions

import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Pairwise-complete Pearson over TWO POSITION-ALIGNED double arrays as
  * a native Catalyst expression — the scalar twin of the
  * [[graft.ops.Stats.pearson]] aggregate, for consumers that hold both
  * series of a pair in array columns (the pruned-corr vector verify,
  * where each candidate pair carries its two series vectors).
  *
  * Arithmetic is IDENTICAL to the aggregate form, slot by slot: a slot
  * contributes iff both sides are non-null (exactly the rows the
  * aggregate's when-guard nulls out; slots past the shorter array —
  * zip padding — are skipped the same way); each contributing value is
  * quantized with the aggregate's own `round(x·1e6, 0)` double
  * semantics (`BigDecimal.valueOf(d).setScale(0, HALF_UP)`, the exact
  * Spark `Round` implementation for doubles); the co-moments accumulate
  * as EXACT 128-bit integers (Math.multiplyHigh + carry — the decimal
  * path's exactness without its per-slot object churn); and the finish
  * is the same `cov/√(vx·vy)` double expression behind the same
  * `n ≥ 2 ∧ vx > 0 ∧ vy > 0` guard, with each exact co-moment converted
  * by `BigDecimal.doubleValue` — the conversion `cast(decimal as
  * double)` performs. Within [[graft.ops.Stats.pearson]]'s documented
  * 38-digit envelope the two forms are bit-identical (pinned by
  * CorrPruneSpec and the a3f oracle), and NEITHER can silently
  * diverge outside it: the aggregate fails loudly under ANSI at its
  * cast/sum overflow, while this kernel throws at its own boundaries —
  * non-finite input, a quantized magnitude past 2^53 (where the
  * double round-trip stops being lossless, so exactness would be a
  * lie), or a 128-bit co-moment overflow (Acc128 traps signed wrap;
  * reachable only at ~10⁶⁺ maximal-magnitude slots, far past where
  * the aggregate already failed). Everything the aggregate's envelope
  * admits at realistic slot counts, this kernel admits and computes
  * with the same exact 128-bit sums and BigInteger finish.
  *
  * Why a custom expression: built-ins can only correlate two array
  * columns by exploding candidate·dims slots into rows, and EVERY
  * explode shape measured (zip_with lambda, arrays_zip structs,
  * posexplode + element_at, an aggregate() fold) pays ~1–3 µs of
  * per-slot interpreter or row machinery — the whole verify's cost at
  * wide dims. This kernel is one JIT-compiled primitive loop over the
  * two unsafe arrays (no boxing, no per-slot objects) reached by a
  * single static call per PAIR, inside whole-stage codegen.
  */
case class PearsonArrays(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pearson_arrays requires (array<double>, array<double>), " +
          s"got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pearson_arrays"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    PearsonArrays.rho(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("pearsonResult")
      s"""
         |java.lang.Double $r = graft.functions.PearsonArrays.rho($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PearsonArrays =
    copy(left = newLeft, right = newRight)
}

object PearsonArrays {

  /** Exact signed-128-bit accumulator: (hi, lo) two's complement.
    * Signed overflow TRAPS (same-sign addends, opposite-sign result —
    * the exact multi-word rule), so the kernel can never wrap
    * silently: with per-slot magnitudes ≤ 2^53 each product is ≤
    * 2^106, and only ≳2×10⁶ maximal-magnitude slots could reach the
    * 2^127 capacity — where this throws instead.
    */
  private final class Acc128 {
    var hi: Long = 0L
    var lo: Long = 0L
    /** this += (addHi, addLo), 128-bit two's complement. */
    def add(addHi: Long, addLo: Long): Unit = {
      val newLo = lo + addLo
      // unsigned carry out of the low word
      val carry = ((lo & addLo) | ((lo | addLo) & ~newLo)) >>> 63
      val newHi = hi + addHi + carry
      if ((hi < 0) == (addHi < 0) && (newHi < 0) != (hi < 0))
        throw new ArithmeticException(
          "pearson_arrays: 128-bit co-moment overflow — array too long " +
            "at this magnitude (the aggregate form overflows loudly " +
            "under ANSI far earlier)")
      hi = newHi
      lo = newLo
    }
    def toBigInteger: BigInteger = big(hi, lo)
  }

  /** Quantized-magnitude ceiling: 2^53 — the EXACTNESS boundary, not a
    * wrap-safety margin (Acc128 traps its own overflow). Past 2^53 the
    * `doubleValue().toLong` round-trip below is lossy (a double cannot
    * hold every integer), so the kernel could no longer claim the
    * aggregate's exact arithmetic — it rejects loudly instead. This
    * admits everything [[graft.ops.Stats.pearson]]'s envelope admits at
    * any realistic slot count (the aggregate's 38-digit sums overflow
    * under ANSI far below n·(2^53)² anyway); only |x| > ~9×10⁹
    * pre-quantize is refused, where the aggregate still computes for
    * tiny n but this kernel could only do so inexactly.
    */
  private val MaxQuantized = 1L << 53

  /** [[Acc128.add]] on an array slot pair — buf(o) = hi, buf(o+1) = lo —
    * for callers whose 128-bit state lives in a flat buffer rather than
    * per-accumulator objects (the exact matrix aggregate's per-pair
    * slots, [[CorrMatrixExactAgg]]). Same two's-complement carry and
    * the same loud signed-overflow trap.
    */
  private[functions] def add128(buf: Array[Long], o: Int,
                                addHi: Long, addLo: Long): Unit = {
    val hi = buf(o)
    val lo = buf(o + 1)
    val newLo = lo + addLo
    val carry = ((lo & addLo) | ((lo | addLo) & ~newLo)) >>> 63
    val newHi = hi + addHi + carry
    if ((hi < 0) == (addHi < 0) && (newHi < 0) != (hi < 0))
      throw new ArithmeticException(
        "128-bit co-moment overflow — series too long at this magnitude")
    buf(o) = newHi
    buf(o + 1) = newLo
  }

  /** (hi, lo) two's-complement pair as a BigInteger — [[Acc128
    * .toBigInteger]] for flat-buffer state. */
  private[functions] def big(hi: Long, lo: Long): BigInteger = {
    val bytes = new Array[Byte](16)
    var i = 0
    while (i < 8) {
      bytes(i) = (hi >>> (56 - 8 * i)).toByte
      bytes(i + 8) = (lo >>> (56 - 8 * i)).toByte
      i += 1
    }
    new BigInteger(bytes)
  }

  /** Spark `round(x·1e6, 0)` for doubles, then the integral result as a
    * long — the aggregate form's exact quantization (`Round` for
    * DoubleType is `BigDecimal.valueOf(d).setScale(0, HALF_UP)`; the
    * follow-on cast to DECIMAL(38,0) is exact on an integral double).
    * Non-finite input and out-of-envelope magnitudes fail loudly here
    * (the aggregate form fails the same way at its ANSI cast — Spark's
    * `Round` passes NaN/Infinity through for doubles, and the decimal
    * cast then throws): silent saturation via `toLong`, or an Acc128
    * wrap from admitted-but-huge values, can never happen.
    */
  private[functions] def quantize(x: Double): Long = {
    val scaled = x * 1e6
    if (!java.lang.Double.isFinite(scaled))
      throw new ArithmeticException(
        s"pearson_arrays: non-finite input $x — outside the exact " +
          "envelope (the aggregate form fails at its ANSI decimal cast)")
    val q = JBigDecimal.valueOf(scaled).setScale(0, RoundingMode.HALF_UP)
      .doubleValue().toLong
    if (q > MaxQuantized || q < -MaxQuantized)
      throw new ArithmeticException(
        s"pearson_arrays: input $x quantizes past 2^53, where the " +
          "double round-trip stops being lossless — refusing rather " +
          "than computing inexactly")
    q
  }

  /** One primitive pass over the aligned pair; null when fewer than two
    * complete slots or either variance is exactly zero — the aggregate
    * form's guard, on the same exact integers.
    */
  def rho(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = math.min(a.numElements(), b.numElements())
    var cnt = 0L
    val sx = new Acc128; val sy = new Acc128
    val sxx = new Acc128; val syy = new Acc128; val sxy = new Acc128
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val xq = quantize(a.getDouble(i))
        val yq = quantize(b.getDouble(i))
        cnt += 1
        sx.add(xq >> 63, xq)
        sy.add(yq >> 63, yq)
        sxx.add(Math.multiplyHigh(xq, xq), xq * xq)
        syy.add(Math.multiplyHigh(yq, yq), yq * yq)
        sxy.add(Math.multiplyHigh(xq, yq), xq * yq)
      }
      i += 1
    }
    if (cnt < 2) return null
    finishRhoSlots(cnt, sx.hi, sx.lo, sy.hi, sy.lo,
      sxx.hi, sxx.lo, syy.hi, syy.lo, sxy.hi, sxy.lo)
  }

  // ---------------------------------------------------------------------
  // Fast exact finish: the same deterministic double chain as
  // [[finishRho]] computed in raw 128-bit long arithmetic — no
  // BigInteger/BigDecimal allocation per cell. Bit-identical BY
  // CONSTRUCTION: the integer arithmetic is exact under the checked
  // preconditions and [[toDouble128]] is the correctly-rounded
  // (nearest-even) conversion, which is UNIQUE — so fast path and
  // BigInteger path cannot differ by even one ulp
  // (PearsonArraysSpec property-pins this on adversarial magnitudes).
  // Motivation: [[CorrMatrixExactAgg]]'s finish runs once per matrix
  // CELL with parallelism capped at the window count — at e1b's shape
  // (250k cells, 2 windows) the BigInteger finish cost a measured
  // ~0.4 s of the query's 2.6 s; this path is ~50 ns/cell.
  // ---------------------------------------------------------------------

  /** Correctly-rounded (round-to-nearest-even) double of a SIGNED
    * 128-bit two's-complement (hi, lo) — exactly
    * `new BigDecimal(BigInteger).doubleValue()`, allocation-free.
    */
  private[functions] def toDouble128(hi: Long, lo: Long): Double = {
    if (hi == (lo >> 63)) return lo.toDouble // fits signed 64: exact JVM op
    val neg = hi < 0
    var mLo = lo
    var mHi = hi
    if (neg) { mLo = ~lo + 1; mHi = ~hi + (if (mLo == 0) 1 else 0) }
    val nlz = if (mHi != 0) java.lang.Long.numberOfLeadingZeros(mHi)
              else 64 + java.lang.Long.numberOfLeadingZeros(mLo)
    val bits = 128 - nlz // > 53 here (≤ 53 would have fit signed 64)
    val shift = bits - 54
    // top = magnitude >>> shift (54 significant bits);
    // sticky = any shifted-out bit set. JVM shifts are mod-64: branch.
    var top = 0L
    var sticky = false
    if (shift == 0) top = mLo // bits = 54 ⇒ mHi = 0
    else if (shift < 64) {
      top = (mHi << (64 - shift)) | (mLo >>> shift)
      sticky = (mLo & ((1L << shift) - 1)) != 0
    } else if (shift == 64) { top = mHi; sticky = mLo != 0 }
    else {
      top = mHi >>> (shift - 64)
      sticky = (mHi & ((1L << (shift - 64)) - 1)) != 0 || mLo != 0
    }
    var mant = top >>> 1
    if ((top & 1) != 0 && (sticky || (mant & 1) != 0)) mant += 1
    var e = shift + 1
    if (mant == (1L << 53)) { mant >>>= 1; e += 1 }
    val d = Math.scalb(mant.toDouble, e)
    if (neg) -d else d
  }

  /** Magnitude bit length of a signed 128-bit value (0 for 0). */
  @inline private def bits128(hi: Long, lo: Long): Int = {
    var mLo = lo
    var mHi = hi
    if (hi < 0) { mLo = ~lo + 1; mHi = ~hi + (if (mLo == 0) 1 else 0) }
    if (mHi != 0) 128 - java.lang.Long.numberOfLeadingZeros(mHi)
    else 64 - java.lang.Long.numberOfLeadingZeros(mLo)
  }

  /** The co-moment finish over raw 128-bit buffer slots, with the fast
    * long-arithmetic path when the checked envelope holds (every input
    * the quantizer admits at ≤ ~10⁵ slots per pair does) and the
    * BigInteger [[finishRho]] as the bit-identical fallback. Layout
    * matches [[CorrMatrixExactAgg]]'s slots: five (hi, lo) pairs.
    */
  private[functions] def finishRhoSlots(cnt: Long,
      sxHi: Long, sxLo: Long, syHi: Long, syLo: Long,
      sxxHi: Long, sxxLo: Long, syyHi: Long, syyLo: Long,
      sxyHi: Long, sxyLo: Long): java.lang.Double = {
    val nBits = 64 - java.lang.Long.numberOfLeadingZeros(cnt)
    // preconditions for exact 128-bit products: n·sxx, n·syy, n·sxy
    // below 2^126, sx/sy in signed 64 (⇒ sx·sy < 2^124); differences
    // then stay below 2^127 — no overflow anywhere in the fast path
    val fast = sxHi == (sxLo >> 63) && syHi == (syLo >> 63) &&
      bits128(sxxHi, sxxLo) + nBits <= 126 &&
      bits128(syyHi, syyLo) + nBits <= 126 &&
      bits128(sxyHi, sxyLo) + nBits <= 126
    if (!fast)
      return finishRho(cnt, big(sxHi, sxLo), big(syHi, syLo),
        big(sxxHi, sxxLo), big(syyHi, syyLo), big(sxyHi, sxyLo))
    // n·acc for a NON-NEGATIVE 128-bit acc (sxx, syy): unsigned shape
    // n·(hi,lo): sxy may be negative — sign-magnitude around the same core
    @inline def mulPosHi(hi: Long, lo: Long): Long =
      hi * cnt + Math.multiplyHigh(lo, cnt) + (if (lo < 0) cnt else 0L)
    val nSxxLo = sxxLo * cnt
    val nSxxHi = mulPosHi(sxxHi, sxxLo)
    val nSyyLo = syyLo * cnt
    val nSyyHi = mulPosHi(syyHi, syyLo)
    var xyHi = sxyHi
    var xyLo = sxyLo
    val xyNeg = xyHi < 0
    if (xyNeg) { xyLo = ~sxyLo + 1; xyHi = ~sxyHi + (if (xyLo == 0) 1 else 0) }
    var nSxyLo = xyLo * cnt
    var nSxyHi = xyHi * cnt + Math.multiplyHigh(xyLo, cnt) +
      (if (xyLo < 0) cnt else 0L)
    if (xyNeg) {
      nSxyLo = ~nSxyLo + 1
      nSxyHi = ~nSxyHi + (if (nSxyLo == 0) 1 else 0)
    }
    // sx², sy², sx·sy as signed 64×64→128
    val sx = sxLo
    val sy = syLo
    val sxxSqHi = Math.multiplyHigh(sx, sx); val sxxSqLo = sx * sx
    val syySqHi = Math.multiplyHigh(sy, sy); val syySqLo = sy * sy
    val sxyPrHi = Math.multiplyHigh(sx, sy); val sxyPrLo = sx * sy
    // differences (128-bit two's complement; bounded < 2^127 by the
    // precondition, so no wrap is possible)
    @inline def subLo(aLo: Long, bLo: Long): Long = aLo - bLo
    @inline def subHi(aHi: Long, aLo: Long, bHi: Long, bLo: Long): Long =
      aHi - bHi - (if (java.lang.Long.compareUnsigned(aLo, bLo) < 0) 1 else 0)
    val vxLo = subLo(nSxxLo, sxxSqLo)
    val vxHi = subHi(nSxxHi, nSxxLo, sxxSqHi, sxxSqLo)
    val vyLo = subLo(nSyyLo, syySqLo)
    val vyHi = subHi(nSyyHi, nSyyLo, syySqHi, syySqLo)
    if (vxHi < 0 || (vxHi == 0 && vxLo == 0)) return null
    if (vyHi < 0 || (vyHi == 0 && vyLo == 0)) return null
    val covLo = subLo(nSxyLo, sxyPrLo)
    val covHi = subHi(nSxyHi, nSxyLo, sxyPrHi, sxyPrLo)
    val cov = toDouble128(covHi, covLo)
    val vx = toDouble128(vxHi, vxLo)
    val vy = toDouble128(vyHi, vyLo)
    java.lang.Double.valueOf(cov / math.sqrt(vx * vy))
  }

  /** The shared finish: rho as ONE deterministic double chain from the
    * exact integer co-moments — vx/vy/cov formed in BigInteger, each
    * converted by the correctly-rounded `BigDecimal.doubleValue` (the
    * conversion `cast(decimal as double)` performs), then
    * `cov / sqrt(vx·vy)` in IEEE doubles. Every consumer of the exact
    * kernel family ([[PearsonArrays.rho]] and
    * [[CorrMatrixExactAgg]]'s per-pair finish) runs THIS op sequence,
    * so two engines holding the same integer co-moments produce
    * bit-identical rho — the property the e1b oracle's HUGEINT mirror
    * relies on (its `CAST(CAST(v AS VARCHAR) AS DOUBLE)` is the same
    * correctly-rounded integer→double conversion). Null when either
    * variance is exactly zero (constant side) — undefined, as the
    * aggregate's guard. Callers ensure cnt ≥ 2. [[finishRhoSlots]] is
    * the allocation-free fast form of the same chain.
    */
  private[functions] def finishRho(cnt: Long, sxB: BigInteger,
      syB: BigInteger, sxxB: BigInteger, syyB: BigInteger,
      sxyB: BigInteger): java.lang.Double = {
    val nB = BigInteger.valueOf(cnt)
    val vxB = nB.multiply(sxxB).subtract(sxB.multiply(sxB))
    val vyB = nB.multiply(syyB).subtract(syB.multiply(syB))
    if (vxB.signum <= 0 || vyB.signum <= 0) return null
    // BigDecimal.doubleValue is the correctly-rounded conversion that
    // cast(decimal as double) performs — keep it for bit parity with
    // the aggregate form
    val cov = new JBigDecimal(
      nB.multiply(sxyB).subtract(sxB.multiply(syB))).doubleValue()
    val vx = new JBigDecimal(vxB).doubleValue()
    val vy = new JBigDecimal(vyB).doubleValue()
    java.lang.Double.valueOf(cov / math.sqrt(vx * vy))
  }
}
