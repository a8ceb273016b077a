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
  * CorrPruneSpec and the a3f oracle); past it the aggregate fails
  * loudly under ANSI while this kernel, with 128-bit sums and a
  * BigInteger finish, simply cannot overflow.
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

  /** Exact signed-128-bit accumulator: (hi, lo) two's complement. */
  private final class Acc128 {
    var hi: Long = 0L
    var lo: Long = 0L
    /** this += (addHi, addLo), 128-bit two's complement. */
    def add(addHi: Long, addLo: Long): Unit = {
      val newLo = lo + addLo
      // unsigned carry out of the low word
      val carry = ((lo & addLo) | ((lo | addLo) & ~newLo)) >>> 63
      hi = hi + addHi + carry
      lo = newLo
    }
    def toBigInteger: BigInteger = {
      val bytes = new Array[Byte](16)
      var i = 0
      while (i < 8) {
        bytes(i) = (hi >>> (56 - 8 * i)).toByte
        bytes(i + 8) = (lo >>> (56 - 8 * i)).toByte
        i += 1
      }
      new BigInteger(bytes)
    }
  }

  /** Spark `round(x·1e6, 0)` for doubles, then the integral result as a
    * long — the aggregate form's exact quantization (`Round` for
    * DoubleType is `BigDecimal.valueOf(d).setScale(0, HALF_UP)`; the
    * follow-on cast to DECIMAL(38,0) is exact on an integral double).
    * Magnitudes stay ≤ ~1e13 inside pearson's documented envelope, four
    * orders under 2^53, so the double round-trip is lossless.
    */
  private def quantize(x: Double): Long =
    JBigDecimal.valueOf(x * 1e6).setScale(0, RoundingMode.HALF_UP)
      .doubleValue().toLong

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
    val nB = BigInteger.valueOf(cnt)
    val sxB = sx.toBigInteger; val syB = sy.toBigInteger
    val vxB = nB.multiply(sxx.toBigInteger).subtract(sxB.multiply(sxB))
    val vyB = nB.multiply(syy.toBigInteger).subtract(syB.multiply(syB))
    if (vxB.signum <= 0 || vyB.signum <= 0) return null
    // BigDecimal.doubleValue is the correctly-rounded conversion that
    // cast(decimal as double) performs — keep it for bit parity with
    // the aggregate form
    val cov = new JBigDecimal(
      nB.multiply(sxy.toBigInteger).subtract(sxB.multiply(syB)))
      .doubleValue()
    val vx = new JBigDecimal(vxB).doubleValue()
    val vy = new JBigDecimal(vyB).doubleValue()
    java.lang.Double.valueOf(cov / math.sqrt(vx * vy))
  }
}
