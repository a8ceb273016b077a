package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact integer dot product / squared L2 distance over two long-array
  * columns as native Catalyst expressions — the per-pair kernels behind
  * every quantized-vector comparison ([[graft.ops.Similarity.dotq]]'s
  * cosine re-scores, LSH sign projections, [[graft.ops.Kmeans]]'s
  * centroid distances).
  *
  * Why custom expressions: the previous form
  * `aggregate(zip_with(a, b, f), 0L, _+_)` is built from higher-order
  * functions, which are CodegenFallback — every evaluation walks the
  * lambda interpreter per ELEMENT and materializes the zipped products
  * array (~1-3 µs and one allocation per 64-dim pair). An ANN re-score
  * touches each candidate pair once and a k-means assignment touches
  * every (row, centroid) pair, so that per-slot machinery was the hot
  * path of the whole similarity family (the [[PearsonArrays]] finding,
  * re-applied to the long domain). Each kernel is one JIT-compiled
  * primitive loop over the two unsafe arrays, reached by a single
  * static call per pair inside whole-stage codegen. Measured at sf0.1
  * (Profile medians): e10_semdedup 2.95 → 0.94 s, e11_ivfpq_recall
  * 2.68 → 1.59 s, d5_embedding_neardup 1.82 → 1.06 s,
  * e7_trained_ivf_recall 1.35 → 0.74 s.
  *
  * Semantics are bit-identical to the HOF form on every input the
  * engine produces, and LOUD elsewhere:
  *   - either array null → null (nullSafeEval);
  *   - length mismatch → null (zip_with pads the shorter side with
  *     null, the lambda's arithmetic nulls the slot, and the aggregate
  *     fold's `acc + null` nulls the total);
  *   - a null ELEMENT → null (same propagation);
  *   - long overflow traps (`Math.*Exact`), exactly as the ANSI-mode
  *     Add/Multiply in the lambda would — far outside the quantized
  *     envelope (|xq| ≤ ~10⁷ · 64 dims keeps totals < 10¹⁶ ≪ 2⁶³).
  */
abstract class LongArrayFold extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<bigint>), " +
          s"got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
}

case class DotLongs(left: Expression, right: Expression)
    extends LongArrayFold {

  override def prettyName: String = "dot_longs"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    LongArrayMath.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotResult")
      s"""
         |java.lang.Long $r = graft.functions.LongArrayMath.dot($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLongs =
    copy(left = newLeft, right = newRight)
}

case class SqDistLongs(left: Expression, right: Expression)
    extends LongArrayFold {

  override def prettyName: String = "sqdist_longs"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    LongArrayMath.sqDist(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("sqDistResult")
      s"""
         |java.lang.Long $r = graft.functions.LongArrayMath.sqDist($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistLongs =
    copy(left = newLeft, right = newRight)
}

object LongArrayMath {

  /** Σ a(i)·b(i) over two equal-length long arrays; null (boxed) on a
    * length mismatch or a null element — the HOF form's propagation.
    */
  def dot(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc = Math.addExact(acc, Math.multiplyExact(a.getLong(i), b.getLong(i)))
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  /** Σ (a(i)−b(i))² with the same null/length/overflow contract. */
  def sqDist(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = Math.subtractExact(a.getLong(i), b.getLong(i))
      acc = Math.addExact(acc, Math.multiplyExact(d, d))
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
}
