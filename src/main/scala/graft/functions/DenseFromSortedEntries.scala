package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Assemble the k-wide dense panel vector from a bucket's SORTED
  * (series, value) entry list in one two-pointer merge against the
  * sorted series universe — NaN where a series is absent.
  *
  * This replaces the sparse probe [[graft.SparkEntry.panelValsExpr]]
  * used per bucket row on gapped buckets (the normal continuous-
  * streaming case, where nothing forward-fills): `element_at` on
  * Spark's array-backed MapData is a LINEAR scan per lookup, so the
  * probe was O(k²) per bucket row — its own scaladoc said so, "fine
  * for broadcast-sized universes". The merge is O(k + |entries|) with
  * no map materialization and no per-slot expression machinery (the
  * same per-slot-cost reasoning as [[PearsonArrays]]; the universe
  * rides the expression as a literal, exactly like the typedLit the
  * probe compared against).
  *
  * Preconditions, both enforced by the caller: the entries array is
  * sorted ascending by series id (panelValsExpr builds it with
  * `array_sort`, which orders by the FIRST struct field) and the
  * universe is sorted ascending (panelValsExpr `require`s it). Entries
  * whose series is not in the universe are skipped by the merge —
  * matching the probe, which only ever looked universe ids up. Null
  * values cannot occur (the caller coalesces them to NaN before the
  * sort); a null entry STRUCT would have sorted first and is treated
  * defensively as absent.
  */
case class DenseFromSortedEntries(child: Expression, universe: Array[Long])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(k, v)), _)
        if k.dataType == LongType && v.dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      "dense_from_sorted_entries requires array<struct<long, double>>, " +
        s"got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "dense_from_sorted_entries"

  override protected def nullSafeEval(input: Any): Any =
    DenseFromSortedEntries.merge(input.asInstanceOf[ArrayData], universe)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val uni = ctx.addReferenceObj("universe", universe, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.DenseFromSortedEntries.merge(
         |  $c, $uni);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): DenseFromSortedEntries = copy(child = newChild)
}

object DenseFromSortedEntries {

  /** Two-pointer merge of sorted entries into the sorted universe's
    * slots; NaN for absent series, last entry wins on a duplicate id
    * (duplicates cannot occur for the per-bucket grouped entries the
    * caller aggregates, but deterministic beats undefined).
    */
  def merge(entries: ArrayData, universe: Array[Long]): GenericArrayData = {
    val k = universe.length
    val out = new Array[Double](k)
    java.util.Arrays.fill(out, Double.NaN)
    val n = entries.numElements()
    var i = 0
    var u = 0
    while (i < n && u < k) {
      if (entries.isNullAt(i)) { i += 1 }
      else {
        val e = entries.getStruct(i, 2)
        val id = e.getLong(0)
        if (id < universe(u)) i += 1
        else if (id > universe(u)) u += 1
        else {
          // a null value field mirrors the probe's coalesce(_, NaN);
          // the caller pre-coalesces, so this is defense in depth
          out(u) = if (e.isNullAt(1)) Double.NaN else e.getDouble(1)
          i += 1
        }
      }
    }
    new GenericArrayData(out)
  }
}
