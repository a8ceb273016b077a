package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Expand a series' SORTED sparse (grid position, value) entry list to
  * the full dense grid with gap filling — the in-array form of the
  * resample ffill/bfill window (guide §2.4: remove shuffles outright).
  *
  * The relational form pays, per panel build: a distributed grid
  * generation, a grid×keys broadcast join against the bucketed
  * aggregates, a full sort-based Window (one more exchange) and a second
  * pass over grid×keys rows. This expression does the identical fill in
  * one linear pass over each series' own entries after a single
  * per-series aggregation: slot p holds the last non-null value at
  * position ≤ p (forward) or the first non-null at ≥ p (backward);
  * slots before the first (after the last) observation stay SQL NULL —
  * exactly `last(v, ignoreNulls)` / `first(v, ignoreNulls)` over the
  * grid-joined relation. Entries with a NULL value occupy their slot but
  * never interrupt the fill, matching ignoreNulls.
  *
  * Preconditions (enforced by the caller, [[graft.ops.Time]]): entries
  * sorted ascending by position (array_sort on the first struct field)
  * with unique in-range positions (they come from a bucket GROUP BY).
  * Out-of-range positions are skipped defensively; a null entry struct
  * (cannot occur) is treated as absent.
  */
case class FillGrid(child: Expression, dims: Int, backward: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(p, v)), _)
        if p.dataType == IntegerType && v.dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      "fill_grid requires array<struct<int, double>>, " +
        s"got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "fill_grid"

  override protected def nullSafeEval(input: Any): Any =
    FillGrid.fill(input.asInstanceOf[ArrayData], dims, backward)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.FillGrid.fill(
         |  $c, $dims, $backward);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): FillGrid = copy(child = newChild)
}

object FillGrid {

  /** One linear pass: forward fill walks positions ascending carrying
    * the last non-null value; backward fill walks descending carrying
    * the next non-null. Slots with no value on the carried side are
    * null.
    */
  def fill(entries: ArrayData, dims: Int,
           backward: Boolean): GenericArrayData = {
    val out = new Array[Any](dims)
    val n = entries.numElements()
    if (!backward) {
      var cur: Any = null
      var i = 0
      var p = 0
      while (p < dims) {
        while (i < n && {
          if (entries.isNullAt(i)) { i += 1; true }
          else {
            val e = entries.getStruct(i, 2)
            val pos = e.getInt(0)
            if (pos < p) { i += 1; true }
            else if (pos == p) {
              if (!e.isNullAt(1)) cur = e.getDouble(1)
              i += 1
              true
            } else false
          }
        }) {}
        out(p) = cur
        p += 1
      }
    } else {
      var cur: Any = null
      var i = n - 1
      var p = dims - 1
      while (p >= 0) {
        while (i >= 0 && {
          if (entries.isNullAt(i)) { i -= 1; true }
          else {
            val e = entries.getStruct(i, 2)
            val pos = e.getInt(0)
            if (pos > p) { i -= 1; true }
            else if (pos == p) {
              if (!e.isNullAt(1)) cur = e.getDouble(1)
              i -= 1
              true
            } else false
          }
        }) {}
        out(p) = cur
        p -= 1
      }
    }
    new GenericArrayData(out)
  }
}
