package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper that declares itself non-deterministic — an
  * OPTIMIZER FENCE around an expensive aliased expression, at zero
  * runtime cost (eval and codegen forward straight to the child; no
  * materialization, no extra stage, no cached blocks).
  *
  * Why it exists: Catalyst's alias inlining is unpriced. When a filter
  * or join condition references a projected alias, PushPredicateThrough*
  * substitutes the alias's DEFINITION into the pushed predicate — so an
  * O(dims) kernel like [[PearsonArrays]] behind `.as("rho")` gets
  * re-evaluated once per downstream reference (the r15 plan audit
  * caught it running 3× per pair in the pruned-corr vector verify:
  * isnotnull(kernel) and round(kernel) ≥ t both pushed into the join
  * condition, plus the original project). Those rules only substitute
  * DETERMINISTIC aliases; wrapping the kernel in this fence pins the
  * evaluation to its Project — downstream operators reference the
  * computed attribute instead of re-deriving it. The r15 fix was a
  * pair-sized `.cache()` barrier, which works but pays block
  * materialization and an InMemoryRelation scan (+0.3–0.6 s on the a3
  * family at sf0.1); this fence achieves the same exactly-once plan for
  * free — see SCALE.md's barrier A/B.
  *
  * The declared non-determinism is a white lie with bounded blast
  * radius: the child IS deterministic, so task retries and speculative
  * re-execution still produce identical results; the only semantic a
  * fence changes is which plan rewrites Catalyst may apply around it —
  * exactly the point. That bound is MEASURED, not argued: FenceSpec
  * pins that a fenced plan's RDD reports the SAME
  * outputDeterministicLevel as its unfenced twin (DETERMINATE on
  * shuffle-free plans; the usual UNORDERED after a shuffle; never
  * INDETERMINATE) — expression determinism does not feed the
  * scheduler's retry model, so a fetch failure retries lost partitions
  * only, no cascading consumer-stage recompute — and PlanGuardSpec
  * red-greens the exactly-once property itself.
  *
  * Blast radius that IS real: Catalyst's pushdown-through-Project rules
  * require EVERY project field to be deterministic, so a fence blocks
  * pushdown of ALL predicates through its containing Project — a
  * caller's filter on SIBLING columns (e.g. the i/j keys next to a
  * fenced rho) also stops pushing below the select, not just filters
  * on the fenced value. Callers needing key predicates pushed to the
  * scan must pre-filter their inputs BEFORE the fenced projection
  * (CorrPrune does: the panel's user/ts filters sit below the kernel
  * select, and PlanGuardSpec pins both directions — pushed below,
  * provably not pushed above). Use the fence ONLY on expressions whose
  * re-evaluation is the dominant cost; fencing cheap expressions just
  * blocks useful pushdown.
  */
case class OptimizerFence(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  // the whole point: alias-inlining and predicate-pushdown rules refuse
  // to duplicate or substitute non-deterministic expressions
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false
  override def prettyName: String = "optimizer_fence"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(
      newChild: Expression): OptimizerFence = copy(child = newChild)
}
