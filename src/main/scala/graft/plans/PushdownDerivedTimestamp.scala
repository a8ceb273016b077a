package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Optimizer rule: rewrite comparisons on the catalog's derived event
  * timestamp — `timestamp_micros(ts_nanos div 1000) CMP <literal>` —
  * into the raw nanosecond domain, `ts_nanos CMP' <literal ns>`.
  *
  * Why: the `events` fixture stores INT64 TIMESTAMP(NANOS), which the
  * engine reads as a raw long and converts in a projection
  * ([[graft.Catalog.load]]). Every time filter in every query targets
  * the derived column, and a predicate wrapped in
  * `timestamp_micros(div …)` cannot be pushed to the parquet reader —
  * the scan showed `PushedFilters: [IsNotNull(ts)]` only, so row-group
  * min/max pruning never fired on the dominant access pattern of the
  * whole engine. After the rewrite the predicate is a plain comparison
  * on the stored column and reaches the reader
  * (`PushedFilters: [GreaterThanOrEqual(ts, …)]` — asserted in
  * PushdownRuleSpec). At 100 TB this is the difference between scanning
  * every row group and touching only the queried time range.
  *
  * Correctness: `IntegralDivide` truncates toward zero, so
  * `ns div 1000` is a floor only for ns ≥ 0. The guards make the
  * rewrite exact for ALL ns (including negatives / pre-1970):
  * for t ≥ 1:  trunc(ns/1000) ≥ t  ⟺  ns ≥ 1000·t
  *             trunc(ns/1000) < t  ⟺  ns < 1000·t
  * for t ≥ 0:  trunc(ns/1000) > t  ⟺  ns ≥ 1000·(t+1)
  *             trunc(ns/1000) ≤ t  ⟺  ns < 1000·(t+1)
  * (negative ns make the left side false/true consistently with the
  * right side under these guards; equality is left untouched).
  * `timestamp_micros` itself is a monotone bijection long → timestamp,
  * so comparing against the literal's micros value is exact.
  */
object PushdownDerivedTimestamp extends Rule[LogicalPlan] {

  private val maxT = Long.MaxValue / 1000 - 1

  /** Matches timestamp_micros(x div 1000) and yields x. */
  private object DerivedTs {
    def unapply(e: Expression): Option[Expression] = e match {
      case MicrosToTimestamp(IntegralDivide(ns, Literal(1000L, LongType), _))
          if ns.dataType == LongType => Some(ns)
      case _ => None
    }
  }

  private object TsLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(t: Long, TimestampType) if t <= maxT => Some(t)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(
      _.containsPattern(org.apache.spark.sql.catalyst.trees.TreePattern
        .BINARY_COMPARISON)) {
      case GreaterThanOrEqual(DerivedTs(ns), TsLit(t)) if t >= 1 =>
        GreaterThanOrEqual(ns, Literal(t * 1000L, LongType))
      case GreaterThan(DerivedTs(ns), TsLit(t)) if t >= 0 =>
        GreaterThanOrEqual(ns, Literal((t + 1) * 1000L, LongType))
      case LessThan(DerivedTs(ns), TsLit(t)) if t >= 1 =>
        LessThan(ns, Literal(t * 1000L, LongType))
      case LessThanOrEqual(DerivedTs(ns), TsLit(t)) if t >= 0 =>
        LessThan(ns, Literal((t + 1) * 1000L, LongType))
      // literal-on-left mirror forms
      case LessThanOrEqual(TsLit(t), DerivedTs(ns)) if t >= 1 =>
        GreaterThanOrEqual(ns, Literal(t * 1000L, LongType))
      case LessThan(TsLit(t), DerivedTs(ns)) if t >= 0 =>
        GreaterThanOrEqual(ns, Literal((t + 1) * 1000L, LongType))
      case GreaterThan(TsLit(t), DerivedTs(ns)) if t >= 1 =>
        LessThan(ns, Literal(t * 1000L, LongType))
      case GreaterThanOrEqual(TsLit(t), DerivedTs(ns)) if t >= 0 =>
        LessThan(ns, Literal((t + 1) * 1000L, LongType))
    }
}
