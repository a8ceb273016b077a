package graft.plans

/** Text-level physical-plan checks shared by the exactly-once gates
  * (PlanGuardSpec), the barrier A/B (tools/Profile), and the width
  * stress harness (tools/Stress) — one definition so the counting
  * method cannot drift between the test gate and the tools that
  * originally established it.
  */
object PlanText {

  /** DISTINCT normalized plan lines containing `needle` — the honest
    * way to count how many places a plan evaluates an expression.
    * Raw substring hits lie in both directions: a cached plan prints
    * the SAME Project twice (the live node plus the InMemoryRelation's
    * stored copy — identical expression, so it normalizes away here),
    * while a real re-evaluation (the r15 alias-inlining bug) shows the
    * kernel in DIFFERENT contexts (`isnotnull(...)`, a join
    * condition, the original Project) that survive normalization as
    * distinct lines. Normalization strips the tree-position prefix
    * (indentation, codegen stars, connector glyphs, node numbers) so
    * the same node printed at two tree depths counts once.
    */
  def distinctSites(plan: String, needle: String): Set[String] =
    plan.linesIterator.filter(_.contains(needle))
      .map(_.replaceAll("""^[\s:+*()\d-]+""", "")).toSet
}
