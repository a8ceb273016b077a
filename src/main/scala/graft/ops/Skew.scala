package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot aggregation keys.
  *
  * The fixtures are uniform, so no production query here needs this —
  * but at 100 TB a handful of hot series (an index symbol, a viral
  * document cluster) can pin one reducer while 999 idle. AQE's skew-join
  * handling covers joins; for aggregations the standard fix is salting:
  * spread each key over `salt` sub-keys, partially aggregate, then
  * aggregate the partials. Works for any aggregate with a
  * decomposition into (partial, final) — the helper takes both forms
  * explicitly rather than guessing.
  */
object Skew {

  /** Two-phase salted aggregation.
    *
    * @param partial  aggregates applied per (keys, salt) group
    * @param fin      aggregates combining the partials per (keys) —
    *                 refer to the partial aliases
    * @param saltExpr optional caller-supplied salt expression; when the
    *                 input has a stable uniform column (an event id, a
    *                 file offset), pass `pmod(hash-of-it, salt)` here to
    *                 make the salt deterministic under task retries
    *
    * e.g. count: partial `count(1) as c`, final `sum(c) as n`;
    * mean: partials `sum(x) as s`/`count(x) as c`, final `sum(s)/sum(c)`.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salt: Int,
                partial: Seq[Column], fin: Seq[Column],
                saltExpr: Option[Column] = None): DataFrame = {
    // Default salt is the row's POSITION (partition id + row index via
    // monotonically_increasing_id), never a content hash: the
    // archetypal hot key is billions of IDENTICAL rows (a viral event
    // counted over and over), and any content hash maps them all to ONE
    // salt — the exact single-reducer pin this operator exists to
    // prevent. Position-derived salts are uniform by construction, and
    // because the caller supplies a (partial, final) decomposition, any
    // one assignment of rows to salts combines to the same finals.
    // Retry caveat: monotonically_increasing_id is nondeterministic
    // across task retries, and Spark does not mark SQL stages with
    // nondeterministic expressions as indeterminate — if an upstream
    // shuffle's map stage is partially recomputed after a fetch failure
    // while some reducers reuse old shuffle output, rows can be
    // double-counted or dropped (the same exposure as textbook rand()
    // salting). Exactly-once row processing is assumed here; callers
    // with a stable uniform column should pass `saltExpr` instead.
    val salted = df.withColumn("__salt",
      saltExpr.getOrElse(
        pmod(monotonically_increasing_id(), lit(salt.toLong))))
    salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(fin.head, fin.tail: _*)
  }
}
