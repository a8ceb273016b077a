package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** One named engine query plus its DuckDB oracle SQL (None → the driver
  * records a weaker rows-only check). Shared by the query packs that
  * [[graft.SparkEntry]] concatenates.
  */
case class Q(name: String,
             fn: (SparkSession, String) => DataFrame,
             oracle: Option[String])

object Q {

  /** Total-order the small final result of an expensive plan.
    *
    * A bare `orderBy` plans a range exchange whose boundary-sampling pass
    * re-executes the child plan; when the child is a multi-join/agg tree
    * that reduces to a few thousand rows, that one sort nearly doubles
    * the query (measured 5.7 s → 2.0 s on `a3d_corr_pruned` at sf0.1 —
    * AQE materializes shuffle stages, but everything after the last
    * shuffle, including broadcast-join expansions, runs again for the
    * sample). Two pieces replace it:
    *
    *  - a SINGLE-PARTITION sort (`repartition(1)` +
    *    `sortWithinPartitions`): one hash exchange + one in-memory sort,
    *    no sampling pass at all. `repartition(1)`, never `coalesce(1)` —
    *    coalesce would collapse the child's own parallelism into the
    *    single task. Only for results that fit one task; every grading
    *    query's output qualifies by the bounded-output convention.
    *  - a registered cache on the child, which still pays off whenever
    *    the child PLAN re-reads shared subtrees (a3d's pruned pair join:
    *    5.4 s uncached vs 2.2 s cached, measured at sf0.1). For a purely
    *    linear child the cache is overhead instead — use [[sortedOnce]]
    *    there (a3c/e1b: 4.8 s cached vs 3.1 s uncached).
    */
  def sortedSmall(df: DataFrame, cols: String*): DataFrame =
    graft.ops.Time.registerCached(df.cache())
      .repartition(1).sortWithinPartitions(cols.map(col): _*)

  /** [[sortedSmall]] without the cache: the single-partition total order
    * for a LINEAR child that is consumed exactly once — panel → UDAF →
    * explode chains have nothing to reuse, so materializing them into
    * the block store costs ~1.7 s at k=500 for no read.
    */
  def sortedOnce(df: DataFrame, cols: String*): DataFrame =
    df.repartition(1).sortWithinPartitions(cols.map(col): _*)
}
