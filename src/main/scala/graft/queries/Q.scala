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
    * sample). Caching the pre-sort result lets the sample and the sort
    * read the same materialized rows. Only for results that fit memory —
    * every grading query's output qualifies by the bounded-output
    * convention. The cache is registered with [[graft.ops.Time]]'s
    * lifecycle (Verify/Bench also clearCache per query).
    */
  def sortedSmall(df: DataFrame, cols: String*): DataFrame =
    graft.ops.Time.registerCached(df.cache()).orderBy(cols.map(col): _*)
}
