package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational helpers: validity-interval joins, as-of joins, keep-first
  * dedup — the join/dedup shapes the reference implements with pandas
  * merge+query chains.
  */
object Relational {

  /** Partition count for a dimension-sized relation that pays a fixed
    * per-partition cost (an O(k²) aggregation buffer, a per-partition
    * checkpoint file): enough partitions that each holds ≥
    * `targetRowsPerPartition` rows, never fewer than one. The knob that
    * replaces a hard-coded coalesce(1) — at fixture scale it IS 1, at
    * 100× it grows with the input instead of serializing it.
    */
  def boundedPartitions(rows: Long, targetRowsPerPartition: Long): Int = {
    require(targetRowsPerPartition > 0)
    math.max(1L, math.min(4096L, rows / targetRowsPerPartition)).toInt
  }

  /** Inner equi + interval (theta) join: fact rows where `factDate` falls
    * inside the dimension's validity window `[fromCol, toCol]`.
    *
    * The reference does this twice per universe build — once as SQL
    * (`JOIN ... WHERE b.date BETWEEN a.start AND a.ending`,
    * reference TAQpipeline/correlation_matrix_exporter.py:12-18) and once as
    * pandas left-merge followed by `.query('date >= namedt and date <=
    * nameendt')` (:31-35), which is semantically an INNER interval join
    * because the filter drops null-extended rows. We reproduce it as a
    * single inner join with a compound condition: Catalyst extracts the
    * equi key for the shuffle/broadcast and keeps the BETWEEN as a residual
    * predicate, so at scale this is one hash join, not a range scan.
    */
  def joinValid(fact: DataFrame, dim: DataFrame, key: String,
                factDate: String, fromCol: String, toCol: String): DataFrame =
    fact.join(dim,
      fact(key) === dim(key) &&
        fact(factDate) >= dim(fromCol) && fact(factDate) <= dim(toCol),
      "inner")

  /** Backward as-of join, scalable form (union + sort + last-ignore-nulls):
    * for each left row, the latest right row with rightOrd <= leftOrd within
    * the same key. One shuffle by key, no per-row subquery — the reference's
    * per-ticker "pull a window then head(1)" (pyg_graphs.py:172-179) is an
    * N+1 anti-pattern this replaces.
    *
    * left must have (key, ord, ...); right must have (key, ord, payload).
    * Tie-break: at equal `ord`, right rows are considered visible to left
    * rows (<=), and among equal-ord right rows the one with the largest
    * `seqCol` wins. Returns left columns + `payload`.
    */
  def asofBackward(left: DataFrame, right: DataFrame, key: String,
                   ord: String, seq: String, payload: String): DataFrame = {
    // The payload rides inside a struct that is non-null exactly for
    // RIGHT rows: `last(ignoreNulls)` then tracks the latest right ROW,
    // so a right row whose payload value is null still wins (and yields
    // null), matching pandas merge_asof — a bare last(payload,
    // ignoreNulls) would skip it and resurrect an older value.
    val pType = new org.apache.spark.sql.types.StructType()
      .add(payload, right.schema(payload).dataType)
    val l = left.withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(pType))
    val r = right.select(col(key), col(ord), col(seq),
        struct(col(payload)).as("__p"))
      .withColumn("__side", lit(0))
    val unioned = l.select((left.columns.map(col) :+ col("__p") :+
      col("__side")): _*)
      .unionByName(r, allowMissingColumns = true)
    // right rows (__side=0) sort before left rows at equal ord, so a right
    // row at exactly ord is visible; among equal-ord rights, larger seq wins.
    val w = Window.partitionBy(key).orderBy(col(ord), col("__side"), col(seq))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .withColumn(payload, col("__asof")(payload))
      .drop("__p", "__side", "__asof")
  }

  /** pandas `drop_duplicates(keep='first')` with an explicit order: the
    * first row per key under (orderCols) — deterministic, unlike Spark's
    * `dropDuplicates` which keeps an arbitrary row.
    */
  def keepFirst(df: DataFrame, keys: Seq[String],
                order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }

  /** Exclusive global running sum of `sumCol` in ascending `orderCol`
    * order — the distributed replacement for a
    * `sum().over(Window.orderBy(orderCol))`, whose empty PARTITION BY
    * funnels the whole input through ONE task (Spark logs `WindowExec:
    * No Partition Defined` and serializes).
    *
    * Shape: range-repartition by the order column (partition i holds
    * smaller keys than partition i+1), cumsum within each partition (a
    * partitioned window), then shift by per-partition offsets — the
    * running sum of partition totals, computed on the partition-count-
    * sized side relation with a tiny triangular self-join (≤ shuffle
    * partitions² rows) so no global window appears anywhere. The input is
    * cached for the two passes (totals + join) so both see the same
    * physical partitioning; callers' harnesses clear caches per query.
    *
    * `orderCol` values must be distinct — with duplicates the order
    * among equals would be nondeterministic, which is exactly when a
    * global running sum is ill-defined.
    */
  def globalCumSum(df: DataFrame, orderCol: String, sumCol: String,
                   outCol: String): DataFrame = {
    val parted = df.repartitionByRange(col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .cache()
    val sums = parted.groupBy("__pid").agg(sum(sumCol).as("__s"))
    val offs = sums.as("a")
      .join(sums.as("b"), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(coalesce(sum(col("b.__s")), lit(0L)).as("__off"))
    val w = Window.partitionBy("__pid").orderBy(orderCol)
    parted.join(broadcast(offs), Seq("__pid"))
      .withColumn(outCol,
        col("__off") + sum(sumCol).over(w) - col(sumCol))
      .drop("__pid", "__off")
  }

  /** Dense 0-based ids in ascending `orderCol` order: the exclusive
    * running COUNT — [[globalCumSum]] over a constant 1. Same distinct-
    * `orderCol` precondition (ids from a `.distinct()` key dimension).
    */
  def globalRowIds(df: DataFrame, orderCol: String,
                   outCol: String): DataFrame =
    globalCumSum(df.withColumn("__one", lit(1L)), orderCol, "__one",
      outCol).drop("__one")
}
