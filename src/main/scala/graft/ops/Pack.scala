package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: laying documents out into fixed-token-budget
  * training sequences. Two industry-standard layouts:
  *
  *  - '''concat-and-chunk''' ([[concatChunk]]): concatenate the corpus in
  *    a stable order and cut every `budget` tokens; documents may
  *    straddle a cut (the trainer masks across the boundary). The layout
  *    is a pure function of the global token offset, so the whole op is
  *    an exclusive global cumsum.
  *  - '''greedy doc-boundary packing''' ([[greedyPack]]): within a group
  *    (source shard, language, …), fill a sequence until the next
  *    document would overflow the budget, then start a new one. No
  *    document is split; tail space is wasted instead.
  *
  * Scale: the global cumsum uses the same range-partition + per-partition
  * offset scheme as [[Relational.globalRowIds]] — no global-ORDER-BY
  * window, no single-partition stage, shuffle = one range exchange.
  * Greedy packing is sequential BY DESIGN (bin i depends on 1..i-1), so
  * the parallelism unit is the group: groups pack independently and in
  * parallel, and a group's documents must fit one executor's memory —
  * the same contract every production packer (e.g. a per-shard packing
  * pass) accepts.
  */
object Pack {

  /** Exclusive global running sum of `tokCol` in `orderCol` order —
    * [[Relational.globalCumSum]] (one shared implementation of the
    * range-partition + per-partition-offset scheme; see its scaladoc for
    * the shape and the distinct-`orderCol` precondition).
    */
  def globalCumSum(df: DataFrame, orderCol: String, tokCol: String,
                   outCol: String): DataFrame =
    Relational.globalCumSum(df, orderCol, tokCol, outCol)

  /** Concat-and-chunk: assign each document its global token offset, the
    * sequence id it starts in, and whether it straddles a cut. Emits
    * `offset`, `seq_id`, `straddles` alongside the input columns.
    */
  def concatChunk(df: DataFrame, orderCol: String, tokCol: String,
                  budget: Int): DataFrame = {
    require(budget > 0, s"concatChunk: budget must be positive, got $budget")
    globalCumSum(df, orderCol, tokCol, "offset")
      .withColumn("seq_id", floor(col("offset") / budget))
      // a zero-token document occupies no tokens and can never straddle;
      // without the guard, one sitting exactly on a chunk boundary would
      // evaluate floor((offset - 1)/budget) = seq_id - 1 and flag itself
      .withColumn("straddles",
        (col(tokCol) > 0 &&
          floor((col("offset") + col(tokCol) - 1) / budget) =!=
            col("seq_id")).cast("int"))
  }

  // top-level visibility: encoder codegen instantiates these from
  // generated classes, so they cannot be private
  case class PackIn(g: String, id: Long, tok: Int)
  case class PackOut(group: String, doc_id: Long, n_tokens: Int, bin: Int)

  /** Greedy doc-boundary packing per group: documents in `idCol` order
    * fill bin 0, 1, … — a new bin opens when the next document would
    * push the running total past `budget`. An oversized document gets a
    * bin of its own (it opens a fresh bin and overflows it alone).
    * Deterministic: output is a pure function of (group, id order, token
    * counts), so the DuckDB oracle reproduces it with a recursive CTE.
    */
  def greedyPack(spark: SparkSession, df: DataFrame, groupCol: String,
                 idCol: String, tokCol: String, budget: Int): DataFrame = {
    require(budget > 0, s"greedyPack: budget must be positive, got $budget")
    import spark.implicits._
    val in = df.select(col(groupCol).cast("string").as("g"),
      col(idCol).cast("long").as("id"), col(tokCol).cast("int").as("tok"))
      .as[PackIn]
    in.groupByKey(_.g)
      .flatMapGroups { (g, it) =>
        var bin = 0
        var acc = 0L
        it.toSeq.sortBy(_.id).iterator.map { r =>
          if (acc > 0 && acc + r.tok > budget) { bin += 1; acc = 0L }
          acc += r.tok
          PackOut(g, r.id, r.tok, bin)
        }
      }
      .toDF()
  }
}
