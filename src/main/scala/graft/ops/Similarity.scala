package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Embedding similarity search: exact brute-force cosine top-k (the
  * correctness baseline) and a sign-bucket LSH variant (the scale path).
  *
  * Numeric determinism contract: dot products and squared norms are summed
  * as exact decimals (each float·float product is one IEEE double multiply
  * — bit-identical in any engine — and the decimal sum is associative, so
  * partial aggregation order cannot change the result). The final
  * cosine = dot / sqrt(na·nb) is then a fixed sequence of IEEE double ops,
  * so Spark and the DuckDB oracle produce the same double, making
  * rank-by-cosine deterministic without rounding tricks.
  *
  * Scale notes: the long (vec_id, pos, x) form is the 100 TB shape — dot
  * products are a shuffle by `pos` (or by block id with blocked vectors),
  * norms a shuffle by vec_id; nothing is collected. The query side is
  * broadcast (few probe vectors against many targets). The LSH variant
  * prunes the target side to one bucket before any join, turning top-k
  * from O(N) per probe into O(N / 2^bits) expected.
  */
object Similarity {

  private val dec = DecimalType(38, 20)

  /** Long form: one row per (id, pos, x: double), pos 1-based to match the
    * oracle's `embedding[i]` indexing.
    */
  def exploded(emb: DataFrame, idCol: String): DataFrame =
    emb.select(col(idCol), posexplode(col("embedding")).as(Seq("p", "xf")))
      .select(col(idCol), (col("p") + 1).as("pos"),
        col("xf").cast("double").as("x"))

  /** Exact squared norm per vector, summed as decimal. */
  def sqNorms(exploded: DataFrame, idCol: String): DataFrame =
    exploded.groupBy(idCol)
      .agg(sum((col("x") * col("x")).cast(dec)).as("sq"))

  /** Cosine similarity of every (probe, target) pair reachable through
    * `pairsPosJoin` — callers supply the candidate generation (brute force:
    * all targets; LSH: same-bucket targets). Returns
    * (qid, tid, cosine: double).
    */
  def cosine(qx: DataFrame, tx: DataFrame, qn: DataFrame,
             tn: DataFrame): DataFrame = {
    val dots = tx.join(broadcast(qx.withColumnRenamed("x", "qxv")
        .withColumnRenamed("vec_id", "qid")), Seq("pos"))
      .groupBy(col("qid"), col("vec_id").as("tid"))
      .agg(sum((col("x") * col("qxv")).cast(dec)).as("dot"))
    dots
      .join(broadcast(qn.select(col("vec_id").as("qid"),
        col("sq").as("qsq"))), Seq("qid"))
      .join(tn.select(col("vec_id").as("tid"), col("sq").as("tsq")),
        Seq("tid"))
      .select(col("qid"), col("tid"),
        (col("dot").cast("double") /
          sqrt(col("qsq").cast("double") * col("tsq").cast("double")))
          .as("cosine"))
  }

  /** Top-k rows per probe by (cosine desc, tid asc) — deterministic given
    * the engine-independent cosine doubles.
    */
  def topK(cos: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("qid")
      .orderBy(col("cosine").desc, col("tid"))
    cos.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Sign-LSH bucket id from the first `bits` components:
    * Σ_d (x_d > 0) · 2^d. Cheap, deterministic, and balanced for
    * zero-centered embeddings; probes search only their own bucket.
    */
  def signBucket(emb: Column, bits: Int): Column =
    (0 until bits).map(d =>
        when(element_at(emb, d + 1) > 0f, lit(1 << d)).otherwise(lit(0)))
      .reduce(_ + _)
}
