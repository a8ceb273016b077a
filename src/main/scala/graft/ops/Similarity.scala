package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search: exact brute-force cosine top-k (the
  * correctness baseline) and sign-bucket LSH pruning (the scale path).
  *
  * Numeric determinism contract: components are quantized to exact
  * integer micros (`round(x · 1e6)` as long — a ~1e-6 relative
  * quantization, below float32's own resolution for unit-scale
  * embeddings), so dot products and squared norms are plain long sums:
  * exact, associative (partition order cannot change them), identical in
  * any engine, and codegen'd — unlike high-precision decimal sums, which
  * fall onto Spark's boxed BigDecimal path (measured ~5× slower on the
  * same plans). The scale factor cancels in the cosine ratio, and the
  * final cosine = dot / √(na·nb) is a fixed sequence of IEEE double ops,
  * so rank-by-cosine is deterministic without rounding tricks.
  *
  * Scale notes: the long (vec_id, pos, xq) form is the 100 TB shape —
  * dot products are a shuffle by `pos` (or block id), norms a shuffle by
  * vec_id; nothing is collected. The probe side is broadcast. The LSH
  * variant prunes the target side to one bucket before any join, turning
  * top-k from O(N) per probe into O(N / 2^bits) expected.
  */
object Similarity {

  /** Long form: one row per (id, pos, xq: long micros), pos 1-based to
    * match the oracle's `embedding[i]` indexing.
    */
  def exploded(emb: DataFrame, idCol: String): DataFrame =
    emb.select(col(idCol), posexplode(col("embedding")).as(Seq("p", "xf")))
      .select(col(idCol), (col("p") + 1).as("pos"),
        round(col("xf").cast("double") * 1e6, 0).cast("long").as("xq"))

  /** Exact squared norm per vector (micros² units, long-exact: 64 dims ×
    * (1e6)² stays far under 2^63).
    */
  def sqNorms(exploded: DataFrame, idCol: String): DataFrame =
    exploded.groupBy(idCol)
      .agg(sum(col("xq") * col("xq")).as("sq"))

  /** Cosine similarity of every (probe, target) pair: probe side
    * broadcast, dot products shuffled by (qid, tid). Returns
    * (qid, tid, cosine: double); the micros scaling cancels in the ratio.
    */
  def cosine(qx: DataFrame, tx: DataFrame, qn: DataFrame,
             tn: DataFrame): DataFrame = {
    val dots = tx.join(broadcast(qx.withColumnRenamed("xq", "qxv")
        .withColumnRenamed("vec_id", "qid")), Seq("pos"))
      .groupBy(col("qid"), col("vec_id").as("tid"))
      .agg(sum(col("xq") * col("qxv")).as("dot"))
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
