package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pair-pruned correlation tier for panels too wide for the one-pass
  * co-moment UDAF (its per-partition buffer is O(k²) doubles, which caps
  * it near k ≈ 1-2000 series — see SCALE.md's corr tier table).
  *
  * Identity that makes pruning possible: Pearson(a, b) is exactly the
  * cosine of the mean-CENTERED series vectors (standardization only
  * rescales each vector, and cosine is scale-invariant). So "find pairs
  * with ρ ≥ t" is an angular similarity search — the same problem d5/e2
  * solve with banded random-hyperplane LSH, and [[Similarity]]'s bucket
  * machinery transfers verbatim: center each series, quantize to integer
  * micros, bucket by seeded Rademacher projections, and only pairs
  * sharing a (band, bucket) become candidates. Candidates are then
  * verified with the exact [[Stats.pearson]] aggregate, so the OUTPUT is
  * exact; only recall is probabilistic (1 − (1 − p^bits)^bands with
  * p = 1 − θ/π — at ρ ≥ 0.9, θ ≤ 26° and a handful of bands already give
  * ≥ 0.99; choose bands/bits for the target threshold).
  *
  * Cost shape at k series × T buckets: centering is one aggregate +
  * broadcast join; bucketing shuffles k·bands rows; candidate
  * generation is O(bands · bucketSize · k) — linear in k at the
  * [[Similarity.bitsFor]] bucket-size target — versus the Θ(k²) pair
  * join. Requires the aligned (post-resample) panel where every series
  * covers the same grid, the flagship's shape after ffill.
  */
object CorrPrune {

  /** Candidate (i, j) series pairs (i < j) whose centered-vector LSH
    * buckets collide in at least one band — the prefilter for a
    * thresholded correlation search. `panel` must be an aligned long
    * panel (keyCol, posCol: 1-based int grid position, valueCol).
    */
  def corrCandidates(panel: DataFrame, keyCol: String, posCol: String,
                     valueCol: String, dims: Int, bands: Int,
                     bits: Int): DataFrame = {
    val means = panel.groupBy(keyCol)
      .agg(avg(col(valueCol)).as("__mean"))
    // centered, quantized to exact integer micros — the long (id, pos,
    // xq) shape Similarity.bandBuckets consumes
    val ex = panel.join(broadcast(means), Seq(keyCol))
      .select(col(keyCol), col(posCol).as("pos"),
        round((col(valueCol) - col("__mean")) * 1e6, 0).cast("long")
          .as("xq"))
    val planes =
      Similarity.hyperplanes(panel.sparkSession, bands, bits, dims)
    val bk = Similarity.bandBuckets(ex, keyCol, planes, bits)
    bk.select(col("band"), col("bucket"), col(keyCol).as("i"))
      .join(bk.select(col("band"), col("bucket"), col(keyCol).as("j")),
        Seq("band", "bucket"))
      .where(col("i") < col("j"))
      .select("i", "j").distinct()
  }

  /** Prune-then-verify thresholded correlation: exact Pearson (via
    * [[Stats.pearson]]) for every LSH candidate pair, kept at ρ ≥
    * `threshold`. Output rows are a subset of the exact all-pairs
    * answer (verification is exact); recall is governed by bands/bits.
    */
  def corrPairs(panel: DataFrame, keyCol: String, posCol: String,
                valueCol: String, dims: Int, bands: Int, bits: Int,
                threshold: Double): DataFrame = {
    val cand = corrCandidates(panel, keyCol, posCol, valueCol, dims,
      bands, bits)
    val a = panel.select(col(keyCol).as("i"), col(posCol).as("pos"),
      col(valueCol).as("va"))
    val b = panel.select(col(keyCol).as("j"), col(posCol).as("pos"),
      col(valueCol).as("vb"))
    cand.join(a, Seq("i")).join(b, Seq("j", "pos"))
      .groupBy("i", "j")
      .agg(Stats.pearson(col("va"), col("vb")).as("rho"))
      .where(col("rho") >= threshold)
  }
}
