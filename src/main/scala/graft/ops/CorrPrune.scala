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
  * solve with banded random-hyperplane LSH. Candidate pairs share a
  * (band, bucket); they are then verified with the exact
  * [[Stats.pearson]] aggregate, so emitted pairs are exact and only
  * recall is probabilistic (1 − (1 − p^bits)^bands with p = 1 − θ/π — at
  * ρ ≥ 0.9, θ ≤ 26° and a handful of bands already give ≥ 0.99; choose
  * bands/bits for the target threshold).
  *
  * Centering is integer-exact so the buckets are reproducible in ANY
  * engine (the DuckDB oracle mirrors them): with xq = round(x·1e6) and
  * per-series S = Σxq, n = count, the centered projection's sign is
  *   sign(Σ_p s_p·(xq_p − S/n)) = sign(n·Σ_p s_p·xq_p − S·Σ_p s_p)
  * — all long arithmetic, no floating mean whose last ulp could flip a
  * bucket bit between engines. Bounds: |xq| ≤ 10⁹, positions ≤ 10³ keeps
  * n·Σs·xq under 10¹⁵ ≪ 2⁶³.
  *
  * Cost shape at k series × T buckets: bucketing shuffles k·bands rows
  * (the plane join is per-position, like d2's band machinery); candidate
  * generation is O(bands · bucketSize · k) — linear in k — versus the
  * Θ(k²) pair join. Requires the aligned (post-resample) panel where
  * every series lives on the same grid, the flagship's shape after
  * ffill; leading-null grid slots are simply absent from the sums on
  * both sides.
  */
object CorrPrune {

  /** Candidate (i, j) series pairs (i < j) whose centered-vector LSH
    * buckets collide in at least one band. `panel` is the aligned long
    * panel (keyCol, posCol: 1-based int grid position ≤ dims, valueCol).
    */
  def corrCandidates(panel: DataFrame, keyCol: String, posCol: String,
                     valueCol: String, dims: Int, bands: Int,
                     bits: Int): DataFrame = {
    val ex = panel.select(col(keyCol), col(posCol).as("pos"),
        round(col(valueCol) * 1e6, 0).cast("long").as("xq"))
      .where(col("xq").isNotNull)
    val stats = ex.groupBy(keyCol)
      .agg(sum("xq").as("sx"), count(lit(1)).as("nx"))
    val planes =
      Similarity.hyperplanes(panel.sparkSession, bands, bits, dims)
    val projAggs = (0 until bits).flatMap(b => Seq(
      sum(when(col("bit") === b, col("s") * col("xq")).otherwise(0L))
        .as(s"p$b"),
      sum(when(col("bit") === b, col("s")).otherwise(0L)).as(s"q$b")))
    val bk = ex.join(broadcast(planes), Seq("pos"))
      .groupBy(col(keyCol), col("band"))
      .agg(projAggs.head, projAggs.tail: _*)
      .join(broadcast(stats), Seq(keyCol))
      .select(col(keyCol), col("band"),
        (0 until bits).map(b =>
          when(col("nx") * col(s"p$b") - col("sx") * col(s"q$b") > 0,
            lit(1L << b)).otherwise(0L))
          .reduce(_ + _).as("bucket"))
    bk.select(col("band"), col("bucket"), col(keyCol).as("i"))
      .join(bk.select(col("band"), col("bucket"), col(keyCol).as("j")),
        Seq("band", "bucket"))
      .where(col("i") < col("j"))
      .select("i", "j").distinct()
  }

  /** Exact Pearson (via [[Stats.pearson]], pairwise-complete) for every
    * LSH candidate pair — unrounded and unfiltered, so callers control
    * the threshold/rounding (and their oracle mirrors it). Output rows
    * are a subset of the exact all-pairs answer; recall is governed by
    * bands/bits.
    */
  def candidateRho(panel: DataFrame, keyCol: String, posCol: String,
                   valueCol: String, dims: Int, bands: Int,
                   bits: Int): DataFrame = {
    val cand = corrCandidates(panel, keyCol, posCol, valueCol, dims,
      bands, bits)
    val a = panel.select(col(keyCol).as("i"), col(posCol).as("pos"),
      col(valueCol).as("va"))
    val b = panel.select(col(keyCol).as("j"), col(posCol).as("pos"),
      col(valueCol).as("vb"))
    // Broadcast the panel sides: the candidate×dims expansion (pairs ·
    // positions) stays map-side and the only shuffle is the final
    // per-pair partial-aggregated pearson — without the hints both joins
    // shuffle the expanded relation (measured 2× the whole query's cost
    // at sf0.1). The panel is dimension-sized (k·dims), broadcastable by
    // construction for any k this tier serves; at cluster scale the same
    // shape holds (a 2000×10⁴ panel is ~160 MB — switch to a bucketed
    // layout past that).
    cand.join(broadcast(a), Seq("i")).join(broadcast(b), Seq("j", "pos"))
      .groupBy("i", "j")
      .agg(Stats.pearson(col("va"), col("vb")).as("rho"))
  }

  /** Panel-cell ceiling for [[candidateRho]]'s broadcast verify: k·dims
    * grid cells ≈ 8 bytes each, so 2×10⁷ cells is the ~160 MB panel the
    * broadcast comment bounds. Past it, [[candidateRhoVectors]] is the
    * verify path — [[graft.SparkEntry.panelRho]] switches on this.
    */
  val BroadcastVerifyMaxCells: Long = 20000000L

  /** [[candidateRho]] without broadcasting the panel: the verify path
    * for panels past [[BroadcastVerifyMaxCells]] (k ≳ 2000 at 10⁴
    * positions), where shipping every executor a full panel copy stops
    * scaling. The panel is first contracted to ONE COMPACT VECTOR ROW
    * per series (pos-ordered value array — k rows instead of k·dims),
    * which is the only panel-sized shuffle in the plan; each candidate
    * pair then joins its two vectors (shuffles move candidate-sized
    * relations and k vector rows, never the cell-level panel), the pair
    * explodes its zipped positions MAP-SIDE, and the partial-aggregated
    * [[Stats.pearson]] — the identical aggregate the broadcast path
    * runs, null slots skipped pairwise — crosses the final shuffle as
    * one co-moment row per pair. Same output as [[candidateRho]] on any
    * input; only the physical strategy differs.
    */
  def candidateRhoVectors(panel: DataFrame, keyCol: String, posCol: String,
                          valueCol: String, dims: Int, bands: Int,
                          bits: Int): DataFrame = {
    val cand = corrCandidates(panel, keyCol, posCol, valueCol, dims,
      bands, bits)
    // array_sort orders the structs by pos (distinct within a series),
    // so the vector is position-aligned; null values ride inside the
    // structs (collect_list only skips null STRUCTS) and keep the
    // pairwise-complete semantics through the zip below
    val vecs = panel.groupBy(col(keyCol))
      .agg(transform(array_sort(collect_list(struct(col(posCol).as("p"),
        col(valueCol).as("v")))), e => e.getField("v")).as("vs"))
    cand
      .join(vecs.select(col(keyCol).as("i"), col("vs").as("va")), Seq("i"))
      .join(vecs.select(col(keyCol).as("j"), col("vs").as("vb")), Seq("j"))
      .select(col("i"), col("j"),
        explode(zip_with(col("va"), col("vb"),
          (x, y) => struct(x.as("x"), y.as("y")))).as("e"))
      .groupBy("i", "j")
      .agg(Stats.pearson(col("e.x"), col("e.y")).as("rho"))
  }
}
