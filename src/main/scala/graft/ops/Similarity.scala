package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * Scale notes: dot products and norms are computed on the quantized
  * ARRAY form via codegen'd higher-order functions ([[dotq]]) — one
  * projection per candidate row, no per-dimension explode shuffle (the
  * exploded form moves dims× more rows through every join; measured 4×
  * slower on the d5 verification at sf0.1). The long (vec_id, pos, xq)
  * [[exploded]] form remains the input to band bucketing, where the
  * plane join genuinely is per-dimension. Probe sides are broadcast;
  * nothing is collected. The LSH variant prunes candidates to band
  * buckets before any join.
  */
object Similarity {

  /** Long form: one row per (id, pos, xq: long micros), pos 1-based to
    * match the oracle's `embedding[i]` indexing.
    */
  def exploded(emb: DataFrame, idCol: String): DataFrame =
    emb.select(col(idCol), posexplode(col("embedding")).as(Seq("p", "xf")))
      .select(col(idCol), (col("p") + 1).as("pos"),
        round(col("xf").cast("double") * 1e6, 0).cast("long").as("xq"))

  /** Quantized array form with exact squared norm: (idCol, q:
    * array<long> micros, sq: long) — one map-only projection, the shape
    * every cosine verification joins against. dotq(q, q) is long-exact
    * (64 dims × (1e6)² stays far under 2^63).
    */
  def withSqNorm(emb: DataFrame, idCol: String): DataFrame =
    emb.select(col(idCol), quantized(col("embedding")).as("q"))
      .withColumn("sq", dotq(col("q"), col("q")))

  /** Top-k rows per probe by (cosine desc, tid asc) — deterministic given
    * the engine-independent cosine doubles.
    */
  def topK(cos: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("qid")
      .orderBy(col("cosine").desc, col("tid"))
    cos.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  // ------------------------------------------------- banded hyperplane LSH

  /** Number of hyperplane bits for a corpus of `n` vectors targeting
    * ~`target` vectors per bucket: the smallest b ≥ 3 with
    * target · 2^b ≥ n. Pure integer arithmetic (no floating log2 whose
    * last-ulp could differ between engines at power-of-two boundaries);
    * [[bitsSqlCase]] mirrors the identical ladder for the oracle.
    */
  def bitsFor(n: Long, target: Long = 64L): Int = {
    var b = 3
    while (b < MaxBits && (target << b) < n) b += 1
    b
  }

  /** Upper bound on the bits ladder (target·2^20 ≈ 67M vectors — far past
    * any test scale; at 100 TB the target itself would be raised).
    */
  val MaxBits = 20

  /** DuckDB CASE expression computing [[bitsFor]] from a count column
    * expression — same integer ladder, engine-identical.
    */
  def bitsSqlCase(countExpr: String, target: Long = 64L): String =
    (3 until MaxBits).map(b =>
        s"WHEN $countExpr <= ${target << b} THEN $b")
      .mkString("CASE ", " ", s" ELSE $MaxBits END")

  /** Seeded random hyperplanes as a relation (band, bit, pos, s) with
    * s ∈ {−1, +1}: the sign is the low bit of the 60-bit md5 hash of
    * "band:bit:p" (p 0-based; pos = p+1 matches [[exploded]]'s 1-based
    * positions). A ±1 Rademacher matrix is a valid random-projection
    * family for sign-LSH, and the md5 derivation makes every coefficient
    * reproducible in ANY engine — the DuckDB oracle regenerates the same
    * planes from the same strings instead of receiving a giant literal.
    */
  def hyperplanes(spark: SparkSession, bands: Int, bits: Int,
                  dims: Int): DataFrame = {
    val b = spark.range(bands).select(col("id").as("band"))
    val t = spark.range(bits).select(col("id").as("bit"))
    val p = spark.range(dims).select(col("id").as("p"))
    b.crossJoin(t).crossJoin(p)
      .select(col("band"), col("bit"), (col("p") + 1).as("pos"),
        (Text.hash60(concat_ws(":", col("band"), col("bit"), col("p")))
          .bitwiseAND(lit(1L)) * 2 - 1).as("s"))
  }

  /** The ±1 sign of plane (band, bit, pos 0-based), computed driver-side:
    * low bit of the 60-bit prefix of md5("band:bit:p") — the EXACT value
    * [[hyperplanes]] derives relationally (and the oracle SQL mirrors),
    * checked equal in SimilaritySpec. Materializing the bands·bits·dims
    * sign matrix on the driver (a few thousand bytes) lets bucketing run
    * as a map-only projection instead of a per-dimension plane join.
    */
  def planeSigns(bands: Int, bits: Int, dims: Int): Seq[Seq[Seq[Long]]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until bands).map(b => (0 until bits).map(t => (0 until dims).map {
      p =>
        md.reset()
        val hex = md.digest(s"$b:$t:$p".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 15)
        (java.lang.Long.parseLong(hex, 16) & 1L) * 2 - 1
    }))
  }

  /** Map-only banded bucketing over the quantized ARRAY form (id, q):
    * bucket bit t of band b is set iff dotq(q, signs(b)(t)) > 0, with the
    * signs as array literals — no join, no explode, no shuffle; one
    * narrow (id, band, bucket) output row per band via an inline
    * struct-array explode. Integer-exact and bit-identical to
    * [[bandBuckets]] (asserted in SimilaritySpec); preferred when the
    * embedding fits an array column, which is the common case.
    */
  def bandBucketsFromSigns(embq: DataFrame, idCol: String,
                           signs: Seq[Seq[Seq[Long]]]): DataFrame = {
    val bandStructs = signs.zipWithIndex.map { case (band, b) =>
      val bucket = band.zipWithIndex.map { case (plane, t) =>
        when(dotq(col("q"), typedLit(plane)) > 0, lit(1L << t))
          .otherwise(0L)
      }.reduce(_ + _)
      struct(lit(b.toLong).as("band"), bucket.as("bucket"))
    }
    embq.select(col(idCol), explode(array(bandStructs: _*)).as("e"))
      .select(col(idCol), col("e.band").as("band"),
        col("e.bucket").as("bucket"))
  }

  /** Per-(vector, band) LSH bucket id: bit b of the bucket is set iff the
    * exact integer projection Σ_pos s(band,b,pos) · xq(pos) is positive.
    * One shuffle keyed (id, band) with `bits` conditional partial sums —
    * integer-exact, so bucketing is identical across engines. Input is
    * the long [[exploded]] form; `planes` is broadcast (bands·bits·dims
    * rows — a few thousand). Use this relational form when vectors only
    * exist exploded (e.g. [[CorrPrune]]'s long panels); prefer
    * [[bandBucketsFromSigns]] for array-column embeddings.
    */
  def bandBuckets(ex: DataFrame, idCol: String, planes: DataFrame,
                  bits: Int): DataFrame = {
    val projAggs = (0 until bits).map(b =>
      sum(when(col("bit") === b, col("s") * col("xq")).otherwise(0L))
        .as(s"pj$b"))
    ex.join(broadcast(planes), Seq("pos"))
      .groupBy(col(idCol), col("band"))
      .agg(projAggs.head, projAggs.tail: _*)
      .select(col(idCol), col("band"),
        (0 until bits).map(b =>
          when(col(s"pj$b") > 0, lit(1L << b)).otherwise(0L))
          .reduce(_ + _).as("bucket"))
  }

  /** Number of independent band tables for an ANN probe at corpus size
    * `n`: 4·bits + 4. Each extra bit halves a band's hit probability
    * p^bits for pairs at a fixed angle, so the band count must grow with
    * the bit width to hold recall — the classic LSH amplification
    * tradeoff (recall = 1 − (1 − p^bits)^bands). The linear-in-bits ramp
    * holds measured recall@3 ≥ 0.93 on the fixture's near-random
    * neighbors (angle ≈ 67°) at both test scales; a corpus with a real
    * similarity gap needs far fewer bands for the same recall.
    */
  def bandsFor(bits: Int): Int = 4 * bits + 4

  /** Shared DuckDB CTE fragment mirroring [[hyperplanes]] +
    * [[bandBuckets]]: defines `meta(bits)`, `planes` and
    * `bk(vec_id, band, bucket)`. Expects the `x` CTE (exploded quantized
    * vectors) to be in scope. `bandsExpr` is a SQL expression for the
    * band count (a literal, or `"(SELECT 4 * bits + 4 FROM meta)"` for
    * the [[bandsFor]] ramp) — an expression, not an Int, because the
    * oracle SQL is built statically while the band count derives from
    * the corpus size at run time.
    */
  def bucketsSqlCtes(bandsExpr: String, dims: Int,
                     target: Long = 64L): String =
    s"""meta AS (
        SELECT ${bitsSqlCase("count(*)", target)} AS bits FROM embeddings),
      planes AS (
        SELECT band, bit, p + 1 AS pos,
          CASE WHEN (CAST(concat('0x',
              substr(md5(band || ':' || bit || ':' || p), 1, 15)) AS BIGINT)
              & 1) = 1 THEN 1 ELSE -1 END AS s
        FROM (SELECT unnest(range($bandsExpr)) AS band) bb
        CROSS JOIN (SELECT unnest(range((SELECT bits FROM meta)))
                    AS bit) tt
        CROSS JOIN (SELECT unnest(range($dims)) AS p) pp),
      proj AS (
        SELECT x.vec_id, pl.band, pl.bit, sum(pl.s * x.xq) AS pj
        FROM x JOIN planes pl ON pl.pos = x.pos
        GROUP BY 1, 2, 3),
      bk AS (
        SELECT vec_id, band,
          sum(CASE WHEN pj > 0 THEN (CAST(1 AS BIGINT) << bit)
              ELSE 0 END) AS bucket
        FROM proj GROUP BY 1, 2)"""

  /** Quantize a float embedding array to exact integer micros — the
    * array-form twin of [[exploded]]'s xq.
    */
  def quantized(emb: Column): Column =
    transform(emb, x => round(x.cast("double") * 1e6, 0).cast("long"))

  /** Exact integer dot product of two quantized arrays: a single-pass
    * codegen'd higher-order function — no 64-way explode, no shuffle. The
    * long sums are associative and engine-exact (dims · (1e6)² ≪ 2^63).
    */
  def dotq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

}
