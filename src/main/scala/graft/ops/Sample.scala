package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-reproducible sampling and dataset splitting.
  *
  * A training-data pipeline needs sampling decisions that are (a) stable
  * across re-runs, partitionings, and engines — a document's split
  * assignment must never change when the corpus is re-shuffled or the job
  * retried — and (b) map-only at any scale: the decision is a pure
  * function of the row's key, so 100 TB splits with zero shuffles.
  * `rand()`-based sampling fails (a); `TABLESAMPLE` fails both.
  *
  * The primitive is a salted md5 bucket: the first 8 hex chars of
  * md5(salt || key) parsed as an integer, mod `buckets`. md5 is bit-exact
  * in every engine (the DuckDB oracle computes the identical bucket with
  * `('0x' || substr(md5(...), 1, 8))::BIGINT`), and the salt gives every
  * sampling decision an independent hash so a doc's split assignment and
  * its mixture keep/drop are uncorrelated.
  *
  * Reference anchor: the reference pipeline pulls fixed universes
  * (cloud_TAQ/taq_chunks.py:21 `chunk_size=100`) and has no sampling
  * story; this is part of the beyond-reference LLM-curation surface.
  */
object Sample {

  /** Uniform stable bucket in [0, buckets) from a salted md5 of `key`.
    * 32 bits of hash → bias from the mod is < 2⁻²⁵ for any `buckets`
    * ≤ 10⁴ — far below anything a corpus-scale split can observe.
    */
  def hashBucket(salt: String, key: Column, buckets: Int): Column = {
    require(buckets > 0 && buckets <= 10000,
      s"hashBucket: buckets must be in [1, 10000], got $buckets")
    conv(substring(md5(concat(lit(salt + ":"), key.cast("string"))), 1, 8),
      16, 10).cast("bigint") % buckets
  }

  /** The DuckDB-SQL mirror of [[hashBucket]], for oracle queries. */
  def hashBucketSql(salt: String, keyExpr: String, buckets: Int): String =
    s"('0x' || substr(md5('$salt:' || CAST($keyExpr AS VARCHAR)), 1, 8))" +
      s"::BIGINT % $buckets"

  /** Named split assignment from cumulative percentage cut points, e.g.
    * `Seq("train" -> 80, "val" -> 90, "test" -> 100)` → 80/10/10. The
    * last cut must be 100 so every bucket lands in a split.
    */
  def splitColumn(salt: String, key: Column,
                  cuts: Seq[(String, Int)]): Column = {
    require(cuts.nonEmpty && cuts.last._2 == 100 &&
      cuts.map(_._2) == cuts.map(_._2).sorted,
      s"splitColumn: cuts must be ascending and end at 100, got $cuts")
    val b = hashBucket(salt, key, 100)
    cuts.init.foldRight(lit(cuts.last._1)) { case ((name, cut), els) =>
      when(b < cut, name).otherwise(els)
    }
  }

  /** Keep a row iff its stable bucket falls under `ratePct` percent.
    * Per-stratum rates compose by building `ratePct` from the stratum
    * column (see `c3_domain_mixture`); the salt should include the
    * stratum so rates are independent across strata.
    */
  def keepFraction(salt: String, key: Column, ratePct: Column): Column =
    hashBucket(salt, key, 100) < ratePct
}
