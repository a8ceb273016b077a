package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Catalog
import graft.ops.Sample

/** Corpus-curation operators a training-data pipeline runs between the
  * dedup/quality passes ([[LlmQueries]]) and the trainer: deterministic
  * dataset splitting, source-mixture downsampling, and sequence packing.
  *
  * Everything here is a pure function of row keys — map-only decisions
  * (split/mixture) or a single window pass (packing) — so the plans carry
  * zero shuffles beyond what the output grouping itself requires and hold
  * unchanged at 100 TB. Randomized sampling (`rand()`, `TABLESAMPLE`)
  * is deliberately absent: re-runs, retries, and engine changes must not
  * move a document across the train/test boundary.
  */
object CurationQueries {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Catalog.load(s, dir, name)

  // c2: deterministic train/val/test split. The assignment is a salted
  // md5 bucket of doc_id — stable under re-partitioning, re-runs, and
  // engines (the oracle reproduces the identical bucket), and map-only:
  // at 100 TB this is a projection on the scan, no shuffle, no state.
  private val SplitCuts = Seq("train" -> 80, "val" -> 90, "test" -> 100)
  private val qC2 = Q("c2_hash_split",
    (s, d) => T(s, d, "documents")
      .select(col("doc_id"),
        Sample.hashBucket("split", col("doc_id"), 100).as("bucket"),
        Sample.splitColumn("split", col("doc_id"), SplitCuts).as("split"))
      .orderBy("doc_id"),
    Some(s"""SELECT doc_id, bucket,
        CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val'
          ELSE 'test' END AS split
      FROM (SELECT doc_id,
          ${Sample.hashBucketSql("split", "doc_id", 100)} AS bucket
        FROM documents)
      ORDER BY doc_id"""))

  // c3: source-mixture downsampling. Each source domain gets a target
  // keep-rate (curated sources kept whole, bulk sources thinned); the
  // keep decision is a per-document stable bucket salted with the source
  // so rates are independent across strata. Map-only filter + one
  // rollup shuffle by source; the rate table would be a broadcast dim in
  // production (here it is an arithmetic rule so the oracle can mirror
  // it exactly).
  private val qC3 = Q("c3_domain_mixture",
    (s, d) => {
      val n = expr("cast(substring(source, 4) as int)")
      val rate = when(n < 5, 100).when(n < 10, 50).otherwise(25)
      val keep = Sample.keepFraction("mix",
        concat(col("source"), lit(":"), col("doc_id").cast("string")), rate)
      T(s, d, "documents")
        .select(col("source"), rate.as("rate_pct"), keep.cast("int").as("k"))
        .groupBy("source")
        .agg(min("rate_pct").as("rate_pct"), count(lit(1)).as("n_total"),
          sum("k").as("n_kept"))
        .orderBy("source")
    },
    Some(s"""SELECT source, min(rate_pct) AS rate_pct,
        count(*) AS n_total,
        CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      FROM (SELECT source, rate_pct,
          ${Sample.hashBucketSql("mix",
            "source || ':' || CAST(doc_id AS VARCHAR)", 100)} < rate_pct
            AS keep
        FROM (SELECT source, doc_id,
            CASE WHEN CAST(substr(source, 4) AS INT) < 5 THEN 100
              WHEN CAST(substr(source, 4) AS INT) < 10 THEN 50
              ELSE 25 END AS rate_pct
          FROM documents))
      GROUP BY source ORDER BY source"""))

  val all: Seq[Q] = Seq(qC2, qC3)
}
