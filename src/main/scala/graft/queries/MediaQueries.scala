package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Catalog
import graft.ops.Images

/** Real-codec multimodal queries (m5-m7): deterministic per-document
  * PNGs round-tripped through `javax.imageio` decode and `Graphics2D`
  * resize, hash-graded against a DuckDB oracle that computes the
  * expected pixels arithmetically (see [[graft.ops.Images]] — channel
  * (x, y, c) of doc d is `(d*1000003 + x*7919 + y*104729 + c*131) % 256`,
  * PNG is lossless, so a correct encode→decode chain reproduces it
  * exactly). The byte-domain m1-m4 stubs remain for formats this JVM
  * cannot decode; these three make the image path real end to end.
  */
object MediaQueries {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Catalog.load(s, dir, name)

  // fixture image geometry: small enough that the SQL oracle's
  // per-pixel unnest stays cheap (w*h*3 = 1,152 terms/doc), large
  // enough that a byte-order or channel-swap bug cannot collide
  private val W = 24
  private val H = 16

  private def pixelSql(x: String, y: String, c: String) =
    s"(doc_id * 1000003 + $x * 7919 + $y * 104729 + $c * 131) % 256"

  private val lanesSql =
    """(SELECT unnest(range(24)) AS x) rx,
       (SELECT unnest(range(16)) AS y) ry,
       (SELECT unnest(range(3)) AS c) rc"""

  /** The decode-ONCE raster lake table: every clean payload encoded,
    * PNG-decoded exactly one time, and persisted as (doc_id, width,
    * height, px). m5/m6/m7 are feature extractors over this table — the
    * real 100 TB media-lake shape, where the codec runs once per object
    * and every downstream pass scans decoded samples (m5-m7 used to
    * re-decode the same payloads 3×). m8 deliberately does NOT read it:
    * its graded surface IS the decode-tolerance path over corrupted
    * payloads.
    */
  private def raster(s: SparkSession, d: String): DataFrame =
    graft.sources.Materialize.table(s, d, "media_raster") {
      Images.rasterize(s, Images.synthesize(s, T(s, d, "documents"), W, H))
    }

  // m5: real PNG decode (now paid once, in the raster table build). The
  // engine encodes each doc's deterministic pixels to PNG and decodes
  // them back with javax.imageio; the graded surface is (dims,
  // position-weighted pixel checksum), which only matches the oracle's
  // arithmetic replay if the decode returns every sample at its exact
  // position — a transpose, flip, channel swap, or stride bug all shift
  // weights and fail the hash.
  private val qM5 = Q("m5_image_decode",
    (s, d) => Images.rasterMeta(s, raster(s, d))
      .orderBy("doc_id"),
    Some(s"""SELECT doc_id, CAST(24 AS INT) AS width,
        CAST(16 AS INT) AS height,
        CAST(sum((${pixelSql("x", "y", "c")})
          * ((y * 24 + x) * 3 + c + 1)) AS BIGINT) AS px_checksum
      FROM documents, $lanesSql
      GROUP BY doc_id ORDER BY doc_id"""))

  // m6: Graphics2D nearest-neighbor halving off the raster table.
  // Java2D inverse-maps each output center, so out(x, y) =
  // in(2x+1, 2y+1) — pinned by ImagesSpec's golden; the oracle replays
  // that mapping. The resize itself is still the REAL Java2D call on
  // the decoded samples — only the per-query PNG decode is gone.
  private val qM6 = Q("m6_image_resize",
    (s, d) => Images.rasterResizeMeta(s, raster(s, d), 2)
      .orderBy("doc_id"),
    Some(s"""SELECT doc_id, CAST(12 AS INT) AS width,
        CAST(8 AS INT) AS height,
        CAST(sum((${pixelSql("(2 * x + 1)", "(2 * y + 1)", "c")})
          * ((y * 12 + x) * 3 + c + 1)) AS BIGINT) AS px_checksum
      FROM documents,
        (SELECT unnest(range(12)) AS x) rx,
        (SELECT unnest(range(8)) AS y) ry,
        (SELECT unnest(range(3)) AS c) rc
      GROUP BY doc_id ORDER BY doc_id"""))

  // m7: per-channel pixel statistics off the decoded raster — integer
  // sums and truncating mean, so the grade is exact in both engines.
  private val qM7 = Q("m7_image_channel_stats",
    (s, d) => Images.rasterChannelStats(s, raster(s, d))
      .orderBy("doc_id", "channel"),
    Some(s"""SELECT doc_id, CAST(c AS INT) AS channel,
        CAST(sum(${pixelSql("x", "y", "c")}) AS BIGINT) AS sum_v,
        CAST(sum(${pixelSql("x", "y", "c")}) // 384 AS BIGINT) AS mean_v
      FROM documents, $lanesSql
      GROUP BY doc_id, c ORDER BY doc_id, channel"""))

  // m8: decode tolerance, oracle-graded. Every 50th document's payload
  // is corrupted (its PNG truncated to 7 bytes — inside the 8-byte PNG
  // signature, so every decoder rejects it); the graded surface is the
  // FULL outcome partition: surviving docs with their real decoded
  // checksum, failed docs flagged with null metrics. DuckDB predicts
  // both sides arithmetically, so a decode path that crashed on the bad
  // payload (no rows), silently dropped it (missing flagged rows), or
  // mis-decoded the good ones (checksum) all fail the hash.
  private val qM8 = Q("m8_decode_tolerance",
    (s, d) => {
      // cached: BOTH outcome partitions (decodeMeta + decodeFailures)
      // consume the encoded payloads — uncached, every PNG is rendered
      // and encoded twice (the codec is the whole cost of this query)
      val imgs = graft.ops.Time.registerCached(
        Images.synthesize(s, T(s, d, "documents"), W, H)
          .withColumn("png",
            when(col("doc_id") % 50 === 0,
              expr("substring(png, 1, 7)")).otherwise(col("png")))
          .cache())
      Images.decodeMeta(s, imgs)
        .withColumn("decoded", lit(1))
        .unionByName(Images.decodeFailures(s, imgs)
          .select(col("doc_id"), lit(null).cast("int").as("width"),
            lit(null).cast("int").as("height"),
            lit(null).cast("long").as("px_checksum"),
            lit(0).as("decoded")))
        .orderBy("doc_id")
    },
    Some(s"""SELECT doc_id,
        CASE WHEN doc_id % 50 != 0 THEN 24 END AS width,
        CASE WHEN doc_id % 50 != 0 THEN 16 END AS height,
        CASE WHEN doc_id % 50 != 0 THEN cks END AS px_checksum,
        CAST(doc_id % 50 != 0 AS INT) AS decoded
      FROM (
        SELECT doc_id,
          CAST(sum((${pixelSql("x", "y", "c")})
            * ((y * 24 + x) * 3 + c + 1)) AS BIGINT) AS cks
        FROM documents, $lanesSql
        GROUP BY doc_id)
      ORDER BY doc_id"""))

  val all: Seq[Q] = Seq(qM5, qM6, qM7, qM8)
}
