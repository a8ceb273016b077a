package graft.ops

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import org.apache.spark.sql.{DataFrame, SparkSession}

/** One encoded image: document id plus PNG bytes. */
case class ImageRow(doc_id: Long, png: Array[Byte])

/** One DECODED image: document id, dimensions, and the raster samples in
  * row-major (y·w + x)·3 + c order — the materialization row of the
  * decode-once lake pattern (see [[Images.rasterize]]).
  */
case class RasterRow(doc_id: Long, width: Int, height: Int,
                     px: Array[Int])

/** Real-codec image operators over binary columns — the non-stub tier of
  * the multimodal family ([[Multimodal]] keeps the byte-domain stubs for
  * the formats this JVM genuinely cannot decode, e.g. video).
  *
  * The codec is `javax.imageio` (PNG — lossless, so decoded samples are
  * bit-identical to what was encoded) and the resize is `Graphics2D`
  * nearest-neighbor. Everything runs in `mapPartitions` so per-task codec
  * setup (`ImageIO.setUseCache(false)` — keeps encode/decode purely
  * in-memory instead of spilling a disk cache file per call) happens once
  * per partition, not per row; only (doc_id, png) reach the boundary
  * after column pruning, and the output is a narrow metadata row, so the
  * one deliberate codegen break stays cheap. No shuffle anywhere —
  * partitioning is whatever the upstream scan had.
  *
  * The fixture ships no media files, so [[synthesize]] generates a
  * deterministic PNG per document: channel sample (x, y, c) of document
  * d is `(d*1000003 + x*7919 + y*104729 + c*131) mod 256`. That exact
  * arithmetic is replayable in SQL, which is what makes the decode /
  * resize / feature queries hash-gradeable end to end against DuckDB:
  * the oracle computes the expected pixels arithmetically, the engine
  * must round-trip them through a REAL encode → decode (→ resize) to
  * match.
  */
object Images {

  /** Deterministic channel sample for document `docId` at (x, y, band). */
  def pixel(docId: Long, x: Int, y: Int, c: Int): Int =
    ((docId * 1000003L + x * 7919L + y * 104729L + c * 131L) % 256L).toInt

  private def render(docId: Long, w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    val r = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) { r.setSample(x, y, c, pixel(docId, x, y, c)); c += 1 }
        x += 1
      }
      y += 1
    }
    img
  }

  /** Docs per codec task: enough render+encode work (~tens of ms at
    * fixture geometry) that a task is not mostly scheduling overhead,
    * small enough that 100k+ docs still fan far wider than any core
    * count. Replaces the unconditional core-count fan-out (r22): at
    * 5k fixture docs `defaultParallelism` made 32 near-empty tasks —
    * the 8-core sweep beat the 32-core one on m7/m8 purely on task
    * dispatch.
    */
  private val SynthDocsPerTask = 512L

  /** Generate the per-document PNG column: (doc_id) → (doc_id, png).
    * Distributed map — each task encodes its own partition's images.
    *
    * The id stream is round-robin spread first: codec work per row
    * dwarfs row bytes, so the upstream scan's byte-sized partitioning
    * (the 5k-doc fixture reads as 1-2 splits) would funnel every render
    * through one or two tasks — the guide §2.5 "CPU fan-out off a
    * byte-small input" shape. The repartition moves only 8-byte ids,
    * and the count is split-metadata-cheap (the lshBuckets idiom). The
    * partition count follows the WORK (docs to encode, see
    * [[SynthDocsPerTask]]), not the core count — a local[32] constant
    * would both over-split small fixtures and under-split a corpus.
    */
  def synthesize(spark: SparkSession, docIds: DataFrame,
                 w: Int, h: Int): DataFrame = {
    import spark.implicits._
    val ids = docIds.select("doc_id")
    val parts = Relational.boundedPartitions(ids.count(), SynthDocsPerTask)
    ids.repartition(parts)
      .as[Long].mapPartitions { it =>
      ImageIO.setUseCache(false)
      it.map { id =>
        val bos = new ByteArrayOutputStream()
        ImageIO.write(render(id, w, h), "png", bos)
        ImageRow(id, bos.toByteArray)
      }
    }.toDF()
  }

  /** Raster samples of a decoded image in row-major (y·w + x)·3 + c
    * order — the one flattening convention shared by the checksum, the
    * raster table, and the raster→image rebuild, so they cannot drift.
    */
  private def rasterOf(img: BufferedImage): Array[Int] = {
    val r = img.getRaster
    val (w, h) = (img.getWidth, img.getHeight)
    val px = new Array[Int](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) {
          px(((y * w + x) * 3) + c) = r.getSample(x, y, c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    px
  }

  /** The inverse of [[rasterOf]]: rebuild a BufferedImage from raster
    * samples, so raster-table consumers can run REAL Java2D transforms
    * (resize) without re-paying the PNG decode.
    */
  private def imageOf(w: Int, h: Int, px: Array[Int]): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    val r = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) {
          r.setSample(x, y, c, px(((y * w + x) * 3) + c))
          c += 1
        }
        x += 1
      }
      y += 1
    }
    img
  }

  /** Pixel-weighted checksum: Σ sample·(idx+1) over the row-major raster
    * (idx = (y·w + x)·3 + c). Position-weighting makes the checksum
    * sensitive to pixel ORDER, not just the value multiset — a decoder
    * that transposed, flipped, or swapped channels would still sum the
    * same values but fail the checksum.
    */
  private def checksumPx(px: Array[Int]): Long = {
    var acc = 0L
    var i = 0
    while (i < px.length) { acc += px(i).toLong * (i + 1); i += 1 }
    acc
  }

  private def checksum(img: BufferedImage): Long = checksumPx(rasterOf(img))

  /** Decode one payload, or None when the codec rejects it
    * (`ImageIO.read` returns null for undecodable bytes and throws on
    * truncated streams). At corpus scale corrupt media is routine — a
    * bad object must cost one skipped row, never a task (the same
    * per-unit tolerance contract as the reference's per-window Try,
    * SURVEY §2.11).
    */
  private def tryDecode(png: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(png)))
    catch { case _: java.io.IOException => None }

  /** Decode each PNG and emit (doc_id, width, height, px_checksum).
    * Undecodable payloads are dropped (see [[tryDecode]]); pair with
    * [[decodeFailures]] when the skip set must be audited.
    */
  def decodeMeta(spark: SparkSession, images: DataFrame): DataFrame = {
    import spark.implicits._
    images.as[ImageRow].mapPartitions { it =>
      ImageIO.setUseCache(false)
      it.flatMap { m =>
        tryDecode(m.png).map(img =>
          (m.doc_id, img.getWidth, img.getHeight, checksum(img)))
      }
    }.toDF("doc_id", "width", "height", "px_checksum")
  }

  /** The audit complement of [[decodeMeta]]: ids whose payload the codec
    * rejected, with the byte length — what a curation pipeline logs and
    * quarantines rather than silently dropping.
    */
  def decodeFailures(spark: SparkSession, images: DataFrame): DataFrame = {
    import spark.implicits._
    images.as[ImageRow].mapPartitions { it =>
      ImageIO.setUseCache(false)
      it.collect { case m if tryDecode(m.png).isEmpty =>
        (m.doc_id, m.png.length)
      }
    }.toDF("doc_id", "n_bytes")
  }

  /** Decode, nearest-neighbor downscale by integer `factor` via
    * `Graphics2D`, and emit the resized (doc_id, width, height,
    * px_checksum). Java2D's nearest-neighbor inverse-maps each output
    * pixel center, so output (x, y) samples input
    * (factor·x + factor − 1, factor·y + factor − 1) for even factors —
    * pinned by ImagesSpec's golden so the SQL oracle can replay it.
    */
  /** Real Java2D nearest-neighbor downscale by integer `factor` — the
    * one resize implementation behind [[resizeMeta]] (PNG input) and
    * [[rasterResizeMeta]] (raster-table input).
    */
  private def resized(src: BufferedImage, factor: Int): BufferedImage = {
    val (w, h) = (src.getWidth / factor, src.getHeight / factor)
    val dst = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    val g = dst.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
        RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
      g.drawImage(src, 0, 0, w, h, null)
    } finally g.dispose()
    dst
  }

  def resizeMeta(spark: SparkSession, images: DataFrame,
                 factor: Int): DataFrame = {
    require(factor > 1, s"resizeMeta: factor must be > 1, got $factor")
    import spark.implicits._
    images.as[ImageRow].mapPartitions { it =>
      ImageIO.setUseCache(false)
      it.flatMap { m =>
        tryDecode(m.png).map { src =>
          val dst = resized(src, factor)
          (m.doc_id, dst.getWidth, dst.getHeight, checksum(dst))
        }
      }
    }.toDF("doc_id", "width", "height", "px_checksum")
  }

  /** Per-channel statistics of the decoded pixels — the honest "feature
    * extraction" a metadata pipeline runs before any learned encoder:
    * (doc_id, channel, sum_v, mean_v) with the mean as truncating
    * integer division (exact in both engines; no fp in the grade).
    */
  def channelStats(spark: SparkSession, images: DataFrame): DataFrame = {
    import spark.implicits._
    images.as[ImageRow].mapPartitions { it =>
      ImageIO.setUseCache(false)
      it.flatMap { m =>
        tryDecode(m.png).toSeq.flatMap { img =>
          val r = img.getRaster
          val (w, h) = (img.getWidth, img.getHeight)
          val sums = new Array[Long](3)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              var c = 0
              while (c < 3) { sums(c) += r.getSample(x, y, c); c += 1 }
              x += 1
            }
            y += 1
          }
          (0 until 3).map(c =>
            (m.doc_id, c, sums(c), sums(c) / (w.toLong * h)))
        }
      }
    }.toDF("doc_id", "channel", "sum_v", "mean_v")
  }

  // ------------------------------------------------- decode-once tier
  //
  // A 100 TB media lake decodes each payload ONCE and materializes the
  // decoded raster; every feature extractor (checksum, resize,
  // channel stats, any future embedding) then scans the raster table
  // instead of re-paying the codec. The three consumers below are the
  // raster-table twins of decodeMeta / resizeMeta / channelStats —
  // byte-identical outputs (they share rasterOf/checksumPx/resized),
  // minus the per-consumer decode.

  /** Decode each PNG ONCE into its raster row — the materialization
    * target of the decode-once pattern. Undecodable payloads are
    * dropped, exactly as [[decodeMeta]] drops them (audit via
    * [[decodeFailures]]).
    */
  def rasterize(spark: SparkSession, images: DataFrame): DataFrame = {
    import spark.implicits._
    images.as[ImageRow].mapPartitions { it =>
      ImageIO.setUseCache(false)
      it.flatMap { m =>
        tryDecode(m.png).map(img =>
          RasterRow(m.doc_id, img.getWidth, img.getHeight, rasterOf(img)))
      }
    }.toDF()
  }

  /** [[decodeMeta]] off the raster table: (doc_id, width, height,
    * px_checksum) with no codec in the plan.
    */
  def rasterMeta(spark: SparkSession, raster: DataFrame): DataFrame = {
    import spark.implicits._
    raster.as[RasterRow].mapPartitions(_.map(r =>
      (r.doc_id, r.width, r.height, checksumPx(r.px))))
      .toDF("doc_id", "width", "height", "px_checksum")
  }

  /** [[resizeMeta]] off the raster table: rebuilds the image from the
    * raster samples and runs the SAME Java2D nearest-neighbor resize —
    * a real transform on decoded data, without re-paying the decode.
    */
  def rasterResizeMeta(spark: SparkSession, raster: DataFrame,
                       factor: Int): DataFrame = {
    require(factor > 1, s"rasterResizeMeta: factor must be > 1, got $factor")
    import spark.implicits._
    raster.as[RasterRow].mapPartitions(_.map { r =>
      val dst = resized(imageOf(r.width, r.height, r.px), factor)
      (r.doc_id, dst.getWidth, dst.getHeight, checksum(dst))
    }).toDF("doc_id", "width", "height", "px_checksum")
  }

  /** [[channelStats]] off the raster table: per-channel integer sums
    * and truncating mean straight from the raster samples.
    */
  def rasterChannelStats(spark: SparkSession,
                         raster: DataFrame): DataFrame = {
    import spark.implicits._
    raster.as[RasterRow].mapPartitions(_.flatMap { r =>
      val sums = new Array[Long](3)
      var i = 0
      while (i < r.px.length) { sums(i % 3) += r.px(i); i += 1 }
      (0 until 3).map(c =>
        (r.doc_id, c, sums(c), sums(c) / (r.width.toLong * r.height)))
    }).toDF("doc_id", "channel", "sum_v", "mean_v")
  }
}
