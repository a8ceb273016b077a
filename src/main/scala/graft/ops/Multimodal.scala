package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One media object: an opaque binary payload plus its id. Real pipelines
  * carry (bytes, mime, width, height, …); the fixture has no media files,
  * so the payload is whatever bytes the caller supplies.
  */
case class MediaRow(doc_id: Long, payload: Array[Byte])

/** Decoded metadata the stub "codec" extracts per object. */
case class MediaMeta(doc_id: Long, n_bytes: Int, n_frames: Int,
                     sample_hash: String)

/** Multimodal binary-column plumbing: treat image/audio/video as opaque
  * `binary` columns and run decode / feature-extraction as a typed
  * partition-local pass.
  *
  * The decode here is a STUB for formats this JVM has no codec for
  * (video/audio): deterministic arithmetic on the payload bytes — length,
  * a fake 16-bytes-per-frame frame count, and an md5 sample hash. The
  * IMAGE path is real — see [[Images]] (`javax.imageio` PNG decode,
  * `Graphics2D` resize, raster statistics; queries m5-m7). What is real,
  * and what the tests cover, is the Spark-side shape: a typed
  * `Dataset[MediaRow]`, `mapPartitions` so the (expensive, native) decoder
  * is initialized once per partition rather than per row, and a columnar
  * hand-off back to SQL. Swapping the stub for a real codec changes only
  * the body of the map.
  *
  * Scale notes: this is the one deliberate codegen break in the engine —
  * an opaque decoder cannot run inside whole-stage codegen, so the
  * boundary is placed after column pruning (only (id, payload) reach it)
  * and the output is a narrow metadata row, keeping the expensive exchange
  * small. Partitioning is whatever the upstream scan had; no shuffle.
  */
object Multimodal {

  /** Decode a (doc_id, payload: binary) frame to per-object metadata. */
  def decodeStub(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      // per-partition decoder lifecycle: one digest instance per task
      val digest = java.security.MessageDigest.getInstance("MD5")
      it.map { m =>
        digest.reset()
        val hex = digest.digest(m.payload)
          .map("%02x".format(_)).mkString.substring(0, 8)
        MediaMeta(m.doc_id, m.payload.length, m.payload.length / 16, hex)
      }
    }.toDF()
  }

  /** Resize stub: deterministic byte-domain downsample (every
    * `factor`-th byte) — the real op would be an image rescale; the
    * Spark-side shape (map, payload in/payload out, no shuffle) is what
    * carries over. Output: (doc_id, payload: binary, n_bytes).
    */
  def resizeStub(spark: SparkSession, media: DataFrame,
                 factor: Int): DataFrame = {
    require(factor > 0, s"resizeStub: factor must be positive, got $factor")
    import spark.implicits._
    media.as[MediaRow].map { m =>
      val out = m.payload.indices.collect {
        case i if i % factor == 0 => m.payload(i)
      }.toArray
      (m.doc_id, out, out.length)
    }.toDF("doc_id", "payload", "n_bytes")
  }

  /** Feature-extraction stub: a deterministic 4-dim float "embedding"
    * derived from the payload's md5 — the real op would run a vision
    * encoder over decoded pixels. Batch shape: one vector per object,
    * ArrayType(FloatType) column ready for the Similarity operators.
    */
  def featureExtractStub(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      it.map { m =>
        digest.reset()
        val d = digest.digest(m.payload)
        val feats = (0 until 4).map { k =>
          // 4 bytes per lane, scaled to [-1, 1)
          val v = ((d(4 * k) & 0xff) << 24) | ((d(4 * k + 1) & 0xff) << 16) |
            ((d(4 * k + 2) & 0xff) << 8) | (d(4 * k + 3) & 0xff)
          v / 2147483648.0f
        }.toArray
        (m.doc_id, feats)
      }
    }.toDF("doc_id", "features")
  }

  /** Frame sampling: slice the payload into fixed 16-byte "frames" and
    * keep every `stride`-th one — the video-frame-sampling shape (one
    * input row fans out to a bounded set of frame rows, flatMap not
    * explode because the real decoder is imperative native code).
    * Output: (doc_id, frame_idx, frame: binary).
    */
  def frameSample(spark: SparkSession, media: DataFrame,
                  stride: Int): DataFrame = {
    require(stride > 0, s"frameSample: stride must be positive, got $stride")
    import spark.implicits._
    media.as[MediaRow].flatMap { m =>
      val frameSize = 16
      val nFrames = m.payload.length / frameSize
      (0 until nFrames by stride).map { idx =>
        (m.doc_id, idx,
          java.util.Arrays.copyOfRange(m.payload, idx * frameSize,
            (idx + 1) * frameSize))
      }
    }.toDF("doc_id", "frame_idx", "frame")
  }
}
