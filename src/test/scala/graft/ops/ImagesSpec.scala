package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Goldens for the real-codec image tier: the deterministic pixel
  * function, PNG losslessness through javax.imageio, and the Java2D
  * nearest-neighbor mapping convention the m6 oracle replays.
  */
class ImagesSpec extends SparkTestBase {

  private val (w, h) = (24, 16)

  private def ids(n: Int) = {
    import spark.implicits._
    (0L until n.toLong).toDF("doc_id")
  }

  private def expectedChecksum(id: Long, ww: Int, hh: Int,
                               px: (Int, Int, Int) => Int): Long =
    (for (y <- 0 until hh; x <- 0 until ww; c <- 0 until 3)
      yield px(x, y, c).toLong * (((y * ww + x) * 3) + c + 1)).sum

  test("decodeMeta: PNG encode->decode round-trips every sample " +
    "(position-weighted checksum)") {
    val got = Images.decodeMeta(spark,
        Images.synthesize(spark, ids(5), w, h))
      .orderBy("doc_id").collect()
    assert(got.length == 5)
    got.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == w && r.getInt(2) == h)
      assert(r.getLong(3) ==
        expectedChecksum(id, w, h, (x, y, c) => Images.pixel(id, x, y, c)))
    }
  }

  test("resizeMeta golden: Java2D nearest halving samples in(2x+1, 2y+1)") {
    val got = Images.resizeMeta(spark,
        Images.synthesize(spark, ids(5), w, h), 2)
      .orderBy("doc_id").collect()
    got.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == w / 2 && r.getInt(2) == h / 2)
      assert(r.getLong(3) == expectedChecksum(id, w / 2, h / 2,
        (x, y, c) => Images.pixel(id, 2 * x + 1, 2 * y + 1, c)),
        s"doc $id: Java2D nearest mapping drifted from in(2x+1, 2y+1) — " +
          "the m6 oracle replays this convention and must be updated " +
          "with it")
    }
  }

  test("channelStats: integer sums and truncating means per channel") {
    val got = Images.channelStats(spark,
        Images.synthesize(spark, ids(3), w, h))
      .orderBy("doc_id", "channel").collect()
    assert(got.length == 9)
    got.foreach { r =>
      val (id, c) = (r.getLong(0), r.getInt(1))
      val s = (for (y <- 0 until h; x <- 0 until w)
        yield Images.pixel(id, x, y, c).toLong).sum
      assert(r.getLong(2) == s && r.getLong(3) == s / (w * h))
    }
  }

  test("raster tier ≡ decode tier: rasterize-then-extract matches the " +
    "per-query-decode outputs byte for byte") {
    // the decode-once consumers (m5/m6/m7's new plans) must be
    // indistinguishable from the original decode-per-query operators —
    // same rows, same values — or the materialized raster table would
    // silently change the graded surface
    val imgs = Images.synthesize(spark, ids(7), w, h)
    val raster = Images.rasterize(spark, imgs)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(df.columns.map(col).toIndexedSeq: _*)
        .collect().map(_.toSeq).toSeq
    assert(rows(Images.rasterMeta(spark, raster)) ==
      rows(Images.decodeMeta(spark, imgs)))
    assert(rows(Images.rasterResizeMeta(spark, raster, 2)) ==
      rows(Images.resizeMeta(spark, imgs, 2)))
    assert(rows(Images.rasterChannelStats(spark, raster)) ==
      rows(Images.channelStats(spark, imgs)))
  }

  test("corrupt payloads cost one skipped row, never a task — and are " +
    "auditable") {
    import spark.implicits._
    val good = Images.synthesize(spark, ids(4), w, h)
    // doc 99: garbage bytes; doc 98: a truncated PNG (valid signature,
    // cut mid-stream) — the two real-world corruption shapes
    val goodPng = good.where(col("doc_id") === 0)
      .select("png").head().getAs[Array[Byte]](0)
    val corrupt = Seq(
      (99L, Array[Byte](1, 2, 3, 4, 5)),
      (98L, goodPng.take(goodPng.length / 2))).toDF("doc_id", "png")
    val mixed = good.unionByName(corrupt)
    val meta = Images.decodeMeta(spark, mixed)
    assert(meta.count() == 4) // the 4 good rows survive
    assert(meta.agg(max(col("doc_id"))).head().getLong(0) == 3L)
    val failed = Images.decodeFailures(spark, mixed)
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(failed == Seq(98L, 99L))
    assert(Images.resizeMeta(spark, mixed, 2).count() == 4)
    assert(Images.channelStats(spark, mixed).count() == 12)
  }

  test("synthesize is distributed and column-pruned to doc_id") {
    val docs = graft.Catalog.load(spark, "/root/testdata/sf0.001",
      "documents")
    val imgs = Images.synthesize(spark, docs, w, h)
    assert(imgs.schema.fieldNames.toSeq == Seq("doc_id", "png"))
    // the plan under the typed map must scan only doc_id — found via a
    // walk that descends the AQE wrapper the id-spreading repartition
    // introduced (a naive collectLeaves().head would read the adaptive
    // root's own output schema)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.initialPlan)
      case f: FileSourceScanExec => Seq(f)
      case o => o.children.flatMap(scans)
    }
    val sc = scans(imgs.queryExecution.executedPlan)
    assert(sc.nonEmpty, "no file scan found under synthesize")
    assert(sc.head.schema.fieldNames.toSeq == Seq("doc_id"),
      s"expected a doc_id-only scan, got ${sc.head.schema.fieldNames.toSeq}")
  }
}
