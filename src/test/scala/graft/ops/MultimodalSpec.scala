package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def media = Seq(
    (1L, "0123456789abcdef0123456789abcdefXY"), // 34 bytes -> 2 frames
    (2L, "short")                               // 5 bytes  -> 0 frames
  ).toDF("doc_id", "text")
    .select(col("doc_id"), col("text").cast("binary").as("payload"))

  test("decodeStub: deterministic metadata, md5 matches SQL md5") {
    val got = Multimodal.decodeStub(spark, media).orderBy("doc_id")
      .collect()
    assert(got(0).getInt(1) == 34 && got(0).getInt(2) == 2)
    assert(got(1).getInt(1) == 5 && got(1).getInt(2) == 0)
    val sqlHash = spark.sql(
      "SELECT substr(md5('short'), 1, 8)").head().getString(0)
    assert(got(1).getString(3) == sqlHash)
  }

  test("resizeStub downsamples bytes deterministically") {
    val got = Multimodal.resizeStub(spark, media, factor = 4)
      .orderBy("doc_id").collect()
    assert(new String(got(0).getAs[Array[Byte]](1)) == "048c048cX")
    assert(got(0).getInt(2) == 9)
    assert(got(1).getInt(2) == 2) // "short" -> s, r
  }

  test("featureExtractStub emits stable 4-dim unit-scale features") {
    val a = Multimodal.featureExtractStub(spark, media).orderBy("doc_id")
      .collect().map(_.getSeq[Float](1))
    val b = Multimodal.featureExtractStub(spark, media).orderBy("doc_id")
      .collect().map(_.getSeq[Float](1))
    assert(a.toSeq.map(_.toSeq) == b.toSeq.map(_.toSeq)) // deterministic
    assert(a.forall(f => f.length == 4 && f.forall(x =>
      x >= -1.0f && x < 1.0f)))
    assert(a(0) != a(1)) // payload-sensitive
  }

  test("documents fixture is pure ASCII (m2's byte=char slicing premise)") {
    // m2_frame_sample's oracle slices with DuckDB's CHARACTER-based
    // substring while the engine slices payload BYTES; they agree only
    // while every document is single-byte text. Assert it on the gate
    // fixture so a future non-ASCII fixture fails here, not as a silent
    // oracle hash divergence.
    val nonAscii = graft.Catalog
      .load(spark, "/root/testdata/sf0.01", "documents")
      .where(octet_length(col("text")) =!= length(col("text")))
      .count()
    assert(nonAscii == 0L)
  }

  test("frameSample slices fixed frames at the given stride") {
    val frames = Multimodal.frameSample(spark, media, stride = 2)
      .orderBy("doc_id", "frame_idx").collect()
    // doc 1 has frames 0,1 -> stride 2 keeps only frame 0; doc 2 none
    assert(frames.length == 1)
    assert(frames(0).getLong(0) == 1L && frames(0).getInt(1) == 0)
    assert(new String(frames(0).getAs[Array[Byte]](2)) ==
      "0123456789abcdef")
  }
}
