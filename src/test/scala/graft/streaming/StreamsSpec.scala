package graft.streaming

import java.nio.file.{Files, Paths}
import graft.SparkTestBase
import org.apache.spark.sql.functions._

class StreamsSpec extends SparkTestBase {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def stageEvents(): String = {
    val in = tmp("graft_stream_in_")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      Paths.get(in, "events.parquet"))
    in
  }

  test("windowedMeans drains the bounded stream and matches batch") {
    val in = stageEvents()
    val out = tmp("graft_stream_out_")
    val ck = tmp("graft_stream_ck_")
    val batches = Streams.windowedMeans(spark, in, out, ck)
    assert(batches >= 1)
    val streamed = spark.read.parquet(out)
    val ev = graft.Catalog.load(spark, "/root/testdata/sf0.001", "events")
    // append mode emits exactly the windows finalized by the watermark:
    // window.end <= max(ts) - 1h. Later windows are correctly retained
    // as open state when the bounded stream ends.
    val maxTs = ev.agg(max("ts")).head().getTimestamp(0)
    val batch = ev
      .groupBy(window(col("ts"), "1 minute"), col("user_id"))
      .agg(avg("value").as("avg_value"), count(lit(1)).as("n"))
      .where(col("window.end") <= lit(maxTs) - expr("INTERVAL 1 HOUR"))
    assert(streamed.count() == batch.count())
    assert(streamed.agg(sum("n")).head().getLong(0) ==
      batch.agg(sum("n")).head().getLong(0))
    // partitioned layout materialized
    assert(new java.io.File(out).listFiles()
      .exists(_.getName.startsWith("date=")))
  }

  test("dedupStream keeps exactly one row per event_id") {
    val in = stageEvents()
    // duplicate the file so every event_id arrives twice
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      Paths.get(in, "events_dup.parquet"))
    val out = tmp("graft_dedup_out_")
    val ck = tmp("graft_dedup_ck_")
    Streams.dedupStream(spark, in, out, ck)
    val got = spark.read.parquet(out)
    val distinctIds = spark.read
      .parquet("/root/testdata/sf0.001/events.parquet")
      .select("event_id").distinct().count()
    assert(got.count() == distinctIds)
    assert(got.select("event_id").distinct().count() == distinctIds)
  }
}
