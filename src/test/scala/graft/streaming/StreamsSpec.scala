package graft.streaming

import java.nio.file.{Files, Paths}
import graft.SparkTestBase
import org.apache.spark.sql.functions._

class StreamsSpec extends SparkTestBase {

  private def tmp(prefix: String): String =
    scratchDir(prefix)

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

  test("sessionStream emits watermark-closed sessions matching batch") {
    val in = stageEvents()
    val out = tmp("graft_sess_out_")
    val ck = tmp("graft_sess_ck_")
    Streams.sessionStream(spark, in, out, ck)
    val streamed = spark.read.parquet(out)
    val ev = graft.Catalog.load(spark, "/root/testdata/sf0.001", "events")
    // batch oracle: same built-in session_window aggregate, restricted to
    // sessions the final watermark (max ts - 1h) closed
    val maxTs = ev.agg(max("ts")).head().getTimestamp(0)
    val batch = ev
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .where(col("session_window.end") <= lit(maxTs) -
        expr("INTERVAL 1 HOUR"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("session_start"),
        unix_timestamp(col("session_window.end")).as("session_end"),
        col("n_events"))
    assert(streamed.count() > 0)
    assert(streamed.orderBy("user_id", "session_start").collect().toSeq ==
      batch.orderBy("user_id", "session_start").collect().toSeq)
  }

  test("clickViewJoin matches the batch interval join on a bounded drain") {
    val in = stageEvents()
    val out = tmp("graft_ssj_out_")
    val ck = tmp("graft_ssj_ck_")
    Streams.clickViewJoin(spark, in, out, ck)
    val streamed = spark.read.parquet(out)
    val ev = graft.Catalog.load(spark, "/root/testdata/sf0.001", "events")
    def side(tpe: String, sfx: String) = ev
      .where(col("event_type") === tpe)
      .select(col("event_id").as(s"event_id_$sfx"),
        col("user_id").as(s"user_id_$sfx"), col("ts").as(s"ts_$sfx"))
    val batch = side("click", "c").join(side("view", "v"),
      expr("""user_id_c = user_id_v AND
        ts_v BETWEEN ts_c - INTERVAL 5 minutes
                 AND ts_c + INTERVAL 5 minutes"""))
    assert(streamed.count() > 0)
    assert(streamed.count() == batch.count())
    assert(streamed.select("event_id_c", "event_id_v").distinct().count()
      == batch.count())
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

  test("incrementalDedupStream verdicts equal d8's batch form") {
    val fx = "/root/testdata/sf0.001"
    val docs = graft.Catalog.load(spark, fx, "documents")
    val th = docs.agg(max("doc_id")).head().getLong(0) * 9 / 10
    // stage the top decile (d8's delta) as the arriving stream
    val in = tmp("graft_incr_in_")
    docs.where(col("doc_id") >= th)
      .write.mode("overwrite").parquet(in)
    val out = tmp("graft_incr_out_")
    val ck = tmp("graft_incr_ck_")
    Streams.incrementalDedupStream(spark, in, fx, out, ck, th)
    val streamed = spark.read.parquet(out)
      .orderBy("doc_id").collect().toSeq
    val batch = graft.SparkEntry.queries("d8_incremental_dedup")(spark, fx)
      .collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("incrementalDedupStream multi-batch: later batches see earlier " +
    "deltas as corpus (state append)") {
    import org.apache.spark.sql.Row
    // the sf0.001 fixture has no within-delta dup, so synthesize one:
    // two new top-id docs share a nonsense text that appears nowhere in
    // the corpus — the second can only be verdicted via the first
    val base = graft.Catalog.load(spark, "/root/testdata/sf0.001",
      "documents")
    val m = base.agg(max("doc_id")).head().getLong(0)
    val nonsense = (1 to 40).map(i => s"zqxv$i").mkString(" ")
    val extra = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(m + 1, nonsense, "en", "synthetic", nonsense.length.toLong),
        Row(m + 2, nonsense, "en", "synthetic", nonsense.length.toLong)),
      graft.Catalog.schemas("documents"))
    val fx = tmp("graft_incr_mb_fx_")
    base.unionByName(extra).write.mode("overwrite")
      .parquet(s"$fx/documents.parquet")
    val docs = graft.Catalog.load(spark, fx, "documents")
    val th = (m + 2) * 9 / 10
    val batch = graft.SparkEntry.queries("d8_incremental_dedup")(spark, fx)
      .collect().toSeq
    // splitting the delta at j* = m+2 guarantees the (m+1, m+2) pair
    // spans two micro-batches, so the verdict for m+2 is only correct
    // if batch 1's signatures were appended to the stream's state
    val jStar = batch.find(_.getString(3) == "dup_of_delta")
      .getOrElse(fail("synthetic within-delta dup missing"))
    val mid = jStar.getLong(0)
    assert(mid == m + 2 && jStar.getLong(1) == m + 1)
    val delta = docs.where(col("doc_id") >= th)
    val in = tmp("graft_incr_mb_in_")
    // two parquet files; mtimes force FileStreamSource to take the
    // lower-id file first, so every cross-file pair (i < j) has i in the
    // earlier batch — the only order under which batch-equality is the
    // documented semantics
    def stage(df: org.apache.spark.sql.DataFrame, name: String,
              mtime: Long): Unit = {
      val t = tmp("graft_incr_mb_stage_")
      df.coalesce(1).write.mode("overwrite").parquet(t)
      val part = new java.io.File(t).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).head
      val dst = Paths.get(in, name)
      Files.copy(part.toPath, dst)
      assert(dst.toFile.setLastModified(mtime))
    }
    val now = System.currentTimeMillis()
    stage(delta.where(col("doc_id") < mid), "a_low.parquet", now - 120000)
    stage(delta.where(col("doc_id") >= mid), "b_high.parquet", now)
    val out = tmp("graft_incr_mb_out_")
    val ck = tmp("graft_incr_mb_ck_")
    Streams.incrementalDedupStream(spark, in, fx, out, ck, th,
      maxFilesPerTrigger = Some(1))
    val streamed = spark.read.parquet(out)
      .orderBy("doc_id").collect().toSeq
    assert(streamed == batch)
  }
}
