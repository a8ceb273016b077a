package graft.streaming

import java.nio.file.{Files, Paths}
import graft.SparkTestBase
import org.apache.spark.sql.functions._

class StreamsSpec extends SparkTestBase {

  private def tmp(prefix: String): String =
    scratchDir(prefix)

  /** One synthetic events row — ts is epoch SECONDS here, stored in the
    * engine's public encoding (TimestampType), the form [[Streams
    * .eventsStream]] reads: an ingest dir is landed by upstream engine
    * stages, not the fixture generator.
    */
  private def evRow(id: Long, tsSec: Long, user: Long, value: Double) =
    org.apache.spark.sql.Row(id,
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(tsSec)),
      user, "click", value, "{}")

  /** Write rows as one parquet file named `name` under `dir` with a
    * controlled mtime — FileStreamSource orders files by modification
    * time, so mtimes pin the micro-batch order.
    */
  private def stageFile(dir: String, name: String, mtime: Long,
                        rows: Seq[org.apache.spark.sql.Row]): Unit = {
    val t = tmp("graft_late_stage_")
    spark.createDataFrame(
        new java.util.ArrayList(java.util.Arrays.asList(rows: _*)),
        graft.Catalog.schemas("events"))
      .coalesce(1).write.mode("overwrite").parquet(t)
    val part = new java.io.File(t).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val dst = Paths.get(dir, name)
    Files.copy(part.toPath, dst)
    assert(dst.toFile.setLastModified(mtime))
  }

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
    // idempotent per-batch layout: batch_id=N dirs at the root, the
    // date= partitioning inside each
    val batchDirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("batch_id="))
    assert(batchDirs.nonEmpty)
    assert(batchDirs.exists(b => Option(b.listFiles()).getOrElse(Array())
      .exists(_.getName.startsWith("date="))))
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
    assert(streamed
      .select("user_id", "session_start", "session_end", "n_events")
      .orderBy("user_id", "session_start").collect().toSeq ==
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

  test("windowedMeans drops late rows past the watermark, accepts the " +
    "rest") {
    val base = graft.SparkEntry.sec("2024-01-02T10:00:00")
    val h = 3600L
    val in = tmp("graft_late_win_in_")
    val now = System.currentTimeMillis()
    // Spark applies the late-event filter with the watermark as of the
    // PREVIOUS batch (eviction uses the updated one), so the watermark
    // advance must land a full batch before the late row arrives:
    // batch 1 (two 10:00-window rows + a 13:00 row) raises the
    // watermark (1h delay) to 12:00, batch 2 keeps the clock moving,
    // batch 3 carries the late rows.
    stageFile(in, "b1.parquet", now - 180000, Seq(
      evRow(1, base, 1, 1.0),
      evRow(2, base + 30, 1, 3.0),
      evRow(3, base + 3 * h, 1, 5.0)))
    stageFile(in, "b2.parquet", now - 120000, Seq(
      evRow(4, base + 3 * h + 1800, 1, 5.0)))
    // batch 3: a row for the long-finalized 10:00 window (2h behind the
    // 12:00 watermark -> DROPPED), a 12:45 row behind max-seen event
    // time but inside the watermark -> ACCEPTED, and a 14:00 row that
    // advances the final watermark to 13:00 so the survivor emits
    stageFile(in, "b3.parquet", now, Seq(
      evRow(5, base + 10, 1, 100.0), // late past watermark
      evRow(6, base + 2 * h + 2700, 1, 7.0), // late, within watermark
      evRow(7, base + 4 * h, 1, 9.0)))
    val out = tmp("graft_late_win_out_")
    val ck = tmp("graft_late_win_ck_")
    val batches = Streams.windowedMeans(spark, in, out, ck,
      maxFilesPerTrigger = Some(1))
    assert(batches >= 3)
    val got = spark.read.parquet(out)
      .select(unix_timestamp(col("bucket_start")).as("b"),
        col("avg_value"), col("n"))
      .orderBy("b").collect().toSeq.map(r =>
        (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // 10:00 window holds ONLY batch 1's rows (n=2, avg=2.0): the late
    // v=100 row was dropped against its already-evicted window, not
    // merged and not re-emitted. The 12:45 window emits the accepted
    // late row. The 13:00/13:30/14:00 windows stay open (the 13:00
    // watermark has not passed their ends) — exactly two closed rows.
    assert(got == Seq(
      (base, 2.0, 2L),
      (base + 2 * h + 2700, 7.0, 1L)))
  }

  test("sessionStream drops late rows past the watermark, accepts the " +
    "rest") {
    val base = graft.SparkEntry.sec("2024-01-02T10:00:00")
    val h = 3600L
    val in = tmp("graft_late_sess_in_")
    val now = System.currentTimeMillis()
    // same one-batch-lag watermark staging as the windowed test:
    // batch 1: a two-event session at 10:00-10:40 (gap 30m) + a 13:00
    // event that pushes the watermark to 12:00
    stageFile(in, "b1.parquet", now - 180000, Seq(
      evRow(1, base, 1, 1.0),
      evRow(2, base + 600, 1, 1.0),
      evRow(3, base + 3 * h, 1, 1.0)))
    // batch 2: a 13:05 event merging into the 13:00 session
    stageFile(in, "b2.parquet", now - 120000, Seq(
      evRow(4, base + 3 * h + 300, 1, 1.0)))
    // batch 3: a 10:05 row inside the long-closed first session (past
    // the watermark -> DROPPED, count stays 2), a 12:20 row inside the
    // watermark -> its own session, and a 15:00 row that advances the
    // final watermark to 14:00 so every earlier session closes
    stageFile(in, "b3.parquet", now, Seq(
      evRow(5, base + 300, 1, 1.0), // late past watermark
      evRow(6, base + 2 * h + 1200, 1, 1.0), // late, within watermark
      evRow(7, base + 5 * h, 1, 1.0)))
    val out = tmp("graft_late_sess_out_")
    val ck = tmp("graft_late_sess_ck_")
    Streams.sessionStream(spark, in, out, ck,
      maxFilesPerTrigger = Some(1))
    val got = spark.read.parquet(out)
      .select("session_start", "session_end", "n_events")
      .orderBy("session_start").collect().toSeq.map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2)))
    // first session is [10:00, 10:40) with n=2 — the dropped 10:05 row
    // neither raised the count nor re-opened the session; the accepted
    // 12:20 row is its own closed session; 13:00+13:05 merged into
    // [13:00, 13:35); 15:00's session stays open
    assert(got == Seq(
      (base, base + 600 + 1800, 2L),
      (base + 2 * h + 1200, base + 2 * h + 3000, 1L),
      (base + 3 * h, base + 3 * h + 300 + 1800, 2L)))
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
      .select("doc_id", "match_id", "n_matches", "verdict")
      .orderBy("doc_id").collect().toSeq
    val batch = graft.SparkEntry.queries("d8_incremental_dedup")(spark, fx)
      .collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  /** Synthetic fixture with a GUARANTEED within-delta dup (the sf0.001
    * fixture has none): two new top-id docs share a nonsense text absent
    * from the corpus, so the second can only be verdicted via the
    * first's signatures. Returns (fixture dir, threshold, batch d8
    * verdicts, delta docs, the split id m+2 whose verdict requires
    * cross-batch state).
    */
  private def syntheticDupFixture(): (String, Long,
      Seq[org.apache.spark.sql.Row], org.apache.spark.sql.DataFrame,
      Long) = {
    import org.apache.spark.sql.Row
    val base = graft.Catalog.load(spark, "/root/testdata/sf0.001",
      "documents")
    val m = base.agg(max("doc_id")).head().getLong(0)
    val nonsense = (1 to 40).map(i => s"zqxv$i").mkString(" ")
    val extra = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(m + 1, nonsense, "en", "synthetic", nonsense.length.toLong),
        Row(m + 2, nonsense, "en", "synthetic", nonsense.length.toLong)),
      graft.Catalog.schemas("documents"))
    val fx = tmp("graft_incr_fx_")
    base.unionByName(extra).write.mode("overwrite")
      .parquet(s"$fx/documents.parquet")
    val docs = graft.Catalog.load(spark, fx, "documents")
    val th = (m + 2) * 9 / 10
    val batch = graft.SparkEntry.queries("d8_incremental_dedup")(spark, fx)
      .collect().toSeq
    val jStar = batch.find(_.getString(3) == "dup_of_delta")
      .getOrElse(fail("synthetic within-delta dup missing"))
    assert(jStar.getLong(0) == m + 2 && jStar.getLong(1) == m + 1)
    (fx, th, batch, docs.where(col("doc_id") >= th), m + 2)
  }

  private def stageParquet(in: String, df: org.apache.spark.sql.DataFrame,
                           name: String, mtime: Long): Unit = {
    val t = tmp("graft_incr_stage_")
    df.coalesce(1).write.mode("overwrite").parquet(t)
    val part = new java.io.File(t).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).head
    val dst = Paths.get(in, name)
    Files.copy(part.toPath, dst)
    assert(dst.toFile.setLastModified(mtime))
  }

  test("incrementalDedupStream multi-batch: later batches see earlier " +
    "deltas as corpus (state append)") {
    val (fx, th, batch, delta, mid) = syntheticDupFixture()
    val in = tmp("graft_incr_mb_in_")
    // two parquet files; mtimes force FileStreamSource to take the
    // lower-id file first, so every cross-file pair (i < j) has i in the
    // earlier batch — the only order under which batch-equality is the
    // documented semantics. The (m+1, m+2) pair spans the two
    // micro-batches, so m+2's verdict is only correct if batch 1's
    // signatures were appended to the stream's state
    val now = System.currentTimeMillis()
    stageParquet(in, delta.where(col("doc_id") < mid), "a_low.parquet",
      now - 120000)
    stageParquet(in, delta.where(col("doc_id") >= mid), "b_high.parquet",
      now)
    val out = tmp("graft_incr_mb_out_")
    val ck = tmp("graft_incr_mb_ck_")
    Streams.incrementalDedupStream(spark, in, fx, out, ck, th,
      maxFilesPerTrigger = Some(1))
    val streamed = spark.read.parquet(out)
      .select("doc_id", "match_id", "n_matches", "verdict")
      .orderBy("doc_id").collect().toSeq
    assert(streamed == batch)
  }

  test("incrementalDedupStream restart: appended state survives a second " +
    "invocation on the same checkpoint") {
    val (fx, th, batch, delta, mid) = syntheticDupFixture()
    val in = tmp("graft_incr_rs_in_")
    val out = tmp("graft_incr_rs_out_")
    val ck = tmp("graft_incr_rs_ck_")
    // invocation 1 drains only the low-id half
    stageParquet(in, delta.where(col("doc_id") < mid), "a_low.parquet",
      System.currentTimeMillis() - 120000)
    Streams.incrementalDedupStream(spark, in, fx, out, ck, th)
    // invocation 2 on the SAME checkpoint sees only the newly staged
    // high-id half (the file log suppresses re-processing) — its dup
    // verdict is only correct if invocation 1's appended signatures
    // survived, i.e. the state seed must not overwrite on restart
    stageParquet(in, delta.where(col("doc_id") >= mid), "b_high.parquet",
      System.currentTimeMillis())
    Streams.incrementalDedupStream(spark, in, fx, out, ck, th)
    val streamed = spark.read.parquet(out)
      .select("doc_id", "match_id", "n_matches", "verdict")
      .orderBy("doc_id").collect().toSeq
    assert(streamed == batch)
  }

  test("windowedCorr: streamed per-day corr matrices equal the batch " +
    "chain up to the watermark") {
    // the fixture corpus is far too sparse for ANY defined pairwise
    // correlation (1000 ticks over 15 users and 30 days — no pair
    // shares two buckets even hourly), so the stream ingests staged
    // dense ticks: 3 correlated-by-construction series, one tick per
    // 5 minutes for 2.5 days. Deterministic values (distinct affine +
    // oscillating shapes per series) make every daily matrix cell
    // defined and reproducible.
    val in = tmp("graft_corr_in_")
    val base = 1700006400L // aligned to a UTC day boundary
    val users = Seq(0L, 1L, 2L)
    val rows = for {
      t <- 0L until (86400L * 5 / 2) by 300L
      u <- users
    } yield evRow(t * 10 + u, base + t, u,
      // per-series deterministic shape: affine trend + per-series
      // phase-shifted sawtooth, so no pair is exactly collinear
      u.toDouble + 0.001 * t + ((t / 300 + 7 * u) % 13).toDouble)
    stageFile(in, "ticks.parquet", base * 1000, rows)
    val out = tmp("graft_corr_out_")
    val ck = tmp("graft_corr_ck_")
    Streams.windowedCorr(spark, in, out, ck, users,
      bucket = "10 minutes", span = "1 day", watermark = "1 hour")
    val all = spark.read.parquet(out)
      .select("window_start", "i", "j", "rho")
    assert(all.count() > 0, "stream emitted no matrices")
    // batch oracle: the same three-operator chain on the static table.
    // The watermark is computed over the FILTERED stream (the plan
    // filters to the series universe before withWatermark), so the
    // cutoff is the staged max ts minus the delay; one span width of
    // safety margin keeps the boundary span (emitted only when
    // wm >= end exactly) out of the prefix compare — the left-anti
    // check below still covers it.
    val ev = spark.read.schema(graft.Catalog.schemas("events"))
      .parquet(in)
    val maxTs = ev.agg(max("ts")).head().getTimestamp(0)
    val span = 86400L
    val cut = unix_timestamp(lit(maxTs)) - 3600L - span
    val batchAll = Streams.windowedCorrPlan(ev, users,
        "10 minutes", "1 day", watermark = None)
    val streamed = all.where(col("window_start") + span <= cut)
    val batch = batchAll.where(col("window_start") + span <= cut)
    assert(streamed.count() > 0, "prefix compare is vacuous")
    assert(streamed.count() == batch.count(),
      s"stream ${streamed.count()} rows vs batch ${batch.count()}")
    // nothing streamed — prefix or not — is absent from the batch set
    assert(all.join(batchAll.select("window_start", "i", "j"),
      Seq("window_start", "i", "j"), "left_anti").count() == 0)
    // rho equal up to the Chan-merge fp tolerance (stream and batch
    // accumulate partials in different orders); undefined (null) cells
    // must agree exactly, and defined rhos must actually be compared
    val j = streamed.join(batch
        .select(col("window_start"), col("i"), col("j"),
          col("rho").as("brho")),
      Seq("window_start", "i", "j"), "full_outer")
    assert(j.where(col("rho").isNull =!= col("brho").isNull).count() == 0)
    val defined = j.where(col("rho").isNotNull && col("brho").isNotNull)
    assert(defined.count() > 0, "no defined rho pair in the compare")
    val maxDiff = defined
      .agg(max(abs(col("rho") - col("brho")))).head().getDouble(0)
    assert(maxDiff < 1e-9, s"max rho diff $maxDiff")
  }

  test("windowedCorr restart: a later tick file advances the stream, " +
    "each span emitted exactly once") {
    val in = tmp("graft_corr2_in_")
    val base = 1700006400L
    val users = Seq(0L, 1L)
    def ticks(fromSec: Long, untilSec: Long): Seq[org.apache.spark.sql.Row] =
      for {
        t <- fromSec until untilSec by 600L
        u <- users
      } yield evRow(t * 10 + u, base + t, u,
        u.toDouble + 0.01 * t + ((t / 600 + 3 * u) % 7).toDouble)
    stageFile(in, "day0.parquet", base * 1000, ticks(0L, 86400L * 2))
    val out = tmp("graft_corr2_out_")
    val ck = tmp("graft_corr2_ck_")
    Streams.windowedCorr(spark, in, out, ck, users,
      bucket = "10 minutes", span = "1 day", watermark = "1 hour")
    val first = spark.read.parquet(out)
      .select("window_start", "i", "j").collect().toSet
    assert(first.nonEmpty, "first drain emitted nothing")
    // a later file lands (the continuous-deployment tick): the SAME
    // checkpoint drains only the new data; its later event times push
    // the watermark past the previously open spans
    stageFile(in, "day2.parquet", base * 1000 + 1000,
      ticks(86400L * 2, 86400L * 3))
    Streams.windowedCorr(spark, in, out, ck, users,
      bucket = "10 minutes", span = "1 day", watermark = "1 hour")
    val rows = spark.read.parquet(out)
      .select("window_start", "i", "j").collect().toSeq
    // exactly-once per span pair: no duplicates across the two drains
    assert(rows.size == rows.toSet.size,
      s"duplicate span rows after restart: ${rows.size} vs ${rows.toSet.size}")
    // and the restart emitted NEW spans (the day-1 matrix its first
    // drain held open, now finalized by day-2's watermark)
    assert(rows.toSet.size > first.size,
      s"restart emitted nothing new (${rows.size} vs ${first.size})")
  }
}
