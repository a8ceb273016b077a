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
  private def evRow(id: Long, tsSec: Long, user: Long, value: Double,
                    tpe: String = "click") =
    org.apache.spark.sql.Row(id,
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(tsSec)),
      user, tpe, value, "{}")

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

  test("session cutoff boundary: a 30-minute-gap chain reaching the " +
    "watermark cutoff is excluded from the emitted (graded) set") {
    // w19's determinism rests on "a 30-minute-gap chain cannot reach
    // the slice end minus the watermark at fixture density". This pins
    // what happens if one ever DOES: each new event extends the
    // session's end past max(ts) − 1 h, so the end never falls behind
    // the watermark, the session stays open state, and the emitted
    // (graded) set simply excludes it — a fixture change creating such
    // a chain surfaces here as a understood exclusion, not as an
    // unexplained oracle mismatch.
    val jan2 = graft.SparkEntry.jan2
    val t0 = jan2 + 3600
    // user 1: a plainly closed two-event session inside the graded day
    val closedRows = Seq(evRow(1L, t0, 1L, 1.0),
      evRow(2L, t0 + 600, 1L, 1.0))
    // user 2: events every 29 min from t0 to past the next midnight —
    // every inter-event gap is under the 30-min session gap, so the
    // whole chain is ONE session whose start is inside the graded day
    // and whose end outruns the final watermark (last ts − 1 h)
    val chainRows = (0 to 50).map(i =>
      evRow(100L + i, t0 + i * 1740L, 2L, 1.0))
    val in = tmp("graft_sess_cut_in_")
    stageFile(in, "events.parquet", 1000000L, closedRows ++ chainRows)
    val out = tmp("graft_sess_cut_out_")
    val ck = tmp("graft_sess_cut_ck_")
    Streams.sessionStream(spark, in, out, ck)
    val got = spark.read.parquet(out)
    val graded = got.where(col("session_start") >= jan2 &&
      col("session_start") < jan2 + 86400)
    // the closed session is emitted and graded, exactly once
    val s1 = graded.where(col("user_id") === 1L).collect()
    assert(s1.length == 1, s1.mkString(","))
    assert(s1.head.getAs[Long]("session_start") == t0)
    assert(s1.head.getAs[Long]("session_end") == t0 + 600 + 1800)
    assert(s1.head.getAs[Long]("n_events") == 2L)
    // the cutoff-reaching chain is excluded WHOLESALE — no partial
    // session, no row at all, even though its start lies in the graded
    // window (the batch oracle would include it: that divergence is
    // precisely why w19's fixture-density argument matters)
    assert(got.where(col("user_id") === 2L).count() == 0)
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

  test("clickViewJoin multi-batch boundary: watermark-evicted click " +
    "state cannot match a later view; pre-eviction late views still " +
    "can (inner-join at-least semantics)") {
    // w20's oracle determinism rests on a single-batch drain (starting
    // watermark 0 ⇒ nothing late ⇒ inner join ≡ batch join). This pins
    // the OTHER side of that argument, with the semantics Spark
    // actually gives an inner stream-stream join: lateness handling is
    // AT-LEAST, not exact — a late view arriving while the matching
    // click is still buffered (state cleanup runs at end-of-batch, so
    // eviction lags the watermark by one batch) still emits its match,
    // erring toward the full batch join; but once the watermark-driven
    // cleanup HAS evicted the click's interval, a later matching view
    // finds nothing. The second half is the property that matters at
    // 100 TB: join state is bounded by the watermark, never by the
    // stream's length.
    val t0 = graft.SparkEntry.jan2
    val in = tmp("graft_ssj_late_in_")
    // batch 1: an early click (user 2), plus a click+view pair two
    // hours later (user 3) that matches in-batch and drives the
    // watermark to t0+2h+60s − 1h
    stageFile(in, "b1.parquet", 1000000L, Seq(
      evRow(10L, t0 + 60, 2L, 1.0),
      evRow(11L, t0 + 7200, 3L, 1.0),
      evRow(12L, t0 + 7260, 3L, 1.0, tpe = "view")))
    // batch 2: a late view for user 2 (t0+120, ~59 min below the
    // watermark, 60 s from click 10) — matches, because click 10's
    // state is evicted only at this batch's END; and an above-watermark
    // view for user 3 — the ordinary cross-batch match with click 11
    stageFile(in, "b2.parquet", 2000000L, Seq(
      evRow(13L, t0 + 120, 2L, 1.0, tpe = "view"),
      evRow(14L, t0 + 7320, 3L, 1.0, tpe = "view")))
    // batch 3: another view matching click 10 (120 s apart) — by now
    // the watermark-driven cleanup has removed the click's interval
    // from state, so NO match may emit
    stageFile(in, "b3.parquet", 3000000L, Seq(
      evRow(15L, t0 + 180, 2L, 1.0, tpe = "view")))
    val out = tmp("graft_ssj_late_out_")
    val ck = tmp("graft_ssj_late_ck_")
    Streams.clickViewJoin(spark, in, out, ck,
      maxFilesPerTrigger = Some(1))
    val got = spark.read.parquet(out)
      .select("event_id_c", "event_id_v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((11L, 12L), (11L, 14L), (10L, 13L)),
      s"expected user-3 matches + the pre-eviction late match, and " +
        s"NEVER the post-eviction view 15, got $got")
  }

  test("clickViewJoin restart between every batch: the watermark " +
    "CONTRACT survives the checkpoint — on-time cross-batch matches " +
    "emit, the process-lifetime late-row grace does not") {
    // The SAME three files as the multi-batch test, drained by three
    // separate query starts on one checkpoint. What the checkpoint
    // carries across a restart is exactly the watermark contract and
    // the state it implies, measured here against the continuous run's
    // {(11,12),(11,14),(10,13)}:
    //   * (11,14) — an ON-TIME cross-restart match: view 14 arrives
    //     above the restored watermark and finds click 11's buffered
    //     interval in the restored state store. Lost state would drop
    //     it.
    //   * (10,13) — the continuous run's pre-eviction LATE match — is
    //     correctly ABSENT: the "eviction lags the watermark by one
    //     batch" grace is a batch-timing artifact of one process
    //     lifetime, and the restarted query applies the restored
    //     watermark to its input up front. Nothing promised is lost —
    //     view 13 was below the watermark, so its emission was always
    //     best-effort — but anyone equating restart with continuation
    //     for LATE data is wrong, and this pins it.
    //   * (10,15) absent exactly as in the continuous run: a RESET
    //     watermark (the failure this test exists to catch) would
    //     wrongly re-admit click 10's interval and emit it.
    val t0 = graft.SparkEntry.jan2
    val in = tmp("graft_ssj_rs_in_")
    val out = tmp("graft_ssj_rs_out_")
    val ck = tmp("graft_ssj_rs_ck_")
    stageFile(in, "b1.parquet", 1000000L, Seq(
      evRow(10L, t0 + 60, 2L, 1.0),
      evRow(11L, t0 + 7200, 3L, 1.0),
      evRow(12L, t0 + 7260, 3L, 1.0, tpe = "view")))
    Streams.clickViewJoin(spark, in, out, ck)
    stageFile(in, "b2.parquet", 2000000L, Seq(
      evRow(13L, t0 + 120, 2L, 1.0, tpe = "view"),
      evRow(14L, t0 + 7320, 3L, 1.0, tpe = "view")))
    Streams.clickViewJoin(spark, in, out, ck)
    stageFile(in, "b3.parquet", 3000000L, Seq(
      evRow(15L, t0 + 180, 2L, 1.0, tpe = "view")))
    Streams.clickViewJoin(spark, in, out, ck)
    val got = spark.read.parquet(out)
      .select("event_id_c", "event_id_v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((11L, 12L), (11L, 14L)),
      s"restarted drains diverged from the watermark contract: $got")
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

  test("dedupStream restart: first-seen state survives the checkpoint — " +
    "replayed ids emit nothing, new ids emit exactly once") {
    val t0 = graft.SparkEntry.jan2
    val in = tmp("graft_dedup_rs_in_")
    stageFile(in, "d1.parquet", 1000000L, Seq(
      evRow(1L, t0, 1L, 1.0), evRow(2L, t0 + 10, 2L, 2.0),
      evRow(3L, t0 + 20, 3L, 3.0)))
    val out = tmp("graft_dedup_rs_out_")
    val ck = tmp("graft_dedup_rs_ck_")
    Streams.dedupStream(spark, in, out, ck)
    assert(spark.read.parquet(out).count() == 3)
    // second drain against the SAME checkpoint: ids 2 and 3 replayed
    // (identical payload), id 4 new — the flatMapGroupsWithState
    // first-seen state must have survived the restart, so only 4 emits
    stageFile(in, "d2.parquet", 2000000L, Seq(
      evRow(2L, t0 + 30, 2L, 2.0), evRow(3L, t0 + 40, 3L, 3.0),
      evRow(4L, t0 + 50, 4L, 4.0)))
    Streams.dedupStream(spark, in, out, ck)
    val got = spark.read.parquet(out)
      .select("event_id", "user_id", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sorted
    assert(got == Seq((1L, 1L, 1.0), (2L, 2L, 2.0), (3L, 3L, 3.0),
      (4L, 4L, 4.0)), s"restart must add only the new id: $got")
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

  test("resampleFfillStream: streamed filled grid equals batch " +
    "resampleFfill on the finalized prefix") {
    val in = tmp("graft_ffill_in_")
    val base = 1700006400L // aligned to a UTC day boundary
    val step = 600L
    val end = base + 86400L
    // three series with DIFFERENT gap structure: u0 ticks every bucket,
    // u1 skips a known mid-range (carry-forward must bridge it), u2
    // starts late (leading cells must be null). Two ticks in one
    // bucket for u0 exercise the dedup-mean.
    val rows =
      (for (t <- 0L until 43200L by step) yield
        evRow(t * 100, base + t + 30, 0L, 1.0 + 0.001 * t)) ++
      Seq(evRow(999999L, base + 630, 0L, 7.0)) ++ // 2nd tick in u0's bucket 1
      (for (t <- 0L until 43200L by step
            if t < 6000L || t >= 18000L) yield
        evRow(t * 100 + 1, base + t + 60, 1L, 2.0 + 0.002 * t)) ++
      (for (t <- 21600L until 43200L by step) yield
        evRow(t * 100 + 2, base + t + 90, 2L, 3.0 + 0.003 * t))
    stageFile(in, "ticks.parquet", base * 1000, rows)
    val out = tmp("graft_ffill_out_")
    val ck = tmp("graft_ffill_ck_")
    Streams.resampleFfillStream(spark, in, out, ck, base, end, step,
      watermark = "30 minutes")
    val streamed = spark.read.parquet(out)
      .select("bucket", "user_id", "value")
    assert(streamed.count() > 0, "stream emitted no cells")
    // exactly-once per grid cell
    val keys = streamed.select("bucket", "user_id").collect().toSeq
    assert(keys.size == keys.toSet.size, "duplicate grid cells")
    // batch oracle: the real batch operator, same grid, same plain avg
    val ev = spark.read.schema(graft.Catalog.schemas("events"))
      .parquet(in)
    val batch = graft.ops.Time.resampleFfill(spark, ev, "user_id", "ts",
      "value", base, end, step, graft.ops.Exact.davg(col("value")))
    // finalized prefix: the final watermark is max ts - delay; every
    // bucket whose end is at or before it must have been emitted
    val maxSec = ev.agg(max(unix_timestamp(col("ts")))).head().getLong(0)
    val wm = maxSec - 1800L
    val frontier = base + ((wm - step - base) / step) * step
    val sPrefix = streamed.where(col("bucket") <= frontier)
    val bPrefix = batch.where(col("bucket") <= frontier)
    assert(sPrefix.count() > 0, "prefix compare is vacuous")
    assert(sPrefix.count() == bPrefix.count(),
      s"stream ${sPrefix.count()} cells vs batch ${bPrefix.count()}")
    // nothing streamed — prefix or not — is absent from the batch grid
    assert(streamed.join(batch.select("bucket", "user_id"),
      Seq("bucket", "user_id"), "left_anti").count() == 0)
    // cell-for-cell: null-ness exact (leading nulls + carries), values
    // equal to fp-accumulation-order tolerance
    val j = sPrefix.join(
      bPrefix.select(col("bucket"), col("user_id"),
        col("value").as("bvalue")),
      Seq("bucket", "user_id"), "full_outer")
    assert(j.where(col("value").isNull =!= col("bvalue").isNull)
      .count() == 0, "null-ness mismatch")
    val defined = j.where(col("value").isNotNull)
    assert(defined.count() > 0)
    val maxDiff = defined.agg(max(abs(col("value") - col("bvalue"))))
      .head().getDouble(0)
    assert(maxDiff < 1e-9, s"max value diff $maxDiff")
    // non-vacuity of the INTERESTING semantics: u1's gap buckets were
    // emitted as carries (value present, no raw tick in the bucket),
    // and u2 has leading nulls
    val u1gap = sPrefix.where(col("user_id") === 1L &&
      col("bucket") >= base + 6000L && col("bucket") < base + 18000L)
    assert(u1gap.count() > 0 &&
      u1gap.where(col("value").isNull).count() == 0,
      "u1's gap was not carry-filled")
    assert(sPrefix.where(col("user_id") === 2L &&
      col("value").isNull).count() > 0, "u2 has no leading nulls")
  }

  test("resampleFfillStream restart: a later file extends the filled " +
    "grid exactly once") {
    val in = tmp("graft_ffill2_in_")
    val base = 1700006400L
    val step = 600L
    val end = base + 86400L * 2
    def ticks(from: Long, until: Long): Seq[org.apache.spark.sql.Row] =
      for (t <- from until until by (step * 2)) yield // every OTHER bucket
        evRow(t * 10, base + t, 5L, 1.0 + 0.01 * t)
    stageFile(in, "d0.parquet", base * 1000, ticks(0L, 86400L))
    val out = tmp("graft_ffill2_out_")
    val ck = tmp("graft_ffill2_ck_")
    Streams.resampleFfillStream(spark, in, out, ck, base, end, step,
      watermark = "30 minutes")
    val first = spark.read.parquet(out)
      .select("bucket", "user_id").collect().toSet
    assert(first.nonEmpty, "first drain emitted nothing")
    stageFile(in, "d1.parquet", base * 1000 + 1000,
      ticks(86400L, 86400L + 43200L))
    Streams.resampleFfillStream(spark, in, out, ck, base, end, step,
      watermark = "30 minutes")
    val all = spark.read.parquet(out)
      .select("bucket", "user_id").collect().toSeq
    assert(all.size == all.toSet.size,
      s"duplicate cells after restart: ${all.size} vs ${all.toSet.size}")
    assert(all.toSet.size > first.size, "restart emitted nothing new")
  }

  test("resampleFfillStream: a late tick replayed after the grid " +
    "completed cannot re-emit cells (tombstone state)") {
    val in = tmp("graft_ffill4_in_")
    val base = 1700006400L
    val step = 600L
    val end = base + 7200L // 12-bucket grid, completes quickly
    val rows = for (t <- 0L until 7200L by step) yield
      evRow(t * 10, base + t, 9L, 1.0 + t)
    stageFile(in, "d0.parquet", base * 1000, rows)
    // a post-grid tick (another series, ts past the grid end) drives
    // the watermark beyond the grid end — it never enters the grid
    // (ffillAdvance's upper-bound guard) but its event time finalizes
    // series 9's LAST bucket, reaching the tombstone branch
    stageFile(in, "d1.parquet", base * 1000 + 1000,
      Seq(evRow(999L, end + 120, 8L, 5.0)))
    val out = tmp("graft_ffill4_out_")
    val ck = tmp("graft_ffill4_ck_")
    Streams.resampleFfillStream(spark, in, out, ck, base, end, step,
      watermark = "1 minute")
    val first = spark.read.parquet(out)
      .where(col("user_id") === 9L).select("bucket").collect().toSeq
    assert(first.size == 12, s"grid not complete: ${first.size} of 12")
    // now a LATE tick for the completed series 9 lands (an old
    // timestamp replayed into the source dir)
    stageFile(in, "late.parquet", base * 1000 + 2000,
      Seq(evRow(1000L, base + 600, 9L, 99.0)))
    Streams.resampleFfillStream(spark, in, out, ck, base, end, step,
      watermark = "1 minute")
    val after = spark.read.parquet(out)
      .where(col("user_id") === 9L).select("bucket").collect().toSeq
    assert(after.size == after.toSet.size,
      s"late replay duplicated cells: ${after.size} vs ${after.toSet.size}")
    assert(after.size == 12, s"cell count changed: ${after.size}")
  }

  test("filled continuous corr: ffill stream chained into " +
    "windowedCorrFromCells equals the batch FILLED chain") {
    val in = tmp("graft_fcorr_in_")
    val base = 1700006400L
    val step = 600L
    val end = base + 86400L * 2
    val users = Seq(0L, 1L, 2L)
    // deterministic correlated series WITH GAPS: u2 skips every third
    // bucket, so the filled chain genuinely differs from the unfilled
    // one (the carry changes its correlations)
    val rows = for {
      t <- 0L until (86400L * 2) by step
      u <- users
      if u != 2L || (t / step) % 3 != 0
    } yield evRow(t * 10 + u, base + t, u,
      u.toDouble + 0.001 * t + ((t / step + 5 * u) % 11).toDouble)
    stageFile(in, "ticks.parquet", base * 1000, rows)
    val cellsOut = tmp("graft_fcorr_cells_")
    Streams.resampleFfillStream(spark, in, cellsOut, tmp("graft_fcorr_ck1_"),
      base, end, step, watermark = "1 hour")
    val corrOut = tmp("graft_fcorr_corr_")
    Streams.windowedCorrFromCells(spark, cellsOut, corrOut,
      tmp("graft_fcorr_ck2_"), users,
      bucket = "10 minutes", span = "1 day", watermark = "1 hour")
    val streamed = spark.read.parquet(corrOut)
      .select("window_start", "i", "j", "rho")
    assert(streamed.count() > 0, "chained corr emitted nothing")
    // batch comparator: the SAME corr plan over the batch-filled panel
    val ev = spark.read.schema(graft.Catalog.schemas("events"))
      .parquet(in)
    val batchCells = graft.ops.Time.resampleFfill(spark, ev, "user_id",
        "ts", "value", base, end, step, graft.ops.Exact.davg(col("value")))
      .select(timestamp_seconds(col("bucket")).as("ts"), col("user_id"),
        col("value"))
    val batch = Streams.windowedCorrPlan(batchCells, users,
      "10 minutes", "1 day", watermark = None)
    // prefix: query 1's frontier is maxTs - 1h (minus one grid step);
    // query 2's watermark then trails that frontier by another hour —
    // spans whose end clears maxTs - 2h - step are certainly emitted;
    // one extra step of margin keeps the boundary span out
    val maxSec = ev.agg(max(unix_timestamp(col("ts")))).head().getLong(0)
    val span = 86400L
    val cut = maxSec - 7200L - 2 * step
    val sPrefix = streamed.where(col("window_start") + span <= cut)
    val bPrefix = batch.where(col("window_start") + span <= cut)
    assert(sPrefix.count() > 0, "prefix compare is vacuous")
    assert(sPrefix.count() == bPrefix.count(),
      s"stream ${sPrefix.count()} vs batch ${bPrefix.count()}")
    val j = sPrefix.join(bPrefix
        .select(col("window_start"), col("i"), col("j"),
          col("rho").as("brho")),
      Seq("window_start", "i", "j"), "full_outer")
    assert(j.where(col("rho").isNull =!= col("brho").isNull).count() == 0)
    val defined = j.where(col("rho").isNotNull)
    assert(defined.count() > 0)
    val maxDiff = defined.agg(max(abs(col("rho") - col("brho"))))
      .head().getDouble(0)
    assert(maxDiff < 1e-9, s"max rho diff $maxDiff")
    // non-vacuity: the fill is load-bearing — the UNFILLED chain over
    // the same ticks disagrees with the filled one on this fixture
    val unfilled = Streams.windowedCorrPlan(ev, users,
      "10 minutes", "1 day", watermark = None)
      .where(col("window_start") + span <= cut)
      .select(col("window_start"), col("i"), col("j"),
        col("rho").as("urho"))
    val cmp = bPrefix.join(unfilled, Seq("window_start", "i", "j"))
      .where(abs(col("rho") - col("urho")) > 1e-6)
    assert(cmp.count() > 0,
      "fixture makes filled == unfilled — gap fixture broken")
  }

  test("documented limitation: a windowed aggregate cannot chain onto " +
    "the ffill stream in one query") {
    // windowedCorr's scaladoc says the filled continuous corr must run
    // as two chained queries because Spark rejects an aggregation
    // downstream of flatMapGroupsWithState in append mode. Pin that:
    // if a Spark upgrade lifts the restriction, this fails and the
    // single-query filled-corr chain should be built.
    val in = tmp("graft_ffill3_in_")
    val base = 1700006400L
    stageFile(in, "t.parquet", base * 1000,
      Seq(evRow(1L, base + 60, 0L, 1.0)))
    val cells = Streams.resampleFfillStreamPlan(
      Streams.eventsStream(spark, in), base, base + 3600, 600, "10 minutes")
    val agg = cells.toDF()
      .withColumn("ts", timestamp_seconds(col("bucket")))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(avg("value").as("m"))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      val q = agg.writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .outputMode("append")
        .option("checkpointLocation", tmp("graft_ffill3_ck_"))
        .format("noop").start()
      try q.awaitTermination() finally q.stop()
    }
    // the intercept above is the real canary (a lifted restriction makes
    // it fail); this only pins that the rejection came from the
    // streaming UnsupportedOperationChecker rather than some unrelated
    // analysis error — by its error condition, with the message
    // substring as fallback so a condition rename alone can't fail it
    assert(e.getCondition == "_LEGACY_ERROR_TEMP_3102" ||
      e.getMessage.toLowerCase.contains("flatmapgroupswithstate"),
      s"condition=${e.getCondition} msg=${e.getMessage}")
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

  test("windowedCorr restart mid-span: a span's OPEN corr-UDAF state " +
    "survives the checkpoint and merges the post-restart ticks — two " +
    "drains equal one") {
    // The deepest batch-boundary case the exactly-once test above does
    // not cover: kill the query while a span's CO-MOMENT state is open
    // (half its buckets aggregated), land the other half, re-drain from
    // the checkpoint. Lost or recomputed-from-scratch state would emit
    // the span's matrix from only the post-restart half; the asserts
    // compare the two-drain output row-for-row (rho included) against
    // one uninterrupted drain AND pin that the post-restart-only data
    // gives a measurably different rho — so agreement proves a real
    // cross-restart state merge, not a lucky recompute.
    val base = 1700006400L // UTC day boundary
    val users = Seq(0L, 1L)
    def ticks(fromSec: Long, untilSec: Long): Seq[org.apache.spark.sql.Row] =
      for {
        t <- fromSec until untilSec by 600L
        u <- users
      } yield evRow(t * 10 + u, base + t, u,
        u.toDouble + 0.001 * t + ((t / 600 + 7 * u) % 13).toDouble)
    val cutSec = 86400L * 3 / 2 // kill point: day 1 half-aggregated
    def run(in: String, out: String, ck: String): Unit =
      Streams.windowedCorr(spark, in, out, ck, users,
        bucket = "10 minutes", span = "1 day", watermark = "1 hour")
    // run A: drain to the kill point, land the rest, re-drain
    val inA = tmp("graft_corr_rs_inA_")
    val outA = tmp("graft_corr_rs_outA_")
    val ckA = tmp("graft_corr_rs_ckA_")
    stageFile(inA, "d1.parquet", 1000000L, ticks(0L, cutSec))
    run(inA, outA, ckA)
    val firstSpans = spark.read.parquet(outA)
      .select("window_start").collect().map(_.getLong(0)).toSet
    // the kill really happened mid-span: day 1 is open, not emitted
    assert(firstSpans == Set(base),
      s"first drain should emit exactly day 0, got $firstSpans")
    stageFile(inA, "d2.parquet", 2000000L, ticks(cutSec, 86400L * 3))
    run(inA, outA, ckA)
    // run B: identical input, one uninterrupted drain
    val inB = tmp("graft_corr_rs_inB_")
    val outB = tmp("graft_corr_rs_outB_")
    val ckB = tmp("graft_corr_rs_ckB_")
    stageFile(inB, "d1.parquet", 1000000L, ticks(0L, cutSec))
    stageFile(inB, "d2.parquet", 2000000L, ticks(cutSec, 86400L * 3))
    run(inB, outB, ckB)
    val a = spark.read.parquet(outA).select("window_start", "i", "j", "rho")
    val b = spark.read.parquet(outB)
      .select(col("window_start"), col("i"), col("j"), col("rho").as("brho"))
    assert(a.count() == b.count(),
      s"restart drain ${a.count()} rows vs single drain ${b.count()}")
    val j = a.join(b, Seq("window_start", "i", "j"), "full_outer")
    assert(j.where(col("rho").isNull =!= col("brho").isNull).count() == 0,
      "null-rho pattern diverged across the restart")
    val defined = j.where(col("rho").isNotNull)
    assert(defined.count() > 0, "rho compare is vacuous")
    val maxDiff = defined.agg(max(abs(col("rho") - col("brho"))))
      .head().getDouble(0)
    // Chan-merge partials may accumulate in different batch orders
    assert(maxDiff < 1e-9, s"max rho diff across restart $maxDiff")
    // day 1 crossed the restart and was emitted by the second drain
    val day1 = a.where(col("window_start") === base + 86400L)
    assert(day1.count() == 1, "day-1 span missing after restart")
    // non-vacuity of the merge: day 1 recomputed from ONLY the
    // post-restart ticks reads a different rho — state had to carry
    val ev2 = spark.read.schema(graft.Catalog.schemas("events"))
      .parquet(inB)
      .where(unix_timestamp(col("ts")) >= base + cutSec)
    val d2Only = Streams.windowedCorrPlan(ev2, users,
        "10 minutes", "1 day", watermark = None)
      .where(col("window_start") === base + 86400L)
      .head().getAs[Double]("rho")
    val merged = day1.head().getAs[Double]("rho")
    assert(math.abs(merged - d2Only) > 1e-6,
      s"fixture cannot distinguish merge from recompute: " +
        s"merged=$merged d2only=$d2Only")
  }

  test("filled-corr chain restart mid-input: BOTH queries (ffill cells, " +
    "windowed corr) resume from their checkpoints — two drains equal one") {
    // w18's operator is the deepest state in the repo: the ffill
    // stream's flatMapGroupsWithState carry feeding a second query's
    // windowed corr UDAF through the cells lake. Kill BOTH queries
    // mid-input (day 1's cells half-landed, its matrix state open),
    // land the rest, resume each from its own checkpoint, and compare
    // the final matrices row-for-row against one uninterrupted run of
    // the chain on identical input.
    val base = 1700006400L
    val step = 600L
    val users = Seq(0L, 1L, 2L)
    val end = base + 86400L * 3
    // correlated series WITH GAPS (u2 skips every third bucket): the
    // ffill carry is load-bearing, so losing q1's state would change
    // the filled values and thus the rho
    def ticks(fromSec: Long, untilSec: Long): Seq[org.apache.spark.sql.Row] =
      for {
        t <- fromSec until untilSec by step
        u <- users
        if u != 2L || (t / step) % 3 != 0
      } yield evRow(t * 10 + u, base + t, u,
        u.toDouble + 0.001 * t + ((t / step + 5 * u) % 11).toDouble)
    val cutSec = 86400L * 3 / 2
    def chain(in: String, cells: String, ck1: String, out: String,
              ck2: String): Unit = {
      Streams.resampleFfillStream(spark, in, cells, ck1,
        base, end, step, watermark = "1 hour")
      Streams.windowedCorrFromCells(spark, cells, out, ck2, users,
        bucket = "10 minutes", span = "1 day", watermark = "1 hour")
    }
    // run A: chain to the kill point, then resume the whole chain
    val inA = tmp("graft_fc_rs_inA_")
    val cellsA = tmp("graft_fc_rs_cellsA_")
    val outA = tmp("graft_fc_rs_outA_")
    val ck1A = tmp("graft_fc_rs_ck1A_")
    val ck2A = tmp("graft_fc_rs_ck2A_")
    stageFile(inA, "d1.parquet", 1000000L, ticks(0L, cutSec))
    chain(inA, cellsA, ck1A, outA, ck2A)
    val firstSpans = spark.read.parquet(outA)
      .select("window_start").collect().map(_.getLong(0)).toSet
    // mid-input for the SPAN state too: day 1 must still be open (its
    // end is past q2's watermark at the kill)
    assert(!firstSpans.contains(base + 86400L),
      s"day 1 already closed at the kill point: $firstSpans")
    stageFile(inA, "d2.parquet", 2000000L, ticks(cutSec, 86400L * 3))
    chain(inA, cellsA, ck1A, outA, ck2A)
    // run B: identical input, each query drains once
    val inB = tmp("graft_fc_rs_inB_")
    val cellsB = tmp("graft_fc_rs_cellsB_")
    val outB = tmp("graft_fc_rs_outB_")
    stageFile(inB, "d1.parquet", 1000000L, ticks(0L, cutSec))
    stageFile(inB, "d2.parquet", 2000000L, ticks(cutSec, 86400L * 3))
    chain(inB, cellsB, tmp("graft_fc_rs_ck1B_"), outB,
      tmp("graft_fc_rs_ck2B_"))
    val a = spark.read.parquet(outA).select("window_start", "i", "j", "rho")
    val b = spark.read.parquet(outB)
      .select(col("window_start"), col("i"), col("j"), col("rho").as("brho"))
    assert(a.count() == b.count(),
      s"restart chain ${a.count()} rows vs single chain ${b.count()}")
    val j = a.join(b, Seq("window_start", "i", "j"), "full_outer")
    assert(j.where(col("rho").isNull =!= col("brho").isNull).count() == 0,
      "null-rho pattern diverged across the chain restart")
    val defined = j.where(col("rho").isNotNull)
    assert(defined.count() > 0, "rho compare is vacuous")
    val maxDiff = defined.agg(max(abs(col("rho") - col("brho"))))
      .head().getDouble(0)
    assert(maxDiff < 1e-9, s"max rho diff across chain restart $maxDiff")
    // the restart emitted day 1 (crossed both checkpoints' state)
    assert(spark.read.parquet(outA)
        .where(col("window_start") === base + 86400L).count() > 0,
      "day-1 span missing after the chain restart")
  }

  test("sessionStream restart mid-input: an OPEN session's merging state " +
    "survives the checkpoint and a later drain extends it — two drains " +
    "equal one") {
    // The recovery case that matters in a continuous AvailableNow
    // deployment: kill the query while a session is OPEN in state, land
    // more events INSIDE that session's gap, re-drain from the
    // checkpoint. Lost state would re-open the session at the new
    // event (wrong start, wrong n_events); the assert compares the
    // two-drain output row-for-row against one uninterrupted drain of
    // the identical input.
    val t0 = graft.SparkEntry.jan2
    def d1Rows = Seq(
      // user 1: a session fully closed by drain 1's watermark
      evRow(1L, t0, 1L, 1.0), evRow(2L, t0 + 600, 1L, 1.0),
      // user 2: last event at t0+16000 — session end t0+17800 stays
      // AHEAD of drain 1's watermark (t0+16400), so it is held open
      evRow(3L, t0 + 15500, 2L, 1.0), evRow(4L, t0 + 16000, 2L, 1.0),
      // user 9: the watermark clock — max ts t0+20000 ⇒ wm t0+16400
      evRow(5L, t0 + 20000, 9L, 1.0))
    def d2Rows = Seq(
      // user 2 again, 500 s after its last d1 event — INSIDE the 30-min
      // gap: must merge into the open session (start t0+15500, n=3)
      evRow(6L, t0 + 16500, 2L, 1.0),
      // user 3: a fresh post-restart session
      evRow(7L, t0 + 21000, 3L, 1.0), evRow(8L, t0 + 21300, 3L, 1.0),
      // clock: wm t0+26400 closes user 2 (end t0+18300), user 3
      // (end t0+23100), and user 9's first session (end t0+21800)
      evRow(9L, t0 + 30000, 9L, 1.0))
    // run A: drain, land the second file, re-drain from the checkpoint
    val inA = tmp("graft_sess_rs_inA_")
    val outA = tmp("graft_sess_rs_outA_")
    val ckA = tmp("graft_sess_rs_ckA_")
    stageFile(inA, "d1.parquet", 1000000L, d1Rows)
    Streams.sessionStream(spark, inA, outA, ckA)
    stageFile(inA, "d2.parquet", 2000000L, d2Rows)
    Streams.sessionStream(spark, inA, outA, ckA)
    // run B: the same input drained once, uninterrupted
    val inB = tmp("graft_sess_rs_inB_")
    val outB = tmp("graft_sess_rs_outB_")
    val ckB = tmp("graft_sess_rs_ckB_")
    stageFile(inB, "d1.parquet", 1000000L, d1Rows)
    stageFile(inB, "d2.parquet", 2000000L, d2Rows)
    Streams.sessionStream(spark, inB, outB, ckB)
    def rows(out: String) = spark.read.parquet(out)
      .select("user_id", "session_start", "session_end", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq.sorted
    val a = rows(outA)
    val b = rows(outB)
    assert(a == b, s"restart diverged from single drain:\n A=$a\n B=$b")
    // and the cross-restart merge really happened: user 2 is ONE
    // session starting at its d1 first event with all three events
    assert(a.contains((2L, t0 + 15500, t0 + 16500 + 1800, 3L)),
      s"user 2's open session did not merge across the restart: $a")
  }

  test("windowedMeans restart mid-input: an OPEN window's aggregation " +
    "state survives the checkpoint — two drains equal one") {
    // Same recovery contract for the windowed-means ingest (w23's
    // operator): a 1-minute window left open at the kill receives more
    // rows after the restart; its single emitted row must carry the
    // merged (n, avg) — lost state would emit n=1 or a duplicate row.
    val base = graft.SparkEntry.sec("2024-01-02T10:00:00")
    def d1Rows = Seq(
      // window [base, base+60): closed by drain 1's watermark
      evRow(1L, base + 10, 1L, 1.0), evRow(2L, base + 20, 1L, 3.0),
      // window [base+4980, base+5040): end AHEAD of drain 1's watermark
      // (base+3600) — held open with one row of state
      evRow(3L, base + 5000, 2L, 10.0),
      // clock: wm base+3600
      evRow(4L, base + 7200, 9L, 1.0))
    def d2Rows = Seq(
      // same open window, second row — must merge to n=2, avg=20
      evRow(5L, base + 5010, 2L, 30.0),
      // clock: wm base+8400 closes user 2's window and the first
      // clock window [base+7200, base+7260)
      evRow(6L, base + 12000, 9L, 1.0))
    val inA = tmp("graft_wm_rs_inA_")
    val outA = tmp("graft_wm_rs_outA_")
    val ckA = tmp("graft_wm_rs_ckA_")
    stageFile(inA, "d1.parquet", 1000000L, d1Rows)
    Streams.windowedMeans(spark, inA, outA, ckA)
    stageFile(inA, "d2.parquet", 2000000L, d2Rows)
    Streams.windowedMeans(spark, inA, outA, ckA)
    val inB = tmp("graft_wm_rs_inB_")
    val outB = tmp("graft_wm_rs_outB_")
    val ckB = tmp("graft_wm_rs_ckB_")
    stageFile(inB, "d1.parquet", 1000000L, d1Rows)
    stageFile(inB, "d2.parquet", 2000000L, d2Rows)
    Streams.windowedMeans(spark, inB, outB, ckB)
    def rows(out: String) = spark.read.parquet(out)
      .select(unix_timestamp(col("bucket_start")).as("b"), col("user_id"),
        col("avg_value"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSeq.sorted
    val a = rows(outA)
    val b = rows(outB)
    assert(a == b, s"restart diverged from single drain:\n A=$a\n B=$b")
    // the open window's state merged: user 2's minute has BOTH rows
    assert(a.contains((base + 4980, 2L, 20.0, 2L)),
      s"user 2's open window did not merge across the restart: $a")
  }
}
