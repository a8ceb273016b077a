package graft.pipeline

import java.time.LocalDate
import graft.SparkTestBase
import org.apache.spark.sql.functions._

class FlagshipSpec extends SparkTestBase {

  test("parseIntervalMs handles the reference's literal styles") {
    assert(Flagship.parseIntervalMs("250ms") == 250L)
    assert(Flagship.parseIntervalMs("1s") == 1000L)
    assert(Flagship.parseIntervalMs("5min") == 300000L)
    assert(Flagship.parseIntervalMs("4h") == 14400000L)
    assert(Flagship.parseIntervalMs("3d") == 259200000L)
    intercept[IllegalArgumentException](Flagship.parseIntervalMs("soon"))
  }

  test("sessionWindows clamps the last window to the close") {
    // 09:30-16:00 in 2h steps: 4 windows, last one 15:30-16:00
    val w = Flagship.sessionWindows(34200, 57600, 7200)
    assert(w == Seq((34200L, 41400L), (41400L, 48600L), (48600L, 55800L),
      (55800L, 57600L)))
  }

  test("businessDays skips weekends") {
    // 2024-01-05 is a Friday; 06/07 weekend
    val d = Flagship.businessDays(LocalDate.parse("2024-01-05"),
      LocalDate.parse("2024-01-09"))
    assert(d.map(_.toString) == Seq("2024-01-05", "2024-01-08",
      "2024-01-09"))
  }

  test("chunksDropTail drops the incomplete tail chunk") {
    assert(Flagship.chunksDropTail(1 to 7, 3) ==
      Seq(Seq(1, 2, 3), Seq(4, 5, 6)))
    assert(Flagship.chunksDropTail(Seq.empty[Int], 3).isEmpty)
  }

  test("run exports one CSV per window and tolerates empty windows") {
    val out = scratchDir("graft_flag_")
    val open = graft.SparkEntry.sec("2024-01-02T09:30:00")
    val close = graft.SparkEntry.sec("2024-01-02T16:00:00")
    val res = Flagship.run(spark, "/root/testdata/sf0.001", out,
      open, close, windowSec = 7200, freqSec = 300, maxUsers = 5)
    assert(res.length == 4)
    assert(res.forall(_.ok), res.filterNot(_.ok).map(_.error).mkString("; "))
    assert(res.forall(r => r.winEnd <= close))
    res.foreach { r =>
      val files = new java.io.File(r.path).listFiles()
      assert(files != null && files.exists(_.getName.endsWith(".csv")),
        s"no csv under ${r.path}")
    }
    // every window sees the same key set (the grid spans the session), so
    // all windows export the same k*(k-1)/2 pair count, and at least one
    // pair exists at sf0.001
    assert(res.map(_.rows).distinct.size == 1)
    assert(res.head.rows > 0)
  }

  test("wide layout writes the reference's square matrix CSV") {
    val out = scratchDir("graft_flagw_")
    val open = graft.SparkEntry.sec("2024-01-02T09:30:00")
    val close = graft.SparkEntry.sec("2024-01-02T16:00:00")
    // one whole-session window keeps the assertion focused on layout
    val res = Flagship.run(spark, "/root/testdata/sf0.001", out,
      open, close, windowSec = 23400, freqSec = 300, maxUsers = 5,
      layout = "wide")
    assert(res.length == 1 && res.head.ok, res.head.error)
    val csv = new java.io.File(res.head.path).listFiles()
      .filter(_.getName.endsWith(".csv")).head
    val lines = java.nio.file.Files.readAllLines(csv.toPath)
    // pandas to_csv shape: empty index-header cell, ids as header row
    // AND index column, k+1 lines for k ids, unit diagonal
    val header = lines.get(0).split(",", -1)
    assert(header.head == "")
    val ids = header.tail
    assert(ids.nonEmpty && lines.size == ids.length + 1)
    (1 until lines.size).foreach { r =>
      val fields = lines.get(r).split(",", -1)
      assert(fields.length == ids.length + 1)
      assert(fields.head == ids(r - 1))       // index column = header ids
      assert(fields(r).toDouble == 1.0)       // diagonal cell
    }
  }

  test("wide matrix CSV holds its layout at real width (k=150)") {
    val d = "/root/testdata/sf0.01"
    // s6b writes the square matrix as a side effect of its roundtrip
    graft.SparkEntry.queries("s6b_wide_corr_matrix")(spark, d).collect()
    val out = new java.io.File(
      graft.sources.Materialize.path(d, "s6b_wide_matrix"))
    val csv = out.listFiles().filter(_.getName.endsWith(".csv")).head
    val lines = java.nio.file.Files.readAllLines(csv.toPath)
    val header = lines.get(0).split(",", -1)
    assert(header.head == "")
    val ids = header.tail
    // the reference exports ~500 columns (README.md:43); the fixture
    // panel is every sf0.01 user — layout must hold at this width
    assert(ids.length >= 150, s"expected k>=150 columns, got ${ids.length}")
    assert(lines.size == ids.length + 1)
    var empties = 0
    (1 until lines.size).foreach { r =>
      val fields = lines.get(r).split(",", -1)
      assert(fields.length == ids.length + 1)
      assert(fields.head == ids(r - 1))       // index column = header ids
      assert(fields(r).toDouble == 1.0)       // unit diagonal
      empties += fields.tail.count(_.isEmpty)
    }
    // undefined pairs are EMPTY cells (pandas NaN → empty), not zeros —
    // and the matrix is symmetric, so their count is even
    assert(empties > 0 && empties % 2 == 0)
  }

  test("runWideAtWidth: one square CSV per window at real width (k=150), " +
    "read-back matches the UDAF long form") {
    val d = "/root/testdata/sf0.01"
    val out = scratchDir("graft_wide_width_")
    // two daily windows over jan1-jan3 (e1b's graded shape): the full
    // sf0.01 universe (k=150) participates; a single intra-day session
    // only sees the ~70 users with ticks in it
    val open = graft.SparkEntry.jan1
    val close = graft.SparkEntry.jan3
    val res = Flagship.runWideAtWidth(spark, d, out,
      open, close, windowSec = 86400, freqSec = 600, maxUsers = 1000)
    assert(res.length == 2)
    assert(res.forall(_.ok), res.filterNot(_.ok).map(_.error).mkString("; "))
    // the reference's production width: every sf0.01 user (k=150)
    assert(res.forall(_.rows >= 150), s"widths: ${res.map(_.rows)}")

    // expected long form from the same public pieces (panel + UDAF),
    // computed independently of the export loop
    val (users, panel) = graft.SparkEntry.widePanel(spark, d, 1000,
      open, close, 600)
    val k = users.size
    val expected = panel
      .withColumn("win",
        lit(open) + ((col("bucket") - open) / 86400).cast("long") * 86400)
      .groupBy("win")
      .agg(graft.functions.CorrMatrix.corrMatrix(k)(col("vals")).as("cells"))
      .select(col("win"), explode(col("cells")).as("c"))
      .select(col("win"),
        element_at(typedLit(users), col("c.i") + 1).as("i"),
        element_at(typedLit(users), col("c.j") + 1).as("j"),
        round(col("c.rho"), 6).as("rho"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3) || r.getDouble(3).isNaN) None
        else Some(r.getDouble(3))))
      .groupBy(_._1)

    res.foreach { r =>
      // layout: square, ids as header and index, unit diagonal
      val csv = new java.io.File(r.path).listFiles()
        .filter(_.getName.endsWith(".csv")).head
      val lines = java.nio.file.Files.readAllLines(csv.toPath)
      val header = lines.get(0).split(",", -1)
      assert(header.head == "" && header.tail.length == r.rows)
      assert(lines.size == r.rows + 1)
      assert(lines.get(1).split(",", -1)(1).toDouble == 1.0)
      // values: read the square file back to long form and compare to
      // the independently computed matrix for this window
      val ids = header.tail.map(_.toLong).toSeq
      val back = graft.sources.Sinks
        .readWideMatrixCsvLong(spark, r.path, ids)
        .collect()
        .map(b => (b.getLong(0), b.getLong(1),
          if (b.isNullAt(2) || b.getDouble(2).isNaN) None
          else Some(b.getDouble(2))))
        .toSet
      val want = expected(r.winStart)
        .map(e => (e._2, e._3, e._4)).toSet
      assert(back == want,
        s"window ${r.winStart}: ${back.diff(want).take(3)} vs " +
          s"${want.diff(back).take(3)}")
    }
    graft.ops.Time.unpersistPanels()
  }

  test("daily export writes the month layout and matches one span query") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types._
    val out = scratchDir("graft_daily_")
    val d = "/root/testdata/sf0.001"
    val days = Flagship.businessDays(
      java.time.LocalDate.of(2024, 1, 2),
      java.time.LocalDate.of(2024, 1, 26))
    assert(days.size == 19) // multi-week span
    val res = Flagship.runDailyExport(spark, d, out, days, 600, 5)
    assert(res.forall(_.ok), res.filterNot(_.ok).map(_.error).mkString(";"))
    assert(res.forall(_.rows > 0))
    // layout: one gzip CSV per day at {year}/{month:02d}/taq_resampled_*
    // (taq_chunks.py:136-142), zero-padded month dir, nothing else
    val mdir = new java.io.File(s"$out/2024/01")
    assert(mdir.isDirectory)
    assert(mdir.listFiles().map(_.getName).toSet ==
      days.map(dd => s"taq_resampled_$dd.csv.gz").toSet)
    // read every day file back...
    val schema = StructType(Seq(StructField("bucket", LongType),
      StructField("user_id", LongType), StructField("value", DoubleType)))
    val back = spark.read.option("header", "true").schema(schema)
      .csv(s"$out/2024/01/*.csv.gz")
    // ...and compare against ONE span-wide query: same resample, with
    // the ffill window partitioned by (user, day) and each day's key
    // set scoped to users who ticked that day — the single-job form of
    // the reference's per-day loop
    val ws0 = days.head.toEpochDay * 86400L
    val we0 = (days.last.toEpochDay + 1) * 86400L
    val bucketed = graft.Catalog.load(spark, d, "events")
      .where(col("user_id") < 5 &&
        col("ts") >= timestamp_seconds(lit(ws0)) &&
        col("ts") < timestamp_seconds(lit(we0)))
      .groupBy(graft.ops.Time.bucketSec(col("ts"), 600).as("bucket"),
        col("user_id"))
      .agg(graft.ops.Exact.davg(col("value")).as("value"))
    val keysByDay = bucketed
      .select((col("bucket") / 86400).cast("long").as("day"),
        col("user_id")).distinct()
    val grid = spark.range(ws0, we0, 600)
      .select(col("id").as("bucket"))
      .withColumn("day", (col("bucket") / 86400).cast("long"))
      .join(broadcast(keysByDay), Seq("day"))
    val w = Window.partitionBy("user_id", "day").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = grid.join(bucketed, Seq("bucket", "user_id"), "left")
      .withColumn("value", last(col("value"), ignoreNulls = true).over(w))
      .where(col("day").isInCollection(days.map(_.toEpochDay)))
      .select("bucket", "user_id", "value")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("bucket", "user_id").collect().toSeq.map(r =>
        (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    val got = rows(back)
    assert(got.nonEmpty && got == rows(want))
    // day independence: a day after the first still has empty buckets
    // before its first tick — a span-wide user-partitioned ffill would
    // have carried the previous day's close into them
    assert(got.exists { case (b, _, v) =>
      v.isEmpty && b >= days(1).toEpochDay * 86400L })
  }

  test("run records failures per window and never throws (§2.11)") {
    val out = scratchDir("graft_flagf_")
    val open = graft.SparkEntry.sec("2024-01-02T09:30:00")
    val close = graft.SparkEntry.sec("2024-01-02T16:00:00")
    // nonexistent fixture dir: every window's read fails; the reference
    // contract is skip-and-continue, not abort
    val res = Flagship.run(spark, "/nonexistent_fixture_dir", out,
      open, close, windowSec = 7200, freqSec = 300, maxUsers = 5)
    assert(res.length == 4)
    assert(res.forall(r => !r.ok && r.error.nonEmpty && r.rows == 0))
  }
}
