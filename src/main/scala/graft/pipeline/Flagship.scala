package graft.pipeline

import java.time.{DayOfWeek, LocalDate}
import scala.util.{Failure, Success, Try}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Catalog
import graft.ops.{Exact, Time}
import graft.sources.Sinks

/** One window's outcome in the export loop (reference exporter's
  * per-window append, correlation_matrix_exporter.py:153-167).
  */
case class WindowResult(winStart: Long, winEnd: Long, ok: Boolean,
                        rows: Long, path: String, error: String)

/** The reference's flagship end-to-end pipeline (E1,
  * TAQpipeline/correlation_matrix_exporter.py:128-235): universe snapshot →
  * tick filter → resample+ffill → per-window correlation matrix → one CSV
  * per window, with per-window failure tolerance (the reference swallows
  * any window error and continues — bare except at :125-126,169-170).
  *
  * Spark-first shape: the day's panel is resampled and forward-filled
  * ONCE as a lazy plan; each window is a bucket-range slice of it — the
  * driver loop only steers window boundaries and sinks, all data movement
  * stays in one cached plan. At 100 TB the windows would instead become a
  * window-id column and one partitioned write (see the `e1_flagship`
  * query, which is exactly that form); the loop here preserves the
  * reference's one-file-per-window output contract.
  */
object Flagship {

  /** F9: parse the reference's pandas-style interval literals ("4h",
    * "3d", "250ms", "1s", "5min") to milliseconds
    * (correlation_matrix_exporter.py:130,135 `pd.to_timedelta`).
    */
  def parseIntervalMs(s: String): Long = {
    val m = "^(\\d+)\\s*(ms|s|sec|min|m|h|d)$".r
      .findFirstMatchIn(s.trim.toLowerCase)
      .getOrElse(throw new IllegalArgumentException(
        s"unparseable interval literal: '$s'"))
    val n = m.group(1).toLong
    m.group(2) match {
      case "ms" => n
      case "s" | "sec" => n * 1000L
      case "min" | "m" => n * 60000L
      case "h" => n * 3600000L
      case "d" => n * 86400000L
    }
  }

  /** Intra-day session windows anchored at the open, last window clamped
    * to the close (exporter:146-152: `next_dt = min(next_dt, end_dt)`).
    */
  def sessionWindows(openSec: Long, closeSec: Long,
                     stepSec: Long): Seq[(Long, Long)] =
    (openSec until closeSec by stepSec)
      .map(ws => (ws, math.min(ws + stepSec, closeSec)))

  /** Business days in [start, end], weekends skipped
    * (pd.bdate_range, exporter:133).
    */
  def businessDays(start: LocalDate, end: LocalDate): Seq[LocalDate] =
    Iterator.iterate(start)(_.plusDays(1)).takeWhile(!_.isAfter(end))
      .filterNot(d => d.getDayOfWeek == DayOfWeek.SATURDAY ||
        d.getDayOfWeek == DayOfWeek.SUNDAY)
      .toSeq

  /** Multi-day chunks with the drop-incomplete-tail semantic
    * (exporter:176: `while current_index + interval_days <= len`).
    */
  def chunksDropTail[T](xs: Seq[T], n: Int): Seq[Seq[T]] =
    xs.grouped(n).filter(_.size == n).toSeq

  /** The reference's daily resample-export loop (taq_chunks.py:112-147):
    * each listed day's panel is resampled + forward-filled INDEPENDENTLY
    * (no value carries across days; a day's buckets before its first
    * tick stay empty — exactly the per-day query the reference issues
    * per iteration) and written as ONE gzip CSV at the reference's
    * literal artifact path, `outDir/{year}/{month:02d}/
    * taq_resampled_{yyyy-MM-dd}.csv.gz` (taq_chunks.py:136-142). Days
    * with no ticks are skipped (`ok = true, rows = 0`, no file —
    * taq_chunks.py:131-134's skip-empty), failures recorded per day
    * under the same never-throw contract as [[run]].
    *
    * Single-file-per-day is the downstream consumer contract (as with
    * [[Sinks.writeWindowCsv]]); the at-scale form of this computation is
    * one span-wide job with the day as a derived column and one
    * partitioned write (e1_flagship's shape) — FlagshipSpec grades this
    * loop's files byte-for-byte against exactly that single query.
    */
  def runDailyExport(spark: SparkSession, sfDir: String, outDir: String,
                     days: Seq[LocalDate], freqSec: Long,
                     maxUsers: Int): Seq[WindowResult] = {
    import java.nio.file.{Files, Paths}
    days.map { day =>
      val ws = day.atStartOfDay.toEpochSecond(java.time.ZoneOffset.UTC)
      val we = ws + 86400L
      Try {
        val ticks = Catalog.load(spark, sfDir, "events")
          .where(col("user_id") < maxUsers)
        val filled = Time.resampleFfill(spark, ticks, "user_id", "ts",
          "value", ws, we, freqSec, Exact.davg(col("value")))
        try {
          val monthDir = f"$outDir/${day.getYear}/${day.getMonthValue}%02d"
          val target = s"$monthDir/taq_resampled_$day.csv.gz"
          val tmp = s"$outDir/_tmp_$day"
          val n = filled.count()
          if (n == 0) WindowResult(ws, we, ok = true, 0, "", "")
          else try {
            filled.orderBy("bucket", "user_id").coalesce(1)
              .write.mode("overwrite").option("header", "true")
              .option("compression", "gzip").csv(tmp)
            Files.createDirectories(Paths.get(monthDir))
            val part = new java.io.File(tmp).listFiles()
              .filter(_.getName.endsWith(".csv.gz")).head
            Files.move(part.toPath, Paths.get(target),
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            WindowResult(ws, we, ok = true, n, target, "")
          } finally {
            // failed/partial staging (including Spark's nested
            // _temporary dirs) must not leave debris inside the
            // artifact tree a consumer globs recursively; swallow
            // cleanup errors so they can never mask the real failure
            try {
              val t = Paths.get(tmp)
              if (Files.exists(t))
                Files.walk(t)
                  .sorted(java.util.Comparator.reverseOrder())
                  .forEach(f => { Files.deleteIfExists(f); () })
            } catch { case _: Throwable => () }
          }
        } finally Time.unpersistPanels()
      } match {
        case Success(r) => r
        case Failure(e) =>
          WindowResult(ws, we, ok = false, 0, "", String.valueOf(e.getMessage))
      }
    }
  }

  /** The reference's exact per-window artifact at its REAL width, in the
    * engine's at-scale shape: ONE window-keyed one-pass co-moment UDAF
    * job computes every window's full k×k correlation matrix from a
    * single resample shuffle (e1b's plan — per-window state is a
    * k(k−1)/2×10-double co-moment buffer, never k² rows per bucket), the
    * per-window cell ARRAYS are cached once, and the driver loop only
    * steers the per-window square-CSV writes
    * ([[Sinks.writeWideMatrixCsvDense]]: ids as header + index, unit
    * diagonal, empty cells for undefined pairs — exporter:163,227-235 —
    * assembled straight off each window's cells row, no explode/regroup
    * in the loop). Contrast with [[run]]'s layout="wide", which
    * recomputes each window through the toy per-slice pair join.
    *
    * Same never-throw contract as [[run]]: a failing window is recorded
    * and skipped; a setup failure degrades to every window failed.
    */
  def runWideAtWidth(spark: SparkSession, sfDir: String, outDir: String,
                     openSec: Long, closeSec: Long, windowSec: Long,
                     freqSec: Long, maxUsers: Int): Seq[WindowResult] = {
    import org.apache.spark.sql.functions.{struct, transform}
    val windows = sessionWindows(openSec, closeSec, windowSec)
    val setup = Try {
      val (users, panel) = graft.SparkEntry.widePanel(spark, sfDir,
        maxUsers, openSec, closeSec, freqSec)
      val k = users.size
      val nBuckets = (closeSec - openSec) / freqSec
      // one row per window: the UDAF's cell ARRAY, kept un-exploded —
      // the per-window write below hands each row straight to the dense
      // square-CSV writer (ids = the shared sorted universe), so the
      // old explode → per-window id-collect → mirror-union → regroup
      // path is gone from the loop entirely
      val cells = panel
        .coalesce(graft.ops.Relational.boundedPartitions(nBuckets, 256))
        .withColumn("win",
          lit(openSec) + ((col("bucket") - openSec) / windowSec)
            .cast("long") * windowSec)
        .groupBy("win")
        .agg(graft.functions.CorrMatrix.corrMatrix(k)(col("vals"))
          .as("cells"))
        .select(col("win"), transform(col("cells"), c =>
          struct(c.getField("i").as("i"), c.getField("j").as("j"),
            round(c.getField("rho"), 6).as("rho"))).as("cells"))
        .cache()
      // materialize once (the write loop only filters); a failure
      // mid-count must release the partially cached blocks itself —
      // the Failure branch below only reaches the panel registry
      try cells.count()
      catch { case e: Throwable => cells.unpersist(); throw e }
      (users, cells)
    }
    val (users, cells) = setup match {
      case Failure(e) =>
        // the early return skips the finally below — release whatever
        // widePanel managed to register before the setup failure, or
        // the partial caches stay pinned for the rest of the session
        Time.unpersistPanels()
        return windows.map { case (ws, we) =>
          WindowResult(ws, we, ok = false, 0, "",
            String.valueOf(e.getMessage))
        }
      case Success(m) => m
    }
    try {
      windows.map { case (ws, we) =>
        Try {
          val winCells = cells.where(col("win") === ws).select("cells")
          // count on the cached cells is a cheap per-window probe; an
          // empty window (structurally impossible for grid-aligned
          // windows, but a caller can pass a wider range) must report
          // rows = 0 like runDailyExport, not claim a k-wide matrix
          val n = winCells.count()
          val path = s"$outDir/corr_${ws}_$we"
          Sinks.writeWideMatrixCsvDense(winCells, users, path)
          WindowResult(ws, we, ok = true,
            if (n == 0) 0L else users.size.toLong, path, "")
        } match {
          case Success(r) => r
          case Failure(e) =>
            WindowResult(ws, we, ok = false, 0, "",
              String.valueOf(e.getMessage))
        }
      }
    } finally {
      cells.unpersist()
      Time.unpersistPanels()
    }
  }

  /** Run the per-window correlation export over one trading session.
    * Every window is wrapped in Try: a failing window is recorded and
    * skipped, never failing the run (§2.11 of the survey — the
    * reference's lenient per-window contract).
    *
    * `layout` selects the sink: "long" writes the (i, j, rho) pair form
    * per window; "wide" writes the reference's square matrix CSV — ids
    * as header and index, unit diagonal ([[Sinks.writeWideMatrixCsv]],
    * exporter:163,227-235).
    */
  def run(spark: SparkSession, sfDir: String, outDir: String,
          openSec: Long, closeSec: Long, windowSec: Long,
          freqSec: Long, maxUsers: Int,
          layout: String = "long"): Seq[WindowResult] = {
    require(layout == "long" || layout == "wide",
      s"unknown layout '$layout' (want long | wide)")
    val windows = sessionWindows(openSec, closeSec, windowSec)
    // setup failure (missing source, bad schema) degrades to "every
    // window failed", preserving the never-throw contract
    val setup = Try {
      val ticks = Catalog.load(spark, sfDir, "events")
        .where(col("user_id") < maxUsers)
      // resampleFfill caches + registers the filled panel itself — no
      // second cache() here (it would be a CacheManager no-op plus a
      // redundant unpersist to keep in sync)
      Time.resampleFfill(spark, ticks, "user_id", "ts", "value",
          openSec, closeSec, freqSec, Exact.davg(col("value")))
    }
    val filled = setup match {
      case Failure(e) =>
        return windows.map { case (ws, we) =>
          WindowResult(ws, we, ok = false, 0, "",
            String.valueOf(e.getMessage))
        }
      case Success(f) => f
    }
    try {
      windows.map { case (ws, we) =>
        Try {
          val slice = filled.where(col("bucket") >= ws && col("bucket") < we)
          val a = slice.select(col("bucket"), col("user_id").as("i"),
            col("value").as("va"))
          val b = slice.select(col("bucket"), col("user_id").as("j"),
            col("value").as("vb"))
          val m = a.join(b, Seq("bucket")).where(col("i") < col("j"))
            .groupBy("i", "j")
            .agg(round(graft.ops.Stats.pearson(col("va"), col("vb")), 6).as("rho"))
            .orderBy("i", "j")
          val path = s"$outDir/corr_${ws}_$we"
          val n =
            if (layout == "wide")
              Sinks.writeWideMatrixCsv(m, "i", "j", "rho", path).size.toLong
            else Sinks.writeWindowCsv(m, path)
          WindowResult(ws, we, ok = true, n, path, "")
        } match {
          case Success(r) => r
          case Failure(e) =>
            WindowResult(ws, we, ok = false, 0, "",
              String.valueOf(e.getMessage))
        }
      }
    } finally Time.unpersistPanels() // releases the registered panel caches
  }
}
