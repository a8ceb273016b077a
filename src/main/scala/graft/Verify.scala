package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Fixture/decode drift tripwire. Round 9: the fixture's `ts` physical
    * unit changed and the engine decoded every event into January 1970 —
    * nothing failed loudly; the drift surfaced only as 37 confusing
    * oracle mismatches a round later. One cheap agg before grading turns
    * that failure mode into a named abort: the events span must look
    * like the generator's ~30-day 2024 window (TESTDATA.md).
    */
  def fixtureDriftCheck(spark: org.apache.spark.sql.SparkSession,
                        sfDir: String): Unit = {
    import org.apache.spark.sql.functions.{col, max, min, unix_micros}
    val r = Catalog.load(spark, sfDir, "events")
      .agg(min(col("ts")).as("lo"), max(col("ts")).as("hi"),
        ((unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
          / (86400.0 * 1e6)).as("spanDays"))
      .head()
    val (lo, hi) = (r.getTimestamp(0).toInstant, r.getTimestamp(1).toInstant)
    val spanDays = r.getDouble(2)
    require(lo.toString.startsWith("2024-") &&
        hi.toString.startsWith("2024-") && spanDays > 20 && spanDays < 40,
      s"fixture/decode drift: events.ts spans [$lo, $hi] " +
        f"($spanDays%.1f days); expected the ~30-day 2024 fixture window. " +
        "The parquet encoding or Catalog.load's decode changed — fix the " +
        "decode before trusting any oracle comparison (see CatalogSpec).")
  }

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional trailing names restrict the dump (dev: re-check a subset
    // without the full ~70-query sweep); the driver passes none.
    val only = args.drop(2).toSet
    // a typo'd name silently matching nothing would dump an empty
    // result set that reads as vacuously green downstream — fail fast
    val unknown = only -- SparkEntry.queries.keySet
    require(unknown.isEmpty,
      s"unknown query name(s): ${unknown.mkString(", ")}")
    val spark = Sessions.build("graft-verify")
    fixtureDriftCheck(spark, sfDir)
    new java.io.File(outDir).mkdirs()
    var failed = 0
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failed += 1
        System.err.println(s"[verify] $name FAILED: ${e.getMessage}")
      }
      // bound cached-intermediate storage across the run (each query's
      // caches are released once its result is on disk); the registry
      // release also drops the tracked plan references, not just blocks
      graft.ops.Time.unpersistPanels()
      spark.catalog.clearCache()
    }
    if (failed > 0) System.err.println(s"[verify] $failed queries failed")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.isEmpty || only(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
