package graft

import org.apache.spark.sql.SparkSession

/** Single place to build the engine's SparkSession so every entry point
  * (Verify, Bench, tests) agrees on the session-level contracts:
  *
  *   - UTC session timezone (the DuckDB oracle uses naive timestamps);
  *   - `spark.sql.legacy.parquet.nanosAsLong=true` — kept for the NANOS
  *     branch of [[Catalog.eventsTsUnit]]: when a fixture stores `ts` as
  *     INT64 TIMESTAMP(NANOS) (as rounds 2-8 did), Spark 4's vectorized
  *     reader refuses to widen it to TimestampType, so the scan reads raw
  *     longs and [[Catalog.load]] derives the timestamp. The conf only
  *     affects NANOS-annotated columns, so it is inert for the current
  *     MICROS fixture;
  *   - shuffle partitions sized to the local core count (not the 200
  *     default) — on a real cluster this is instead sized to input volume
  *     (or left to AQE coalescing).
  */
object Sessions {

  /** Thread/partition count: the driver contract is local[32] with 32
    * shuffle partitions; SPARK_GRAFT_CPUS overrides for dev boxes.
    */
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def build(appName: String): SparkSession = {
    val builder = SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // Spark 4.1's checksummed checkpoint writer deadlocks on local-FS
      // state-store delta files (tasks park forever in
      // ChecksumCancellableFSDataOutputStream.close awaiting the checksum
      // future — observed live under flatMapGroupsWithState). Checksums
      // protect against checkpoint corruption on flaky object stores; on
      // a reliable FS turning them off is the documented escape hatch.
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .config("spark.ui.enabled", "false")
    // evidence/dev hook: GRAFT_CONF="k=v;k2=v2" layers extra session
    // confs over the defaults — e.g. the CLUSTER-SHAPE correctness
    // sweep runs the whole Verify gate under
    // GRAFT_CONF="spark.sql.autoBroadcastJoinThreshold=-1" to prove
    // every graded query computes (not just plans) without size-based
    // broadcasts, the way PlanGuardSpec pins individual plans
    val withExtra = sys.env.get("GRAFT_CONF").toSeq
      .flatMap(_.split(';').toSeq).map(_.trim).filter(_.nonEmpty)
      .foldLeft(builder) { (b, kv) =>
        kv.split("=", 2) match {
          case Array(k, v) => b.config(k, v)
          case _ => sys.error(s"GRAFT_CONF entry '$kv' is not k=v")
        }
      }
    val spark = withExtra.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
