package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for the suites (built once per forked test JVM;
  * [[Sessions.build]] is a getOrCreate so every suite sees the same one
  * with the engine's session contracts applied).
  */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.build("graft-test")

  /** Pre-execution physical plan string for plan-shape assertions —
    * with the metadata string limit raised, because the default
    * 100-char truncation can cut the table name out of the scan
    * Location paths the asserts grep for. Shared so plan-inspecting
    * specs cannot drift on that guard.
    */
  def planOf(df: org.apache.spark.sql.DataFrame): String = {
    spark.conf.set("spark.sql.maxMetadataStringLength", 4000)
    df.queryExecution.executedPlan.toString
  }

  /** Temp dir registered for recursive deletion at JVM exit — specs
    * write parquet/CSV fixtures without accreting /tmp garbage across
    * test runs.
    */
  def scratchDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    SparkTestBase.registerCleanup(p)
    p.toString
  }
}

object SparkTestBase {
  private val cleanup =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private lazy val hook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      cleanup.forEach { p =>
        try {
          java.nio.file.Files.walk(p)
            .sorted(java.util.Comparator.reverseOrder())
            .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
        } catch { case _: Throwable => () }
      }))
    ()
  }

  private[graft] def registerCleanup(p: java.nio.file.Path): Unit = {
    hook
    cleanup.add(p)
    ()
  }
}
