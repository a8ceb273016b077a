package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for the suites (built once per forked test JVM;
  * [[Sessions.build]] is a getOrCreate so every suite sees the same one
  * with the engine's session contracts applied).
  */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.build("graft-test")
}
