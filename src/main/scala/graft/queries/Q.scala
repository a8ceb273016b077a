package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query plus its DuckDB oracle SQL (None → the driver
  * records a weaker rows-only check). Shared by the query packs that
  * [[graft.SparkEntry]] concatenates.
  */
case class Q(name: String,
             fn: (SparkSession, String) => DataFrame,
             oracle: Option[String])
