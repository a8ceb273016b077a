package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Explicit table catalog for the fixture star schema.
  *
  * The reference pipeline materializes schemas implicitly from remote SQL
  * result sets (`db.raw_sql(..., date_cols=...)`, e.g.
  * reference TAQpipeline/correlation_matrix_exporter.py:12-19); here every
  * table has a declared [[StructType]] so scans fail fast on drift and
  * Catalyst can prune columns against a known schema.
  *
  * At 100 TB the only change is the path layout: `events` (the tick-table
  * analog) would be laid out as Hive-partitioned `events/date=YYYY-MM-DD/`
  * so the per-day table-name dispatch of the reference
  * (correlation_matrix_exporter.py:89) becomes Catalyst partition pruning.
  */
object Catalog {

  val schemas: Map[String, StructType] = Map(
    "region" -> StructType(Seq(
      StructField("r_regionkey", IntegerType),
      StructField("r_name", StringType))),
    "nation" -> StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType))),
    "customer" -> StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType))),
    "supplier" -> StructType(Seq(
      StructField("s_suppkey", LongType),
      StructField("s_name", StringType),
      StructField("s_nationkey", IntegerType),
      StructField("s_acctbal", DoubleType))),
    "part" -> StructType(Seq(
      StructField("p_partkey", LongType),
      StructField("p_name", StringType),
      StructField("p_brand", StringType),
      StructField("p_type", StringType),
      StructField("p_size", IntegerType),
      StructField("p_retailprice", DoubleType))),
    "orders" -> StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType),
      StructField("o_orderpriority", StringType))),
    "lineitem" -> StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType),
      StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType),
      StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType),
      StructField("l_tax", DoubleType),
      StructField("l_returnflag", StringType),
      StructField("l_linestatus", StringType),
      StructField("l_shipdate", TimestampType))),
    // ts is physically INT64 TIMESTAMP(NANOS) — unreadable as TimestampType
    // by Spark 4's vectorized reader. Declared LongType here (requires
    // session conf spark.sql.legacy.parquet.nanosAsLong=true, see
    // [[Sessions]]); [[load]] converts it to a public TimestampType column.
    "events" -> StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType))),
    "documents" -> StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("n_chars", LongType))),
    "embeddings" -> StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
  )

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one fixture table. Schema is declared, not inferred, so the scan
    * carries an exact ReadSchema for column pruning.
    *
    * `events.ts` is read as raw nanosecond-epoch longs (see [[schemas]])
    * and converted to microsecond TimestampType here with integer division,
    * so every consumer sees a plain timestamp column. The conversion is a
    * codegen'd projection on top of the vectorized scan — no UDF, no
    * row-by-row decode.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val raw = spark.read.schema(schemas(name)).parquet(s"$sfDir/$name.parquet")
    if (name == "events")
      raw.withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
    else raw
  }

  /** Register every table as a temp view so `spark.sql` works against the
    * same names the DuckDB oracle uses.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    tableNames.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
