package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Each loader is a plain parquet scan: Catalyst pushes filters and
  * column pruning into the scan (verify with `.explain`: PushedFilters /
  * ReadSchema), which is the 100 TB-scale contract — a query that needs
  * 2 columns must read 2 columns.
  */
object Tables {
  // private so callers go through the named loaders (fixed table set)
  private def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts has shipped as two physical types across fixture
    * generations, so the loader adapts to the schema it finds:
    *
    *  - parquet TIMESTAMP(NANOS), which Spark 4 refuses to read natively:
    *    read as raw nanos (legacy long) and truncate to a µs TimestampType
    *    with exact integer arithmetic (`div`, not `/` — ns since epoch
    *    overflows double precision; post-epoch data, where div == floor).
    *    Matches DuckDB's `CAST(ts AS TIMESTAMP)` ns→µs truncation.
    *  - parquet TIMESTAMP(MICROS) without UTC adjustment, which Spark 4
    *    reads as TIMESTAMP_NTZ: cast to TimestampType — identity on the
    *    stored micros under the UTC session timezone every entry point
    *    sets, and what DuckDB reads directly.
    *
    * Downstream operators always see a µs TimestampType `ts` either way
    * (unix_timestamp/unix_micros/date_format all assume it).
    *
    * The runtime conf set is a DELIBERATE session-level side effect: the
    * driver's smoke check calls `SparkEntry.entry` on a session we do not
    * build, so the flag cannot be a builder option. It only changes how
    * TIMESTAMP(NANOS) parquet columns read (as raw longs); it is inert
    * for µs fixtures. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
