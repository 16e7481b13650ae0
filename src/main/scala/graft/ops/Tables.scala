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

  /** events.ts is parquet TIMESTAMP(NANOS) which Spark 4 refuses to read
    * natively; read it as raw nanos (legacy long) and truncate to a µs
    * TimestampType with exact integer arithmetic (`div`, not `/` — ns since
    * epoch overflows double precision; post-epoch data, where div ==
    * floor). This matches DuckDB's `CAST(ts AS TIMESTAMP)` ns→µs
    * truncation, keeping the oracle aligned.
    *
    * The runtime conf set is a DELIBERATE session-level side effect: the
    * driver's smoke check calls `SparkEntry.entry` on a session we do not
    * build, so the flag cannot be a builder option. It only changes how
    * TIMESTAMP(NANOS) parquet columns read (as raw longs), and `events`
    * is the only such table in the fixture set. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    table(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
