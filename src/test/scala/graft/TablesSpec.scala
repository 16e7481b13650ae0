package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.Tables

/** Pins the schema-adaptive events loader: fixture generations have
  * shipped `ts` both as raw nanos (parquet TIMESTAMP(NANOS), read as
  * long under `nanosAsLong`) and as TIMESTAMP(MICROS) (read as
  * TIMESTAMP_NTZ). The loader must yield the SAME µs TimestampType
  * column for the same instants either way — downstream arithmetic
  * (unix_timestamp / unix_micros / date_format) assumes it. */
class TablesSpec extends SparkSpecBase {

  private def writeEvents(dir: String, tsExpr: String): Unit = {
    import spark.implicits._
    Seq(
      (1L, 1609459200123456789L, 10L, "click", 1.5, "{}"),
      (2L, 1609459260999999999L, 11L, "view", 2.5, "{}"))
      .toDF("event_id", "ns", "user_id", "event_type", "value", "props")
      .selectExpr("event_id", s"$tsExpr as ts", "user_id", "event_type",
        "value", "props")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("events loader: long-nanos and NTZ-micros fixtures read identically") {
    val nanoDir = Files.createTempDirectory("graft_ev_nano").toString
    val ntzDir = Files.createTempDirectory("graft_ev_ntz").toString
    // long column named ts = what a TIMESTAMP(NANOS) fixture looks like
    // under spark.sql.legacy.parquet.nanosAsLong=true
    writeEvents(nanoDir, "ns")
    // TIMESTAMP_NTZ column = what a TIMESTAMP(MICROS) isAdjustedToUTC=false
    // fixture reads as (nanos truncate to µs, matching the loader's div)
    writeEvents(ntzDir, "cast(timestamp_micros(ns div 1000) as timestamp_ntz)")

    val a = Tables.events(spark, nanoDir)
    val b = Tables.events(spark, ntzDir)
    assert(a.schema("ts").dataType.typeName === "timestamp")
    assert(b.schema("ts").dataType.typeName === "timestamp")
    val got = Seq(a, b).map(
      _.select(col("event_id"), unix_micros(col("ts")).as("us"))
        .orderBy(col("event_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
    assert(got(0) === got(1))
    assert(got(0) === Seq(
      (1L, 1609459200123456L), (2L, 1609459260999999L)))
  }
}
