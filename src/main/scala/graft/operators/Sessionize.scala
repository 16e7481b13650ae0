package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{QueryDef, QueryModule, Tables}

/** Event sessionization — the batch form of the streaming
  * `session_window` (SURVEY §2.6: absent from the reference, which only
  * batches by processing time; this is the event-time extension).
  *
  * Classic gaps-and-islands: per user, a session breaks after a >30 min
  * silence; session ids come from a running sum over the break flags. Both
  * the lag and the running sum share one window partitioning (user_id), so
  * the whole query is a single shuffle on user_id followed by one
  * hash-aggregate — the same plan shape at any scale. Skewed users would be
  * salted at ingest; event data has no such key skew.
  */
object Sessionize extends QueryModule {

  private val GapSeconds = 1800L

  def sessionize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(s, d)
      .withColumn("prev_ts", lag($"ts", 1).over(w))
      .withColumn("brk",
        when($"prev_ts".isNull
          || unix_timestamp($"ts") - unix_timestamp($"prev_ts") > GapSeconds,
          1L).otherwise(0L))
      .withColumn("session_id",
        sum($"brk").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"session_id")
      .agg(
        count(lit(1)).as("n_events"),
        unix_timestamp(min($"ts")).as("start_s"),
        unix_timestamp(max($"ts")).as("end_s"),
        sum($"value".cast("decimal(18,6)")).cast("double").as("total_value"))
      .orderBy($"user_id", $"session_id")
  }

  /** Session-length distribution: how many sessions of each event count —
    * the downstream rollup a pipeline would feed monitoring from. */
  def sessionStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    sessionize(s, d)
      .groupBy($"n_events")
      .agg(count(lit(1)).as("n_sessions"),
        max($"end_s" - $"start_s").as("max_duration_s"))
      .orderBy($"n_events")
  }

  private val oracleSessions = s"""
    WITH x AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
             lag(CAST(ts AS TIMESTAMP)) OVER
               (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
               AS prev_ts
      FROM events),
    b AS (
      SELECT *, CASE WHEN prev_ts IS NULL OR
               CAST(floor(epoch(ts)) AS BIGINT)
                 - CAST(floor(epoch(prev_ts)) AS BIGINT) > 1800
             THEN 1 ELSE 0 END AS brk
      FROM x),
    sess AS (
      SELECT user_id, event_id, ts, value,
             CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM b),
    agg AS (
      SELECT user_id, session_id,
             count(*) AS n_events,
             CAST(floor(epoch(min(ts))) AS BIGINT) AS start_s,
             CAST(floor(epoch(max(ts))) AS BIGINT) AS end_s,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      FROM sess GROUP BY user_id, session_id)"""

  override def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_sessionize", sessionize, Some(s"""
        $oracleSessions
        SELECT user_id, session_id, n_events, start_s, end_s, total_value
        FROM agg ORDER BY user_id, session_id""")),
    QueryDef(
      "q_session_stats", sessionStats, Some(s"""
        $oracleSessions
        SELECT n_events, count(*) AS n_sessions,
               max(end_s - start_s) AS max_duration_s
        FROM agg GROUP BY n_events ORDER BY n_events"""))
  )
}
