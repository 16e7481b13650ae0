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

  /** Ordered funnel per user: first 'view', then the first 'click'
    * AT-OR-AFTER it, then the first 'purchase' at-or-after that — the
    * sequential-conversion measurement ad-hoc flag counting gets wrong
    * (a purchase BEFORE the first view must not count as a conversion).
    * Emitted per user (nullable stage times in epoch µs) so the gate
    * hashes the full trajectory, not just the counts; stage counts are
    * one GROUP BY away.
    *
    * Scale: three per-user min-aggregates chained by equi-joins on
    * user_id — every stage reuses the same hash partitioning, and
    * per-stage state is one row per user. No windows over the full
    * event stream, no self-join of events against events. */
  def funnel(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, d)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
    val t1 = e.where($"event_type" === "view")
      .groupBy($"user_id").agg(min($"us").as("view_us"))
    val t2 = e.where($"event_type" === "click")
      .join(t1, Seq("user_id"))
      .where($"us" >= $"view_us")
      .groupBy($"user_id").agg(min($"us").as("click_us"))
    val t3 = e.where($"event_type" === "purchase")
      .join(t2, Seq("user_id"))
      .where($"us" >= $"click_us")
      .groupBy($"user_id").agg(min($"us").as("purchase_us"))
    t1.join(t2, Seq("user_id"), "left")
      .join(t3, Seq("user_id"), "left")
      .select($"user_id", $"view_us", $"click_us", $"purchase_us")
      .orderBy($"user_id")
  }

  /** Cohort retention: users bucketed by FIRST-ACTIVE day, counted on
    * each later day they return — the (cohort_day, day_offset) matrix
    * behind every retention curve. Days are exact integer epoch-day
    * arithmetic (µs div 86400000000), so the matrix reproduces
    * bit-for-bit cross-engine.
    *
    * Scale: first-active day is one per-user min; the activity set is
    * the distinct (user, day) projection (map-side pre-aggregated);
    * the join key user_id reuses the same partitioning; the final
    * matrix is cohort x offset — tiny at any corpus size. */
  def retention(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val days = Tables.events(s, d)
      .select($"user_id",
        expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct()
    val cohorts = days.groupBy($"user_id").agg(min($"day").as("cohort_day"))
    days.join(cohorts, Seq("user_id"))
      .groupBy($"cohort_day", ($"day" - $"cohort_day").as("day_offset"))
      .agg(countDistinct($"user_id").as("n_users"))
      .orderBy($"cohort_day", $"day_offset")
  }

  /** Interval-union active time: each event opens a 5-minute activity
    * window; per user, the total length of the UNION of those windows
    * (overlaps merged — naive per-event summing double-counts bursts)
    * plus the merged-interval count. The sweep-line gaps-and-islands
    * form: an interval starts a new island iff it begins after the
    * running max of all previous ends; both windows (running max, island
    * running sum) and the two aggregates share ONE exchange on user_id.
    * All arithmetic is epoch-micros BIGINT. */
  def activeTime(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val winUs = 300000000L // 5 min
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, d)
      .select($"user_id", unix_micros($"ts").as("us"), $"event_id")
      .withColumn("end_us", $"us" + winUs)
      .withColumn("prev_max_end", max($"end_us").over(wPrev))
      .withColumn("new_island",
        when($"prev_max_end".isNull || $"us" > $"prev_max_end", 1L)
          .otherwise(0L))
      .withColumn("island", sum($"new_island").over(w))
      .groupBy($"user_id", $"island")
      .agg(min($"us").as("i_start"), max($"end_us").as("i_end"))
      .groupBy($"user_id")
      .agg(
        sum($"i_end" - $"i_start").as("active_us"),
        count(lit(1)).as("n_intervals"))
      .orderBy($"user_id")
  }

  /** CUSUM change-point detection on the hourly event rate: the
    * one-sided cumulative-sum statistic S_t = max(0, S_{t−1} + (c_t −
    * ref)) over the hourly count series, with ref = the exact integer
    * mean hourly count and an alarm at S_t ≥ 3·ref — the standard
    * sequential detector for "the rate shifted up", which per-hour
    * threshold checks miss when the shift is gradual.
    *
    * The nonlinear recurrence folds into TWO stacked windows via
    * S_t = P_t − min(0, min_{j≤t} P_j) with P the prefix sum of
    * deviations (induction: max(0, P_t − M_{t−1}) = P_t − min(P_t,
    * M_{t−1})) — no recursive computation, no driver loop. All
    * arithmetic BIGINT.
    *
    * Scale shape: the ONLY full-data pass is the map-side-combined
    * hourly rollup; both windows run on the hour series, whose length
    * is bounded by the time range, not the corpus (the same
    * domain-bounded single-partition-window argument as the profiling
    * histograms). The series is the OBSERVED hours; an hour with zero
    * events contributes no row (on sparse streams densify upstream if
    * silence should count as negative drift). */
  def rateCusum(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val hourly = Tables.events(s, d)
      .groupBy(expr("unix_micros(ts) div 3600000000").as("hour"))
      .agg(count(lit(1)).as("c"))
    val ref = hourly.agg(
      expr("sum(c) div count(1)").as("ref"))
    val wCum = Window.orderBy($"hour")
      .rowsBetween(Window.unboundedPreceding, 0)
    hourly.crossJoin(broadcast(ref)) // 1-row scalar
      .withColumn("pf", sum($"c" - $"ref").over(wCum))
      .withColumn("mn", least(lit(0L), min($"pf").over(wCum)))
      .select($"hour", $"c".as("n_events"),
        ($"pf" - $"mn").as("cusum"),
        when($"pf" - $"mn" >= lit(3L) * $"ref", 1L).otherwise(0L)
          .as("alarm"))
      .orderBy($"hour")
  }

  /** DAILY / WEEKLY ACTIVE USERS + stickiness — the product-analytics
    * rollup every event pipeline ends up serving: per epoch-day, the
    * exact distinct-user count (DAU), the exact distinct users over
    * the trailing 7 days (WAU), and DAU/WAU stickiness in ppm. The
    * trailing distinct is NOT a sum of dailies (users repeat), so the
    * exact form fans each (day, user) pair out to the ≤ 7 window days
    * it contributes to — an equi-groupable explode, deliberately
    * instead of a non-equi range join (which would plan a
    * BroadcastNestedLoop over the day table).
    *
    * Scale shape: the corpus reduces FIRST to distinct (day, user)
    * pairs (one map-side-combined exchange, grain = users × days, not
    * events); the 7× explode and both distinct aggregates run on that
    * reduced table. Days with no events in the window simply do not
    * appear — WAU days are restricted to days that themselves saw
    * events (inner join with the day list). */
  def activeUsers(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pairs = Tables.events(s, d)
      .select(expr("unix_timestamp(ts) div 86400").as("day"), $"user_id")
      .distinct()
    val dau = pairs.groupBy($"day").agg(count(lit(1)).as("dau"))
    val wau = pairs
      .select(explode(sequence($"day", $"day" + 6L)).as("day"), $"user_id")
      .groupBy($"day")
      .agg(countDistinct($"user_id").as("wau"))
    dau.join(wau, Seq("day")) // inner: only days that saw events
      .select($"day", $"dau", $"wau",
        expr("dau * 1000000 div wau").as("stickiness_ppm"))
      .orderBy($"day")
  }

  /** GROWTH ACCOUNTING — the daily active-user LEDGER that explains
    * every DAU move: per epoch-day, actives split exactly into
    * `new` (first day ever), `retained` (also active the previous
    * day), and `resurrected` (returning after a gap), plus `churned`
    * (active yesterday, absent today). The identities
    * `active = new + retained + resurrected` and
    * `active(d) − active(d−1) = new + resurrected − churned` hold
    * exactly by construction — a growth chart that doesn't reconcile
    * is the classic sign the events pipeline is dropping data.
    *
    * Scale shape: the corpus reduces FIRST to distinct (day, user)
    * pairs; first-day is one per-user min; yesterday-activity is a
    * self-equi-join of the reduced pairs on (day−1, user). Everything
    * after the reduction is (users × days)-grain, not event-grain. */
  def growthAccounting(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pairs = Tables.events(s, d)
      .select(expr("unix_timestamp(ts) div 86400").as("day"), $"user_id")
      .distinct()
    val firstDay = pairs.groupBy($"user_id").agg(min($"day").as("first_day"))
    val prev = pairs.select(($"day" + 1L).as("day"), $"user_id",
      lit(true).as("was_prev"))
    val flagged = pairs
      .join(firstDay, Seq("user_id"))
      .join(prev, Seq("day", "user_id"), "left")
      .select($"day", $"user_id",
        ($"day" === $"first_day").as("is_new"),
        coalesce($"was_prev", lit(false)).as("was_prev"))
    val daily = flagged.groupBy($"day").agg(
      count(lit(1)).as("n_active"),
      sum(when($"is_new", 1L).otherwise(0L)).as("n_new"),
      sum(when(!$"is_new" && $"was_prev", 1L).otherwise(0L)).as("n_retained"),
      sum(when(!$"is_new" && !$"was_prev", 1L).otherwise(0L))
        .as("n_resurrected"))
    // churned(d) = active(d−1) − retained(d): yesterday's actives who
    // did not return. Joined on the CALENDAR previous day (not lag over
    // present rows — an empty day would silently shift the reference)
    val prevCounts = daily.select(($"day" + 1L).as("day"),
      $"n_active".as("prev_active"))
    daily
      .join(prevCounts, Seq("day"), "left")
      .withColumn("n_churned",
        coalesce($"prev_active", lit(0L)) - $"n_retained")
      .select($"day", $"n_active", $"n_new", $"n_retained",
        $"n_resurrected", $"n_churned")
      .orderBy($"day")
  }

  /** LATE-ARRIVAL census, batch form — the oracle-gated analogue of
    * [[graft.streaming.StreamingPipeline.lateDataCensus]]: with arrival
    * order = event_id (the ingest sequence) and event time = ts, an
    * event is LATE when it arrives more than `delay` behind its
    * source's (event_type's) event-time high-water mark over strictly
    * earlier arrivals — exactly what a watermarked streaming aggregate
    * would have dropped at that delay. Per source: events, late events,
    * late share ppm, and the worst lateness in seconds — the readout
    * that calibrates the watermark delay BEFORE deploying the stream.
    *
    * Scale shape: one event_type exchange feeds the running-max window
    * (the same partitioning sessionize uses); the rollup is map-side
    * combined to a row per source. Exact integers: epoch micros,
    * ppm floor-division. */
  def lateArrivalCensus(s: SparkSession, d: String,
      delaySeconds: Long = 3600L): DataFrame = {
    import s.implicits._
    val wArr = Window.partitionBy($"event_type").orderBy($"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, d)
      .select($"event_type", $"event_id", unix_micros($"ts").as("us"))
      .withColumn("hwm", max($"us").over(wArr))
      .withColumn("late",
        $"hwm".isNotNull && $"us" < $"hwm" - delaySeconds * 1000000L)
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum(when($"late", 1L).otherwise(0L)).as("n_late"),
        max(when($"late", ($"hwm" - delaySeconds * 1000000L - $"us")
          .cast("long")).otherwise(0L)).as("worst_us"))
      .select($"event_type", $"n_events", $"n_late",
        expr("n_late * 1000000 div n_events").as("late_ppm"),
        expr("worst_us div 1000000").as("worst_s"))
      .orderBy($"event_type")
  }

  override def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_late_census", (s, d) => lateArrivalCensus(s, d), Some("""
        WITH e AS (
          SELECT event_type, event_id, epoch_us(ts) AS us,
                 max(epoch_us(ts)) OVER (
                   PARTITION BY event_type ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS hwm
          FROM events),
        f AS (
          SELECT event_type, us, hwm,
                 (hwm IS NOT NULL AND us < hwm - 3600000000::BIGINT)
                   AS late
          FROM e)
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_late,
               CAST(sum(CASE WHEN late THEN 1 ELSE 0 END) * 1000000
                 // count(*) AS BIGINT) AS late_ppm,
               CAST(max(CASE WHEN late THEN hwm - 3600000000::BIGINT - us
                        ELSE 0 END) // 1000000 AS BIGINT) AS worst_s
        FROM f GROUP BY event_type ORDER BY event_type""")),
    QueryDef(
      "q_growth_accounting", growthAccounting, Some("""
        WITH pr AS (
          SELECT DISTINCT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
                 user_id
          FROM events),
        fd AS (SELECT user_id, CAST(min(day) AS BIGINT) AS first_day
               FROM pr GROUP BY user_id),
        fl AS (
          SELECT pr.day, pr.user_id,
                 pr.day = fd.first_day AS is_new,
                 pv.user_id IS NOT NULL AS was_prev
          FROM pr
          JOIN fd USING (user_id)
          LEFT JOIN pr pv ON pv.user_id = pr.user_id
                          AND pv.day = pr.day - 1),
        daily AS (
          SELECT day,
                 CAST(count(*) AS BIGINT) AS n_active,
                 CAST(sum(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_new,
                 CAST(sum(CASE WHEN NOT is_new AND was_prev THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_retained,
                 CAST(sum(CASE WHEN NOT is_new AND NOT was_prev THEN 1 ELSE 0
                   END) AS BIGINT) AS n_resurrected
          FROM fl GROUP BY day)
        SELECT d.day, d.n_active, d.n_new, d.n_retained, d.n_resurrected,
               coalesce(p.n_active, 0) - d.n_retained AS n_churned
        FROM daily d LEFT JOIN daily p ON p.day = d.day - 1
        ORDER BY d.day""")),
    QueryDef(
      "q_active_users", activeUsers, Some("""
        WITH pr AS (
          SELECT DISTINCT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
                 user_id
          FROM events),
        dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau
                FROM pr GROUP BY day),
        w AS (SELECT unnest(generate_series(day, day + 6)) AS day, user_id
              FROM pr),
        wau AS (SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
                FROM w GROUP BY day)
        SELECT dau.day, dau.dau, wau.wau,
               dau.dau * 1000000 // wau.wau AS stickiness_ppm
        FROM dau JOIN wau USING (day) ORDER BY day""")),
    QueryDef(
      "q_rate_cusum", rateCusum, Some("""
        WITH h AS (
          SELECT epoch_us(ts) // 3600000000 AS hour,
                 CAST(count(*) AS BIGINT) AS c
          FROM events GROUP BY 1),
        t AS (
          SELECT CAST(sum(c) AS BIGINT) // CAST(count(*) AS BIGINT)
            AS ref FROM h),
        p AS (
          SELECT h.hour, h.c, t.ref,
                 CAST(sum(h.c - t.ref) OVER (ORDER BY h.hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS pf
          FROM h, t),
        m AS (
          SELECT *, least(CAST(0 AS BIGINT),
                 CAST(min(pf) OVER (ORDER BY hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT)) AS mn
          FROM p)
        SELECT hour, c AS n_events, pf - mn AS cusum,
               CAST(CASE WHEN pf - mn >= 3 * ref THEN 1 ELSE 0 END
                 AS BIGINT) AS alarm
        FROM m ORDER BY hour""")),
    QueryDef(
      "q_active_time", activeTime, Some("""
        WITH e AS (
          SELECT user_id, epoch_us(ts) AS us, event_id,
                 epoch_us(ts) + 300000000 AS end_us
          FROM events),
        m AS (
          SELECT *,
                 max(end_us) OVER (PARTITION BY user_id
                   ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev_max_end
          FROM e),
        isl AS (
          SELECT *,
                 CAST(sum(CASE WHEN prev_max_end IS NULL
                     OR us > prev_max_end THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS island
          FROM m),
        iv AS (
          SELECT user_id, island, min(us) AS i_start, max(end_us) AS i_end
          FROM isl GROUP BY user_id, island)
        SELECT user_id,
               CAST(sum(i_end - i_start) AS BIGINT) AS active_us,
               CAST(count(*) AS BIGINT) AS n_intervals
        FROM iv GROUP BY user_id ORDER BY user_id""")),
    QueryDef(
      "q_funnel", funnel, Some("""
        WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
                   FROM events),
        t1 AS (SELECT user_id, min(us) AS view_us
               FROM e WHERE event_type = 'view' GROUP BY user_id),
        t2 AS (SELECT e.user_id, min(us) AS click_us
               FROM e JOIN t1 USING (user_id)
               WHERE event_type = 'click' AND us >= view_us
               GROUP BY e.user_id),
        t3 AS (SELECT e.user_id, min(us) AS purchase_us
               FROM e JOIN t2 USING (user_id)
               WHERE event_type = 'purchase' AND us >= click_us
               GROUP BY e.user_id)
        SELECT t1.user_id, t1.view_us, t2.click_us, t3.purchase_us
        FROM t1 LEFT JOIN t2 USING (user_id) LEFT JOIN t3 USING (user_id)
        ORDER BY user_id""")),
    QueryDef(
      "q_retention", retention, Some("""
        WITH days AS (
          SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
          FROM events),
        cohorts AS (SELECT user_id, min(day) AS cohort_day
                    FROM days GROUP BY user_id)
        SELECT cohort_day, day - cohort_day AS day_offset,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM days JOIN cohorts USING (user_id)
        GROUP BY cohort_day, day - cohort_day
        ORDER BY cohort_day, day_offset""")),
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
