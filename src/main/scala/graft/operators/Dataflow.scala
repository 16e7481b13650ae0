package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{QueryDef, QueryModule, Tables}

/** The reference's relational "SQL surface": the two verification queries it
  * runs over sunk data, plus the highwater-mark computation — the only pure
  * relational algorithm in its codebase.
  *
  * Mapping (see SURVEY.md §2.4-2.6): the reference checks Kafka delivery over
  * `(partition, offset)`; on the driver's `events` table the same shapes run
  * over `(user_id → partition, event_id → offset)`.
  *
  * Reference provenance (studied, not copied):
  *  - delivery-gap check: /root/reference/README.md:86-99
  *  - double-write check: /root/reference/README.md:101-113
  *  - highwater mark max(offset)+1 per key: /root/reference/src/lib.rs:944-978
  *  - parse projection + JSON wire format: /root/reference/src/main.rs:22-34
  *  - epoch-seconds timestamp serialization: /root/reference/src/main.rs:18
  *
  * Scale notes (100 TB): every query below is a single hash-aggregate or
  * window over the natural key — Spark plans partial+final aggregation
  * (map-side combine) automatically, the parquet scan prunes to the 2-3
  * referenced columns, and there is exactly one shuffle (on the group/window
  * key). No collect, no UDFs, fully codegen'd.
  */
object Dataflow extends QueryModule {

  /** Distinct (user_id, event_id) pairs — the `SELECT DISTINCT *` subquery of
    * the reference's gap check (README.md:95). Pre-partitioned on user_id:
    * hash(user_id) co-locates (user_id, event_id) too, so the distinct
    * aggregation, the per-user window, and the final per-user aggregate in
    * [[gapByWindow]] all reuse this ONE exchange — the same
    * single-shuffle formulation [[deliveryGap]] uses. Tradeoff: no
    * map-side pre-dedup, right when duplicates are rare (the
    * delivery-check regime). */
  private def distinctPairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d).select("user_id", "event_id")
      .repartition($"user_id")
      .distinct()
  }

  /** Flagship: per-key delivery-gap check. offset_diff == occ (delta = 0)
    * iff the offset range is dense — no message lost.
    *
    * The reference phrases this as `SELECT DISTINCT` then GROUP BY (two
    * shuffles); expressing the dedup as count(DISTINCT event_id) keeps
    * identical semantics (min/max are distinct-invariant) in ONE shuffle
    * on user_id — the plan that matters at 100 TB. */
  def deliveryGap(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select($"user_id", $"event_id")
      // hash(user_id) co-locates (user_id, event_id) too, so BOTH agg
      // phases of the distinct aggregation reuse this one exchange.
      // Tradeoff: no map-side pre-dedup — right when duplicates are rare
      // (the delivery-check regime); heavy-duplication inputs should drop
      // the repartition and take the extra exchange.
      .repartition($"user_id")
      .groupBy($"user_id")
      .agg(
        min($"event_id").as("min_off"),
        max($"event_id").as("max_off"),
        countDistinct($"event_id").as("occ"))
      .withColumn("offset_diff", $"max_off" - $"min_off" + lit(1L))
      .withColumn("delta", $"offset_diff" - $"occ")
      .orderBy($"user_id")
  }

  /** Double-write check: keys written more than once (README.md:101-113).
    * Correctly empty on clean data — duplicates would surface here. */
  def doubleWrite(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .groupBy($"user_id", $"event_id")
      .agg(count(lit(1)).as("occ"))
      .where($"occ" > 1)
      .orderBy($"user_id", $"event_id")
  }

  /** Highwater mark: max(offset)+1 per key — the commit-stage fold
    * (src/lib.rs:956-962) as one relational aggregate. */
  def highwater(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .groupBy($"user_id")
      .agg((max($"event_id") + lit(1L)).as("hwm"))
      .orderBy($"user_id")
  }

  /** Highwater mark through the typed `Aggregator` surface (A4 — the
    * Reducer-trait analogue; same answer as [[highwater]], but the fold
    * runs as a user-defined typed aggregation with map-side partials). */
  def highwaterTyped(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select($"user_id", $"event_id").as[(Long, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(graft.pipeline.Aggregators.HighwaterAgg.toColumn.name("hwm"))
      .toDF("user_id", "hwm")
      .orderBy($"user_id")
  }

  /** Idiomatic-Spark gap check: per-key lag window — finds WHERE the gaps
    * are, not just that they exist (SURVEY §2.6's showcase variant). */
  def gapByWindow(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"event_id")
    distinctPairs(s, d)
      .withColumn("prev", lag($"event_id", 1).over(w))
      .where($"prev".isNotNull)
      .withColumn("step", $"event_id" - $"prev")
      .groupBy($"user_id")
      .agg(
        count(lit(1)).as("n_steps"),
        sum(when($"step" =!= 1L, 1L).otherwise(0L)).as("n_gaps"),
        max($"step").as("max_step"))
      .orderBy($"user_id")
  }

  /** Parse stage: JSON payload → typed columns (`from_json` analogue of the
    * demo's serde parse, src/main.rs:22-34). Runs from_json to a map and
    * extracts the key — stays fully codegen'd, no UDF. */
  def parseProps(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // r13: from_json per row on the single-partition bench scan —
    // spread first (structural no-op at deployment scale)
    graft.ops.Par.spread(
      Tables.events(s, d).select($"event_id", $"props"), $"event_id")
      .select(
        $"event_id",
        element_at(
          from_json($"props", MapType(StringType, LongType)), "k").as("k"))
      .orderBy($"event_id")
  }

  /** Epoch-seconds round-trip (ts_seconds serialization, src/main.rs:18):
    * timestamp → epoch seconds → formatted UTC string. */
  def epochRoundtrip(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select(
        $"event_id",
        unix_timestamp($"ts").as("epoch_s"),
        date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("ts_str"))
      .orderBy($"event_id")
  }

  /** JSON wire-format round-trip: struct → to_json → from_json → fields,
    * the sink serialization path (serde_json::to_vec, src/main.rs:25-30). */
  def jsonRoundtrip(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val wireSchema = StructType(Seq(
      StructField("partition", LongType),
      StructField("offset", LongType)))
    // r13: to_json/from_json per row on the single-partition bench
    // scan — spread first (structural no-op at deployment scale)
    graft.ops.Par.spread(
      Tables.events(s, d).select($"event_id", $"user_id"), $"event_id")
      .select(
        $"event_id",
        to_json(struct($"user_id".as("partition"), $"event_id".as("offset")))
          .as("wire"))
      .select($"event_id", from_json($"wire", wireSchema).as("rec"), $"wire")
      .select(
        $"event_id",
        $"rec.partition".as("partition"),
        $"rec.offset".as("offset"),
        length($"wire").cast("long").as("wire_len"))
      .orderBy($"event_id")
  }

  /** Trailing event-time window: for every event, the count and value
    * extremes of the same user's events in the preceding 30 minutes
    * (inclusive) — a RANGE frame over event time, the per-record form of
    * rate limiting / burst detection a stream processor runs with state.
    *
    * The frame is ordered on epoch MICROS as a long, not the timestamp
    * column: integer range arithmetic is exact and engine-portable
    * (DuckDB's `RANGE ... PRECEDING` over `epoch_us(ts)` is the identical
    * frame), and equal-µs peers land in the same frame in both engines.
    *
    * Scale: one shuffle on user_id; the frame is evaluated with a sliding
    * two-pointer over each partition's sorted run — no per-row rescan, no
    * second exchange (same partitioning as every other per-user window
    * here). Aggregates are count/min/max — order-free, so exact on doubles. */
  def trailingWindow(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us")
      .rangeBetween(-1800000000L, 0L) // 30 min in µs, inclusive
    Tables.events(s, d)
      .select($"event_id", $"user_id", unix_micros($"ts").as("us"), $"value")
      .select(
        $"event_id", $"user_id", $"us",
        count(lit(1)).over(w).as("n_trail"),
        min($"value").over(w).as("vmin"),
        max($"value").over(w).as("vmax"))
      .orderBy($"event_id")
  }

  /** Sliding event-time windows in batch: 1-hour windows every 30 minutes
    * over the whole event stream — the batch form of the streaming
    * windowed aggregation (StreamingPipeline pins the streaming half).
    * With size = 2×slide every event lands in exactly two windows;
    * Spark plans this as one Expand (factor 2, the window count — NOT a
    * per-window self-join) feeding a single hash aggregate.
    *
    * Window starts are emitted as epoch micros: integer window arithmetic
    * (`us - us % slide - i·slide`) reproduces bit-exactly in the oracle,
    * where a timestamp column would re-open timezone/precision skew. */
  def slidingCounts(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .groupBy(window($"ts", "1 hour", "30 minutes").as("w"))
      .agg(
        count(lit(1)).as("n"),
        min($"value").as("vmin"),
        max($"value").as("vmax"))
      .select(unix_micros($"w.start").as("wstart"), $"n", $"vmin", $"vmax")
      .orderBy($"wstart")
  }

  /** Deterministic per-group MODE: each user's most frequent event
    * type, ties to the lexicographically smallest type. Spark's (and
    * DuckDB's) built-in `mode()` is tie-arbitrary — useless under a
    * hash gate and a reproducibility contract — so the mode is computed
    * as count + rank under a TOTAL order, the same
    * majority-by-construction shape as the cluster-purity audit.
    * One exchange: the (user, type) partial agg and the rank window
    * share the user_id partitioning. */
  def modalEventType(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val counts = Tables.events(s, d)
      .groupBy($"user_id", $"event_type").agg(count(lit(1)).as("n_modal"))
    val w = Window.partitionBy($"user_id")
      .orderBy($"n_modal".desc, $"event_type")
    counts.withColumn("rn", row_number().over(w))
      .where($"rn" === 1)
      .select($"user_id", $"event_type".as("modal_type"), $"n_modal")
      .orderBy($"user_id")
  }

  /** Hourly OHLC bars over the event stream: per hour bucket the
    * opening and closing `value` (first/last by event time, ties broken
    * by event_id — min_by/max_by under a TOTAL (us, event_id) order,
    * not first()/last() whose tie behavior is engine-dependent), the
    * extremes, and the count. The time-series downsampling shape
    * (financial bars, metric rollups) as ONE map-side-combined
    * aggregation: state per bucket is two (key, value) extremes + three
    * scalars, so nothing ever sorts a bucket's rows (the previous
    * row_number form sorted every hour-bucket partition twice — an
    * hour of a high-rate stream is exactly the partition that grows
    * with ingest rate, the bounded-aggregate rule's target).
    *
    * `value` passes through untouched (no sums), so doubles are safe;
    * the bucket is integer µs arithmetic. */
  def ohlcBars(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, d)
      .select(expr("unix_micros(ts) div 3600000000").as("hour_bucket"),
        unix_micros($"ts").as("us"), $"event_id", $"value")
    e.groupBy($"hour_bucket")
      .agg(
        min_by($"value", struct($"us", $"event_id")).as("open"),
        max($"value").as("high"),
        min($"value").as("low"),
        max_by($"value", struct($"us", $"event_id")).as("close"),
        count(lit(1)).as("n"))
      .orderBy($"hour_bucket")
  }

  override def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_modal_type", modalEventType, Some("""
        WITH c AS (
          SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n_modal
          FROM events GROUP BY user_id, event_type),
        r AS (
          SELECT *, row_number() OVER (PARTITION BY user_id
                   ORDER BY n_modal DESC, event_type) AS rn
          FROM c)
        SELECT user_id, event_type AS modal_type, n_modal
        FROM r WHERE rn = 1 ORDER BY user_id""")),
    QueryDef(
      "q_ohlc_bars", ohlcBars, Some("""
        WITH e AS (
          SELECT epoch_us(ts) // 3600000000 AS hour_bucket,
                 epoch_us(ts) AS us, event_id, value
          FROM events),
        r AS (
          SELECT *,
                 row_number() OVER (PARTITION BY hour_bucket
                   ORDER BY us, event_id) AS rn_a,
                 row_number() OVER (PARTITION BY hour_bucket
                   ORDER BY us DESC, event_id DESC) AS rn_d
          FROM e)
        SELECT hour_bucket,
               max(CASE WHEN rn_a = 1 THEN value END) AS open,
               max(value) AS high,
               min(value) AS low,
               max(CASE WHEN rn_d = 1 THEN value END) AS close,
               CAST(count(*) AS BIGINT) AS n
        FROM r GROUP BY hour_bucket ORDER BY hour_bucket""")),
    QueryDef(
      "q_trailing_window", trailingWindow, Some("""
        SELECT event_id, user_id, epoch_us(ts) AS us,
               CAST(count(*) OVER w AS BIGINT) AS n_trail,
               min(value) OVER w AS vmin,
               max(value) OVER w AS vmax
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW)
        ORDER BY event_id""")),
    QueryDef(
      "q_sliding_counts", slidingCounts, Some("""
        WITH x AS (
          SELECT epoch_us(ts) AS us, value,
                 unnest([CAST(0 AS BIGINT), CAST(1 AS BIGINT)]) AS i
          FROM events)
        SELECT us - (us % 1800000000) - i * 1800000000 AS wstart,
               CAST(count(*) AS BIGINT) AS n,
               min(value) AS vmin,
               max(value) AS vmax
        FROM x
        GROUP BY 1 ORDER BY 1""")),
    QueryDef(
      "q_delivery_gap", deliveryGap, Some("""
        SELECT user_id,
               min(event_id) AS min_off,
               max(event_id) AS max_off,
               count(event_id) AS occ,
               max(event_id) - min(event_id) + 1 AS offset_diff,
               (max(event_id) - min(event_id) + 1) - count(event_id) AS delta
        FROM (SELECT DISTINCT user_id, event_id FROM events) t
        GROUP BY user_id ORDER BY user_id""")),
    QueryDef(
      "q_double_write", doubleWrite, Some("""
        SELECT user_id, event_id, count(*) AS occ
        FROM events
        GROUP BY user_id, event_id
        HAVING count(*) > 1
        ORDER BY user_id, event_id""")),
    QueryDef(
      "q_highwater", highwater, Some("""
        SELECT user_id, max(event_id) + 1 AS hwm
        FROM events GROUP BY user_id ORDER BY user_id""")),
    QueryDef(
      "q_highwater_typed", highwaterTyped, Some("""
        SELECT user_id, max(event_id) + 1 AS hwm
        FROM events GROUP BY user_id ORDER BY user_id""")),
    QueryDef(
      "q_gap_by_window", gapByWindow, Some("""
        SELECT user_id,
               count(*) AS n_steps,
               CAST(sum(CASE WHEN step <> 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_gaps,
               max(step) AS max_step
        FROM (SELECT user_id,
                     event_id - lag(event_id)
                       OVER (PARTITION BY user_id ORDER BY event_id) AS step
              FROM (SELECT DISTINCT user_id, event_id FROM events) t) s
        WHERE step IS NOT NULL
        GROUP BY user_id ORDER BY user_id""")),
    QueryDef(
      "q_parse_props", parseProps, Some("""
        SELECT event_id,
               CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k
        FROM events ORDER BY event_id""")),
    QueryDef(
      "q_epoch_roundtrip", epochRoundtrip, Some("""
        SELECT event_id,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS epoch_s,
               strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_str
        FROM events ORDER BY event_id""")),
    QueryDef(
      "q_json_roundtrip", jsonRoundtrip, Some("""
        SELECT event_id,
               user_id AS partition,
               event_id AS offset,
               length('{"partition":' || user_id || ',"offset":' || event_id
                      || '}') AS wire_len
        FROM events ORDER BY event_id"""))
  )
}
