package graft.operators

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{QueryDef, QueryModule, Tables}
import graft.pipeline.{Mapper, Pipeline, Record}

/** End-to-end pipeline run registered in the correctness gate: the events
  * table replayed as a Kafka-shaped record stream through
  * source → parse (par_map) → DLQ split, with both branches checked
  * against the oracle (E1 semantics, reference `src/lib.rs:526-540`).
  *
  * The parse stage deliberately rejects records whose payload `k` is a
  * multiple of 10, so the DLQ branch is non-empty and the oracle pins
  * per-record skip-on-error: rejected offsets appear ONLY on the DLQ,
  * accepted ones ONLY on the ok branch. */
object PipelineQueries extends QueryModule {

  private val KPattern = """"k": ([0-9]+)""".r.unanchored

  private object ParseProps extends Mapper[Record, Long] {
    def map(in: Record): Try[Long] =
      new String(in.value, "UTF-8") match {
        case KPattern(k) if k.toLong % 10 != 0 => Success(k.toLong)
        case KPattern(_) => Failure(new RuntimeException("rejected: k%10==0"))
        case _ => Failure(new RuntimeException("unparseable payload"))
      }
  }

  private def eventRecords(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.events(s, d)
      .select($"user_id".cast("int").as("partition"), $"event_id",
        unix_timestamp($"ts").as("ts_s"), $"props")
      .as[(Int, Long, Long, String)]
      .map { case (p, o, ts, props) =>
        Record("events", p, o, ts * 1000L, None, props.getBytes("UTF-8"))
      }(Record.encoder)
  }

  private def parsed(s: SparkSession, d: String) = {
    import s.implicits._
    // cache=false: each registered query materializes one branch once,
    // so intermediate persisting would only pin memory in the driver's
    // long-lived gate/bench session
    Pipeline.from(s, eventRecords(s, d), cache = false).via(ParseProps)
  }

  /** Ok branch of the pipeline: accepted records with parsed value. */
  def pipelineOk(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    parsed(s, d).dataset
      .map { case (rec, k) => (rec.partition, rec.offset, k) }
      .toDF("partition", "offset", "k")
      .orderBy($"offset")
  }

  /** DLQ branch: originals of rejected records. */
  def pipelineDlq(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    parsed(s, d).dlq
      .map(rec => (rec.partition, rec.offset))
      .toDF("partition", "offset")
      .orderBy($"offset")
  }

  /** Highwater marks over the full replay (D7 at the pipeline level). */
  def pipelineHighwater(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.pipeline.HighwaterMark.of(
      eventRecords(s, d)
        .map(r => (r.topic, r.partition, r.offset))
        .toDF("topic", "partition", "offset"))
      .orderBy($"partition")
  }

  override def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_pipeline_ok", pipelineOk, Some("""
        SELECT CAST(user_id AS INTEGER) AS partition, event_id AS "offset",
               CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k
        FROM events
        WHERE CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) % 10 <> 0
        ORDER BY "offset"""")),
    QueryDef(
      "q_pipeline_dlq", pipelineDlq, Some("""
        SELECT CAST(user_id AS INTEGER) AS partition, event_id AS "offset"
        FROM events
        WHERE CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) % 10 = 0
        ORDER BY "offset"""")),
    QueryDef(
      "q_pipeline_highwater", pipelineHighwater, Some("""
        SELECT 'events' AS topic, CAST(user_id AS INTEGER) AS partition,
               max(event_id) + 1 AS next_offset
        FROM events GROUP BY user_id ORDER BY partition"""))
  )
}
