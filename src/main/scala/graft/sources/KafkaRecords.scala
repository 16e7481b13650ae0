package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Record

/** Production Kafka source wiring (S1): builds the `Dataset[Record]` the
  * pipeline/streaming layers consume from a real broker. The harness has
  * no Kafka, so tests cover [[toRecords]] (the column mapping) against a
  * Kafka-shaped DataFrame and `Demo`/specs drive the same downstream path
  * from `MemoryStream[Record]` — swapping in [[stream]] is the only
  * change a live deployment makes.
  *
  * Reference consumer-config mapping (SURVEY §2.2):
  *  - `enable.auto.commit` / `auto.commit.interval.ms` /
  *    `enable.auto.offset.store` (src/main.rs:100-102) → none: the
  *    checkpoint IS the offset store (stronger, per-batch);
  *  - 1024-msg fan-in channel + size-128 reducer flush
  *    (src/lib.rs:254, src/main.rs:115) → `maxOffsetsPerTrigger`;
  *  - 2 s flush interval (src/main.rs:116) → `Trigger.ProcessingTime`
  *    on the writer, not a source option.
  */
object KafkaRecords {

  final case class Config(
      bootstrapServers: String,
      topics: Seq[String],
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Option[Long] = None,
      groupIdPrefix: Option[String] = None)

  /** Source options for `readStream.format("kafka")` (pure; unit-tested). */
  def options(c: Config): Map[String, String] = {
    val base = Map(
      "kafka.bootstrap.servers" -> c.bootstrapServers,
      "subscribe" -> c.topics.mkString(","),
      "startingOffsets" -> c.startingOffsets)
    base ++
      c.maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString) ++
      c.groupIdPrefix.map("groupIdPrefix" -> _)
  }

  /** Map the Kafka source's fixed seven-column schema to [[Record]]
    * (pure column logic; unit-tested on a Kafka-shaped batch frame). */
  def toRecords(kafkaShaped: DataFrame): Dataset[Record] = {
    import kafkaShaped.sparkSession.implicits._
    kafkaShaped
      .select(
        col("topic"),
        col("partition"),
        col("offset"),
        expr("unix_millis(timestamp)").as("timestampMs"),
        col("key"),
        col("value"))
      .as[(String, Int, Long, Long, Array[Byte], Array[Byte])]
      .map { case (t, p, o, ts, k, v) =>
        Record(t, p, o, ts, Option(k), v)
      }(Record.encoder)
  }

  /** Live-broker entry point: `readStream.format("kafka")` with the
    * mapped options. Untestable in this harness (zero egress, no broker);
    * the downstream pipeline is identical from MemoryStream. */
  def stream(spark: SparkSession, c: Config): Dataset[Record] = {
    val reader = options(c).foldLeft(
      spark.readStream.format("kafka")) { case (r, (k, v)) => r.option(k, v) }
    toRecords(reader.load())
  }
}
