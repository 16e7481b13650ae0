package graft.pipeline

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` forms of the reference's `Reducer`
  * trait (SURVEY §2.5/2.7): `zero` = `reset`, `reduce` = `reduce`,
  * `finish` = `flush`. Unlike the [[Reducer]] batch interface (whole
  * partition at a time), these run inside Spark's aggregation machinery
  * with map-side partial aggregation — the scalable form of a keyed
  * accumulate-then-flush stage.
  */
object Aggregators {

  /** Highwater mark as a typed aggregator: max(offset)+1 per key
    * (reference `HighwaterMark::track`, `src/lib.rs:956-962`, which folds
    * one message at a time exactly like `reduce` here). */
  object HighwaterAgg extends Aggregator[Long, Long, Long] {
    def zero: Long = Long.MinValue
    def reduce(buf: Long, offset: Long): Long = math.max(buf, offset)
    def merge(a: Long, b: Long): Long = math.max(a, b)
    def finish(buf: Long): Long = buf + 1L
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Batch-concatenating reducer (the reference's `BatchingReducer` mock,
    * `src/lib.rs:1105-1192`, accumulates payload chunks and flushes them
    * as one batch): accumulates string payloads in arrival order. */
  object ConcatAgg extends Aggregator[String, List[String], String] {
    def zero: List[String] = Nil
    def reduce(buf: List[String], v: String): List[String] = v :: buf
    def merge(a: List[String], b: List[String]): List[String] = b ::: a
    def finish(buf: List[String]): String = buf.reverse.mkString(",")
    def bufferEncoder: Encoder[List[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[String]]()
    def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** Batch row-count — the sink's `written_rows` ack payload
    * (`src/clickhouse.rs:160-168`). */
  object CountAgg extends Aggregator[Any, Long, Long] {
    def zero: Long = 0L
    def reduce(buf: Long, v: Any): Long = buf + 1L
    def merge(a: Long, b: Long): Long = a + b
    def finish(buf: Long): Long = buf
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }
}
