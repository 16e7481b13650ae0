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

  /** Misra–Gries heavy-hitters summary over a token stream: a bounded
    * (k-entry) counter map whose classic guarantees SURVIVE Spark's
    * partial-aggregate merges (MG summaries are mergeable): after
    * summarizing n tokens,
    *  - every token with true count > n/k is present, and
    *  - every estimate undercounts its true count by at most n/k.
    * The map-side partial summary is what makes corpus-scale "what
    * dominates the vocabulary" queries one bounded-memory aggregation
    * instead of a full token groupBy — the skew-finding companion to
    * the exact [[graft.operators.Corpus.tokenFrequencies]]. Estimates
    * (not membership above the bound) depend on merge order, so this is
    * spec-pinned rather than oracle-gated, like the other sketches. */
  class MisraGriesAgg(k: Int)
      extends Aggregator[Long, Map[Long, Long], Map[Long, Long]] {
    private def compact(m: Map[Long, Long]): Map[Long, Long] =
      if (m.size <= k) m
      else {
        // subtract the (k+1)-th largest count from everything; at most k
        // strictly-positive counters can survive
        val d = m.values.toSeq.sorted(Ordering[Long].reverse)(k)
        m.flatMap { case (t, c) => if (c - d > 0) Some(t -> (c - d)) else None }
      }
    def zero: Map[Long, Long] = Map.empty
    def reduce(buf: Map[Long, Long], tok: Long): Map[Long, Long] =
      compact(buf.updated(tok, buf.getOrElse(tok, 0L) + 1L))
    def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] =
      compact(b.foldLeft(a) { case (m, (t, c)) =>
        m.updated(t, m.getOrElse(t, 0L) + c)
      })
    def finish(buf: Map[Long, Long]): Map[Long, Long] = buf
    def bufferEncoder: Encoder[Map[Long, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()
    def outputEncoder: Encoder[Map[Long, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()
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
