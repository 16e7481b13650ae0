package graft.pipeline

import scala.util.Try

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** The Kafka-shaped record every pipeline stage sees — the Spark row form
  * of the reference's `OwnedMessage` (field inventory: SURVEY §1.1;
  * reference `src/lib.rs:464-478`). `key` is carried for parity but unused
  * by every reference test (`src/lib.rs:1206`). */
final case class Record(
    topic: String,
    partition: Int,
    offset: Long,
    timestampMs: Long,
    key: Option[Array[Byte]],
    value: Array[Byte])

object Record {
  /** Catalyst encoder, session-independent (companion implicit so user
    * code never has to summon it). */
  implicit val encoder: Encoder[Record] = Encoders.product[Record]
}

/** 1→1 stage with failure routing — the `Mapper` trait analogue
  * (reference `src/lib.rs:562-571`): a failure sends the ORIGINAL record
  * to the DLQ while later records keep flowing (per-record skip-on-error,
  * `src/lib.rs:526-540`). Evaluated once per record (tagged MapStep
  * split), so non-deterministic stages are safe. */
trait Mapper[I, O] extends Serializable {
  def map(in: I): Try[O]
}

/** N→1 batch stage — the `Reducer` trait analogue (reference
  * `src/lib.rs:703-713`). In batch execution a `reduce` sees one whole
  * partition; in streaming, one micro-batch (the reference's flush
  * interval / size knobs map to triggers — SURVEY §2.2). */
trait Reducer[I, O] extends Serializable {
  def reduce(batch: Seq[I]): Try[O]
}

/** Identity stages for topology tests (reference `src/noop.rs:11-91`). */
object Noop {
  def mapper[T]: Mapper[T, T] = new Mapper[T, T] {
    def map(in: T): Try[T] = Try(in)
  }
}

/** Where acked offsets go after a successful sink write — the commit stage
  * (D6, reference `src/lib.rs:980-994`). Production = streaming
  * checkpoints; tests = an in-memory mock identical in spirit to the
  * reference's `MockCommitClient` (`src/lib.rs:1028-1037`). */
trait CommitClient {
  def storeOffsets(highwater: Seq[((String, Int), Long)]): Unit
}

/** Highwater-mark computation (D7, reference `src/lib.rs:944-978`):
  * max(offset)+1 per (topic, partition) — pure relational, one
  * hash-aggregate. */
object HighwaterMark {
  def of(acked: DataFrame): DataFrame =
    acked
      .groupBy(col("topic"), col("partition"))
      .agg((max(col("offset")) + lit(1L)).as("next_offset"))
}

/** Result of running a pipeline: sink output, dead-letter records
  * (originals, as in the reference), and the offsets that were stored. */
final case class PipelineResult[T](
    ok: Dataset[(Record, T)],
    dlq: Dataset[Record],
    committed: Seq[((String, Int), Long)]) {

  /** Release the cached `ok`/`dlq` branches pinned by [[Pipeline.run]].
    * Call when done consuming the result — long-lived sessions that run
    * many pipelines (tests, the gate driver) otherwise accumulate cached
    * blocks without bound. */
  def unpersist(): Unit = {
    ok.unpersist()
    dlq.unpersist()
    ()
  }
}

/** One reduced batch: the records that fed it (provenance, the reference's
  * `(Vec<OwnedMessage>, T)` channel payload — `src/lib.rs:751-754`) and the
  * reduced value. */
final case class ReducedBatch[O](
    topic: String,
    partition: Int,
    offsets: Seq[Long],
    value: O)

/** Tagged outcome of reducing one group: a batch on success, the failed
  * originals otherwise (lets the reduce run in a single shuffle). */
final case class ReduceStep[O](
    batch: Option[ReducedBatch[O]],
    failed: Seq[Record])

/** Tagged outcome of one mapped record: value on success, None = the
  * original goes to the DLQ (lets a map stage run in ONE evaluation per
  * record — no determinism requirement on the stage). */
final case class MapStep[O](rec: Record, value: Option[O])

/** Declarative dataflow pipeline over a `Dataset[Record]` — the
  * `processing_strategy!` analogue (D8, reference `src/lib.rs:235-383`).
  *
  * The reference hand-schedules Tokio actors joined by bounded channels;
  * here each stage appends to a lazily-composed Spark plan, so "pipeline
  * construction" is logical-plan construction and Catalyst/Tungsten own
  * scheduling (SURVEY §3.1). The semantic mapping:
  *   - per-partition parallel ingest (D2) → one Spark task per partition;
  *   - bounded concurrency (D3 `MapConfig`) → the task-slot model;
  *   - channel backpressure → pull-based iterators;
  *   - rebalance handling (D9/D12) → deliberate no-op: Spark assigns
  *     partitions to tasks itself, there is no consumer-group rebalance
  *     protocol to mirror;
  *   - shutdown/drain (D10-D13) → batch jobs run to completion; the
  *     streaming path uses `Trigger.AvailableNow` / `query.stop()`
  *     (see graft.streaming).
  *
  * Records that fail any stage land on the DLQ as ORIGINALS and never
  * reach commit; later records still flow (at-least-once with per-record
  * skip, pinned by the ported `test_fail_on_*` cases —
  * reference `src/lib.rs:1384-1391`).
  */
final class Pipeline[T] private (
    val spark: SparkSession,
    private val okDs: Dataset[(Record, T)],
    private val dlqDs: Dataset[Record],
    private val caches: scala.collection.mutable.ListBuffer[Dataset[_]],
    private val useCache: Boolean) {

  import Pipeline._

  /** 1→1 transform with DLQ split (par_map / map stages, D2/D3). The
    * stage runs ONCE per record into a tagged [[MapStep]]; the ok/DLQ
    * branches are projections of that staged dataset (cached unless the
    * pipeline was built with cache=false), so stages need not be
    * deterministic and expensive stages aren't re-evaluated. */
  def via[O: Encoder](stage: Mapper[T, O])(
      implicit mt: scala.reflect.runtime.universe.TypeTag[MapStep[O]])
      : Pipeline[O] = {
    import spark.implicits._
    implicit val rEnc: Encoder[Record] = recordEncoder(spark)
    implicit val roEnc: Encoder[(Record, O)] =
      Encoders.tuple(rEnc, implicitly[Encoder[O]])
    val stagedRaw = okDs.map { case (rec, v) =>
      MapStep[O](rec, safely(stage, v).toOption)
    }
    val staged = if (useCache) { val c = stagedRaw.persist(); caches += c; c }
      else stagedRaw
    val ok = staged.flatMap(s => s.value.map(o => (s.rec, o)))
    val failed = staged.flatMap(s => if (s.value.isEmpty) Some(s.rec) else None)
    new Pipeline(spark, ok, dlqDs.union(failed), caches, useCache)
  }

  def viaFn[O: Encoder](f: T => Try[O])(
      implicit mt: scala.reflect.runtime.universe.TypeTag[MapStep[O]])
      : Pipeline[O] =
    via(new Mapper[T, O] { def map(in: T): Try[O] = f(in) })

  /** [[via]] with bounded IN-TASK async concurrency — the
    * `MapConfig.concurrency` knob (reference `src/lib.rs:549-554`,
    * enforced at `src/lib.rs:660`, concurrency=16 in `src/noop.rs:40`).
    *
    * The task-slot model already parallelizes ACROSS partitions; this
    * adds parallelism WITHIN one task for IO-bound stages (the
    * reference's HTTP-ack path), where one request per task would leave
    * executor cores idle behind network latency. Each task keeps at most
    * `concurrency` stage invocations in flight on a private pool and
    * yields results in INPUT ORDER (the reference's FuturesOrdered:
    * completion may be out of order, emission is not), so downstream
    * offset/provenance semantics are identical to [[via]] — as is DLQ
    * routing, pinned by the async `test_map`/`test_fail_on_map` ports. */
  def viaAsync[O: Encoder](stage: Mapper[T, O], concurrency: Int)(
      implicit mt: scala.reflect.runtime.universe.TypeTag[MapStep[O]])
      : Pipeline[O] = {
    require(concurrency >= 1, "concurrency must be >= 1")
    import spark.implicits._
    implicit val rEnc: Encoder[Record] = recordEncoder(spark)
    implicit val roEnc: Encoder[(Record, O)] =
      Encoders.tuple(rEnc, implicitly[Encoder[O]])
    val stagedRaw = okDs.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val pool =
          java.util.concurrent.Executors.newFixedThreadPool(concurrency)
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutorService(pool)
        // a killed/failed task must not leak its pool
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => pool.shutdownNow()))
        new Iterator[MapStep[O]] {
          private val inflight = scala.collection.mutable.Queue
            .empty[(Record, scala.concurrent.Future[Option[O]])]
          private def fill(): Unit =
            while (inflight.size < concurrency && it.hasNext) {
              val (r, v) = it.next()
              inflight.enqueue(
                (r, scala.concurrent.Future(safely(stage, v).toOption)))
            }
          def hasNext: Boolean = {
            fill()
            if (inflight.isEmpty) { pool.shutdown(); false } else true
          }
          def next(): MapStep[O] = {
            fill()
            val (r, f) = inflight.dequeue()
            MapStep(r, scala.concurrent.Await.result(f,
              scala.concurrent.duration.Duration.Inf))
          }
        }
      }
    }
    val staged = if (useCache) { val c = stagedRaw.persist(); caches += c; c }
      else stagedRaw
    val ok = staged.flatMap(s => s.value.map(o => (s.rec, o)))
    val failed = staged.flatMap(s => if (s.value.isEmpty) Some(s.rec) else None)
    new Pipeline(spark, ok, dlqDs.union(failed), caches, useCache)
  }

  /** Release every intermediate cache this pipeline pinned. Called by
    * [[run]] after both branches are materialized; callers that consume
    * [[dataset]]/[[dlq]]/[[reduceBatches]] directly own this call. */
  def releaseCache(): Unit = {
    caches.foreach(_.unpersist())
    caches.clear()
  }

  /** N→1 per-partition reduce (D4): each (topic, partition) group reduces
    * to one value; a failed reduce routes the whole in-flight batch to the
    * DLQ and the pipeline continues with other groups — exactly
    * `handle_reducer_failure` (reference `src/lib.rs:715-726`).
    *
    * Memory contract: one GROUP (not one table) is buffered per task to
    * order it by offset and hand the reducer its whole batch — the same
    * in-memory batch the reference accumulates before flush, and in
    * streaming use it is bounded by the micro-batch size knobs
    * ([[graft.sources.KafkaRecords.Config.maxOffsetsPerTrigger]]). For
    * unbounded batch groups, pre-sort with `sortWithinPartitions` and a
    * streaming-fold reducer instead of this whole-batch contract. */
  def reduceBatches[O: Encoder](reducer: Reducer[T, O])(
      implicit st: scala.reflect.runtime.universe.TypeTag[ReduceStep[O]],
      bt: scala.reflect.runtime.universe.TypeTag[ReducedBatch[O]])
      : (Dataset[ReducedBatch[O]], Dataset[Record]) = {
    import spark.implicits._
    implicit val rEnc: Encoder[Record] = recordEncoder(spark)
    // ONE shuffle: each group reduces once into a tagged step (either a
    // reduced batch or the failed originals); the cached step dataset is
    // then split into the two output branches. A throwing reducer is
    // treated as a Failure (batch to DLQ), like `safely` for mappers.
    val steps = okDs
      .groupByKey { case (rec, _) => (rec.topic, rec.partition) }
      .mapGroups[ReduceStep[O]] {
        (key: (String, Int), it: Iterator[(Record, T)]) =>
        val rows = it.toSeq.sortBy(_._1.offset)
        Try(reducer.reduce(rows.map(_._2))).flatten match {
          case scala.util.Success(o) =>
            ReduceStep[O](Some(ReducedBatch(key._1, key._2,
              rows.map(_._1.offset), o)), Nil)
          case scala.util.Failure(_) =>
            ReduceStep[O](None, rows.map(_._1))
        }
      }
    val steps2 = if (useCache) { val c = steps.persist(); caches += c; c }
      else steps
    val reduced = steps2.flatMap(_.batch.iterator)
    (reduced, dlqDs.union(steps2.flatMap(_.failed.iterator)))
  }

  /** Current ok branch (record + value). */
  def dataset: Dataset[(Record, T)] = okDs

  /** Current DLQ branch (original failed records). */
  def dlq: Dataset[Record] = dlqDs

  /** Run: sink the ok branch, then commit highwater marks of the acked
    * records (commit-after-durable-write ordering, D6; reference macro
    * ordering `src/lib.rs:283-287`). The sink is any callback — parquet
    * writer, console, test buffer (S2/S4 analogues). */
  def run(sink: Dataset[(Record, T)] => Unit,
      commit: CommitClient): PipelineResult[T] = {
    val ok = okDs.persist()
    val dlqOut = dlqDs.persist()
    sink(ok)
    implicit val e: Encoder[(String, Int, Long)] =
      Encoders.tuple(Encoders.STRING, Encoders.scalaInt, Encoders.scalaLong)
    val hw = HighwaterMark.of(
      ok.map(p => (p._1.topic, p._1.partition, p._1.offset))
        .toDF("topic", "partition", "offset"))
      .collect()
      .map(r => ((r.getString(0), r.getInt(1)), r.getLong(2)))
      .sortBy(_._1)
      .toSeq
    commit.storeOffsets(hw)
    // materialize the DLQ branch too, then release the per-stage caches
    // (the returned ok/dlq stay cached for the caller)
    dlqOut.count()
    releaseCache()
    PipelineResult(ok, dlqOut, hw)
  }
}

object Pipeline {
  def recordEncoder(spark: SparkSession): Encoder[Record] = Record.encoder

  /** Evaluate a stage defensively: an exception THROWN by the stage is
    * the same contract-wise as a returned Failure — the record goes to
    * the DLQ instead of killing the task (per-record skip-on-error).
    * Lives on the companion so task closures capture only the stage. */
  private[pipeline] def safely[A, B](stage: Mapper[A, B], v: A): Try[B] =
    Try(stage.map(v)).flatten

  /** Entry point (D1 analogue): start from any record source — in tests a
    * memory Dataset standing in for the Kafka scan, mirroring the
    * reference's broadcast-channel mock queue (`src/lib.rs:1806-1833`). */
  /** Entry point. `cache = false` skips intermediate persisting — right
    * for one-shot registered queries that materialize a single branch
    * (no leak, at the cost of re-running stages if BOTH branches of the
    * same pipeline are consumed). */
  def from(spark: SparkSession, source: Dataset[Record],
      cache: Boolean = true): Pipeline[Record] = {
    implicit val rEnc: Encoder[Record] = recordEncoder(spark)
    implicit val rrEnc: Encoder[(Record, Record)] =
      Encoders.tuple(rEnc, rEnc)
    new Pipeline(spark, source.map(r => (r, r)), spark.emptyDataset[Record],
      scala.collection.mutable.ListBuffer.empty, cache)
  }
}
