package graft

import scala.collection.mutable
import scala.util.{Failure, Success, Try}

import graft.pipeline._

/** Shared concurrency probe for the viaAsync specs: task closures must
  * reach the SAME counters from executor threads — a top-level object is
  * one JVM-wide instance under local[*]. */
object AsyncProbe {
  val current = new java.util.concurrent.atomic.AtomicInteger(0)
  val observedMax = new java.util.concurrent.atomic.AtomicInteger(0)
  def reset(): Unit = { current.set(0); observedMax.set(0) }
  def enter(): Unit = {
    val c = current.incrementAndGet()
    observedMax.updateAndGet(m => math.max(m, c))
    ()
  }
  def exit(): Unit = { current.decrementAndGet(); () }
}

/** Ports of the reference's actor-level unit tests (SURVEY §5;
  * /root/reference/src/lib.rs:996-1973) onto the Spark pipeline. */
class PipelineSpec extends SparkSpecBase {

  private def rec(p: Int, o: Long, v: String = "x"): Record =
    Record("topic", p, o, 1700000000000L + o,
      None, v.getBytes("UTF-8"))

  private class MockCommit extends CommitClient {
    val stored = mutable.Buffer[Seq[((String, Int), Long)]]()
    def storeOffsets(hw: Seq[((String, Int), Long)]): Unit = stored += hw
  }

  private def source(rs: Record*) = {
    implicit val e = Pipeline.recordEncoder(spark)
    spark.createDataset(rs)
  }

  test("test_commit port: offsets {1,0} on partitions {0,1} -> stored {2,1}") {
    val commit = new MockCommit
    val result = Pipeline.from(spark, source(rec(0, 1), rec(1, 0)))
      .via(Noop.mapper[Record])
      .run(_.count(), commit)
    assert(commit.stored.toSeq ===
      Seq(Seq(("topic", 0) -> 2L, ("topic", 1) -> 1L)))
    assert(result.dlq.count() === 0)
  }

  test("test_fail_on_map port: failed record to DLQ as original, rest flow") {
    val parse = new Mapper[Record, String] {
      def map(in: Record): Try[String] = {
        val s = new String(in.value, "UTF-8")
        if (s == "poison") Failure(new RuntimeException("bad"))
        else Success(s.toUpperCase)
      }
    }
    val commit = new MockCommit
    import spark.implicits._
    val p = Pipeline
      .from(spark, source(rec(0, 0, "a"), rec(0, 1, "poison"), rec(0, 2, "c")))
      .via(parse)
    val result = p.run(_.count(), commit)
    // original record (not the transformed value) lands on the DLQ
    assert(result.dlq.collect().map(r => (r.partition, r.offset)).toSeq
      === Seq((0, 1)))
    // later records were still processed and committed (offset skip)
    assert(result.ok.collect().map(_._2).sorted.toSeq === Seq("A", "C"))
    assert(commit.stored.head === Seq(("topic", 0) -> 3L))
  }

  test("test_sequential_reducers port: stages compose") {
    import spark.implicits._
    val upper = new Mapper[Record, String] {
      def map(in: Record): Try[String] =
        Success(new String(in.value, "UTF-8").toUpperCase)
    }
    val exclaim = new Mapper[String, String] {
      def map(in: String): Try[String] = Success(in + "!")
    }
    val out = Pipeline.from(spark, source(rec(0, 0, "a"), rec(1, 0, "b")))
      .via(upper)
      .via(exclaim)
      .dataset.collect().map(_._2).sorted.toSeq
    assert(out === Seq("A!", "B!"))
  }

  test("test_reduce port: per-partition batch reduce with provenance") {
    import spark.implicits._
    val concat = new Reducer[String, String] {
      def reduce(batch: Seq[String]): Try[String] = Success(batch.mkString(","))
    }
    val toStr = new Mapper[Record, String] {
      def map(in: Record): Try[String] = Success(new String(in.value, "UTF-8"))
    }
    val (batches, dlq) = Pipeline
      .from(spark, source(rec(0, 0, "a"), rec(0, 1, "b"), rec(1, 0, "z")))
      .via(toStr)
      .reduceBatches(concat)
    val got = batches.collect().map(b => (b.partition, b.offsets, b.value))
      .sortBy(_._1).toSeq
    assert(got === Seq((0, Seq(0L, 1L), "a,b"), (1, Seq(0L), "z")))
    assert(dlq.count() === 0)
  }

  test("test_fail_on_reduce port: failed batch dumped to DLQ, others continue") {
    import spark.implicits._
    val picky = new Reducer[String, String] {
      def reduce(batch: Seq[String]): Try[String] =
        if (batch.contains("poison")) Failure(new RuntimeException("bad batch"))
        else Success(batch.mkString(","))
    }
    val toStr = new Mapper[Record, String] {
      def map(in: Record): Try[String] = Success(new String(in.value, "UTF-8"))
    }
    val (batches, dlq) = Pipeline
      .from(spark,
        source(rec(0, 0, "a"), rec(0, 1, "poison"), rec(1, 0, "z")))
      .via(toStr)
      .reduceBatches(picky)
    // partition 0's whole in-flight batch lands on the DLQ (the reference's
    // handle_reducer_failure dumps all inflight messages, lib.rs:715-726)
    assert(dlq.collect().map(r => (r.partition, r.offset)).sorted.toSeq
      === Seq((0, 0L), (0, 1L)))
    // partition 1 still reduced
    assert(batches.collect().map(b => (b.partition, b.value)).toSeq
      === Seq((1, "z")))
  }

  test("a THROWING mapper routes the record to the DLQ instead of killing the job") {
    import spark.implicits._
    val explosive = new Mapper[Record, String] {
      def map(in: Record): Try[String] = {
        // NPE-style failure BEFORE any Try is constructed
        val s = new String(in.value, "UTF-8")
        if (s == "boom") throw new IllegalStateException("stage blew up")
        Success(s)
      }
    }
    val result = Pipeline
      .from(spark, source(rec(0, 0, "ok"), rec(0, 1, "boom")))
      .via(explosive)
      .run(_.count(), new MockCommit)
    assert(result.dlq.collect().map(_.offset).toSeq === Seq(1L))
    assert(result.ok.collect().map(_._2).toSeq === Seq("ok"))
  }

  test("a throwing reducer dumps its batch to the DLQ, other groups continue") {
    import spark.implicits._
    val toStr = new Mapper[Record, String] {
      def map(in: Record): Try[String] = Success(new String(in.value, "UTF-8"))
    }
    val explosive = new Reducer[String, String] {
      def reduce(batch: Seq[String]): Try[String] = {
        if (batch.contains("boom")) throw new IllegalStateException("bad")
        Success(batch.mkString(","))
      }
    }
    val (batches, dlq) = Pipeline
      .from(spark, source(rec(0, 0, "boom"), rec(1, 0, "fine")))
      .via(toStr)
      .reduceBatches(explosive)
    assert(dlq.collect().map(r => (r.partition, r.offset)).toSeq === Seq((0, 0L)))
    assert(batches.collect().map(_.value).toSeq === Seq("fine"))
  }

  test("viaAsync test_map port: out-of-order completion, in-order emission") {
    import spark.implicits._
    // later records sleep LESS, so they complete first — FuturesOrdered
    // semantics require emission in input order anyway (the reference's
    // async test_map assertion, src/lib.rs:1835-1900)
    val slowFirst = new Mapper[Record, String] {
      def map(in: Record): Try[String] = {
        Thread.sleep(math.max(0L, 60L - in.offset * 5L))
        Success(new String(in.value, "UTF-8").toUpperCase)
      }
    }
    val recs = (0 until 12).map(o => rec(0, o.toLong, s"v$o"))
    val out = Pipeline.from(spark, source(recs: _*))
      .viaAsync(slowFirst, concurrency = 8)
      .dataset.collect()
    // input order preserved end-to-end despite reversed completion order
    assert(out.map(_._1.offset).toSeq === (0L until 12L))
    assert(out.map(_._2).toSeq === (0 until 12).map(o => s"V$o"))
  }

  test("viaAsync bounds in-flight concurrency and actually overlaps work") {
    import spark.implicits._
    AsyncProbe.reset()
    val probed = new Mapper[Record, String] {
      def map(in: Record): Try[String] = {
        AsyncProbe.enter()
        try { Thread.sleep(100); Success(new String(in.value, "UTF-8")) }
        finally AsyncProbe.exit()
      }
    }
    val recs = (0 until 16).map(o => rec(0, o.toLong, s"v$o"))
    // single partition so the bound under test is the IN-TASK pool, not
    // the task-slot model
    implicit val e = Pipeline.recordEncoder(spark)
    val onePart = spark.createDataset(recs).repartition(1)
    val result = Pipeline.from(spark, onePart)
      .viaAsync(probed, concurrency = 4)
      .run(_.count(), new MockCommit)
    assert(result.dlq.count() === 0)
    assert(AsyncProbe.observedMax.get() <= 4,
      s"pool overran its bound: ${AsyncProbe.observedMax.get()}")
    assert(AsyncProbe.observedMax.get() >= 2,
      "no overlap observed - stage ran serially")
    result.unpersist()
  }

  test("viaAsync test_fail_on_map port: DLQ gets the original, order kept") {
    import spark.implicits._
    val parse = new Mapper[Record, String] {
      def map(in: Record): Try[String] = {
        val s = new String(in.value, "UTF-8")
        if (s == "poison") Failure(new RuntimeException("bad"))
        else Success(s.toUpperCase)
      }
    }
    val commit = new MockCommit
    val result = Pipeline
      .from(spark, source(rec(0, 0, "a"), rec(0, 1, "poison"), rec(0, 2, "c")))
      .viaAsync(parse, concurrency = 3)
      .run(_.count(), commit)
    assert(result.dlq.collect().map(r => (r.partition, r.offset)).toSeq
      === Seq((0, 1)))
    assert(result.ok.collect().map(_._2).toSeq === Seq("A", "C"))
    assert(commit.stored.head === Seq(("topic", 0) -> 3L))
    result.unpersist()
  }

  test("a THROWING async mapper dead-letters instead of killing the task") {
    import spark.implicits._
    val explosive = new Mapper[Record, String] {
      def map(in: Record): Try[String] = {
        val s = new String(in.value, "UTF-8")
        if (s == "boom") throw new IllegalStateException("stage blew up")
        Success(s)
      }
    }
    val result = Pipeline
      .from(spark, source(rec(0, 0, "ok"), rec(0, 1, "boom")))
      .viaAsync(explosive, concurrency = 2)
      .run(_.count(), new MockCommit)
    assert(result.dlq.collect().map(_.offset).toSeq === Seq(1L))
    assert(result.ok.collect().map(_._2).toSeq === Seq("ok"))
    result.unpersist()
  }

  test("highwater mark of empty ack set commits nothing") {
    val commit = new MockCommit
    val failAll = new Mapper[Record, String] {
      def map(in: Record): Try[String] = Failure(new RuntimeException("no"))
    }
    import spark.implicits._
    val result = Pipeline.from(spark, source(rec(0, 0), rec(0, 1)))
      .via(failAll)
      .run(_.count(), commit)
    assert(commit.stored.toSeq === Seq(Seq()))
    assert(result.dlq.count() === 2)
  }
}
