package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.pipeline.Record
import graft.streaming.HttpBatchSink

/** External-sink ack contract (the reference's ClickHouse writer + ack
  * handler shape, src/clickhouse.rs:65-184, exercised the way
  * test_fail_on_flush exercises the flush path, src/lib.rs:1498-1665):
  * a local JDK HttpServer stands in for the JSONEachRow endpoint — row
  * counting, summary-header ack, injectable failures — so the full
  * POST/ack/retry/redeliver loop runs with zero network egress. */
class HttpSinkSpec extends SparkSpecBase {

  /** JSONEachRow stub: counts newline-delimited rows, acks them in the
    * ClickHouse summary-header convention. `failuresLeft` injects
    * transient 500s (nothing written); `underAck` makes it write but
    * acknowledge one row too few — the silent-data-loss case an ack
    * check exists to catch. */
  private final class StubSink {
    val received = new ConcurrentLinkedQueue[String]()
    val requests = new AtomicInteger(0)
    val failuresLeft = new AtomicInteger(0)
    val underAck = new AtomicBoolean(false)
    private val server =
      HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        requests.incrementAndGet()
        val body = new String(ex.getRequestBody.readAllBytes(),
          StandardCharsets.UTF_8)
        val lines = body.split("\n").filter(_.nonEmpty)
        if (failuresLeft.getAndUpdate(n => math.max(n - 1, 0)) > 0) {
          ex.sendResponseHeaders(500, -1) // transient: nothing written
        } else {
          lines.foreach(received.add)
          val acked =
            if (underAck.get()) math.max(lines.length - 1, 0)
            else lines.length
          ex.getResponseHeaders.add("x-clickhouse-summary",
            s"""{"read_rows":"${lines.length}","written_rows":"$acked"}""")
          ex.sendResponseHeaders(200, -1)
        }
        ex.close()
      }
    })
    server.start()
    val url: String = s"http://127.0.0.1:${server.getAddress.getPort}/"
    def stop(): Unit = server.stop(0)
    def rows: Seq[String] = {
      val it = received.iterator()
      val buf = Seq.newBuilder[String]
      while (it.hasNext) buf += it.next()
      buf.result()
    }
  }

  private def rec(o: Long, v: String): Record =
    Record("topic", 0, o, 1700000000000L + o, None, v.getBytes("UTF-8"))

  private def payloads(rows: Seq[String]): Seq[String] =
    rows.flatMap("\"payload\":\"([^\"]*)\"".r
      .findFirstMatchIn(_).map(_.group(1)))

  private def stream(spark: org.apache.spark.sql.SparkSession) = {
    implicit val sqlCtx = spark.sqlContext
    MemoryStream[Record]
  }

  private def asPayloadDf(s: MemoryStream[Record]) = {
    import org.apache.spark.sql.functions._
    // one partition per micro-batch: deterministic request counting
    s.toDF().repartition(1)
      .select(col("partition"), col("offset"),
        decode(col("value"), "UTF-8").as("payload"))
  }

  test("acked batches flow end to end; offsets commit only after the ack") {
    val sink = new StubSink
    try {
      val src = stream(spark)
      src.addData(rec(0, "a"), rec(1, "b"), rec(2, "c"))
      val q = HttpBatchSink.sink(asPayloadDf(src),
        HttpBatchSink.Config(sink.url), Files.createTempDirectory("ck").toString)
      q.awaitTermination()
      assert(payloads(sink.rows).sorted === Seq("a", "b", "c"))
      assert(sink.requests.get() === 1) // one partition, one POST, one ack
    } finally sink.stop()
  }

  test("transient 500s retry the same body without reprocessing the batch") {
    val sink = new StubSink
    sink.failuresLeft.set(2)
    try {
      val src = stream(spark)
      src.addData(rec(0, "x"), rec(1, "y"))
      val q = HttpBatchSink.sink(asPayloadDf(src),
        HttpBatchSink.Config(sink.url, maxAttempts = 4, retryBackoffMs = 5),
        Files.createTempDirectory("ck").toString)
      q.awaitTermination()
      // two refused attempts + one acked: the acked body arrived intact
      // and exactly once — the retry re-POSTed bytes, not recomputation
      assert(sink.requests.get() === 3)
      assert(payloads(sink.rows).sorted === Seq("x", "y"))
    } finally sink.stop()
  }

  test("test_fail_on_flush port: a failed ack blocks the checkpoint; restart redelivers") {
    val sink = new StubSink
    sink.underAck.set(true) // sink persists but acknowledges one row short
    try {
      val ckpt = Files.createTempDirectory("ck").toString
      val src = stream(spark)
      src.addData(rec(0, "p"), rec(1, "q"))
      val q1 = HttpBatchSink.sink(asPayloadDf(src),
        HttpBatchSink.Config(sink.url, maxAttempts = 2, retryBackoffMs = 5),
        ckpt)
      // the ack shortfall must fail the query, not pass silently
      val failed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q1.awaitTermination()
      }
      assert(failed.getMessage.contains("written_rows")
        || Option(failed.getCause).exists(_.getMessage.contains("written_rows")))
      // ack never succeeded → offsets never committed: an honest restart
      // REDELIVERS the batch (at-least-once: duplicates possible, loss not)
      sink.underAck.set(false)
      val q2 = HttpBatchSink.sink(asPayloadDf(src),
        HttpBatchSink.Config(sink.url, maxAttempts = 2, retryBackoffMs = 5),
        ckpt)
      q2.awaitTermination()
      val got = payloads(sink.rows)
      assert(got.distinct.sorted === Seq("p", "q")) // nothing lost
      assert(got.size > 2) // and the redelivery really happened
    } finally sink.stop()
  }

  test("summary-header parse: quoted, bare, and absent written_rows") {
    assert(HttpBatchSink.parseWrittenRows(
      """{"read_rows":"5","written_rows":"128"}""") === Some(128L))
    assert(HttpBatchSink.parseWrittenRows(
      """{"written_rows": 7}""") === Some(7L))
    assert(HttpBatchSink.parseWrittenRows("""{"read_rows":"5"}""") === None)
  }
}
