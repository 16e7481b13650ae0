package graft.streaming

import java.io.{ByteArrayOutputStream, InputStream}
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** External batch-sink writer with acknowledgment — the structural
  * analogue of the reference's `ClickhouseBatchWriter` +
  * `ClickhouseAckHandler` (studied, not copied:
  * /root/reference/src/clickhouse.rs:65-145 batches rows into one HTTP
  * POST body per flush; :147-184 awaits the response, requires status
  * 200 and parses the `x-clickhouse-summary` header's `written_rows`).
  *
  * Spark mapping, stage by stage:
  *  - batch accumulation (128 rows / 2 s) → the micro-batch itself
  *    (`maxOffsetsPerTrigger` + trigger interval, SURVEY §2.2);
  *  - one streamed POST per flush → one POST per PARTITION of the
  *    micro-batch, issued executor-side: at deployment scale every
  *    executor ships its own partition concurrently, so the sink has no
  *    driver bottleneck and no `collect()` of data volume;
  *  - ack check → status must be 200 AND the summary header's
  *    `written_rows` must equal the rows posted; any shortfall throws;
  *  - retry → transient failures re-POST the SAME serialized body
  *    (bounded attempts, linear backoff) WITHOUT recomputing the
  *    partition — retry-without-reprocess, the `WriteHandle` re-use
  *    shape. The body for one partition is buffered in memory, bounded
  *    by `maxOffsetsPerTrigger` / partition count, exactly the
  *    reference's in-flight batch buffer;
  *  - ack failure after retries → the task throws, the batch fails, the
  *    checkpoint does NOT advance, and the restarted query redelivers
  *    the whole micro-batch: at-least-once, duplicates possible, loss
  *    impossible (the `test_fail_on_flush` contract,
  *    /root/reference/src/lib.rs:1498-1665 — failed flushes never reach
  *    commit). Receivers needing exactly-once dedup on a key downstream,
  *    as the reference's double-write check assumes (README.md:101-113).
  */
object HttpBatchSink {

  /** Sink endpoint + ack/retry policy. `summaryHeader` is the response
    * header carrying `{"written_rows":"<n>"}` (the ClickHouse wire
    * convention; a JSONEachRow-speaking stub in tests uses the same). */
  final case class Config(
      url: String,
      maxAttempts: Int = 3,
      retryBackoffMs: Long = 50,
      connectTimeoutMs: Int = 5000,
      readTimeoutMs: Int = 30000,
      summaryHeader: String = "x-clickhouse-summary")

  /** POST one micro-batch to the endpoint as JSONEachRow, one request
    * per non-empty partition, acked and retried per the config. Usable
    * directly on any batch DataFrame, or via [[sink]] for streaming. */
  def writeBatch(df: DataFrame, cfg: Config): Unit =
    df.toJSON.foreachPartition { (rows: Iterator[String]) =>
      if (rows.hasNext) {
        val body = new StringBuilder
        var n = 0L
        rows.foreach { r => body.append(r).append('\n'); n += 1 }
        postWithRetry(body.toString.getBytes(StandardCharsets.UTF_8), n, cfg)
      }
    }

  /** Streaming entry: source → JSONEachRow POST per micro-batch →
    * checkpoint commit after the ack (offsets advance only when every
    * partition's write was acknowledged — commit-after-sink, D6/C1). */
  def sink(
      records: DataFrame,
      cfg: Config,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    records.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) => writeBatch(batch, cfg) }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** One partition's POST: bounded attempts over the SAME body bytes.
    * Success = HTTP 200 and the summary header acknowledges exactly the
    * posted row count. Executor-side (must stay dependency-free:
    * `HttpURLConnection` only). */
  private[streaming] def postWithRetry(
      body: Array[Byte], rows: Long, cfg: Config): Unit = {
    var attempt = 0
    var lastErr: String = ""
    while (attempt < cfg.maxAttempts) {
      attempt += 1
      postOnce(body, rows, cfg) match {
        case None => return // acked
        case Some(err) =>
          lastErr = err
          if (attempt < cfg.maxAttempts)
            Thread.sleep(cfg.retryBackoffMs * attempt)
      }
    }
    throw new java.io.IOException(
      s"sink ack failed after ${cfg.maxAttempts} attempts: $lastErr")
  }

  /** One POST + ack check; Some(reason) on any failure. */
  private def postOnce(
      body: Array[Byte], rows: Long, cfg: Config): Option[String] =
    try {
      val conn = new URI(cfg.url).toURL.openConnection()
        .asInstanceOf[HttpURLConnection]
      try {
        conn.setConnectTimeout(cfg.connectTimeoutMs)
        conn.setReadTimeout(cfg.readTimeoutMs)
        conn.setRequestMethod("POST")
        conn.setRequestProperty("Content-Type", "application/x-ndjson")
        conn.setFixedLengthStreamingMode(body.length)
        conn.setDoOutput(true)
        val out = conn.getOutputStream
        try { out.write(body); out.flush() } finally out.close()
        val status = conn.getResponseCode
        // drain the stream so the connection is reusable either way
        drain(if (status >= 400) conn.getErrorStream else conn.getInputStream)
        if (status != 200) Some(s"status $status")
        else {
          val written = Option(conn.getHeaderField(cfg.summaryHeader))
            .flatMap(parseWrittenRows)
          if (written.contains(rows)) None
          else Some(s"ack written_rows=${written.getOrElse("absent")}, sent $rows")
        }
      } finally conn.disconnect()
    } catch { case e: java.io.IOException => Some(e.toString) }

  /** `written_rows` from a summary header like
    * `{"read_rows":"128","written_rows":"128"}` — quoted (ClickHouse
    * style) or bare number both accepted; no JSON dependency. */
  private[graft] def parseWrittenRows(summary: String): Option[Long] =
    """"written_rows"\s*:\s*"?(\d+)"?""".r
      .findFirstMatchIn(summary).map(_.group(1).toLong)

  private def drain(in: InputStream): Unit =
    if (in != null) try {
      val sink = new ByteArrayOutputStream()
      in.transferTo(sink)
    } finally in.close()
}
