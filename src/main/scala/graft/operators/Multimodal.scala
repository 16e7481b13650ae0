package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{QueryDef, QueryModule, Tables}

/** One decoded media record (the per-batch output row of the decode
  * stage). */
final case class MediaFeatures(
    doc_id: Long,
    mime: String,
    n_bytes: Long,
    width: Long,
    height: Long,
    phash: String)

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted in partition-sized batches.
  *
  * The container has no image/audio codecs, so [[MediaDecoder.decodeStub]]
  * is a clearly-marked deterministic fake; everything around it — the
  * binary payload column, metadata struct, `mapPartitions` batch shape
  * (the Scala analogue of a pandas-batch UDF: one iterator per partition,
  * codec state initialized once per partition, streaming through rows
  * without materializing the partition), and the typed output schema — is
  * the real production plumbing.
  *
  * Scale: decode is embarrassingly parallel per partition; payload bytes
  * never shuffle (features are extracted before any wide operation, so the
  * shuffle carries ~50 bytes/row, not megabyte blobs). That ordering —
  * project-then-shuffle — is the whole game for multimodal at 100 TB.
  */
object Multimodal extends QueryModule {

  object MediaDecoder {
    /** STUB — a real build would decode image bytes here (e.g. via a JNI
      * codec). Deterministic fake: dimensions derived from byte length,
      * perceptual hash from md5. Chosen to be reproducible in plain SQL so
      * the DuckDB oracle can check the surrounding plumbing end-to-end. */
    def decodeStub(payload: Array[Byte]): (Long, Long) = {
      val n = payload.length.toLong
      (n % 640L, (n * 7L) % 480L)
    }
  }

  /** Documents-as-media: text bytes standing in for an image payload, with
    * a typed metadata struct alongside. */
  def mediaTable(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(
        $"doc_id",
        encode($"text", "UTF-8").as("payload"),
        struct(
          lit("image/fake").as("mime"),
          $"source".as("origin"),
          $"n_chars".as("content_hint")).as("meta"))
  }

  /** The decode stage: partition-batched feature extraction over the
    * binary column (Dataset[MediaFeatures] out). */
  def decodeFeatures(s: SparkSession, d: String): Dataset[MediaFeatures] = {
    import s.implicits._
    mediaTable(s, d)
      .select($"doc_id", $"payload", $"meta.mime".as("mime"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        // per-partition init happens here (codec handles, model weights…)
        rows.map { case (id, payload, mime) =>
          val (w, h) = MediaDecoder.decodeStub(payload)
          MediaFeatures(id, mime, payload.length.toLong, w, h,
            org.apache.commons.codec.digest.DigestUtils.md5Hex(payload))
        }
      }
  }

  /** Registered query: decoded features, oracle-reproducible because the
    * stub is pure integer arithmetic + md5. */
  def mediaFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    decodeFeatures(s, d).toDF().orderBy($"doc_id")
  }

  /** Frame sampling over a "video" payload: fixed-width frames on a
    * stride (every other frame skipped), all inside codegen'd byte-slice
    * expressions — the payload is never exploded before sampling, so a
    * 100 GB video column only materializes the sampled frames. Frame
    * extraction itself is the STUB (real builds substitute a keyframe
    * decoder); the slicing/stride/summary plumbing is the real thing. */
  def frameSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val frameLen = 64
    val stride = 128
    Tables.documents(s, d)
      .select($"doc_id", encode($"text", "UTF-8").as("payload"))
      .withColumn("frames",
        transform(
          // greatest(..,1): an empty payload still yields one (empty)
          // frame instead of sequence(1,0) throwing; the oracle mirrors
          // this with greatest((strlen-1)//128, 0)+1
          sequence(lit(1),
            greatest(octet_length($"payload").cast("int"), lit(1)),
            lit(stride)),
          p => $"payload".substr(p, lit(frameLen))))
      .select(
        $"doc_id",
        size($"frames").cast("long").as("n_frames"),
        md5(element_at($"frames", 1)).as("first_md5"),
        md5(element_at($"frames", -1)).as("last_md5"))
      .orderBy($"doc_id")
  }

  object MediaResizer {
    /** STUB — a real build would decode + bilinear-resample here.
      * Deterministic fake: truncate/cycle payload bytes to the target
      * "pixel" count so output size is shape-correct. */
    def resizeStub(payload: Array[Byte], outW: Int, outH: Int): Array[Byte] = {
      val out = new Array[Byte](outW * outH)
      if (payload.nonEmpty) {
        var i = 0
        while (i < out.length) {
          out(i) = payload(i % payload.length)
          i += 1
        }
      }
      out
    }
  }

  /** Resize stage: partition-batched like [[decodeFeatures]], emitting
    * fixed-shape thumbnails (binary) + dims. */
  def resizeThumbnails(s: SparkSession, d: String, w: Int = 8, h: Int = 8)
      : DataFrame = {
    import s.implicits._
    mediaTable(s, d)
      .select($"doc_id", $"payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          (id, MediaResizer.resizeStub(payload, w, h), w, h)
        }
      }
      .toDF("doc_id", "thumb", "width", "height")
  }

  /** BINARY near-dup via content-defined chunking — the storage-dedup
    * approach applied to a media column: Gear/FastCDC chunk boundaries
    * depend only on LOCAL byte content, so an insertion or deletion
    * re-chunks a constant-size neighborhood and leaves every other
    * chunk hash intact — unlike any fixed-grid perceptual hash, which a
    * few shifted bytes scramble end to end (shift-robustness is why
    * dedup of byte streams chunks content-defined). Media sharing
    * ≥ `MinShared` chunk hashes are reported with their overlap as ppm
    * of the smaller chunk set. Works on ANY opaque payload — no codec
    * in the loop; the chunker is the same native
    * [[graft.functions.VectorExpressions.content_chunks]] kernel
    * (maskBits=5, ~32-byte chunks) the text CDC profile gates, so the
    * two surfaces cannot drift.
    *
    * Scale shape: chunking is one narrow codegen'd pass over the
    * payload column (bytes never shuffle — only 8-byte chunk hashes
    * explode); the pair stage is the inverted-index count join with
    * hot chunks (df > `DfCap`, container boilerplate) dropped before
    * the self-join, Σdf² not n². */
  /** Previous [[mediaChunkDedup]] invocation's cached chunk table —
    * unpersist-FIRST one-slot swap, same discipline as
    * [[graft.operators.Similarity]]'s `lastCells`. */
  private val lastChunks =
    new java.util.concurrent.atomic.AtomicReference[DataFrame](null)

  def mediaChunkDedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val MinShared = 3
    val DfCap = 64
    Option(lastChunks.getAndSet(null)).foreach(_.unpersist(false))
    // consumed three times (df filter + both join sides): persist so
    // the payload column is chunked in ONE pass; at deployment the
    // chunk postings are a stored index next to the media table
    val ch = mediaTable(s, d)
      .select($"doc_id", decode($"payload", "UTF-8").as("txt"))
      .select($"doc_id",
        graft.functions.VectorExpressions.content_chunks($"txt", 5)
          .as("cs"))
      .select($"doc_id", size($"cs").cast("long").as("n_chunks"),
        explode($"cs").as("chunk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    lastChunks.set(ch)
    val keep = ch.groupBy($"chunk").agg(count(lit(1)).as("df"))
      .where($"df" <= DfCap)
      .select($"chunk")
    val cf = ch.join(keep, Seq("chunk"))
    cf.select($"chunk", $"doc_id".as("id_a"), $"n_chunks".as("nc_a"))
      .join(cf.select($"chunk", $"doc_id".as("id_b"), $"n_chunks".as("nc_b")),
        Seq("chunk"))
      .where($"id_a" < $"id_b")
      .groupBy($"id_a", $"id_b")
      .agg(count(lit(1)).as("n_shared"),
        min($"nc_a").as("nc_a"), min($"nc_b").as("nc_b"))
      .where($"n_shared" >= MinShared)
      .select($"id_a", $"id_b", $"n_shared",
        expr("n_shared * 1000000 div least(nc_a, nc_b)").as("overlap_ppm"))
      .orderBy($"id_a", $"id_b")
  }

  /** Rollup a real pipeline would emit: per-origin media volume. */
  def mediaStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d)
      .select($"doc_id", $"meta.origin".as("origin"),
        length($"payload").cast("long").as("n_bytes"))
      .groupBy($"origin")
      .agg(count(lit(1)).as("n_media"), sum($"n_bytes").as("total_bytes"),
        max($"n_bytes").as("max_bytes"))
      .orderBy($"origin")
  }

  override def defs: Seq[QueryDef] = Seq(
    QueryDef(
      // chunk hashes via graft.ops.HashOracleSql.chunksCte (the same
      // Gear walk, bit-exact); per-media chunk-set sizes from that CTE
      "q_media_chunk_dedup", mediaChunkDedup, Some(s"""
        ${graft.ops.HashOracleSql.chunksCte},
        cw AS (
          SELECT doc_id,
                 CAST(count(*) OVER (PARTITION BY doc_id) AS BIGINT)
                   AS n_chunks,
                 chunk
          FROM chunks),
        k AS (SELECT chunk FROM cw GROUP BY chunk
              HAVING count(*) <= 64),
        cf AS (SELECT cw.* FROM cw JOIN k USING (chunk))
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(count(*) AS BIGINT) AS n_shared,
               count(*) * 1000000 // least(min(a.n_chunks), min(b.n_chunks))
                 AS overlap_ppm
        FROM cf a JOIN cf b ON a.chunk = b.chunk AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
        HAVING count(*) >= 3
        ORDER BY id_a, id_b""")),
    QueryDef(
      "q_media_features", mediaFeatures, Some("""
        SELECT doc_id,
               'image/fake' AS mime,
               CAST(strlen(text) AS BIGINT) AS n_bytes,
               CAST(strlen(text) % 640 AS BIGINT) AS width,
               CAST((strlen(text) * 7) % 480 AS BIGINT) AS height,
               md5(text) AS phash
        FROM documents ORDER BY doc_id""")),
    QueryDef(
      // Oracle parity note: the Spark side slices BYTES of the UTF-8
      // payload while DuckDB substr/strlen count CHARACTERS — identical
      // only because the driver corpus is ASCII-only (verified:
      // octet_length(encode(text)) = strlen(text) on every row; see
      // graft.ops.HashOracleSql). A non-ASCII corpus would need
      // blob-based slicing on the oracle side.
      "q_frame_sample", frameSample, Some("""
        SELECT doc_id,
               CAST(greatest((strlen(text) - 1) // 128, 0) + 1 AS BIGINT)
                 AS n_frames,
               md5(substr(text, 1, 64)) AS first_md5,
               md5(substr(text, greatest((strlen(text) - 1) // 128, 0) * 128 + 1,
                   64)) AS last_md5
        FROM documents ORDER BY doc_id""")),
    QueryDef(
      "q_media_stats", mediaStats, Some("""
        SELECT source AS origin,
               count(*) AS n_media,
               CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
               CAST(max(strlen(text)) AS BIGINT) AS max_bytes
        FROM documents GROUP BY source ORDER BY origin"""))
  )
}
