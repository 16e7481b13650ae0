package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{QueryDef, QueryModule, Tables}

/** Corpus-CURATION operators: the release-engineering steps a training
  * corpus goes through after cleaning/dedup — PII scrubbing, mixing
  * sources to a token budget, and the deterministic global shuffle that
  * fixes the training order. (North-star extensions; the reference —
  * a Kafka map-reduce pipeline — has no curation surface.)
  *
  * All three are engine-reproducible by construction: selection and
  * ordering key off md5 of the row key, never `rand()`, so a re-run on a
  * different cluster size (or a different engine, as the DuckDB oracles
  * prove) produces byte-identical output.
  */
object Curation extends QueryModule {

  // ---------------------------------------------------------------- PII

  /** Match-count via regexp_extract_all (group 0 explicit: Spark 4 ANSI
    * requires the index; DuckDB's default group is already 0). */
  private def nMatches(c: Column, re: String): Column =
    size(regexp_extract_all(c, lit(re), lit(0))).cast("long")

  /** Conservative RE2-subset patterns (no lookaround, no backreference)
    * so Java regex (Spark) and RE2 (DuckDB) agree match-for-match. */
  private[graft] val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private[graft] val IpRe =
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  private[graft] val PhoneRe = "\\b555-[0-9]{4}\\b"

  /** Redaction pipeline over a text column: emails, then IPv4s, then
    * phone-shaped numbers, each replaced by a typed tag. Email runs
    * FIRST (its local/domain parts contain dots and digits the later
    * patterns could claim); the inserted tags are uppercase-only, so no
    * later pattern can match inside an earlier replacement. */
  private[graft] def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        IpRe, "<IP>"),
      PhoneRe, "<PHONE>")

  /** PII scrubbing gate query. The driver corpus is synthetic prose with
    * no PII, so the query PLANTS a deterministic contact block per row
    * (derived from doc_id — both engines build the identical string) and
    * then redacts it: the oracle therefore checks the regex semantics
    * cross-engine, not a trivially-empty match set. Narrow projection —
    * no shuffle, and at 100 TB the scrub runs at scan speed with the
    * match counting sharing the scan. */
  def piiRedact(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val planted = concat(
      $"text",
      lit(" mail u"), $"doc_id", lit("@ex"), $"doc_id" % 7,
      lit(".org tel 555-0"), lpad(($"doc_id" % 1000).cast("string"), 3, "0"),
      lit(" ip 10.2."), $"doc_id" % 256, lit("."), $"doc_id" % 100)
    Tables.documents(s, d)
      .select($"doc_id", planted.as("aug"))
      .select(
        $"doc_id",
        nMatches($"aug", EmailRe).as("n_emails"),
        nMatches($"aug", IpRe).as("n_ips"),
        nMatches($"aug", PhoneRe).as("n_phones"),
        md5(redactPii($"aug")).as("red_fp"))
      .orderBy($"doc_id")
  }

  // ---------------------------------------------------- mixture sampling

  /** Whitespace token cost, shared identity with [[Corpus.packBins]]
    * (and its DuckDB oracle): tokens = spaces + 1, 0 for blank text. */
  private def nTokens(c: Column): Column =
    when(length(trim(c)) === 0, 0L)
      .otherwise((length(c) - length(regexp_replace(c, " ", ""))).cast("long")
        + lit(1L))

  /** Source-MIXTURE sampling to a token budget: give each source a
    * mixing weight, split half the corpus' token mass across sources in
    * proportion to weight, and deterministically fill each source's
    * quota in md5 order. This is the "mix web/code/reference at 50/30/20"
    * step of corpus assembly, with quota arithmetic in exact BIGINT
    * (integer DIV), never floating shares.
    *
    * Scale shape: one narrow pass computes per-doc cost; the weight and
    * budget scalars are 1-row/`n_sources`-row broadcasts (index
    * metadata); the fill is one shuffle on `source` whose window the
    * running sum reuses. The output here aggregates per source so the
    * gate row count stays bounded; the per-doc `kept` frame is the
    * `where(running <= quota)` intermediate. */
  def mixtureSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // mixing weight from the source name's numeric suffix: {1,2,3} —
    // deterministic in both engines without a hard-coded source list
    val w = substring($"source", 4, 10).cast("long") % 3L + 1L
    val docs = Tables.documents(s, d)
      .select($"source", $"doc_id", nTokens($"text").as("n_tokens"),
        w.as("w"))
    val totals = broadcast(docs.agg(
      sum($"n_tokens").as("t_total")))                      // 1 row
    val weights = broadcast(docs.groupBy($"source").agg(first($"w").as("w"))
      .agg(sum($"w").as("w_total")))                        // 1 row
    val running = Window.partitionBy($"source")
      .orderBy(md5($"doc_id".cast("string")), $"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.crossJoin(totals).crossJoin(weights)
      // budget = half the corpus tokens; quota = budget * w / W in
      // exact integer arithmetic (DIV), matching DuckDB's `//`
      .withColumn("quota", expr("(t_total DIV 2) * w DIV w_total"))
      .withColumn("running", sum($"n_tokens").over(running))
      .withColumn("kept", ($"running" <= $"quota").cast("boolean"))
      .groupBy($"source")
      .agg(
        min($"w").as("w"),
        min($"quota").as("quota"),
        count(lit(1)).as("n_docs"),
        sum($"kept".cast("long")).as("n_kept"),
        sum(when($"kept", $"n_tokens").otherwise(0L)).as("kept_tokens"))
      .orderBy($"source")
  }

  // ------------------------------------------------------ global shuffle

  /** Deterministic GLOBAL training-order shuffle + split assignment:
    * every document gets a unique position in a corpus-wide md5
    * permutation, and the position induces the 80/10/10
    * train/val/test split (exact integer thresholds).
    *
    * The global index is computed the way a 1000-executor cluster must:
    * range-partition by the shuffle key (one shuffle), rank WITHIN each
    * partition, then add per-partition offsets — the offset table is
    * one bounded row per partition (index metadata, same class as the
    * IVF codebook collect), never a global single-task window. Position
    * values are partitioning-invariant: they equal the global rank of
    * (h, doc_id), whatever the range boundaries sampled. */
  /** Previous invocation's cached range-partitioned keying, swapped out
    * on the next call (same single-slot pattern as
    * [[Similarity.labelBucketTopK]]). The persist is load-bearing for
    * correctness, not just cost: the offset table is collected from the
    * SAME materialized partitioning the rank pass reads — re-running
    * `repartitionByRange` could sample different boundaries between the
    * two passes and skew every offset. */
  private val lastKeyed =
    new java.util.concurrent.atomic.AtomicReference[DataFrame](null)

  def globalShuffle(s: SparkSession, d: String, parts: Int = 32): DataFrame = {
    import s.implicits._
    // within-partition rank as a STREAMING walk over the range-sorted
    // partitions (same shape as [[Corpus.packBins]]) instead of a
    // Window.partitionBy(pid): Catalyst cannot know pid IS the ambient
    // partition id, so the window form would re-shuffle the whole corpus
    // by pid — a second full exchange this operator exists to avoid.
    val keyed = Tables.documents(s, d)
      .select($"doc_id",
        md5(concat(lit("ep1-"), $"doc_id".cast("string"))).as("h"))
      .repartitionByRange(parts, $"h", $"doc_id")
      .sortWithinPartitions($"h", $"doc_id")
      .as[(Long, String)]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var rn = 0L
        it.map { case (id, _) => rn += 1L; (id, pid, rn) }
      }
      .toDF("doc_id", "pid", "rn")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Option(lastKeyed.getAndSet(keyed)).foreach(_.unpersist(false))
    // bounded collect: one row per non-empty range partition
    val counts = keyed.groupBy($"pid").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = counts.values.sum
    val offsetMap = {
      var acc = 0L
      counts.keys.toSeq.sorted.map { p =>
        val o = acc; acc += counts(p); p -> o
      }.toMap
    }
    keyed
      .withColumn("pos", $"rn" + element_at(typedLit(offsetMap), $"pid"))
      .withColumn("split",
        when($"pos" * 10 <= lit(n) * 8, "train")
          .when($"pos" * 10 <= lit(n) * 9, "val")
          .otherwise("test"))
      .select($"doc_id", $"pos", $"split")
      .orderBy($"pos")
  }

  // -------------------------------------------------------------- oracle

  /** Shared token-cost SQL, identical to the [[Corpus.packBins]] oracle. */
  private val oracleCost = """
    CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE
      length(text) - length(replace(text, ' ', '')) + 1 END AS BIGINT)"""

  /** INGEST DRIFT REPORT — distribution shift between the standing
    * corpus (doc_id % 10 < 8, as in the incremental-dedup split) and a
    * fresh batch, over the token-length histogram (16-token buckets):
    * the monitoring check a pipeline runs BEFORE accepting a drop, so a
    * recrawl that suddenly skews short/long is caught at the door, not
    * three stages later in training metrics. Per bucket: both counts,
    * both exact shares, and the absolute share gap (each a single
    * correctly-rounded division/subtraction — no transcendental
    * divergence-statistic arithmetic, which ln() implementations would
    * make engine-dependent; rank buckets by `share_gap` and alert on
    * the max downstream).
    *
    * Scale shape: the histogram is one groupBy on a derived constant
    * (bucket) with both sides counted in the SAME pass via conditional
    * sums — one shuffle of (bucket, partial counts); totals ride a
    * 1-row broadcast. */
  def ingestDrift(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val nTokens = when(length(trim($"text")) === 0, 0L)
      .otherwise(length($"text") - length(replace($"text", lit(" "), lit(""))) + 1L)
    val bucketed = Tables.documents(s, d)
      .select((nTokens.cast("long") / 16L).cast("long").as("bucket"),
        ($"doc_id" % 10 >= 8).as("fresh"))
    val hist = bucketed.groupBy($"bucket")
      .agg(
        sum(when(!$"fresh", 1L).otherwise(0L)).as("n_corpus"),
        sum(when($"fresh", 1L).otherwise(0L)).as("n_batch"))
    val totals = hist.agg(
      sum($"n_corpus").as("t_corpus"), sum($"n_batch").as("t_batch"))
    hist.crossJoin(broadcast(totals)) // 1 row
      .select($"bucket", $"n_corpus", $"n_batch",
        ($"n_corpus".cast("double") / $"t_corpus").as("share_corpus"),
        ($"n_batch".cast("double") / $"t_batch").as("share_batch"))
      .withColumn("share_gap",
        abs($"share_corpus" - $"share_batch"))
      .orderBy($"bucket")
  }

  /** PER-LANGUAGE quality calibration: a fixed global quality threshold
    * over-drops whichever language scores structurally lower (the
    * stopword markers are language-biased by construction), so cleaning
    * pipelines calibrate the cutoff WITHIN each language — keep a doc
    * iff its quality percentile within its language clears the floor
    * (bottom 20% dropped here). Scores reuse [[TextOps.textStats]]'
    * composite exactly; the percentile is percent_rank (rank-based, so
    * ties share a value and the result is order-free and
    * engine-reproducible).
    *
    * Scale shape: the window partitions by `lang` — LOW-cardinality by
    * nature, so at 100 TB this exact form would funnel each language
    * into one partition. The deployment lever (documented, not default:
    * the gate pins the exact form) is threshold-from-sketch — per-lang
    * `approx_percentile(score, 0.2)` (mergeable, fully parallel) or the
    * exact t-digest audit path, broadcast the ~5-row threshold table,
    * then a NARROW scan-stage filter — the same
    * exactness-vs-parallelism swap the salted/sketch variants elsewhere
    * make explicit. */
  def qualityCalibrate(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"lang").orderBy($"quality_score")
    Tables.documents(s, d)
      .select($"doc_id", $"lang",
        TextOps.qualityScore($"text").as("quality_score"))
      .withColumn("pctl", percent_rank().over(w))
      .withColumn("keep", $"pctl" >= 0.2)
      .orderBy($"doc_id")
  }

  // ------------------------------------------------------- source cap

  /** Per-source frequency cap — the domain/URL-dedup step of web-corpus
    * curation (no single site may dominate the mixture): each source
    * keeps at most `cap` documents, selected by the deterministic md5
    * rank the samplers use, so a re-run (or another engine, as the
    * oracle proves) keeps the identical rows. One hash exchange: the
    * per-source window ranks without a global sort, and rank state is
    * O(1) per partition. A pathologically hot source concentrates its
    * rank into one task's external sort; if that ever dominated at
    * 100 TB the lever is the salted two-phase rank (per-salt partial
    * rank + prefix-sum offsets, the q_salted_agg pattern) — but capped
    * selection only needs the FIRST `cap` of each source, so even the
    * degenerate case sorts once and stops reading early. */
  def sourceCap(s: SparkSession, d: String, cap: Int = 15): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"source")
      .orderBy(md5($"doc_id".cast("string")), $"doc_id")
    Tables.documents(s, d)
      .select($"doc_id", $"source")
      .withColumn("src_rank", row_number().over(w).cast("long"))
      .withColumn("keep", $"src_rank" <= cap)
      .orderBy($"doc_id")
  }

  /** Per-source token CONCENTRATION (Lorenz profile): sources ranked by
    * token contribution with exact cumulative share ppm — the "how few
    * sources dominate the mix" readout that drives mixture weighting
    * and per-source caps (a top-3-at-80% corpus needs caps before any
    * quality work matters). Token cost is the library-wide whitespace
    * rule (shared with packBins / mixSample), all BIGINT.
    *
    * Scale shape: the corpus reduces map-side to one row per source;
    * the ranking windows run on THAT table (cardinality = number of
    * sources — the domain-bounded single-partition-window argument),
    * and the grand total rides the same cumulative window. */
  def sourceConcentration(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cost = when(length(trim($"text")) === 0, 0L)
      .otherwise(
        (length($"text") - length(regexp_replace($"text", " ", ""))).cast("long")
          + lit(1L))
    val bySrc = Tables.documents(s, d)
      .select($"source", cost.as("t"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"t").as("n_tokens"))
    val wRank = Window.orderBy($"n_tokens".desc, $"source")
    val wCum = wRank.rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.orderBy($"n_tokens".desc, $"source")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    bySrc
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .withColumn("cum_tokens", sum($"n_tokens").over(wCum))
      .withColumn("total", sum($"n_tokens").over(wAll))
      .select($"rank", $"source", $"n_docs", $"n_tokens", $"cum_tokens",
        expr("cum_tokens * 1000000 div total").as("cum_share_ppm"))
      .orderBy($"rank")
  }

  override def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_source_concentration", sourceConcentration, Some("""
        WITH c AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE
                   length(text) - length(replace(text, ' ', '')) + 1 END)
                   AS BIGINT) AS n_tokens
          FROM documents GROUP BY source),
        r AS (
          SELECT *,
                 CAST(row_number() OVER (ORDER BY n_tokens DESC, source)
                   AS BIGINT) AS rank,
                 CAST(sum(n_tokens) OVER (ORDER BY n_tokens DESC, source
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_tokens,
                 CAST(sum(n_tokens) OVER () AS BIGINT) AS total
          FROM c)
        SELECT rank, source, n_docs, n_tokens, cum_tokens,
               cum_tokens * 1000000 // total AS cum_share_ppm
        FROM r ORDER BY rank""")),
    QueryDef(
      "q_source_cap", sourceCap(_, _), Some("""
        WITH r AS (
          SELECT doc_id, source,
                 CAST(row_number() OVER (PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                   AS BIGINT) AS src_rank
          FROM documents)
        SELECT doc_id, source, src_rank, src_rank <= 15 AS keep
        FROM r ORDER BY doc_id""")),
    QueryDef(
      "q_quality_calibrate", qualityCalibrate(_, _), Some("""
        WITH q AS (
          SELECT doc_id, lang,
                 CASE WHEN n_tokens = 0 THEN 0.0 ELSE
                   (CAST(n_stop AS DOUBLE) / n_tokens) * 2.0
                     + CASE WHEN n_tokens BETWEEN 20 AND 1000
                            THEN 1.0 ELSE 0.0 END END AS quality_score
          FROM (
            SELECT doc_id, lang,
                   CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE
                     length(text) - length(replace(text, ' ', '')) + 1 END
                     AS BIGINT) AS n_tokens,
                   CAST(len(list_filter(string_split(text, ' '),
                          t -> t = 'the'))
                      + len(list_filter(string_split(text, ' '),
                          t -> t = 'a'))
                      + len(list_filter(string_split(text, ' '),
                          t -> t = 'of'))
                      + len(list_filter(string_split(text, ' '),
                          t -> t = 'and')) AS BIGINT) AS n_stop
            FROM documents))
        SELECT doc_id, lang, quality_score,
               percent_rank() OVER (PARTITION BY lang
                 ORDER BY quality_score) AS pctl,
               percent_rank() OVER (PARTITION BY lang
                 ORDER BY quality_score) >= 0.2 AS keep
        FROM q ORDER BY doc_id""")),
    QueryDef(
      "q_ingest_drift", ingestDrift, Some("""
        WITH b AS (
          SELECT CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE
                   length(text) - length(replace(text, ' ', '')) + 1 END
                   // 16 AS BIGINT) AS bucket,
                 doc_id % 10 >= 8 AS fresh
          FROM documents),
        h AS (
          SELECT bucket,
                 CAST(sum(CASE WHEN fresh THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_corpus,
                 CAST(sum(CASE WHEN fresh THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_batch
          FROM b GROUP BY bucket),
        t AS (SELECT CAST(sum(n_corpus) AS BIGINT) AS t_corpus,
                     CAST(sum(n_batch) AS BIGINT) AS t_batch FROM h)
        SELECT bucket, n_corpus, n_batch,
               CAST(n_corpus AS DOUBLE) / t_corpus AS share_corpus,
               CAST(n_batch AS DOUBLE) / t_batch AS share_batch,
               abs(CAST(n_corpus AS DOUBLE) / t_corpus
                 - CAST(n_batch AS DOUBLE) / t_batch) AS share_gap
        FROM h CROSS JOIN t ORDER BY bucket""")),
    QueryDef(
      "q_pii_redact", piiRedact(_, _), Some("""
        WITH a AS (
          SELECT doc_id,
                 text || ' mail u' || CAST(doc_id AS VARCHAR) || '@ex'
                      || CAST(doc_id % 7 AS VARCHAR) || '.org tel 555-0'
                      || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                      || ' ip 10.2.' || CAST(doc_id % 256 AS VARCHAR)
                      || '.' || CAST(doc_id % 100 AS VARCHAR) AS aug
          FROM documents)
        SELECT doc_id,
               CAST(len(regexp_extract_all(aug,
                 '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT)
                 AS n_emails,
               CAST(len(regexp_extract_all(aug,
                 '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))
                 AS BIGINT) AS n_ips,
               CAST(len(regexp_extract_all(aug, '\b555-[0-9]{4}\b'))
                 AS BIGINT) AS n_phones,
               md5(regexp_replace(regexp_replace(regexp_replace(aug,
                 '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
                 '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
                 '<IP>', 'g'),
                 '\b555-[0-9]{4}\b', '<PHONE>', 'g')) AS red_fp
        FROM a ORDER BY doc_id""")),
    QueryDef(
      "q_mix_sample", mixtureSample(_, _), Some(s"""
        WITH d AS (
          SELECT source, doc_id, $oracleCost AS n_tokens,
                 CAST(substr(source, 4) AS BIGINT) % 3 + 1 AS w
          FROM documents),
        t AS (SELECT sum(n_tokens) AS t_total FROM d),
        wt AS (SELECT CAST(sum(w) AS BIGINT) AS w_total
               FROM (SELECT source, min(w) AS w FROM d GROUP BY source)),
        r AS (
          SELECT d.source, d.doc_id, d.n_tokens, d.w,
                 CAST((t.t_total // 2) * d.w // wt.w_total AS BIGINT)
                   AS quota,
                 sum(d.n_tokens) OVER (PARTITION BY d.source
                   ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id
                   ROWS UNBOUNDED PRECEDING) AS running
          FROM d, t, wt)
        SELECT source,
               CAST(min(w) AS BIGINT) AS w,
               CAST(min(quota) AS BIGINT) AS quota,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN running <= quota THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_kept,
               CAST(sum(CASE WHEN running <= quota THEN n_tokens ELSE 0 END)
                 AS BIGINT) AS kept_tokens
        FROM r GROUP BY source ORDER BY source""")),
    QueryDef(
      "q_global_shuffle", globalShuffle(_, _), Some("""
        WITH r AS (
          SELECT doc_id,
                 CAST(row_number() OVER (ORDER BY
                   md5('ep1-' || CAST(doc_id AS VARCHAR)), doc_id)
                   AS BIGINT) AS pos,
                 count(*) OVER () AS n
          FROM documents)
        SELECT doc_id, pos,
               CASE WHEN pos * 10 <= n * 8 THEN 'train'
                    WHEN pos * 10 <= n * 9 THEN 'val'
                    ELSE 'test' END AS split
        FROM r ORDER BY pos"""))
  )
}
