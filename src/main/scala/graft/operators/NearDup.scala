package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.SimHash64.simhash64
import graft.ops.{QueryDef, QueryModule, Tables}

/** Near-duplicate detection on `documents` — the LLM-pipeline dedup family
  * (north star; no analogue in the reference).
  *
  * Scale design: the only self-join is the MinHash/LSH band equi-join — a
  * shuffle on a constant-width (band, signature) key whose bucket sizes are
  * governed by the banding parameters, never an all-pairs product. Exact
  * Jaccard verification runs only on LSH candidates. The DuckDB oracle is
  * the brute-force *definition* (all pairs with J >= tau), so the
  * correctness gate also measures LSH recall: any missed pair fails the
  * hash compare.
  */
object NearDup extends QueryModule {

  /** 32 bands x 4 rows = 128 permutations: for J >= 0.9 the per-band hit
    * rate is 0.9^4 ≈ 0.656, so the miss probability is (1-0.656)^32 ≈ 1e-15
    * — effectively perfect recall at the verification threshold. */
  private val Bands = 32
  private val Rows = 4
  private val Perms = Bands * Rows
  private val Tau = 0.8
  private val MersennePrime = 2305843009213693951L // 2^61 - 1

  /** Distinct word 3-gram shingles. */
  private def shingleCol(text: Column): Column = {
    val toks = split(text, " ")
    when(size(toks) >= 3,
      array_distinct(transform(sequence(lit(1), size(toks) - 2), i =>
        concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
          element_at(toks, i + 2)))))
      .otherwise(array(text))
  }

  private def shingles(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select($"doc_id", shingleCol($"text").as("sh"))
  }

  /** Universal-hash parameters for permutation p (deterministic; engine
    * internal — the oracle never sees MinHash values, only verified pairs).
    * Kept to 31 bits so a*h+b never overflows a long under ANSI mode. */
  private def hashA(p: Int): Long =
    ((1103515245L * (p + 1) + 12345L) % 1073741823L) * 2L + 1L
  private def hashB(p: Int): Long =
    (1103515245L * (2L * p + 7L) + 54321L) % 2147483647L

  /** MinHash signatures: explode shingles, hash once with xxhash64, then
    * take 128 permutation minima in one hash-aggregate (map-side partial
    * aggregation keeps the shuffle at 128 longs per document). */
  private def signatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val mins = (0 until Perms).map { p =>
      min(pmod(lit(hashA(p)) * $"h" + lit(hashB(p)), lit(MersennePrime)))
        .as(s"mh$p")
    }
    shingles(s, d)
      .select($"doc_id", explode($"sh").as("shingle"))
      .withColumn("h", pmod(xxhash64($"shingle"), lit(2147483647L)))
      .groupBy($"doc_id")
      .agg(mins.head, mins.tail: _*)
  }

  /** Candidate pairs from LSH banding: one row per (doc, band) keyed by the
    * band's Rows-wide signature slice, self-joined on (band, key). */
  private def candidatePairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bandStructs = (0 until Bands).map { b =>
      struct(lit(b).as("band"),
        struct((0 until Rows).map(r =>
          col(s"mh${b * Rows + r}").as(s"k$r")): _*).as("key"))
    }
    val banded = signatures(s, d)
      .select($"doc_id", explode(array(bandStructs: _*)).as("bk"))
      .select($"doc_id", $"bk.band".as("band"), $"bk.key".as("key"))
    val a = banded.select($"band", $"key", $"doc_id".as("id_a"))
    val b = banded.select($"band", $"key", $"doc_id".as("id_b"))
    a.join(b, Seq("band", "key"))
      .where($"id_a" < $"id_b")
      .select($"id_a", $"id_b")
      .distinct()
  }

  /** Near-duplicate pairs: LSH candidates verified with exact shingle
    * Jaccard >= tau. */
  def minhashNearDup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sh = shingles(s, d)
    candidatePairs(s, d)
      .join(sh.select($"doc_id".as("id_a"), $"sh".as("sh_a")), Seq("id_a"))
      .join(sh.select($"doc_id".as("id_b"), $"sh".as("sh_b")), Seq("id_b"))
      .withColumn("n_common",
        size(array_intersect($"sh_a", $"sh_b")).cast("long"))
      .withColumn("jaccard",
        $"n_common".cast("double") /
          (size($"sh_a") + size($"sh_b") - $"n_common"))
      .where($"jaccard" >= Tau)
      .select($"id_a", $"id_b", $"n_common", $"jaccard")
      .orderBy($"id_a", $"id_b")
  }

  /** N-gram Jaccard similarity, bucketed by `source` (pre-partitioned
    * corpus blocks): top-3 most similar pairs per block. The generic
    * unblocked form at scale is [[minhashNearDup]]. */
  def ngramJaccardTopK(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sh = Tables.documents(s, d)
      .select($"doc_id", $"source", shingleCol($"text").as("sh"))
    val a = sh.select($"source", $"doc_id".as("id_a"), $"sh".as("sh_a"))
    val b = sh.select($"source", $"doc_id".as("id_b"), $"sh".as("sh_b"))
    val w = Window.partitionBy($"source")
      .orderBy($"jaccard".desc, $"id_a", $"id_b")
    a.join(b, Seq("source"))
      .where($"id_a" < $"id_b")
      .withColumn("n_common",
        size(array_intersect($"sh_a", $"sh_b")).cast("long"))
      .withColumn("jaccard",
        $"n_common".cast("double") /
          (size($"sh_a") + size($"sh_b") - $"n_common"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where($"rank" <= 3)
      .select($"source", $"rank", $"id_a", $"id_b", $"jaccard")
      .orderBy($"source", $"rank")
  }

  /** SimHash fingerprints via the native [[graft.functions.SimHash64]]
    * expression, grouped to dedup clusters on the exact fingerprint.
    * (No oracle: DuckDB has no compatible 64-bit token hash; pinned by
    * NearDupSpec instead.) */
  def simhashClusters(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", simhash64($"text").as("simhash"))
      .groupBy($"simhash")
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_docs"))
      .select($"keep_id", $"simhash", $"n_docs")
      .orderBy($"keep_id")
  }

  private val oracleShingles = """
    WITH s AS (
      SELECT doc_id, source,
        CASE WHEN len(string_split(text, ' ')) >= 3 THEN
          list_distinct(list_transform(
            generate_series(1, len(string_split(text, ' ')) - 2),
            i -> string_split(text, ' ')[i] || ' ' ||
                 string_split(text, ' ')[i+1] || ' ' ||
                 string_split(text, ' ')[i+2]))
        ELSE [text] END AS sh
      FROM documents)"""

  override def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_minhash_neardup", minhashNearDup, Some(s"""
        $oracleShingles,
        p AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_common,
                 CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                   (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
                   AS jaccard
          FROM s a JOIN s b ON a.doc_id < b.doc_id)
        SELECT id_a, id_b, n_common, jaccard
        FROM p WHERE jaccard >= 0.8 ORDER BY id_a, id_b""")),
    QueryDef(
      "q_ngram_jaccard", ngramJaccardTopK, Some(s"""
        $oracleShingles,
        p AS (
          SELECT a.source, a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_common,
                 CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                   (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
                   AS jaccard
          FROM s a JOIN s b ON a.source = b.source AND a.doc_id < b.doc_id),
        r AS (
          SELECT source, id_a, id_b, jaccard,
                 row_number() OVER (PARTITION BY source
                   ORDER BY jaccard DESC, id_a, id_b) AS rank
          FROM p)
        SELECT source, rank, id_a, id_b, jaccard
        FROM r WHERE rank <= 3 ORDER BY source, rank""")),
    QueryDef("q_simhash", simhashClusters, None)
  )
}
