package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Bloom-filter sketch build + scan-side membership test, on Spark's own
  * `BloomFilterAggregate` / `BloomFilterMightContain` (the machinery
  * behind injected runtime row-group filters, here driven explicitly).
  *
  * Why this exists: a broadcast anti-join needs the whole key set on
  * every executor. At 100 TB a decontamination benchmark of 10^8 32-byte
  * fingerprints is ~3 GB raw — past broadcast comfort — while its bloom
  * sketch at ~10 bits/key is ~120 MB and tests membership from the scan,
  * so the corpus discards definite-negatives WITHOUT any join. False
  * positives (and only those) proceed to the exact join, so composed
  * results are IDENTICAL to the exact anti-join — which is what lets the
  * bloom-backed query share the exact query's DuckDB oracle.
  *
  * The sketch is built with one small aggregation job at query-construction
  * time and inlined as a literal (the same shape as Spark's runtime
  * filters, where the build side arrives via an executed subquery;
  * `BloomFilterMightContain` requires a foldable/subquery bloom input).
  */
object BloomSketch {

  /** Aggregate `keys` of `df` into a serialized bloom filter (runs a
    * driver job NOW; the result is a few MB even for huge key sets).
    * An EMPTY key set yields an empty filter — `mightContain` false for
    * everything — matching the exact-join semantics of "no benchmark
    * matches anything" (Spark's aggregate itself evals to NULL on zero
    * rows, which would otherwise poison every downstream predicate). */
  def build(df: DataFrame, key: Column, estimatedItems: Long): Array[Byte] = {
    val agg = GraftShims.column(
      new BloomFilterAggregate(
        GraftShims.toExpression(xxhash64(key)), estimatedItems)
        .toAggregateExpression())
    Option(df.select(agg.as("bf")).head().getAs[Array[Byte]](0)).getOrElse {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.spark.util.sketch.BloomFilter.create(1).writeTo(out)
      out.toByteArray
    }
  }

  /** Predicate: may `key` be in the sketch? No false negatives; false
    * positives at the sketch's fpp. Codegen'd, scan-side pushable. */
  def mightContain(sketch: Array[Byte], key: Column): Column =
    GraftShims.column(BloomFilterMightContain(
      GraftShims.toExpression(lit(sketch)),
      GraftShims.toExpression(xxhash64(key))))
}
