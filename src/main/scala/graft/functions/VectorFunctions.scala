package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType` embedding columns, built entirely from
  * Catalyst higher-order functions (`zip_with`/`aggregate`/`transform`) —
  * no UDFs, so everything stays inside whole-stage codegen and the
  * expressions are pushed to executors untouched at any scale.
  *
  * Determinism contract: dot products fold strictly left-to-right in
  * double precision (`aggregate` is a sequential fold), which the DuckDB
  * oracle reproduces with `list_sum(list_transform(...))` — verified
  * bit-exact on the test fixtures.
  */
object VectorFunctions {

  /** Sequential-fold dot product (float or double arrays). Delegates to
    * the native [[ArrayDot]] expression: same left-to-right double fold as
    * the higher-order `aggregate` form (bit-identical results), but a
    * codegen'd tight loop instead of per-element interpretation. */
  def dot(a: Column, b: Column): Column = VectorExpressions.array_dot(a, b)

  /** L2 norm. */
  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity given precomputed norms (preferred: compute each
    * vector's norm once, not once per pair). */
  def cosineWithNorms(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  /** Cosine similarity of two double arrays. */
  def cosine(a: Column, b: Column): Column =
    cosineWithNorms(a, b, l2Norm(a), l2Norm(b))

  /** Deterministic pseudo-random ±1.0 sequence shared with the oracle:
    * LCG over the flat index, bit 15 as the sign bit (low LCG bits are
    * not random). Exact integer arithmetic — reproducible anywhere. */
  def signAt(flatIndex: Long): Double = {
    val x = (flatIndex * 1103515245L + 12345L) % 2147483648L
    if (((x >> 15) & 1L) == 0L) 1.0 else -1.0
  }

}
