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

  /** Cast a float array to double for precision-stable arithmetic. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

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

  /** Random-hyperplane LSH bucket for one hash table: an `nBits`-bit
    * signature where bit r = [dot(v, h_r) >= 0] and h_r is a ±1
    * hyperplane drawn from [[signAt]]. */
  def lshBucket(v: Column, table: Int, nBits: Int, dim: Int): Column = {
    val bits = (0 until nBits).map { r =>
      val signs = (0 until dim)
        .map(k => signAt((table.toLong * nBits + r) * dim + k))
      val d = dot(v, typedlit(signs))
      when(d >= 0.0, lit(1L << r)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
