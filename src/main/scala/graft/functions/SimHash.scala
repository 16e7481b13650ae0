package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash document fingerprint.
  *
  * Whitespace-tokenizes, hashes each token with FNV-1a/64 (public-domain
  * hash), and bit-votes: output bit b is 1 iff more token hashes have bit b
  * set than clear. Near-duplicate documents land within a small Hamming
  * distance — dedup then groups on rotated prefixes of the fingerprint, a
  * constant-width shuffle key at any scale.
  */
object SimHash {
  private val FnvOffset = 0xcbf29ce484222325L
  private val FnvPrime = 0x100000001b3L

  def fnv1a64(s: String): Long = {
    var h = FnvOffset
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  def simhash64(text: String): Long = {
    val votes = new Array[Int](64)
    var start = 0
    val n = text.length
    var i = 0
    while (i <= n) {
      if (i == n || Character.isWhitespace(text.charAt(i))) {
        if (i > start) {
          val h = fnv1a64(text.substring(start, i))
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Codegen entry point (called from generated Java). */
  def eval(s: UTF8String): Long = simhash64(s.toString)
}

/** Native Catalyst expression: stays inside whole-stage codegen (doGenCode
  * emits a static call), unlike a Scala UDF which would box rows. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    SimHash.eval(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash.eval($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
}

object SimHash64 {
  /** Column-level API: `simhash64($"text")`. */
  def simhash64(c: Column): Column =
    GraftShims.column(SimHash64(GraftShims.toExpression(c)))
}
