package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector/sketch hot paths.
  *
  * Spark's higher-order functions (`aggregate`, `zip_with`, `transform`)
  * are CodegenFallback — every element step runs through the expression
  * interpreter, which dominates wall-clock once a query evaluates millions
  * of element operations (pairwise cosine, LSH signatures, MinHash). These
  * expressions do the same arithmetic as tight JVM loops and participate
  * in whole-stage codegen via static calls, typically 10-50x faster —
  * the (b) tier of the custom-operator ladder (custom Expression before
  * custom physical operator).
  *
  * Determinism contract: [[VecOps.dot]] folds strictly left-to-right in
  * double precision — bit-identical to the `aggregate`-based fold it
  * replaces and to the DuckDB oracle's `list_sum(list_transform(...))`.
  */
object VecOps {

  private def elem(a: ArrayData, isFloat: Boolean, i: Int): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Sequential-fold dot product; accepts float or double arrays. */
  def dot(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += elem(a, aFloat, i) * elem(b, bFloat, i)
      i += 1
    }
    acc
  }

  /** Hyperplane sign tables, memoized per (tables, bits, dim): the
    * hyperplanes are CONSTANTS of the expression, so the per-row hot
    * loop should read a flat double array, not re-derive the avalanche
    * mix tables×bits×dim times per vector. One JVM-wide entry per
    * distinct shape; bounded — `lsh_buckets` is SQL-registered with
    * caller-chosen parameters and dim is per-row, so a ragged or
    * adversarial workload must not grow the cache without limit (or
    * overflow the Int table size). Shapes past the cap fall back to
    * computing signs on the fly (the pre-memoization path). */
  private val MaxSignTableLen = 1 << 22 // 32 MB of doubles per shape
  private val MaxSignTables = 64
  private val signTables =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Double]]()

  private[graft] def signTable(tables: Int, bits: Int, dim: Int): Array[Double] = {
    val len = tables.toLong * bits * dim
    if (len > MaxSignTableLen) return null
    // Look up before applying the table-count cap: a shape that is already
    // cached must keep hitting the fast path even when the cache is full.
    // The cap only gates NEW insertions; computeIfAbsent makes the insert
    // itself atomic (a concurrent racer can overshoot the cap by at most
    // the number of racing threads, which is fine for a soft memory bound).
    val key = (tables, bits, dim)
    val hit = signTables.get(key)
    if (hit != null) hit
    else if (signTables.size >= MaxSignTables) null
    else signTables.computeIfAbsent(key, { _ =>
      Array.tabulate(len.toInt)(i => VectorFunctions.signAt(i.toLong))
    })
  }

  /** Random-hyperplane LSH bucket signatures: one `bits`-wide bucket per
    * table, hyperplane components drawn from [[VectorFunctions.signAt]]
    * (deterministic avalanche-mixed ±1, reproducible across runs),
    * pre-tabulated by [[signTable]]. */
  def lshBuckets(v: ArrayData, isFloat: Boolean, tables: Int, bits: Int): ArrayData = {
    val dim = v.numElements()
    val signs = signTable(tables, bits, dim) // null = shape past cache cap
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var r = 0
      while (r < bits) {
        val base = (t.toLong * bits + r) * dim
        var d = 0.0
        var k = 0
        while (k < dim) {
          d += elem(v, isFloat, k) * (if (signs != null) signs((base + k).toInt)
            else VectorFunctions.signAt(base + k))
          k += 1
        }
        if (d >= 0.0) bucket |= (1L << r)
        r += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  /** MinHash signature over a pre-hashed shingle set (64-bit longs):
    * `perms` permutation minima, each permutation the murmur3 64-bit
    * finalizer (a BIJECTIVE avalanche mix — JVM arithmetic wraps, so the
    * full 64-bit domain is usable here, unlike ANSI SQL) of the shingle
    * xor a per-permutation odd seed.
    *
    * An affine map with small coefficients mod a large prime is NOT
    * min-wise independent: over a 31-bit input range `a*h+b` wraps the
    * modulus at most once, so the map is 2-piecewise MONOTONE and every
    * permutation's minimum comes from one of ~2 fixed elements of the
    * set — minima correlate across permutations and the banded miss rate
    * degrades from (1-J^r)^b to roughly the raw min-collision rate
    * (observed: 5 of 256 true pairs missed at sf0.1 before this fix). An
    * avalanche bijection destroys that shared order structure. */
  def minhashSig(sh: ArrayData, perms: Int): ArrayData = {
    val n = sh.numElements()
    val out = new Array[Long](perms)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = sh.getLong(i)
      var p = 0
      while (p < perms) {
        val v = fmix64(h ^ permSeed(p))
        if (v < out(p)) out(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** LSH band keys from a minhash signature: one 64-bit key per band,
    * fmix64-folded over the band's `rows` signature slice from a
    * per-band seed. Replaces the 32-expression xxhash64-over-element_at
    * chain the band explode used to evaluate per row — one primitive
    * pass over the signature array, zero element_at null machinery.
    * Key VALUES differ from the old chain; keys are internal (candidate
    * buckets, streaming state keys, stored band indexes), so only
    * recall — a property of the banding math, not the hash family —
    * carries to any gated output. */
  def bandKeys(sig: ArrayData, bands: Int, rows: Int): ArrayData = {
    val perms = bands * rows
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      // band fold seeded from permSeed(perms + b): DISJOINT from the
      // permutation seeds permSeed(0..perms-1) that derived the minima
      // being folded (scheme v2 — see [[BandKeySchemeVersion]])
      var acc = fmix64(permSeed(perms + b))
      var r = 0
      while (r < rows) { acc = fmix64(acc ^ sig.getLong(b * rows + r)); r += 1 }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Fused shingles→minhash→band-keys kernel: the whole banding
    * projection (the narrow floor of every LSH pair stage) in one call —
    * the `perms`-wide minima live in a local primitive array instead of
    * a materialized intermediate column, and the band fold runs in the
    * same pass. Identical keys to `bandKeys(minhashSig(sh, perms),
    * bands, perms/bands)` by construction. */
  def minhashBandKeys(sh: ArrayData, perms: Int, bands: Int): ArrayData = {
    val n = sh.numElements()
    val mins = new Array[Long](perms)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = sh.getLong(i)
      var p = 0
      while (p < perms) {
        val v = fmix64(h ^ permSeed(p))
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += 1
    }
    val rows = perms / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      // disjoint band-fold seed range — identical to [[bandKeys]] by
      // construction (scheme v2, see [[BandKeySchemeVersion]])
      var acc = fmix64(permSeed(perms + b))
      var r = 0
      while (r < rows) { acc = fmix64(acc ^ mins(b * rows + r)); r += 1 }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Nearest-centroid assignment of one vector against a small codebook:
    * argmax of cosine over `cents`, ties to the LOWEST centroid id (ids
    * are sorted ascending and the comparison is strict — identical to
    * `row_number() OVER (ORDER BY cos DESC, centroid_id)` = 1). The dot
    * folds left-to-right in double, bit-identical to [[dot]] and the
    * DuckDB oracle. Returns (centroid_id, cos) as an InternalRow. */
  def nearestCentroid(v: ArrayData, isFloat: Boolean, nrm: Double,
      ids: Array[Long], cents: Array[Array[Double]], cnorms: Array[Double])
      : org.apache.spark.sql.catalyst.InternalRow = {
    val dim = v.numElements()
    var best = 0
    var bestCos = Double.NegativeInfinity
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      val n = math.min(dim, c.length)
      var acc = 0.0
      var k = 0
      while (k < n) {
        acc += elem(v, isFloat, k) * c(k)
        k += 1
      }
      val cos = acc / (nrm * cnorms(j))
      if (cos > bestCos) { bestCos = cos; best = j }
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](ids(best), bestCos))
  }

  /** TWO-LEVEL nearest-centroid assignment — the hierarchical coarse
    * quantizer that makes deployment-K IVF assignment affordable: a
    * flat scan is O(K·D) per vector, which at the K ∝ corpus geometry
    * (K = n / cell_target) makes every probe batch's assignment grow
    * linearly with the STANDING corpus. Here the codebook is stored as
    * S super-cells over the K children (CSR layout: children of super
    * `s` occupy `offs(s) until offs(s+1)` of `ids`/`cents`/`cnorms`,
    * sorted by (super, id)); assignment scans the S supers, keeps the
    * top-`nprobe` (ties toward the LOWEST super index — strict
    * comparison, same rule as the flat kernel), then scans only those
    * supers' children: O((S + nprobe·K/S)·D), minimized at S ≈ √K —
    * the standard IVF coarse-within-coarse shape (FAISS's
    * two-level / residual coarse quantizers use the same structure).
    *
    * Child selection: argmax cosine over all scanned children, ties to
    * the lowest CHILD id (global rule, independent of super order).
    * With `nprobe = S` the scanned set is all K children, so for any
    * vector with a finite nonzero norm the result is IDENTICAL to
    * [[nearestCentroid]] — the exactness pin (a zero-norm vector's
    * all-NaN cosines still get a deterministic assignment, but seeded
    * from the first PROBED child rather than flat's index 0); smaller
    * nprobe is the recall/cost knob, measured (planted-twin recall) in
    * ScaleBench's deployment rung.
    *
    * Returns (super_id, centroid_id, cos): the super is the one the
    * winning child lives under, so (index row, probe row) pairs
    * assigned by the same codebook always agree on the cell. */
  def nearestCentroid2(v: ArrayData, isFloat: Boolean, nrm: Double,
      superCents: Array[Array[Double]], superNorms: Array[Double],
      offs: Array[Int], ids: Array[Long], cents: Array[Array[Double]],
      cnorms: Array[Double], nprobe: Int)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val dim = v.numElements()
    val nSuper = superCents.length
    val p = math.max(1, math.min(nprobe, nSuper))
    // top-p supers by cosine, insertion-sorted; strict > keeps the
    // lowest super index on ties (supers admitted in index order).
    // EMPTY supers (offs(s+1) == offs(s) — a refined Lloyd round can
    // orphan one) are never admitted: probing them wastes the slot and
    // an all-empty probe set would return a garbage assignment. NaN
    // super cosines (a zero-norm super or probe) are never admitted
    // either: a NaN admitted during the fill phase would sit at the
    // tail and block every later super (cos > NaN is always false).
    val topIdx = new Array[Int](p)
    val topCos = new Array[Double](p)
    var filled = 0
    var s = 0
    while (s < nSuper) {
      if (offs(s + 1) > offs(s)) {
        val c = superCents(s)
        val n = math.min(dim, c.length)
        var acc = 0.0
        var k = 0
        while (k < n) { acc += elem(v, isFloat, k) * c(k); k += 1 }
        val cos = acc / (nrm * superNorms(s))
        if (cos == cos) {
          if (filled < p) {
            var i = filled
            while (i > 0 && cos > topCos(i - 1)) {
              topCos(i) = topCos(i - 1); topIdx(i) = topIdx(i - 1); i -= 1
            }
            topCos(i) = cos; topIdx(i) = s
            filled += 1
          } else if (cos > topCos(p - 1)) {
            var i = p - 1
            while (i > 0 && cos > topCos(i - 1)) {
              topCos(i) = topCos(i - 1); topIdx(i) = topIdx(i - 1); i -= 1
            }
            topCos(i) = cos; topIdx(i) = s
          }
        }
      }
      s += 1
    }
    // degenerate probe (all super cosines NaN — zero-norm vector):
    // fall back to the first p NON-EMPTY supers in index order, the
    // deterministic analogue of the flat kernel's index-0 seed
    if (filled == 0) {
      var s2 = 0
      while (s2 < nSuper && filled < p) {
        if (offs(s2 + 1) > offs(s2)) { topIdx(filled) = s2; filled += 1 }
        s2 += 1
      }
    }
    // scan the probed supers' children; first visited child seeds the
    // best slot (the NaN-everywhere degenerate then still returns a
    // deterministic assignment, like the flat kernel's index-0 seed)
    var bestId = Long.MinValue
    var bestSuper = -1L
    var bestCos = Double.NegativeInfinity
    var seeded = false
    var t = 0
    while (t < filled) {
      val sup = topIdx(t)
      var j = offs(sup)
      val end = offs(sup + 1)
      while (j < end) {
        val c = cents(j)
        val n = math.min(dim, c.length)
        var acc = 0.0
        var k = 0
        while (k < n) { acc += elem(v, isFloat, k) * c(k); k += 1 }
        val cos = acc / (nrm * cnorms(j))
        if (!seeded || cos > bestCos ||
            (cos == bestCos && ids(j) < bestId)) {
          seeded = true; bestCos = cos; bestId = ids(j); bestSuper = sup
        }
        j += 1
      }
      t += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestSuper, bestId, bestCos))
  }

  /** Scalar-quantization reconstruction stats for one vector: quantize
    * each component to `levels` uniform cells over [min, max], midpoint
    * reconstruction, and report (lo, hi, max_err, mse). One pass for
    * min/max, one for the errors — the cheap capacity-planning pass run
    * before committing a corpus to an int8 index (is span/(2·levels)
    * error tolerable?). All arithmetic in double with left-to-right
    * folds, mirrored term-for-term by the DuckDB oracle. */
  def quantErr(v: ArrayData, isFloat: Boolean, levels: Int)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val n = v.numElements()
    if (n == 0)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0.0, 0.0, 0.0, 0.0))
    var lo = Double.PositiveInfinity
    var hi = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      val x = elem(v, isFloat, i)
      if (x < lo) lo = x
      if (x > hi) hi = x
      i += 1
    }
    val span = hi - lo
    var maxErr = 0.0
    var sq = 0.0
    if (span != 0.0) {
      i = 0
      while (i < n) {
        val x = elem(v, isFloat, i)
        val q = math.floor((x - lo) * levels / span)
        val recon = lo + (q + 0.5) * span / levels
        val err = math.abs(x - recon)
        if (err > maxErr) maxErr = err
        sq += err * err
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](lo, hi, maxErr, sq / n))
  }

  /** Product-quantization ENCODE of one vector against per-subspace
    * sub-codebooks: for each of the M subspaces (contiguous dim slices of
    * width `cents(m)(0).length`), the index of the L2-nearest
    * sub-centroid — strict less-than, so ties keep the LOWEST index,
    * identical to `row_number() OVER (ORDER BY dist, code)` = 1. Each
    * subspace distance folds left-to-right over its dims in double,
    * mirrored term-for-term by the DuckDB oracle. */
  def pqEncode(v: ArrayData, isFloat: Boolean,
      cents: Array[Array[Array[Double]]]): ArrayData = {
    val m = cents.length
    val out = new Array[Long](m)
    var s = 0
    var base = 0
    while (s < m) {
      val sub = cents(s)
      val subDim = sub(0).length
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < sub.length) {
        val cent = sub(c)
        var d = 0.0
        var j = 0
        while (j < subDim) {
          val k = base + j
          val x = if (k < v.numElements()) elem(v, isFloat, k) else 0.0
          val diff = x - cent(j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best.toLong
      base += subDim
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Asymmetric-distance computation (ADC) of a RAW query vector against
    * a PQ-ENCODED corpus vector: squared L2 between the query and the
    * code's reconstruction, as ONE left-to-right fold over the full
    * dimension (not per-subspace partials — FP addition is not
    * associative, and the DuckDB oracle folds over the full dim in k
    * order). This is the PQ search kernel: the corpus side is `M` bytes
    * of codes, the distance reads only codebook entries. */
  def pqAdc(q: ArrayData, isFloat: Boolean, codes: ArrayData,
      cents: Array[Array[Array[Double]]]): Double = {
    var acc = 0.0
    var s = 0
    var base = 0
    while (s < cents.length) {
      val cent = cents(s)(codes.getLong(s).toInt)
      val subDim = cent.length
      var j = 0
      while (j < subDim) {
        val k = base + j
        val x = if (k < q.numElements()) elem(q, isFloat, k) else 0.0
        val diff = x - cent(j)
        acc += diff * diff
        j += 1
      }
      base += subDim
      s += 1
    }
    acc
  }

  /** Version of the LSH band-key SCHEME (hash family + seed derivation +
    * band fold). Band keys are internal hash identities, so the gated
    * query surface is invariant to this — but anything PERSISTED under
    * the keys is not: a stored band index table
    * ([[graft.operators.NearDup.bandIndex]] written via
    * `Ddl.createBucketedTable`) or a streaming dedup state checkpoint
    * keyed on `bkey` built under a previous version probes to ZERO
    * matches with no error. Bump this whenever key values change and
    * rebuild those artifacts (catalog tables carry the version as the
    * `graft.band_key_scheme` property — see `Ddl.stampBandScheme` /
    * `Ddl.assertBandScheme`; streaming checkpoints must be discarded).
    *
    * v2: band fold seeded from the disjoint `permSeed(perms + b)` range —
    * v1 reused `permSeed(b)`, overlapping the permutation seeds of the
    * minima being folded (harmless under fmix64's avalanche, but the
    * seed spaces are trivially separable, so they now are). */
  val BandKeySchemeVersion = 2

  /** Distinct odd multiplier per permutation (golden-ratio stride). */
  def permSeed(p: Int): Long = 0x9E3779B97F4A7C15L * (p + 1)

  /** murmur3's 64-bit finalizer: bijective, full avalanche. */
  def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** |a ∩ b| for SORTED distinct long arrays (as produced by
    * [[textShingles]]): a primitive merge — no boxing, no per-pair hash
    * set, no intersection array allocation. */
  def intersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { n += 1L; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  /** 256-entry random table for the Gear rolling hash (deterministic
    * LCG, iterated full-state — unlike an indexed affine map this is
    * just a table of fixed random constants, and it must stay as-is:
    * [[graft.ops.HashOracleSql]] reproduces exactly this sequence). */
  private val gearTable: Array[Long] = {
    val t = new Array[Long](256)
    var x = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < 256) {
      x = x * 6364136223846793005L + 1442695040888963407L
      t(i) = x
      i += 1
    }
    t
  }

  /** Content-defined chunking via a Gear rolling hash (the FastCDC
    * family): `hash = (hash << 1) + gear(byte)`, so a byte's influence
    * ages out after 64 shifts and a boundary (low `maskBits` bits zero)
    * depends only on the trailing ~64 bytes. An insertion early in a
    * document shifts bytes but NOT later chunk identities — the property
    * fixed-width chunking lacks and the reason CDC powers chunk-level
    * dedup. Returns sorted distinct FNV hashes of the chunks (set form
    * for dedup joins). */
  def contentChunks(text: org.apache.spark.unsafe.types.UTF8String,
      maskBits: Int): ArrayData = {
    val bytes = text.getBytes
    val mask = (1L << maskBits) - 1L
    val minChunk = 8
    var hash = 0L
    val boundaries = scala.collection.mutable.ArrayBuffer[Int](0)
    var i = 0
    while (i < bytes.length) {
      hash = (hash << 1) + gearTable(bytes(i) & 0xff)
      if ((hash & mask) == 0L && (i + 1 - boundaries.last) >= minChunk) {
        boundaries += (i + 1)
      }
      i += 1
    }
    if (boundaries.last != bytes.length) boundaries += bytes.length
    val out = new Array[Long](boundaries.length - 1)
    var c = 0
    while (c < out.length) {
      out(c) = SimHash.fnv1a64(
        new String(bytes, boundaries(c), boundaries(c + 1) - boundaries(c),
          java.nio.charset.StandardCharsets.UTF_8))
      c += 1
    }
    java.util.Arrays.sort(out)
    var w = 0
    var j = 0
    while (j < out.length) {
      if (w == 0 || out(j) != out(w - 1)) { out(w) = out(j); w += 1 }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  /** Split on EVERY space, keeping empty tokens — the exact semantics of
    * Spark's split(col, " ") and DuckDB's string_split (Scala's
    * String.split drops trailing empties, which would silently diverge
    * from the SQL oracle on texts with consecutive/trailing spaces). */
  private def splitSpaces(s: String): Array[String] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        buf += s.substring(start, i)
        start = i + 1
      }
      i += 1
    }
    buf.toArray
  }

  /** Per-document token-repetition stats in ONE row-local pass:
    * (n_tokens, n_distinct_tokens, top_cnt). The aggregation a
    * groupBy-per-token would SHUFFLE for is document-local — at corpus
    * scale the difference between two full-token-stream exchanges and a
    * plain scan. Token identity is exact string equality, matching the
    * SQL oracle's GROUP BY tok. */
  def repetitionStats(text: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val toks = splitSpaces(text.toString)
    val counts = new java.util.HashMap[String, Int](toks.length * 2)
    var top = 0
    var i = 0
    while (i < toks.length) {
      val c = counts.merge(toks(i), 1, Integer.sum)
      if (c > top) top = c
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](toks.length.toLong, counts.size.toLong, top.toLong))
  }

  /** Word n-gram shingle set of a single-space-tokenized text, each
    * shingle hashed with FNV-1a/64, deduplicated and SORTED (the contract
    * [[intersectCount]] relies on). Texts shorter than n tokens hash
    * whole. One native pass replaces a tokenize → transform(sequence) →
    * concat → distinct → hash chain of interpreted higher-order
    * functions. */
  def textShingles(text: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    val s = text.toString
    val toks: Array[String] = splitSpaces(s)
    val out: Array[Long] =
      if (toks.length < n) Array(SimHash.fnv1a64(s))
      else {
        val arr = new Array[Long](toks.length - n + 1)
        val sb = new java.lang.StringBuilder(64)
        var i = 0
        while (i <= toks.length - n) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          arr(i) = SimHash.fnv1a64(sb.toString)
          i += 1
        }
        arr
      }
    java.util.Arrays.sort(out)
    // dedupe in place (sorted)
    var w = 0
    var i = 0
    while (i < out.length) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  private val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }
  private val HexChars = "0123456789abcdef".toCharArray

  private def md5hex(x: String): String = {
    val md = md5Local.get()
    md.reset()
    val dig = md.digest(x.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = new Array[Char](32)
    var i = 0
    while (i < 16) {
      hex(2 * i) = HexChars((dig(i) >> 4) & 0xf)
      hex(2 * i + 1) = HexChars(dig(i) & 0xf)
      i += 1
    }
    new String(hex)
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD'03):
    * md5-hex of every k-token gram, then the DISTINCT minima of a
    * w-hash sliding window, via a monotonic deque — O(grams) total, one
    * narrow pass per document. md5-hex (not the faster FNV family used
    * elsewhere) is deliberate: the SELECTION depends on hash ORDER, and
    * md5 hex strings give Spark and the DuckDB oracle the identical
    * total order without reproducing a custom hash in SQL. Shorter than
    * k tokens ⇒ the whole text hashes as the one fingerprint; fewer
    * than w grams ⇒ their single minimum. Replaces a nested
    * transform(sequence)/slice HOF chain whose gram array Catalyst
    * re-evaluated per window element (~25x slower at bench SF). */
  def winnowFps(text: org.apache.spark.unsafe.types.UTF8String,
      k: Int, w: Int): ArrayData = {
    val s = text.toString
    val toks = splitSpaces(s)
    val grams: Array[String] =
      if (toks.length < k) Array(md5hex(s))
      else {
        val out = new Array[String](toks.length - k + 1)
        val sb = new java.lang.StringBuilder(64)
        var i = 0
        while (i <= toks.length - k) {
          sb.setLength(0)
          var j = 0
          while (j < k) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          out(i) = md5hex(sb.toString)
          i += 1
        }
        out
      }
    val m = grams.length
    val set = new java.util.LinkedHashSet[String]()
    if (m < w) {
      var mn = grams(0)
      var i = 1
      while (i < m) {
        if (grams(i).compareTo(mn) < 0) mn = grams(i)
        i += 1
      }
      set.add(mn)
    } else {
      val dq = new java.util.ArrayDeque[Integer]()
      var i = 0
      while (i < m) {
        while (!dq.isEmpty && grams(dq.peekLast).compareTo(grams(i)) >= 0)
          dq.pollLast()
        dq.addLast(i)
        if (dq.peekFirst <= i - w) dq.pollFirst()
        if (i >= w - 1) set.add(grams(dq.peekFirst))
        i += 1
      }
    }
    val out = new Array[Any](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) {
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next())
      i += 1
    }
    new GenericArrayData(out)
  }

  /** POSITIONAL word n-gram hashes: one long per token position
    * (output index k = the n-gram starting at 1-based token k+1), in
    * document order, duplicates kept — the span-census/-scrub/
    * -decontamination key stream, where [[textShingles]]'s
    * sorted-distinct contract would lose positions and multiplicity.
    *
    * Token hashes (FNV-1a/64) are computed ONCE per token, then each
    * window key is an order-sensitive polynomial combination updated in
    * O(1) per position (slide: subtract the departing token's term,
    * multiply, add the entering token's), finished with a murmur fmix64
    * avalanche so join/shuffle bucketing sees well-spread keys. Replaces
    * the transform(sequence) → slice → array_join → md5/xxhash64 chain
    * whose per-position n-token STRING build dominated the three span
    * queries' scan stage. Texts shorter than n tokens yield an empty
    * array (the callers' `when(size(t) >= n, …)` guard, folded in). */
  def ngramHashes(text: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    val toks = splitSpaces(text.toString)
    val m = toks.length
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](m)
    var i = 0
    while (i < m) { th(i) = SimHash.fnv1a64(toks(i)); i += 1 }
    val P = 0x9E3779B97F4A7C15L // odd golden-ratio multiplier, mod 2^64
    var pn = 1L // P^(n-1), the departing token's positional weight
    i = 0
    while (i < n - 1) { pn *= P; i += 1 }
    val out = new Array[Long](m - n + 1)
    var h = 0L
    i = 0
    while (i < n) { h = h * P + th(i); i += 1 }
    out(0) = fmix64(h)
    i = 1
    while (i <= m - n) {
      h = (h - th(i - 1) * pn) * P + th(i + n - 1)
      out(i) = fmix64(h)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** dot(a, b) over array<float|double> columns → double. */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {
  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dot(a.asInstanceOf[ArrayData], isFloat(left),
      b.asInstanceOf[ArrayData], isFloat(right))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecOps.dot($a, ${isFloat(left)}, $b, ${isFloat(right)})")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ArrayDot = copy(l, r)
}

/** LSH bucket signatures for one vector column. */
case class LshBucketsExpr(child: Expression, tables: Int, bits: Int)
    extends UnaryExpression {
  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    VecOps.lshBuckets(v.asInstanceOf[ArrayData], isFloat, tables, bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VecOps.lshBuckets($c, $isFloat, $tables, $bits)")
  override protected def withNewChildInternal(c: Expression): LshBucketsExpr =
    copy(c)
}

/** MinHash signature for a pre-hashed shingle array column. */
case class MinHashSigExpr(child: Expression, perms: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    VecOps.minhashSig(v.asInstanceOf[ArrayData], perms)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecOps.minhashSig($c, $perms)")
  override protected def withNewChildInternal(c: Expression): MinHashSigExpr =
    copy(c)
}

/** |a ∩ b| for two array<long> columns → long. */
case class IntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.intersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecOps.intersectCount($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): IntersectCountExpr = copy(l, r)
}

/** Content-defined chunk hashes of a text column (see
  * [[VecOps.contentChunks]]). */
case class ContentChunksExpr(child: Expression, mask: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    VecOps.contentChunks(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], mask)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecOps.contentChunks($c, $mask)")
  override protected def withNewChildInternal(c: Expression): ContentChunksExpr =
    copy(c)
}

/** Nearest-centroid assignment against a driver-resolved codebook — the
  * IVF coarse-quantization step as a NARROW expression: the centroid
  * matrix rides to executors as a codegen reference object (the task
  * binary, not a join side), so assignment needs no crossJoin, no
  * window, and above all NO shuffle of the corpus. Children are the
  * vector and its precomputed L2 norm; result is
  * struct(centroid_id LONG, cos DOUBLE). At deployment scale the
  * codebook size K is bounded by what a task binary comfortably carries
  * (64k × 128-d doubles ≈ 64 MB — beyond that, shard the codebook and
  * take an argmax-of-argmax pass). */
case class NearestCentroidExpr(left: Expression, right: Expression,
    ids: Array[Long], cents: Array[Array[Double]], cnorms: Array[Double])
    extends BinaryExpression {
  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def dataType: DataType = StructType(Seq(
    StructField("centroid_id", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = false)))
  override def nullSafeEval(v: Any, n: Any): Any =
    VecOps.nearestCentroid(v.asInstanceOf[ArrayData], isFloat,
      n.asInstanceOf[Double], ids, cents, cnorms)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("centroidIds", ids, "long[]")
    val cRef = ctx.addReferenceObj("centroids", cents, "double[][]")
    val nRef = ctx.addReferenceObj("centroidNorms", cnorms, "double[]")
    defineCodeGen(ctx, ev, (v, n) =>
      s"graft.functions.VecOps.nearestCentroid($v, $isFloat, $n, $idsRef, $cRef, $nRef)")
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): NearestCentroidExpr = copy(left = l, right = r)
}

/** Two-level (hierarchical) nearest-centroid assignment against a
  * driver-resolved CSR codebook (see [[VecOps.nearestCentroid2]]) —
  * the deployment-K assignment kernel: O((S + nprobe·K/S)·D) per
  * vector instead of the flat scan's O(K·D). Codebook arrays ride to
  * executors as codegen reference objects, so assignment stays ONE
  * narrow codegen'd scan with no exchange, exactly like
  * [[NearestCentroidExpr]]. */
case class NearestCentroid2Expr(left: Expression, right: Expression,
    superCents: Array[Array[Double]], superNorms: Array[Double],
    offs: Array[Int], ids: Array[Long], cents: Array[Array[Double]],
    cnorms: Array[Double], nprobe: Int)
    extends BinaryExpression {
  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def dataType: DataType = StructType(Seq(
    StructField("super_id", LongType, nullable = false),
    StructField("centroid_id", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = false)))
  override def nullSafeEval(v: Any, n: Any): Any =
    VecOps.nearestCentroid2(v.asInstanceOf[ArrayData], isFloat,
      n.asInstanceOf[Double], superCents, superNorms, offs, ids, cents,
      cnorms, nprobe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sRef = ctx.addReferenceObj("superCents", superCents, "double[][]")
    val snRef = ctx.addReferenceObj("superNorms", superNorms, "double[]")
    val oRef = ctx.addReferenceObj("childOffs", offs, "int[]")
    val idsRef = ctx.addReferenceObj("childIds", ids, "long[]")
    val cRef = ctx.addReferenceObj("childCents", cents, "double[][]")
    val nRef = ctx.addReferenceObj("childNorms", cnorms, "double[]")
    defineCodeGen(ctx, ev, (v, n) =>
      s"graft.functions.VecOps.nearestCentroid2($v, $isFloat, $n, " +
        s"$sRef, $snRef, $oRef, $idsRef, $cRef, $nRef, $nprobe)")
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): NearestCentroid2Expr =
    copy(left = l, right = r)
}

/** Product-quantization codes of a vector column against driver-resolved
  * per-subspace sub-codebooks → array<long> of M sub-centroid indices.
  * Like [[NearestCentroidExpr]], the codebooks ride to executors as a
  * codegen reference object, so encoding is a NARROW scan — the
  * index-build pass of a PQ/IVF-PQ ANN index costs one corpus read. */
case class PqEncodeExpr(child: Expression,
    cents: Array[Array[Array[Double]]]) extends UnaryExpression {
  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    VecOps.pqEncode(v.asInstanceOf[ArrayData], isFloat, cents)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("pqCents", cents, "double[][][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VecOps.pqEncode($c, $isFloat, $cRef)")
  }
  override protected def withNewChildInternal(c: Expression): PqEncodeExpr =
    copy(child = c)
}

/** ADC squared-L2 distance between a raw query vector column and a PQ
  * code column (see [[VecOps.pqAdc]]) → double. */
case class PqAdcExpr(left: Expression, right: Expression,
    cents: Array[Array[Array[Double]]]) extends BinaryExpression {
  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def dataType: DataType = DoubleType
  override def nullSafeEval(q: Any, codes: Any): Any =
    VecOps.pqAdc(q.asInstanceOf[ArrayData], isFloat,
      codes.asInstanceOf[ArrayData], cents)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("pqCents", cents, "double[][][]")
    defineCodeGen(ctx, ev, (q, c) =>
      s"graft.functions.VecOps.pqAdc($q, $isFloat, $c, $cRef)")
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PqAdcExpr = copy(left = l, right = r)
}

/** Scalar-quantization reconstruction stats of a vector column →
  * struct(lo, hi, max_err, mse), all double (see [[VecOps.quantErr]]). */
case class QuantErrExpr(child: Expression, levels: Int)
    extends UnaryExpression {
  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def dataType: DataType = StructType(Seq(
    StructField("lo", DoubleType, nullable = false),
    StructField("hi", DoubleType, nullable = false),
    StructField("max_err", DoubleType, nullable = false),
    StructField("mse", DoubleType, nullable = false)))
  override def nullSafeEval(v: Any): Any =
    VecOps.quantErr(v.asInstanceOf[ArrayData], isFloat, levels)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VecOps.quantErr($c, $isFloat, $levels)")
  override protected def withNewChildInternal(c: Expression): QuantErrExpr =
    copy(c)
}

/** Per-document token-repetition stats of a text column →
  * struct(n_tokens, n_distinct_tokens, top_cnt), all long (see
  * [[VecOps.repetitionStats]]). */
case class RepetitionStatsExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct_tokens", LongType, nullable = false),
    StructField("top_cnt", LongType, nullable = false)))
  override def nullSafeEval(v: Any): Any =
    VecOps.repetitionStats(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecOps.repetitionStats($c)")
  override protected def withNewChildInternal(c: Expression): RepetitionStatsExpr =
    copy(c)
}

/** Positional (ordered, duplicates kept) hashed word n-grams of a text
  * column — see [[VecOps.ngramHashes]]. */
case class NgramHashesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    VecOps.ngramHashes(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecOps.ngramHashes($c, $n)")
  override protected def withNewChildInternal(c: Expression): NgramHashesExpr =
    copy(c)
}

/** Winnowing fingerprint set of a text column — see
  * [[VecOps.winnowFps]]. */
case class WinnowFpsExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    VecOps.winnowFps(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecOps.winnowFps($c, $k, $w)")
  override protected def withNewChildInternal(c: Expression): WinnowFpsExpr =
    copy(c)
}

/** Band keys from an existing minhash signature column. */
case class BandKeysExpr(child: Expression, bands: Int, rows: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    VecOps.bandKeys(v.asInstanceOf[ArrayData], bands, rows)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecOps.bandKeys($c, $bands, $rows)")
  override protected def withNewChildInternal(c: Expression): BandKeysExpr =
    copy(c)
}

/** Fused shingles→minhash→band-keys kernel (see [[VecOps.minhashBandKeys]]). */
case class MinHashBandKeysExpr(child: Expression, perms: Int, bands: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    VecOps.minhashBandKeys(v.asInstanceOf[ArrayData], perms, bands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VecOps.minhashBandKeys($c, $perms, $bands)")
  override protected def withNewChildInternal(c: Expression): MinHashBandKeysExpr =
    copy(c)
}

/** Sorted-distinct hashed word n-gram shingles of a text column. */
case class TextShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    VecOps.textShingles(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecOps.textShingles($c, $n)")
  override protected def withNewChildInternal(c: Expression): TextShinglesExpr =
    copy(c)
}

/** Column-level wrappers. */
object VectorExpressions {
  def array_dot(a: Column, b: Column): Column =
    GraftShims.column(ArrayDot(GraftShims.toExpression(a),
      GraftShims.toExpression(b)))
  def lsh_buckets(v: Column, tables: Int, bits: Int): Column =
    GraftShims.column(LshBucketsExpr(GraftShims.toExpression(v), tables, bits))
  def minhash_sig(sh: Column, perms: Int): Column =
    GraftShims.column(MinHashSigExpr(GraftShims.toExpression(sh), perms))
  def band_keys(sig: Column, bands: Int, rows: Int): Column =
    GraftShims.column(BandKeysExpr(GraftShims.toExpression(sig), bands, rows))
  def minhash_band_keys(sh: Column, perms: Int, bands: Int): Column =
    GraftShims.column(MinHashBandKeysExpr(GraftShims.toExpression(sh), perms,
      bands))
  def intersect_count(a: Column, b: Column): Column =
    GraftShims.column(IntersectCountExpr(GraftShims.toExpression(a),
      GraftShims.toExpression(b)))
  def text_shingles(text: Column, n: Int): Column =
    GraftShims.column(TextShinglesExpr(GraftShims.toExpression(text), n))
  def ngram_hashes(text: Column, n: Int): Column =
    GraftShims.column(NgramHashesExpr(GraftShims.toExpression(text), n))
  def content_chunks(text: Column, maskBits: Int): Column =
    GraftShims.column(ContentChunksExpr(GraftShims.toExpression(text), maskBits))
  def nearest_centroid(v: Column, nrm: Column, ids: Array[Long],
      cents: Array[Array[Double]], cnorms: Array[Double]): Column =
    GraftShims.column(NearestCentroidExpr(GraftShims.toExpression(v),
      GraftShims.toExpression(nrm), ids, cents, cnorms))
  def nearest_centroid2(v: Column, nrm: Column,
      superCents: Array[Array[Double]], superNorms: Array[Double],
      offs: Array[Int], ids: Array[Long], cents: Array[Array[Double]],
      cnorms: Array[Double], nprobe: Int): Column =
    GraftShims.column(NearestCentroid2Expr(GraftShims.toExpression(v),
      GraftShims.toExpression(nrm), superCents, superNorms, offs, ids,
      cents, cnorms, nprobe))
  def quant_err(v: Column, levels: Int): Column =
    GraftShims.column(QuantErrExpr(GraftShims.toExpression(v), levels))
  def pq_encode(v: Column, cents: Array[Array[Array[Double]]]): Column =
    GraftShims.column(PqEncodeExpr(GraftShims.toExpression(v), cents))
  def pq_adc(q: Column, codes: Column,
      cents: Array[Array[Array[Double]]]): Column =
    GraftShims.column(PqAdcExpr(GraftShims.toExpression(q),
      GraftShims.toExpression(codes), cents))
  def repetition_stats(text: Column): Column =
    GraftShims.column(RepetitionStatsExpr(GraftShims.toExpression(text)))
  def winnow_fps(text: Column, k: Int, w: Int): Column =
    GraftShims.column(WinnowFpsExpr(GraftShims.toExpression(text), k, w))
}
