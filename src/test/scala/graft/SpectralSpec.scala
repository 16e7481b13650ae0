package graft

import graft.operators.Spectral

/** Pins the spectral operators' MATH, independent of the DuckDB gate:
  * the fixed-point power iteration must actually find the dominant
  * eigendirection (the gate only proves both engines run the same
  * arithmetic), and the projection must satisfy the exact energy
  * identity that ties it to the Rayleigh numerator. */
class SpectralSpec extends SparkSpecBase {

  private def collectGram(): (Array[Array[Double]], Int) = {
    val tri = Spectral.gramMatrix(spark, sfDir).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2)))
    val dims = tri.map(_._2).max + 1
    val g = Array.ofDim[Double](dims, dims)
    tri.foreach { case (i, j, v) => g(i)(j) = v.toDouble; g(j)(i) = v.toDouble }
    (g, dims)
  }

  /** Double-precision power iteration with true normalization — the
    * reference eigensolver the fixed-point loop is checked against. */
  private def topEig(g: Array[Array[Double]], dims: Int): Double = {
    var v = Array.fill(dims)(1.0)
    for (_ <- 1 to 300) {
      val u = Array.tabulate(dims)(i =>
        (0 until dims).map(j => g(i)(j) * v(j)).sum)
      val n = math.sqrt(u.map(x => x * x).sum)
      v = u.map(_ / n)
    }
    val u = Array.tabulate(dims)(i =>
      (0 until dims).map(j => g(i)(j) * v(j)).sum)
    v.indices.map(i => v(i) * u(i)).sum
  }

  test("gram matrix is symmetric PSD on the diagonal and upper-triangular") {
    val rows = Spectral.gramMatrix(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // only j >= i emitted; diagonal entries are sums of squares
    assert(rows.forall(r => r.getLong(1) >= r.getLong(0)))
    assert(rows.filter(r => r.getLong(0) == r.getLong(1))
      .forall(_.getLong(2) >= 0L))
  }

  test("fixed-point Rayleigh quotient reaches the true top eigenvalue") {
    val (g, dims) = collectGram()
    val lamTrue = topEig(g, dims)
    val lamFixed = Spectral.pcaPower(spark, sfDir)
      .select("lam").head().getDouble(0)
    // integer truncation costs a little; the dominant direction must
    // still carry ≥ 99% of the true top eigenvalue, and never exceed it
    assert(lamFixed <= lamTrue * (1 + 1e-9), s"$lamFixed > $lamTrue")
    assert(lamFixed >= lamTrue * 0.99, s"$lamFixed << $lamTrue")
    // and it must beat the average eigenvalue (= trace/D) decisively —
    // a non-converged direction would sit near trace/D
    val trace = (0 until dims).map(i => g(i)(i)).sum
    assert(lamFixed > trace / dims, s"$lamFixed vs avg ${trace / dims}")
  }

  test("power loop fails loudly past the 64-bit output range, never wraps") {
    // a planted Gram whose top eigenvalue pushes v'Gv beyond Long.Max:
    // the loop must throw the documented guard, not return wrapped junk
    val huge = Array((0, 0, 4000000000000000000L), (0, 1, 0L), (1, 1, 1L))
    val e = intercept[IllegalArgumentException] {
      Spectral.powerLoop(huge, 2)
    }
    assert(e.getMessage.contains("deterministic sample"), e.getMessage)
  }

  test("projection energy equals the Rayleigh numerator exactly") {
    // Σ_docs proj² = v'Gv — EXACT in integers, no tolerance: proj_d is
    // the quantized dot x_d·v and G = Σ_d x_d x_d', so equality is an
    // algebraic identity any arithmetic drift would break
    val projs = Spectral.pcaProject(spark, sfDir).collect()
      .map(_.getLong(1))
    val energy = projs.map(p => BigInt(p) * BigInt(p)).sum
    val power = Spectral.pcaPower(spark, sfDir).collect()
    val lam = power.head.getDouble(2)
    val den = power.map(r => BigInt(r.getLong(1)) * BigInt(r.getLong(1))).sum
    // lam = num/den as one IEEE division; recover num and compare
    val num = BigDecimal(lam) * BigDecimal(den)
    assert((BigDecimal(energy) - num).abs / BigDecimal(energy) < 1e-12,
      s"energy $energy vs num $num")
  }

  test("sample-fit projection: cap=256 is the identity, cap=26 projects all") {
    import spark.implicits._
    // bucket < 256 keeps every vector, so the sample-fit path must be
    // BIT-IDENTICAL to the direct fit — pins the plumbing end-to-end
    val direct = Spectral.pcaProject(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    val full = Spectral.pcaProjectSampledCap(spark, sfDir, 256)
      .as[(Long, Long)].collect().toMap
    assert(full === direct)
    // the real 10% rule: fit shrinks, the PROJECTION still covers the
    // whole corpus, and values are exact dot products with the sampled
    // direction (re-derived through the same public pieces)
    val sampled = Spectral.pcaProjectSampledCap(spark, sfDir, 26)
      .as[(Long, Long)].collect().toMap
    assert(sampled.keySet === direct.keySet)
    // a 10% fit on the fixture corpus must still produce a nonzero
    // direction — all-zero projections would mean the sample missed
    assert(sampled.values.exists(_ != 0L))
  }

  test("label affinity matches a brute-force quantized-centroid recount") {
    import spark.implicits._
    val got = Spectral.labelAffinity(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r).toMap
    // brute force: quantize, sum per (label, dim), exact BigInt cosine²
    val rows = graft.ops.Tables.embeddings(spark, sfDir)
      .select($"label", $"embedding").as[(Int, Array[Float])].collect()
    val sums = rows.groupBy(_._1).map { case (l, vs) =>
      val dim = vs.head._2.length
      val s = Array.fill(dim)(BigInt(0))
      vs.foreach { case (_, e) =>
        var i = 0
        while (i < dim) {
          s(i) += BigInt(math.floor(e(i).toDouble * 1024).toLong); i += 1
        }
      }
      l -> (s, vs.length.toLong)
    }
    val labels = sums.keys.toSeq.sorted
    var pairs = 0
    for (a <- labels; b <- labels if a < b) {
      val (sa, na) = sums(a); val (sb, nb) = sums(b)
      val dot = sa.zip(sb).map { case (x, y) => x * y }.sum
      val sqa = sa.map(x => x * x).sum
      val sqb = sb.map(x => x * x).sum
      val want = (dot * dot * 1000000) / (sqa * sqb)
      val r = got((a, b))
      assert(r.getAs[Long]("cos2_ppm") === want.toLong, s"($a,$b)")
      assert(r.getAs[Long]("dot_sign") === dot.signum.toLong, s"($a,$b)")
      assert(r.getAs[Long]("n_a") === na && r.getAs[Long]("n_b") === nb)
      pairs += 1
    }
    assert(got.size === pairs) // exactly the a<b pairs, nothing else
  }
}
