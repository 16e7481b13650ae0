package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.VecOps

/** ScalaCheck properties over the native kernels (pure JVM — no Spark
  * session needed, so these run in milliseconds). */
class VecOpsPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(r.passed, r.status.toString)
  }

  private def arr(xs: Seq[Long]) = new GenericArrayData(xs.toArray)

  private val sortedDistinct: Gen[Seq[Long]] =
    Gen.listOf(Gen.chooseNum(-1000L, 1000L)).map(_.distinct.sorted)

  test("intersectCount: commutative, bounded, exact vs sets") {
    check(Prop.forAll(sortedDistinct, sortedDistinct) { (a, b) =>
      val n = VecOps.intersectCount(arr(a), arr(b))
      n == VecOps.intersectCount(arr(b), arr(a)) &&
        n == a.toSet.intersect(b.toSet).size.toLong &&
        n <= math.min(a.size, b.size)
    })
  }

  test("minhashSig: signature agreement grows with set overlap") {
    check(Prop.forAll(sortedDistinct.suchThat(_.size >= 4)) { a =>
      val sig = VecOps.minhashSig(arr(a), 64)
      val same = VecOps.minhashSig(arr(a), 64)
      (0 until 64).forall(i => sig.getLong(i) == same.getLong(i)) && {
        // a subset's minima are >= the superset's (min over fewer values)
        val sub = a.drop(a.size / 2)
        val subSig = VecOps.minhashSig(arr(sub), 64)
        (0 until 64).forall(i => subSig.getLong(i) >= sig.getLong(i))
      }
    })
  }

  test("textShingles: sorted, distinct, count bounded by token count") {
    val words = Gen.nonEmptyListOf(Gen.identifier.map(_.take(6)))
    check(Prop.forAll(words) { ws =>
      val out = VecOps.textShingles(UTF8String.fromString(ws.mkString(" ")), 3)
      val xs = (0 until out.numElements()).map(out.getLong)
      xs == xs.sorted && xs.distinct.size == xs.size &&
        xs.size <= math.max(ws.size - 2, 1)
    })
  }

  test("ngramHashes: positional count, window identity, rolling == direct") {
    val words = Gen.nonEmptyListOf(Gen.identifier.map(_.take(6)))
    check(Prop.forAll(words, Gen.chooseNum(2, 8)) { (ws, n) =>
      val out = VecOps.ngramHashes(UTF8String.fromString(ws.mkString(" ")), n)
      val xs = (0 until out.numElements()).map(out.getLong)
      // one key per window position, empty when the doc is shorter than n
      xs.size == math.max(ws.size - n + 1, 0) &&
        // the key at position i is a pure function of the n-token window:
        // recomputing each window as its own n-token document (direct
        // O(n) evaluation, no rolling slide) must reproduce the key — the
        // rolling-update/direct-evaluation agreement that makes equal
        // windows collide exactly, wherever they appear
        xs.zipWithIndex.forall { case (h, i) =>
          val solo = VecOps.ngramHashes(
            UTF8String.fromString(ws.slice(i, i + n).mkString(" ")), n)
          solo.numElements() == 1 && solo.getLong(0) == h
        }
    })
  }

  test("ngramHashes: empty-token and order sensitivity pins") {
    // split-on-space semantics: consecutive spaces yield empty tokens,
    // matching Spark's split(text, ' ') and DuckDB's string_split — the
    // alignment the span-scrub position arithmetic relies on
    val a = VecOps.ngramHashes(UTF8String.fromString("a  b c"), 2) // a,'',b,c
    assert(a.numElements() == 3)
    // order-sensitive: "a b" != "b a"
    val ab = VecOps.ngramHashes(UTF8String.fromString("a b"), 2)
    val ba = VecOps.ngramHashes(UTF8String.fromString("b a"), 2)
    assert(ab.getLong(0) != ba.getLong(0))
    // distinct windows hash apart on a planted repeat: in "x y x y x",
    // windows (x y) at 1 and 3 collide; (y x) differs
    val r = VecOps.ngramHashes(UTF8String.fromString("x y x y x"), 2)
    assert(r.getLong(0) == r.getLong(2) && r.getLong(1) == r.getLong(3)
      && r.getLong(0) != r.getLong(1))
  }

  test("signTable: a cached shape keeps its table when the cache cap is reached") {
    // the cap gates NEW insertions only: fill the cache past its 64-shape
    // cap with tiny shapes, then confirm (a) an already-cached shape still
    // returns its table (no silent fallback to per-row signAt — the r4
    // review bug), (b) a genuinely new shape is refused, (c) refusal does
    // not corrupt the cached entries. Shapes here use dim >= 10001, far
    // from any real lsh_buckets call (dim = embedding width, 64), so
    // filling the JVM-wide cache never degrades the real queries' shape.
    val first = VecOps.signTable(1, 1, 10001)
    assert(first != null)
    var i = 0
    while (i < 70) { VecOps.signTable(1, 1, 10002 + i); i += 1 }
    // (a) the first shape, cached before the cap was hit, still serves
    val again = VecOps.signTable(1, 1, 10001)
    assert(again != null)
    assert(again eq first) // the same memoized array, not a recompute
    // (b) a brand-new shape past the cap is refused (caller falls back)
    assert(VecOps.signTable(1, 2, 10001) == null)
    // (c) and the refusal leaves cached entries untouched
    assert(VecOps.signTable(1, 1, 10001) eq first)
  }

  test("dot: linear in a scalar (exactness of the double fold)") {
    val vecs = Gen.nonEmptyListOf(Gen.chooseNum(-10.0, 10.0))
    check(Prop.forAll(vecs) { v =>
      val a = new GenericArrayData(v.toArray)
      val zeros = new GenericArrayData(Array.fill(v.size)(0.0))
      VecOps.dot(a, false, zeros, false) == 0.0 &&
        VecOps.dot(a, false, a, false) >= 0.0
    })
  }

  test("winnowFps: SIGMOD'03 guarantee holds under random padding") {
    // any two docs sharing a contiguous run of K+W-1 = 7 tokens share
    // at least one fingerprint, whatever surrounds the run; docs over
    // disjoint alphabets share none
    def fps(tokens: Seq[String]): Set[String] = {
      val a = VecOps.winnowFps(UTF8String.fromString(tokens.mkString(" ")), 4, 4)
      (0 until a.numElements()).map(i => a.getUTF8String(i).toString).toSet
    }
    val run = (1 to 7).map(i => s"r$i")
    def pad(prefix: String): Gen[Seq[String]] =
      Gen.chooseNum(0, 25).map(n => (1 to n).map(i => s"$prefix$i"))
    check(Prop.forAll(pad("a"), pad("x"), pad("b"), pad("y")) {
      (pa, sa, pb, sb) =>
        val fa = fps(pa ++ run ++ sa)
        val fb = fps(pb ++ run ++ sb)
        val fc = fps(if (pb.isEmpty) Seq("c0") else pb.map("c" + _))
        (fa & fb).nonEmpty && (fa & fc).isEmpty && fa.nonEmpty
    })
  }

  test("contentChunks: deterministic and chunk set non-empty on non-empty input") {
    val texts = Gen.nonEmptyListOf(Gen.identifier).map(_.mkString(" "))
    check(Prop.forAll(texts) { t =>
      val u = UTF8String.fromString(t)
      val a = VecOps.contentChunks(u, 5)
      val b = VecOps.contentChunks(u, 5)
      a.numElements() > 0 && a.numElements() == b.numElements() &&
        (0 until a.numElements()).forall(i => a.getLong(i) == b.getLong(i))
    })
  }

  test("ImageCodec: PNG round-trip is pixel-exact for arbitrary doc ids") {
    import graft.operators.Multimodal.ImageCodec
    check(Prop.forAll(Gen.chooseNum(0L, Long.MaxValue / 1024)) { id =>
      val img = ImageCodec.decode(ImageCodec.makePng(id))
      val w = (16 + id % 17).toInt
      val h = (16 + id % 13).toInt
      img.getWidth == w && img.getHeight == h &&
        (0 until h).forall { y =>
          (0 until w).forall { x =>
            val base = id * 31L + x * 7L + y * 13L
            (img.getRGB(x, y) & 0xffffff) ==
              ((((base % 256) << 16) | (((base + 85) % 256) << 8) |
                ((base + 170) % 256)).toInt)
          }
        }
    })
  }

  test("AudioCodec: WAV round-trip is sample-exact for arbitrary doc ids") {
    import graft.operators.Multimodal.AudioCodec
    check(Prop.forAll(Gen.chooseNum(0L, Long.MaxValue / 1024)) { id =>
      val (rate, samp) = AudioCodec.decodeSamples(AudioCodec.makeWav(id))
      rate == 8000L && samp.length == AudioCodec.sampleCount(id) &&
        samp.indices.forall { i =>
          samp(i) == (((id * 7L + i * 11L) % 65536L) - 32768L).toInt
        }
    })
  }

  test("nearestCentroid2 at nprobe=S is EXACTLY the flat kernel; " +
    "smaller nprobe still returns a child of a probed super") {
    // deterministic pseudo-random geometry: K children over S supers in
    // CSR (children grouped by nearest super, ids ascending per group),
    // probed with vectors of nonzero norm — the exactness contract of
    // the two-level quantizer's scaladoc
    def mix(x: Long): Long = {
      var z = x + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def vecOf(seed: Long, dim: Int): Array[Double] =
      Array.tabulate(dim)(d =>
        (java.lang.Math.floorMod(mix(seed * 53L + d), 2001) - 1000) / 1000.0)
    val gen = for {
      k <- Gen.chooseNum(2, 24)
      s <- Gen.chooseNum(1, 6).map(math.min(_, k))
      dim <- Gen.chooseNum(2, 8)
      seed <- Gen.chooseNum(0L, 1000000L)
      nprobe <- Gen.chooseNum(1, 6)
    } yield (k, s, dim, seed, nprobe)
    check(Prop.forAll(gen) { case (k, s, dim, seed, nprobe) =>
      def l2(a: Array[Double]) = math.sqrt(a.map(x => x * x).sum)
      val cents0 = Array.tabulate(k)(j => vecOf(seed + j, dim))
      val norms0 = cents0.map(l2)
      val ids0 = (0L until k.toLong).toArray
      // supers = first s children; child -> nearest super (strict tie
      // to lowest super) — mirrors Similarity.twoLevelFrom(refine=0)
      val supC = cents0.take(s)
      val supN = norms0.take(s)
      def cos(a: Array[Double], na: Double, b: Array[Double], nb: Double) =
        a.zip(b).map { case (x, y) => x * y }.sum / (na * nb)
      val asg = (0 until k).map { j =>
        (0 until s).maxBy(i => (cos(cents0(j), norms0(j), supC(i), supN(i)),
          -i))
      }
      val order = (0 until k).sortBy(j => (asg(j), ids0(j))).toArray
      val offs = new Array[Int](s + 1)
      order.foreach(j => offs(asg(j) + 1) += 1)
      (1 to s).foreach(i => offs(i) += offs(i - 1))
      val ids = order.map(ids0)
      val cents = order.map(cents0)
      val norms = order.map(norms0)
      (0 until 5).forall { q =>
        val v = vecOf(seed ^ (q * 7919L), dim)
        val nrm = l2(v)
        (nrm == 0.0) || {
          val va = new GenericArrayData(v)
          val flat = VecOps.nearestCentroid(va, false, nrm,
            ids0, cents0, norms0)
          val full = VecOps.nearestCentroid2(va, false, nrm,
            supC, supN, offs, ids, cents, norms, nprobe = s)
          val part = VecOps.nearestCentroid2(va, false, nrm,
            supC, supN, offs, ids, cents, norms, nprobe = nprobe)
          // nprobe=S: identical child AND cosine to the flat kernel
          full.getLong(1) == flat.getLong(0) &&
            full.getDouble(2) == flat.getDouble(1) &&
            // reported super is the child's own super
            asg(full.getLong(1).toInt) == full.getLong(0).toInt &&
            // any nprobe: winner is a child of its reported super, and
            // cosine never exceeds the exact one
            asg(part.getLong(1).toInt) == part.getLong(0).toInt &&
            part.getDouble(2) <= full.getDouble(2)
        }
      }
    })
  }

  test("VideoCodec: container holds frameCount frames; stride s decodes every s-th") {
    import graft.operators.Multimodal.VideoCodec
    check(Prop.forAll(Gen.chooseNum(0L, Long.MaxValue / 1024),
        Gen.chooseNum(1, 4)) { (id, stride) =>
      val video = VideoCodec.makeVideo(id)
      val n = VideoCodec.frameCount(id)
      val sampled = VideoCodec.decodeStrided(video, stride)
      sampled.map(_._1) == (0 until n by stride).toSeq &&
        sampled.forall { case (f, img) =>
          img.getWidth == (16 + ((id + f) % 9)).toInt &&
            img.getHeight == (16 + ((id + f) % 7)).toInt
        }
    })
  }
}
