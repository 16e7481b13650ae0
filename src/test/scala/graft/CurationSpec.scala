package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation

class CurationSpec extends SparkSpecBase {

  test("ingest drift: shares sum to one per side, gap identity holds") {
    import spark.implicits._
    val rows = graft.operators.Curation.ingestDrift(spark, sfDir)
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    // every document lands in exactly one bucket on exactly one side
    val total = graft.ops.Tables.documents(spark, sfDir).count()
    assert(rows.map(r => r._2 + r._3).sum === total)
    // shares are a probability distribution per side
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-9)
    assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-9)
    rows.foreach { r =>
      assert(math.abs(r._6 - math.abs(r._4 - r._5)) < 1e-12, r.toString) }
  }

  test("redactPii: exact redaction + count pins on crafted strings") {
    import spark.implicits._
    val rows = Seq(
      // email, phone, ip all present
      ("a", "write bob.smith+x@mail-host.org or 555-0142 from 10.0.0.1 ok"),
      // nothing to redact, string unchanged
      ("b", "plain prose with no contact details at all"),
      // two emails; dots in local parts must not leak into <IP> matches
      ("c", "cc x.y@z.io and w_q%r@a.b.co now"))
      .toDF("id", "t")
    val out = rows
      .select($"id", Curation.redactPii($"t").as("red"))
      .orderBy($"id").as[(String, String)].collect()
    assert(out(0)._2 === "write <EMAIL> or <PHONE> from <IP> ok")
    assert(out(1)._2 === "plain prose with no contact details at all")
    assert(out(2)._2 === "cc <EMAIL> and <EMAIL> now")
  }

  test("piiRedact gate: every planted contact block is found") {
    import spark.implicits._
    val df = Curation.piiRedact(spark, sfDir)
    val bad = df.where($"n_emails" < 1 || $"n_phones" < 1 || $"n_ips" < 1)
    assert(bad.count() === 0)
  }

  test("mixtureSample: quotas respected, proportional to weight, exact ints") {
    import spark.implicits._
    val df = Curation.mixtureSample(spark, sfDir).cache()
    val rows = df.as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, w, quota, nDocs, nKept, keptTok) =>
      assert(keptTok <= quota, s"$src overfilled: $keptTok > $quota")
      assert(nKept <= nDocs)
      assert(w >= 1L && w <= 3L)
    }
    // quota strictly monotone in weight (same corpus, same budget)
    val byW = rows.groupBy(_._2).map { case (w, rs) => w -> rs.head._3 }
    assert(byW(1L) < byW(2L) && byW(2L) < byW(3L))
    df.unpersist()
  }

  test("mixtureSample: deterministic across invocations") {
    val a = Curation.mixtureSample(spark, sfDir).collect().toSeq
    val b = Curation.mixtureSample(spark, sfDir).collect().toSeq
    assert(a === b)
  }

  test("globalShuffle: pos is a permutation, split is exact 80/10/10") {
    import spark.implicits._
    val df = Curation.globalShuffle(spark, sfDir).cache()
    val n = df.count()
    val pos = df.select($"pos").as[Long].collect().sorted
    assert(pos.toSeq === (1L to n).toSeq) // dense, unique, 1-based
    val splits = df.groupBy($"split").count().as[(String, Long)]
      .collect().toMap
    assert(splits("train") === n * 8 / 10)
    assert(splits("train") + splits("val") === n * 9 / 10)
    assert(splits.values.sum === n)
    df.unpersist()
  }

  test("qualityCalibrate: the floor is per-language, not global") {
    import spark.implicits._
    val df = Curation.qualityCalibrate(spark, sfDir)
      .select($"lang", $"pctl", $"keep")
      .as[(String, Double, Boolean)].collect()
    df.groupBy(_._1).foreach { case (lang, rows) =>
      // keep is exactly the pctl >= 0.2 rule, applied within the language
      rows.foreach { case (_, p, k) => assert(k === (p >= 0.2), lang) }
      // every language keeps its own top ~80% — a global threshold would
      // skew drops toward the structurally-lower-scoring languages
      val kept = rows.count(_._3).toDouble / rows.length
      assert(kept >= 0.75 && kept <= 0.9, s"$lang kept=$kept")
      // percentiles span [0, 1] within each language independently
      assert(rows.map(_._2).min === 0.0)
      assert(math.abs(rows.map(_._2).max - 1.0) < 1e-12)
    }
  }

  test("globalShuffle: positions are partitioning-invariant") {
    // the global rank must not depend on how many range partitions the
    // cluster happens to use — 3 partitions and 32 must agree exactly
    val a = Curation.globalShuffle(spark, sfDir, parts = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val b = Curation.globalShuffle(spark, sfDir, parts = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(a.toSeq === b.toSeq)
  }

  test("sourceCap: exact cap per source, deterministic keep set") {
    val rows = Curation.sourceCap(spark, sfDir, cap = 15).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getBoolean(3)))
    // every source keeps at most 15, and keep ≡ rank <= cap row-by-row
    val bySrc = rows.groupBy(_._2)
    bySrc.foreach { case (src, rs) =>
      assert(rs.count(_._4) === math.min(15, rs.length), src)
      // ranks within a source are exactly 1..n (a total order, no ties)
      assert(rs.map(_._3).sorted.toSeq === (1L to rs.length).toSeq, src)
    }
    assert(rows.forall(r => r._4 === (r._3 <= 15)))
    // md5-rank selection is a pure function of doc_id: a re-run keeps
    // the identical rows (the engine-reproducibility contract)
    val again = Curation.sourceCap(spark, sfDir, cap = 15).collect()
      .map(r => (r.getLong(0), r.getBoolean(3)))
    assert(rows.map(r => (r._1, r._4)).toSeq === again.toSeq)
  }

  test("source concentration: Lorenz profile is monotone and lands on 100%") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = Curation.sourceConcentration(spark, sfDir).collect()
    // ranks are 1..n in emitted order; contributions sorted descending
    assert(rows.map(_.getAs[Long]("rank")).toSeq ===
      (1L to rows.length.toLong).toSeq)
    val toks = rows.map(_.getAs[Long]("n_tokens"))
    assert(toks.zip(toks.tail).forall { case (a, b) => a >= b })
    // cumulative column really accumulates, and the last share is
    // exactly total/total (floor ppm = 1000000)
    val cums = rows.map(_.getAs[Long]("cum_tokens"))
    assert(cums.toSeq === toks.scanLeft(0L)(_ + _).tail.toSeq)
    assert(rows.last.getAs[Long]("cum_share_ppm") === 1000000L)
    // reconciles with the corpus-wide token total
    val total = graft.ops.Tables.documents(spark, sfDir)
      .select(sum(when(length(trim($"text")) === 0, 0L)
        .otherwise((length($"text") -
          length(regexp_replace($"text", " ", ""))).cast("long") + 1L)))
      .head.getLong(0)
    assert(cums.last === total)
  }

  test("effectiveMix: weights shift toward less-duplicated sources, ppm identities hold") {
    import spark.implicits._
    val rows = Curation.effectiveMix(spark, sfDir).collect()
    def l(r: org.apache.spark.sql.Row, c: String) = r.getAs[Long](c)
    for (c <- Seq("w_raw_ppm", "w_eff_ppm")) {
      val s = rows.map(l(_, c)).sum
      assert(s <= 1000000L && s > 1000000L - rows.length, s"$c sum=$s")
    }
    rows.foreach { r =>
      assert(l(r, "effective_tokens") <= l(r, "n_tokens"))
      assert(l(r, "shift_ppm") === l(r, "w_eff_ppm") - l(r, "w_raw_ppm"))
    }
    // shifts are zero-sum up to flooring, and a source with dups loses
    // relative to a dup-free source of equal size (direction check:
    // max-dup source's shift <= min-dup source's shift)
    val byDup = rows.sortBy(r => l(r, "n_tokens") - l(r, "effective_tokens"))
    if (byDup.length > 1 &&
        l(byDup.last, "n_tokens") - l(byDup.last, "effective_tokens") > 0)
      assert(l(byDup.last, "shift_ppm") <= l(byDup.head, "shift_ppm") + 1)
  }

  test("releaseCorpus: manifests reconcile with verdicts and splits never leak") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-release").toString
    val manifest = Curation.releaseCorpus(spark, sfDir, dir, shards = 2)
      .collect()
    // manifest total = curated keep count
    val kept = graft.operators.TextOps.curateCorpus(spark, sfDir)
      .where($"verdict" === "kept").count()
    assert(manifest.map(_.getAs[Long]("n_rows")).sum === kept)
    assert(manifest.map(_.getAs[String]("split")).toSet.subsetOf(
      Set("train", "val", "test")))
    // what landed on disk carries no cross-split near-dup family:
    // recompute cluster labels and check released docs' splits
    val released = Seq("train", "val", "test").flatMap { sp =>
      val p = new java.io.File(s"$dir/$sp")
      if (p.exists)
        spark.read.parquet(s"$dir/$sp").select($"doc_id")
          .as[Long].collect().map(_ -> sp)
      else Seq.empty
    }.toMap
    assert(released.size.toLong === kept)
    val labels = graft.operators.NearDup.dedupClusters(spark, sfDir)
      .as[(Long, Long)].collect()
    labels.groupBy(_._2).foreach { case (cl, ms) =>
      val splits = ms.flatMap(m => released.get(m._1)).distinct
      assert(splits.length <= 1, s"cluster $cl released into $splits")
    }
  }

  test("snapshot diff matches a single-node recount of the derived recrawl") {
    import spark.implicits._
    val docs = graft.ops.Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", $"text")
      .as[(Long, String, String)].collect()
    def tok(t: String): Long =
      if (t.trim.isEmpty) 0L else t.count(_ == ' ').toLong + 1L
    // reference recount: same derivation rules, plain Scala
    val expected = scala.collection.mutable.Map
      .empty[(String, String), (Long, Long)].withDefaultValue((0L, 0L))
    def bump(src: String, st: String, dt: Long): Unit = {
      val (n, d) = expected((src, st))
      expected((src, st)) = (n + 1, d + dt)
    }
    docs.foreach { case (id, src, text) =>
      if (id % 7 == 3) bump(src, "removed", -tok(text))
      else if (id % 5 == 0) bump(src, "modified", 1L) // " rev2" adds 1 token
      else bump(src, "unchanged", 0L)
      if (id % 11 == 0) bump(src, "added", tok(text) + 1L) // " new"
    }
    val got = Curation.snapshotDiff(spark, sfDir)
      .as[(String, String, Long, Long)].collect()
      .map { case (src, st, n, dt) => (src, st) -> (n, dt) }.toMap
    assert(got === expected.toMap)
  }

  test("mix schedule: WFQ finish tags interleave sources in weight proportion") {
    import spark.implicits._
    val rows = Curation.mixSchedule(spark, sfDir)
      .as[(Long, String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // finish-tag identity, rowwise
    rows.foreach { case (_, _, r, w, vt) =>
      assert(vt === r * 1000000000L / w)
    }
    // per-source ranks are 1..n_s with no gaps
    rows.groupBy(_._2).foreach { case (src, rs) =>
      assert(rs.map(_._3).sorted.toSeq === (1L to rs.length.toLong).toSeq,
        s"ranks of $src")
    }
    // WFQ prefix law: floor(r*1e9/w) <= T iff r <= floor(((T+1)*w-1)/1e9),
    // so a vt<=T prefix holds exactly min(n_s, that bound) docs of s —
    // the schedule tracks the weights from the first batch on
    val bySrc = rows.groupBy(_._2)
    val allVt = rows.map(_._5).sorted
    for (t <- Seq(allVt(rows.length / 4), allVt(rows.length / 2),
        allVt(rows.length - 1))) {
      bySrc.foreach { case (src, rs) =>
        val w = rs.head._4
        val got = rs.count(_._5 <= t).toLong
        val want =
          math.min(rs.length.toLong, ((t + 1L) * w - 1L) / 1000000000L)
        assert(got === want, s"prefix vt<=$t source $src")
      }
    }
  }

  test("temperature plan: exact-integer invariants and flattening direction") {
    import spark.implicits._
    val rows = Curation.temperaturePlan(spark, sfDir).collect()
    assert(rows.length > 1)
    def l(r: org.apache.spark.sql.Row, c: String) = r.getAs[Long](c)
    // floor-ppm shares each sum to at most 1e6, and to within one ulp
    // per source of it
    for (c <- Seq("w_uni_ppm", "w_temp_ppm")) {
      val s = rows.map(l(_, c)).sum
      assert(s <= 1000000L && s > 1000000L - rows.length, s"$c sum=$s")
    }
    rows.foreach { r =>
      assert(l(r, "isqrt") ===
        math.floor(math.sqrt(l(r, "n_tokens").toDouble)).toLong)
      assert(l(r, "capped_tokens") <= l(r, "alloc_tokens"))
      assert(l(r, "capped_tokens") <= 4L * l(r, "n_tokens"))
      assert(l(r, "epochs_ppm") <= 4000000L)
      assert(l(r, "shortfall") ===
        l(r, "alloc_tokens") - l(r, "capped_tokens"))
    }
    // sqrt flattening: the largest source loses share, the smallest gains
    val big = rows.maxBy(l(_, "n_tokens"))
    val small = rows.minBy(l(_, "n_tokens"))
    assert(l(big, "w_temp_ppm") <= l(big, "w_uni_ppm"))
    assert(l(small, "w_temp_ppm") >= l(small, "w_uni_ppm"))
  }
}
