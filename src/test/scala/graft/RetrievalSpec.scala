package graft

import graft.operators.Retrieval

class RetrievalSpec extends SparkSpecBase {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("hybrid top-k: RRF score is the exact sum of per-system reciprocal ranks") {
    import spark.implicits._
    val fused = Retrieval.hybridTopK(spark, sfDir).cache()
    assert(!plan(fused).contains("CartesianProduct"), plan(fused))
    val out = fused.as[(Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // recompute both legs' top-5 lists with independent arithmetic
    val sparse = graft.operators.Corpus.bm25TopK(spark, sfDir)
      .select($"q_id", $"doc_id", $"rank").as[(Long, Long, Long)].collect()
    val dense = {
      val vecs = graft.ops.Tables.embeddings(spark, sfDir)
        .select($"vec_id", $"embedding").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble))
      def cos(a: Array[Double], b: Array[Double]) = {
        var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) {
          d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
        }
        d / (math.sqrt(na) * math.sqrt(nb))
      }
      vecs.filter(_._1 < 10).flatMap { case (q, qv) =>
        vecs.filter(_._1 != q)
          .map { case (n, nv) => (n, cos(qv, nv)) }
          .sortBy { case (n, c) => (-c, n) }
          .take(5).zipWithIndex
          .map { case ((n, _), i) => (q, n, i + 1L) }
      }
    }
    val contributions = (sparse ++ dense)
      .groupBy(t => (t._1, t._2))
      .map { case ((q, doc), rows) =>
        (q, doc) -> (rows.map(r => 1000000L / (60L + r._3)).sum, rows.size.toLong)
      }
    val expected = contributions.groupBy(_._1._1).flatMap { case (q, docs) =>
      docs.toSeq
        .sortBy { case ((_, doc), (score, _)) => (-score, doc) }
        .take(5).zipWithIndex
        .map { case (((_, doc), (score, n)), i) => (q, i + 1L, doc, score, n) }
    }.toSet
    assert(out.toSet === expected)
    // both systems' evidence is visible: the fixture must exercise overlap
    // OR single-system rows (either proves fusion, both occur at sf0.001)
    assert(out.forall(r => r._5 >= 1 && r._5 <= 2))
    fused.unpersist()
  }

  test("fuseRrf: overlap sums across systems, ties break by doc_id") {
    import spark.implicits._
    val listA = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L))
      .toDF("q_id", "doc_id", "rank")
    val listB = Seq((1L, 11L, 1L), (1L, 13L, 2L), (1L, 14L, 3L))
      .toDF("q_id", "doc_id", "rank")
    val out = Retrieval.fuseRrf(Seq(listA, listB))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // doc 11: 1000000/62 + 1000000/61 = 16129 + 16393 = 32522, 2 systems
    assert(out.head === ((1L, 1L, 11L, 32522L, 2L)))
    // docs 10 and 13: 16393 each (rank-1 in A / rank-2 in B? no — doc 10
    // rank 1 in A = 16393; doc 13 rank 2 in B = 16129) — doc 10 second
    assert(out(1) === ((1L, 2L, 10L, 16393L, 1L)))
    // doc 13 (16129) ties doc 12? doc 12 rank3 = 1000000/63 = 15873;
    // doc 14 rank3 = 15873 ties doc 12 -> doc_id order: 12 before 14
    assert(out(2) === ((1L, 3L, 13L, 16129L, 1L)))
    assert(out(3) === ((1L, 4L, 12L, 15873L, 1L)))
    assert(out(4) === ((1L, 5L, 14L, 15873L, 1L)))
  }

  test("sq8: full-chain parity with a spec-side recompute, codes in [0,255]") {
    import spark.implicits._
    val got = Retrieval.sq8TopK(spark, sfDir).cache()
    assert(!plan(got).contains("CartesianProduct"), plan(got))
    val out = got.as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // independent recompute of the whole SQ8 chain in plain Scala
    val sv = graft.ops.Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).toArray.map(x => math.floor(x.toDouble * 1048576L).toLong))
    val dims = sv.head._2.length
    val mn = Array.tabulate(dims)(i => sv.map(_._2(i)).min)
    val mx = Array.tabulate(dims)(i => sv.map(_._2(i)).max)
    def code(v: Array[Long]) = Array.tabulate(dims) { i =>
      val c = (v(i) - mn(i)) * 255L / math.max(mx(i) - mn(i), 1L)
      assert(c >= 0L && c <= 255L, s"code out of range: $c")
      c
    }
    def recon(c: Array[Long]) =
      Array.tabulate(dims)(i => mn(i) + c(i) * (mx(i) - mn(i)) / 255L)
    val rec = sv.map { case (id, v) => id -> recon(code(v)) }.toMap
    val expected = sv.filter(t => t._1 >= 20 && t._1 < 30).flatMap {
      case (q, qv) =>
        sv.filter(_._1 != q).map { case (n, _) =>
          val r = rec(n)
          var d = 0L; var i = 0
          while (i < dims) { val x = qv(i) - r(i); d += x * x; i += 1 }
          (n, d)
        }.sortBy { case (n, d) => (d, n) }.take(5).zipWithIndex.map {
          case ((n, d), i) => (q, i + 1L, n, d)
        }
    }.toSet
    assert(out.toSet === expected)
    got.unpersist()
  }

  test("sq8: reconstruction error bounded by one quantization step per dim") {
    import spark.implicits._
    val e = graft.ops.Tables.embeddings(spark, sfDir)
      .select($"vec_id",
        org.apache.spark.sql.functions.expr(
          """transform(embedding, x ->
             CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT))""").as("sv"))
    val (mn, mx) = Retrieval.sq8Bounds(e)
    val coded = Retrieval.sq8Encode(e, mn, mx)
      .select($"vec_id", $"sv", $"recon")
      .as[(Long, Seq[Long], Seq[Long])].collect()
    assert(coded.nonEmpty)
    coded.foreach { case (id, sv, recon) =>
      sv.indices.foreach { i =>
        val step = math.max((mx(i) - mn(i)) / 255L + 1L, 1L)
        assert(math.abs(sv(i) - recon(i)) <= step,
          s"vec $id dim $i: |${sv(i)} - ${recon(i)}| > step $step")
      }
    }
  }
}
