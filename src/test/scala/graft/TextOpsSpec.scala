package graft

import graft.operators.TextOps

class TextOpsSpec extends SparkSpecBase {

  test("dedup keeps one row per distinct text") {
    val df = TextOps.dedupExact(spark, sfDir)
    val total = df.count()
    assert(total > 0)
    // keep_id unique
    assert(df.select("keep_id").distinct().count() === total)
  }

  test("text stats are internally consistent") {
    import spark.implicits._
    val df = TextOps.textStats(spark, sfDir).cache()
    assert(df.where($"n_tokens" <= 0).count() === 0)
    assert(df.where($"n_stopwords" > $"n_tokens").count() === 0)
    assert(df.where($"stopword_ratio" < 0 || $"stopword_ratio" > 1).count() === 0)
    df.unpersist()
  }

  test("repetition signals: fractions well-formed, identities hold") {
    import spark.implicits._
    val df = graft.operators.TextOps.repetition(spark, sfDir).cache()
    val rows = df.as[(Long, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, nTok, nDistinct, topFrac, bigramFrac) =>
      assert(nDistinct >= 1 && nDistinct <= nTok, s"doc $id")
      // the most frequent token occurs at least the mean count
      assert(topFrac >= 1.0 / nDistinct - 1e-12, s"doc $id topFrac=$topFrac")
      assert(topFrac <= 1.0 + 1e-12, s"doc $id")
      assert(bigramFrac > 0.0 && bigramFrac <= 1.0 + 1e-12,
        s"doc $id bigramFrac=$bigramFrac")
    }
    df.unpersist()
  }

  test("bpe token count >= whitespace token count on space-free punct text") {
    import spark.implicits._
    val df = TextOps.tokenCounts(spark, sfDir)
    assert(df.where($"n_bpe_tokens" < $"n_ws_tokens").count() === 0)
  }

  test("lang id predicts a language for every doc") {
    import spark.implicits._
    val df = TextOps.langId(spark, sfDir)
    assert(df.where($"pred_lang".isNull).count() === 0)
  }
}
