package graft

import graft.operators.{Multimodal, Sessionize}

class SessionMultimodalSpec extends SparkSpecBase {

  test("sessionize: ids start at 1 and sessions don't overlap in time") {
    import spark.implicits._
    val df = Sessionize.sessionize(spark, sfDir).cache()
    assert(df.where($"session_id" < 1).count() === 0)
    assert(df.where($"end_s" < $"start_s").count() === 0)
    // consecutive sessions of a user are separated by more than the gap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"session_id")
    val overlaps = df
      .withColumn("prev_end", org.apache.spark.sql.functions.lag($"end_s", 1).over(w))
      .where($"prev_end".isNotNull && $"start_s" - $"prev_end" <= 1800)
    assert(overlaps.count() === 0)
    df.unpersist()
  }

  test("multimodal decode: stub features consistent with payload bytes") {
    import spark.implicits._
    val ds = Multimodal.decodeFeatures(spark, sfDir)
    val bad = ds.filter(m =>
      m.width != m.n_bytes % 640 || m.height != (m.n_bytes * 7) % 480
        || m.phash.length != 32)
    assert(bad.count() === 0)
  }

  test("media stubs survive empty payloads") {
    assert(Multimodal.MediaDecoder.decodeStub(Array.emptyByteArray) === ((0L, 0L)))
    assert(Multimodal.MediaResizer.resizeStub(Array.emptyByteArray, 4, 4)
      .length === 16)
  }

  test("resize stub emits fixed-shape thumbnails") {
    import spark.implicits._
    val df = Multimodal.resizeThumbnails(spark, sfDir, 8, 8)
    val bad = df.where(org.apache.spark.sql.functions
      .octet_length($"thumb") =!= 64)
    assert(bad.count() === 0)
    assert(df.count() === graft.ops.Tables.documents(spark, sfDir).count())
  }

  test("media chunk dedup: finds the planted twins, no cartesian, bounded overlap") {
    import spark.implicits._
    val sf01 = "/root/testdata/sf0.01"
    val df = Multimodal.mediaChunkDedup(spark, sf01)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    val rows = df.as[(Long, Long, Long, Long)].collect()
    rows.foreach { case (a, b, shared, ppm) =>
      assert(a < b)
      assert(shared >= 3L)
      assert(ppm > 0L && ppm <= 1000000L, s"($a,$b) ppm=$ppm")
    }
    // shift-robustness payoff: the corpus' strongest token-level
    // near-dups (J >= 0.97; their byte streams differ by insertions
    // that shift everything after the edit) still share most chunks
    val got = rows.map(r => (r._1, r._2)).toSet
    assert(got.contains((285L, 301L)), rows.take(10).toSeq)
    assert(got.contains((98L, 290L)))
  }

  test("multimodal plumbing: payload bytes don't reach the aggregate shuffle") {
    val plan = Multimodal.mediaStats(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the payload column must be projected away before the exchange
    assert(!plan.contains("payload#") ||
      plan.indexOf("Exchange") < plan.indexOf("payload#"), plan)
  }
}
