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

  test("image table payloads are genuine PNGs and ImageIO round-trips the pixels") {
    import spark.implicits._
    val rows = Multimodal.imageTable(spark, sfDir)
      .select($"doc_id", $"payload").as[(Long, Array[Byte])]
      .orderBy($"doc_id").take(5)
    assert(rows.nonEmpty)
    rows.foreach { case (id, png) =>
      // PNG magic bytes: a real container, not a fake payload
      assert((png(0) & 0xff) === 0x89 && png(1) === 'P'.toByte &&
        png(2) === 'N'.toByte && png(3) === 'G'.toByte, s"doc $id")
      val img = Multimodal.ImageCodec.decode(png)
      assert(img.getWidth === (16 + id % 17).toInt)
      assert(img.getHeight === (16 + id % 13).toInt)
      // lossless round-trip: every decoded pixel equals the formula
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val base = id * 31L + x * 7L + y * 13L
        val want = (((base % 256) << 16) | (((base + 85) % 256) << 8) |
          ((base + 170) % 256)).toInt
        assert((img.getRGB(x, y) & 0xffffff) === want, s"doc $id ($x,$y)")
      }
    }
  }

  test("decoded features: ahash matches a direct recomputation from pixels") {
    import spark.implicits._
    val feats = Multimodal.decodeImageFeatures(spark, sfDir)
      .orderBy($"doc_id").take(3)
    feats.foreach { f =>
      val img = Multimodal.ImageCodec.decode(
        Multimodal.ImageCodec.makePng(f.doc_id))
      val gray = for (ty <- 0 until 8; tx <- 0 until 8) yield {
        val p = img.getRGB(tx * img.getWidth / 8, ty * img.getHeight / 8)
        (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3L
      }
      val mean = gray.sum / 64L
      val want = gray.zipWithIndex.foldLeft(0L) { case (acc, (g, i)) =>
        if (g > mean) acc | (1L << i) else acc
      }
      assert(f.ahash === want, s"doc ${f.doc_id}")
      assert(f.n_pixels === f.width * f.height)
    }
  }

  test("audio payloads are genuine RIFF/WAVE files and decode sample-exact") {
    import spark.implicits._
    val rows = Multimodal.audioTable(spark, sfDir)
      .select($"doc_id", $"payload").as[(Long, Array[Byte])]
      .orderBy($"doc_id").take(3)
    rows.foreach { case (id, wav) =>
      assert(new String(wav.slice(0, 4), "US-ASCII") === "RIFF", s"doc $id")
      assert(new String(wav.slice(8, 12), "US-ASCII") === "WAVE", s"doc $id")
      val (rate, samp) = Multimodal.AudioCodec.decodeSamples(wav)
      assert(rate === 8000L)
      assert(samp.length === Multimodal.AudioCodec.sampleCount(id))
      samp.zipWithIndex.foreach { case (v, i) =>
        val want = (((id * 7L + i * 11L) % 65536L) - 32768L).toInt
        assert(v === want, s"doc $id sample $i")
      }
    }
  }

  test("video container: strided decode seeks past unsampled frames and round-trips pixels") {
    import spark.implicits._
    val rows = Multimodal.videoTable(spark, sfDir)
      .select($"doc_id", $"payload").as[(Long, Array[Byte])]
      .orderBy($"doc_id").take(3)
    rows.foreach { case (id, video) =>
      val n = Multimodal.VideoCodec.frameCount(id)
      val sampled = Multimodal.VideoCodec.decodeStrided(video, 2)
      // stride contract: frames 0,2,4,... only
      assert(sampled.map(_._1) === (0 until n by 2).toSeq, s"doc $id")
      sampled.foreach { case (f, img) =>
        assert(img.getWidth === (16 + ((id + f) % 9)).toInt)
        assert(img.getHeight === (16 + ((id + f) % 7)).toInt)
        val base = id * 31L + f * 997L
        val want = ((((base % 256L).toInt) << 16) |
          ((((base + 85L) % 256L).toInt) << 8) |
          ((base + 170L) % 256L).toInt)
        assert((img.getRGB(0, 0) & 0xffffff) === want, s"doc $id frame $f")
      }
      // stride 1 decodes every frame — the container holds them all
      assert(Multimodal.VideoCodec.decodeStrided(video, 1).size === n)
    }
  }

  test("real resize emits fixed-shape RGB thumbnails") {
    import spark.implicits._
    val df = Multimodal.resizeThumbnails(spark, sfDir, 8, 8)
    val bad = df.where(org.apache.spark.sql.functions
      .octet_length($"thumb") =!= 192) // 8*8 pixels * 3 channels
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
