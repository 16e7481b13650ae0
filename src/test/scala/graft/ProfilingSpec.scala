package graft

import org.apache.spark.sql.functions._

import graft.operators.Profiling

/** Invariant pins for the profiling family. The DuckDB gate at sf0.01 is
  * the cross-engine authority; these specs pin the identities that hold
  * on ANY input, at sf0.001.
  */
class ProfilingSpec extends SparkSpecBase {

  test("event transitions: out-degrees partition the adjacency count; " +
    "probabilities floor-sum to at most one") {
    import spark.implicits._
    val t = Profiling.eventTransitions(spark, sfDir).cache()
    try {
      // n_from really is the per-source-state row total
      val bad = t.groupBy($"prev_type")
        .agg(sum($"n_trans").as("s"), max($"n_from").as("f"),
          sum($"p_ppm").as("p"))
        .where($"s" =!= $"f" || $"p" > 1000000L)
        .count()
      assert(bad === 0L)
      // total transitions = total events - distinct users with >=1 event
      // (each user's chain has (events - 1) adjacencies)
      val totTrans = t.agg(sum($"n_trans")).head.getLong(0)
      val e = graft.ops.Tables.events(spark, sfDir)
      val nEvents = e.count()
      val nUsers = e.select($"user_id").distinct().count()
      assert(totTrans === nEvents - nUsers)
    } finally { t.unpersist() }
  }

  test("skew profile: reproduces brute-force single-node Gini and totals") {
    import spark.implicits._
    val got = Profiling.skewProfile(spark, sfDir).collect().head
    val counts = graft.ops.Tables.lineitem(spark, sfDir)
      .groupBy($"l_orderkey").agg(count(lit(1)).as("c"))
      .select($"c").as[Long].collect().sorted
    val n = counts.length.toLong
    val sTot = counts.sum
    val s1 = counts.zipWithIndex.map { case (c, i) => (i + 1L) * c }.sum
    assert(got.getAs[Long]("n_keys") === n)
    assert(got.getAs[Long]("n_rows") === sTot)
    assert(got.getAs[Long]("max_cnt") === counts.last)
    assert(got.getAs[Long]("top_share_ppm") === counts.last * 1000000L / sTot)
    assert(got.getAs[Long]("gini_ppm") ===
      (2 * s1 - (n + 1) * sTot) * 1000000L / (n * sTot))
  }

  test("join census: predicted join size equals the join actually run") {
    import spark.implicits._
    val got = Profiling.joinCensus(spark, sfDir).collect().head
    val o = graft.ops.Tables.orders(spark, sfDir).select($"o_orderkey")
    val l = graft.ops.Tables.lineitem(spark, sfDir).select($"l_orderkey")
    val actual = o.join(l, $"o_orderkey" === $"l_orderkey").count()
    assert(got.getAs[Long]("join_rows") === actual)
    assert(got.getAs[Long]("n_keys_a") ===
      o.distinct().count())
    assert(got.getAs[Long]("n_common_keys") <=
      math.min(got.getAs[Long]("n_keys_a"), got.getAs[Long]("n_keys_b")))
  }

  test("group quantiles are the exact order statistics of a sorted recount") {
    import spark.implicits._
    val got = Profiling.groupQuantiles(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val rows = graft.ops.Tables.events(spark, sfDir)
      .select($"event_type", floor($"value" * 1000).cast("long").as("v"))
      .as[(String, Long)].collect()
    rows.groupBy(_._1).foreach { case (tpe, vs) =>
      val sorted = vs.map(_._2).sorted
      val n = sorted.length
      def q(p: Int): Long = sorted(((n.toLong * p + 99) / 100).toInt - 1)
      val r = got(tpe)
      assert(r.getAs[Long]("p50_milli") === q(50), tpe)
      assert(r.getAs[Long]("p90_milli") === q(90), tpe)
      assert(r.getAs[Long]("p99_milli") === q(99), tpe)
    }
  }

  test("rate CUSUM reproduces the sequential max(0, S+d) recurrence replay") {
    val got = graft.operators.Sessionize.rateCusum(spark, sfDir).collect()
    val hours = got.map(r => (r.getLong(0), r.getLong(1)))
    assert(hours.map(_._1).sorted.sameElements(hours.map(_._1)))
    val ref = hours.map(_._2).sum / hours.length
    var s = 0L
    hours.zip(got).foreach { case ((h, c), r) =>
      s = math.max(0L, s + (c - ref))
      assert(r.getAs[Long]("cusum") === s, s"hour $h")
      assert(r.getAs[Long]("alarm") === (if (s >= 3 * ref) 1L else 0L))
    }
  }

  test("census-driven join: parameterized columns; salted plan and AQE " +
    "skew handling return identical rows, both timed") {
    import spark.implicits._
    // the c_skew shape under DOMAIN column names — exercises the
    // (keyCol, saltSourceCol) parameters instead of the gate's (k, v)
    val cProbe = graft.ops.Tables.lineitem(spark, sfDir)
      .select(when($"l_orderkey" % 3 === 0, 0L).otherwise($"l_orderkey")
        .cast("long").as("order_k"),
        $"l_linenumber".cast("long").as("line_no"))
    val cBuild = graft.ops.Tables.orders(spark, sfDir)
      .select(when($"o_orderkey" % 3 === 0, 0L).otherwise($"o_orderkey")
        .cast("long").as("order_k"))
      .groupBy($"order_k").agg(count(lit(1)).as("n_ord"))
    val dec = Profiling.decideJoin(cBuild, cProbe, keyCol = "order_k")
    assert(dec.strategy === "salted", dec)
    def canon(df: org.apache.spark.sql.DataFrame)
        : (Long, Set[(Long, Long, Long, Long)]) = {
      val t0 = System.nanoTime()
      val rows = df.groupBy($"order_k", $"line_no", $"n_ord")
        .agg(count(lit(1)).as("m"))
        .as[(Long, Long, Long, Long)].collect()
      ((System.nanoTime() - t0) / 1000000L, rows.toSet)
    }
    val (tSalted, salted) = canon(Profiling.executeDecided(
      cBuild, cProbe, dec, keyCol = "order_k", saltSourceCol = "line_no"))
    // AQE path: the same logical join, skew handled at RUNTIME by
    // adaptive execution (thresholds forced low so the hot key
    // qualifies at sf0.001; broadcast disabled so the join stays
    // sort-merge, the shape AQE's skew-join targets)
    val aqeConfs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = aqeConfs.map { case (k, _) =>
      k -> spark.conf.getOption(k) }
    try {
      aqeConfs.foreach { case (k, v) => spark.conf.set(k, v) }
      val (tAqe, aqe) = canon(cProbe.join(cBuild, Seq("order_k")))
      // the pre-decided salted plan and AQE's runtime re-plan are the
      // SAME relation — identical multiset of rows
      assert(salted === aqe)
      info(s"salted(pre-decided): ${tSalted} ms; AQE skew-join: ${tAqe} ms")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("census-driven join: non-numeric (string) keys — native-type hot " +
    "keys, salted decision, row parity with a plain join") {
    import spark.implicits._
    // string-keyed shape: a cast-to-long hot-key census would NPE here
    // (cast yields null) — the census must carry the key's native type
    val build = spark.range(1500)
      .select(concat(lit("k"), $"id").as("k"), ($"id" * 7L).as("p"))
    val probe = spark.range(6000)
      .select(when($"id" % 2 === 0, lit("k13"))
        .otherwise(concat(lit("k"), $"id" % 1500)).as("k"),
        $"id".as("v"))
    val dec = Profiling.decideJoin(build, probe)
    assert(dec.strategy === "salted", dec)
    assert(dec.hotKeys === Seq("k13"), dec)
    // force the MANUAL targeted-salt branch (AQE deferral off) so the
    // string hot key rides the isin literal + salted equi-join path
    val saved = spark.conf.getOption("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.groupBy($"k", $"v", $"p").agg(count(lit(1)).as("m"))
          .as[(String, Long, Long, Long)].collect().toSet
      val got = canon(Profiling.executeDecided(build, probe, dec))
      val want = canon(probe.join(build, Seq("k")))
      assert(got === want)
      assert(got.nonEmpty)
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
      case None => spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("census-driven join: NULL-heavy probe keys — never in hotKeys, " +
    "spread-salted in the manual plan, row parity with a plain join") {
    import spark.implicits._
    // a probe where the dominant "key" is NULL: the census detects the
    // skew, but null must NOT enter hotKeys (isin(null) never matches —
    // the slice would silently keep salt 0), and the manual salted plan
    // must spread the null rows across salts while returning exactly
    // the rows of a plain inner join (nulls never match, so spreading
    // them is pure skew relief)
    val build = spark.range(1500)
      .select($"id".as("k"), ($"id" * 7L).as("p"))
    // ⅓ null, ⅓ hot key 13, ⅓ spread — BOTH skew classes present, so
    // hotKeys must be exactly Seq(13): nulls excluded from the census
    // yet spread by the executor's explicit isNull salt branch
    val probe = spark.range(6000)
      .select(when($"id" % 3 === 0, lit(null).cast("long"))
        .when($"id" % 3 === 1, lit(13L))
        .otherwise($"id" % 1500).as("k"),
        $"id".as("v"))
    val dec = Profiling.decideJoin(build, probe)
    assert(dec.strategy === "salted", dec)
    assert(dec.hotKeys === Seq(13L),
      s"null leaked into hotKeys or the hot key was missed: $dec")
    val saved = spark.conf.getOption("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.groupBy($"k", $"v", $"p").agg(count(lit(1)).as("m"))
          .as[(Long, Long, Long, Long)].collect().toSet
      val got = canon(Profiling.executeDecided(build, probe, dec))
      val want = canon(probe.join(build, Seq("k")))
      assert(got === want)
      assert(got.nonEmpty)
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
      case None => spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("census-driven join: NULL-ONLY skew — nullHot flagged, build NOT " +
    "exploded, nulls spread, row parity") {
    import spark.implicits._
    // the ONLY >=10%-share slice is the null key: hotKeys must stay
    // empty (isin(null) never matches) but nullHot must fire, and the
    // manual salted plan must keep every build row at salt 0 (the
    // salt-all fallback would explode build x NumSalts — the
    // measured-worst manual form) while spreading only null probe rows
    val build = spark.range(1500)
      .select($"id".as("k"), ($"id" * 7L).as("p"))
    val probe = spark.range(6000)
      .select(when($"id" % 2 === 0, lit(null).cast("long"))
        .otherwise($"id" % 1500).as("k"),
        $"id".as("v"))
    val dec = Profiling.decideJoin(build, probe)
    assert(dec.strategy === "salted", dec)
    assert(dec.hotKeys.isEmpty, dec)
    assert(dec.nullHot, dec)
    val saved = spark.conf.getOption("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val salted = Profiling.executeDecided(build, probe, dec)
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.groupBy($"k", $"v", $"p").agg(count(lit(1)).as("m"))
          .as[(Long, Long, Long, Long)].collect().toSet
      assert(canon(salted) === canon(probe.join(build, Seq("k"))))
      // the plan's explode arm is the constant no-spread branch: with
      // isHot = lit(false) every build row carries sequence(0, 0) — an
      // x8 explode would show sequence(0, 7) in the analyzed plan
      val analyzed = salted.queryExecution.analyzed.toString
      assert(!analyzed.contains("sequence(0, 7)") ||
        analyzed.contains("CASE WHEN false"), analyzed.take(2000))
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
      case None => spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("anomaly MAD: medians match a single-node recount; outliers obey " +
    "the 3-MAD rule exactly") {
    import spark.implicits._
    val got = Profiling.anomalyMad(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val rows = graft.ops.Tables.events(spark, sfDir)
      .select($"event_type", floor($"value" * 1000).cast("long").as("v"))
      .as[(String, Long)].collect()
    rows.groupBy(_._1).foreach { case (tpe, vs) =>
      val sorted = vs.map(_._2).sorted
      val n = sorted.length
      val m2 = sorted((n - 1) / 2) + sorted(n / 2) // lo + hi middle
      val devs = sorted.map(v => math.abs(2 * v - m2)).sorted
      val mad4 = devs((n - 1) / 2) + devs(n / 2)
      val out = devs.count(d => 2 * d > 3 * mad4).toLong
      val r = got(tpe)
      assert(r.getAs[Long]("n_events") === n.toLong, tpe)
      assert(r.getAs[Long]("med2_milli") === m2, tpe)
      assert(r.getAs[Long]("mad4_milli") === mad4, tpe)
      assert(r.getAs[Long]("n_outliers") === out, tpe)
    }
  }
}
