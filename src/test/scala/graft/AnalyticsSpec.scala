package graft

import graft.operators.{NearDup, Sessionize}

/** Invariant pins for the event-analytics and graph-statistics
  * operators, on top of their DuckDB gates: properties that must hold
  * on ANY input, checked on the live fixture. */
class AnalyticsSpec extends SparkSpecBase {

  test("funnel stages are ordered and only reachable in sequence") {
    import spark.implicits._
    val f = Sessionize.funnel(spark, sfDir).cache()
    try {
      // a stage time implies every earlier stage time, in order
      assert(f.where($"click_us".isNotNull && $"view_us".isNull).count() === 0)
      assert(f.where($"purchase_us".isNotNull && $"click_us".isNull)
        .count() === 0)
      assert(f.where($"click_us" < $"view_us").count() === 0)
      assert(f.where($"purchase_us" < $"click_us").count() === 0)
      assert(f.count() > 0)
    } finally f.unpersist()
  }

  test("retention day-0 row equals the cohort's size; offsets non-negative") {
    import spark.implicits._
    val r = Sessionize.retention(spark, sfDir).cache()
    try {
      assert(r.where($"day_offset" < 0).count() === 0)
      // every cohort has a day-0 row, and no later offset exceeds it
      val perCohort = r.groupBy($"cohort_day")
        .agg(org.apache.spark.sql.functions.min($"day_offset").as("mn"),
          org.apache.spark.sql.functions.max($"n_users").as("mx"))
        .collect()
      assert(perCohort.nonEmpty)
      perCohort.foreach(row => assert(row.getLong(1) === 0L, row.toString))
      val day0 = r.where($"day_offset" === 0)
        .select($"cohort_day", $"n_users".as("d0")).alias("z")
      val viol = r.join(day0, Seq("cohort_day"))
        .where($"n_users" > $"d0")
      assert(viol.count() === 0)
    } finally r.unpersist()
  }

  test("curateCorpus row-local + exact-dup verdicts reconcile with filterAudit") {
    import spark.implicits._
    // stages 1-2 of the fused pipeline are definitionally filterAudit's
    // cascade; its 'kept' docs are exactly those curate sends to the
    // near-dup stage (verdict kept or near_dup)
    val curate = graft.operators.TextOps.curateCorpus(spark, sfDir)
      .groupBy($"verdict").count().as[(String, Long)].collect().toMap
    val audit = graft.operators.TextOps.filterAudit(spark, sfDir)
      .select($"reason", $"n_docs").as[(String, Long)].collect().toMap
    for (r <- Seq("lang", "too_short", "too_long", "low_stopword",
        "exact_dup"))
      assert(curate.getOrElse(r, 0L) === audit.getOrElse(r, 0L), r)
    assert(curate.getOrElse("kept", 0L) + curate.getOrElse("near_dup", 0L)
      === audit.getOrElse("kept", 0L))
  }

  test("graph stats agree with a driver-side recount of the pair list") {
    import spark.implicits._
    val pairs = NearDup.minhashNearDup(spark, sfDir)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    val adj = scala.collection.mutable.Map[Long, Set[Long]]()
    pairs.foreach { case (a, b) =>
      adj(a) = adj.getOrElse(a, Set.empty) + b
      adj(b) = adj.getOrElse(b, Set.empty) + a
    }
    val wedges = adj.values.map(s => s.size.toLong * (s.size - 1) / 2).sum
    val triangles = pairs.map { case (a, b) =>
      (adj(a) & adj(b)).size.toLong
    }.sum / 3
    val got = NearDup.graphStats(spark, sfDir).collect().head
    assert(got.getLong(0) === pairs.length.toLong) // n_edges
    assert(got.getLong(1) === wedges)
    assert(got.getLong(2) === triangles)
    if (wedges > 0)
      assert(got.getLong(3) === triangles * 3000000L / wedges)
  }

  test("growth accounting: the ledger identities reconcile day over day") {
    import spark.implicits._
    val rows = Sessionize.growthAccounting(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val byDay = rows.map(r => r._1 -> r).toMap
    rows.foreach { case (day, active, nw, ret, res, churn) =>
      // actives split exactly into the three classes
      assert(active === nw + ret + res, s"day $day split")
      // churn reconciles against the calendar previous day
      val prevActive = byDay.get(day - 1).map(_._2).getOrElse(0L)
      assert(churn === prevActive - ret, s"day $day churn")
      // and the DAU delta is explained by the ledger
      assert(active - prevActive === nw + res - churn, s"day $day delta")
      assert(Seq(nw, ret, res, churn).forall(_ >= 0L), s"day $day signs")
    }
    // the first day is all-new by definition
    val first = rows.minBy(_._1)
    assert(first._2 === first._3 && first._4 === 0L && first._5 === 0L)
  }

  test("active users: WAU bounds DAU, and a recount of one window agrees") {
    import spark.implicits._
    val rows = Sessionize.activeUsers(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val dau = rows.map(r => r._1 -> r._2).toMap
    rows.foreach { case (day, d, w, ppm) =>
      assert(w >= d, s"day $day: wau < dau")
      // wau can't exceed the sum of the window's dailies
      val cap = (day - 6 to day).flatMap(dau.get).sum
      assert(w <= cap, s"day $day")
      assert(ppm === d * 1000000L / w)
      assert(ppm <= 1000000L)
    }
    // exact recount of the LAST day's trailing window from raw events
    val last = rows.last._1
    val users = graft.ops.Tables.events(spark, sfDir)
      .select(org.apache.spark.sql.functions
        .expr("unix_timestamp(ts) div 86400").as("day"), $"user_id")
      .where($"day".between(last - 6, last))
      .select($"user_id").distinct().count()
    assert(rows.last._3 === users)
  }
}
