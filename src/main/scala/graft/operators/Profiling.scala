package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{QueryDef, QueryModule, Tables}

/** Data-profiling operators a pipeline runs BEFORE committing to a plan
  * at scale: the per-key skew census that decides whether a join needs
  * salting, the event-type transition matrix behind behavioral QA, and
  * histogram-exact robust (median/MAD) outlier detection whose state is
  * bounded by the VALUE DOMAIN, not the corpus size.
  *
  * All arithmetic is exact integers (counts, ppm floor-divisions,
  * milli-quantized values), so every result reproduces bit-for-bit
  * against the DuckDB oracle.
  */
object Profiling extends QueryModule {

  /** Markov transition matrix over per-user event streams: for every
    * ordered (prev_type → next_type) adjacency, the transition count,
    * the out-degree of the source state, and the transition probability
    * as integer ppm. The behavioral fingerprint of a product's event
    * stream — sudden shifts in this matrix are the canonical silent
    * instrumentation-breakage signal.
    *
    * Scale shape: ONE exchange on user_id feeds the lag window (the
    * same partitioning sessionize uses); everything after operates on
    * the |types|² transition table — metadata-sized at any corpus
    * scale. The row-total join is a broadcast of that tiny table. */
  def eventTransitions(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val adj = Tables.events(s, d)
      .select($"user_id", $"event_type", $"ts", $"event_id")
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .where($"prev_type".isNotNull)
      .groupBy($"prev_type", $"event_type".as("next_type"))
      .agg(count(lit(1)).as("n_trans"))
    val outDeg = adj.groupBy($"prev_type")
      .agg(sum($"n_trans").as("n_from"))
    adj.join(broadcast(outDeg), Seq("prev_type"))
      .select($"prev_type", $"next_type", $"n_trans", $"n_from",
        expr("n_trans * 1000000 div n_from").as("p_ppm"))
      .orderBy($"prev_type", $"next_type")
  }

  /** Join-key skew profile of lineitem's l_orderkey — the census a
    * planner reads before scheduling a 100 TB shuffle on a key: total
    * rows and keys, the heaviest key's count and its share of all rows
    * (ppm), and the exact Gini coefficient of the per-key count
    * distribution (0 = perfectly uniform, →1 = one key holds
    * everything). Uniform-ish Gini → plain shuffle; high top-share →
    * salt or AQE-skew-join that one key.
    *
    * Gini over ascending-sorted counts x_1..x_n:
    * G = (2·Σ i·x_i − (n+1)·Σ x_i) / (n·Σ x_i), emitted as floor ppm.
    * No global rank is materialized: keys sharing a count value c
    * occupy a CONTIGUOUS rank block, so Σ i·x_i has a closed form on
    * the counts-of-counts histogram — with m_c keys at count c and
    * start_c = 1 + Σ_{c'<c} m_c', the block contributes
    * c·(m_c·start_c + m_c·(m_c−1)/2). Σ i·x_i is tie-invariant
    * (permuting equal x within a rank block fixes the sum), so this
    * equals the oracle's row_number() formulation exactly.
    *
    * Scale shape: ONE map-side-combined pass builds the per-key counts,
    * a second tiny agg folds them to the counts-of-counts histogram,
    * and the cumulative start_c runs on THAT — its width is the number
    * of distinct multiplicities (bounded by the heaviest key's count,
    * not by the key count), metadata-sized at any corpus scale. BIGINT
    * throughout: n·S·10⁶ fits while n·S < 9.2×10¹² — beyond that
    * (extreme corpus) the final division is the one line to lift to
    * decimal(38,0). */
  def skewProfile(s: SparkSession, d: String): DataFrame =
    skewProfileOver(Tables.lineitem(s, d).select(col("l_orderkey").as("k")))

  /** [[skewProfile]] over an arbitrary single-column key frame — the
    * scale probe feeds a synthetic key stream here. */
  private[graft] def skewProfileOver(keys: DataFrame): DataFrame = {
    val s = keys.sparkSession
    import s.implicits._
    val hist = keys
      .groupBy($"k").agg(count(lit(1)).as("cnt"))
      .groupBy($"cnt").agg(count(lit(1)).as("m"))
    val wcum = Window.orderBy($"cnt")
      .rowsBetween(Window.unboundedPreceding, -1)
    hist
      .withColumn("start", coalesce(sum($"m").over(wcum), lit(0L)) + 1L)
      .agg(
        sum($"m").as("n_keys"),
        sum($"cnt" * $"m").as("n_rows"),
        max($"cnt").as("max_cnt"),
        sum(expr("cnt * (m * start + m * (m - 1) div 2)")).as("s1"))
      .select($"n_keys", $"n_rows", $"max_cnt",
        expr("max_cnt * 1000000 div n_rows").as("top_share_ppm"),
        expr("(2 * s1 - (n_keys + 1) * n_rows) * 1000000" +
          " div (n_keys * n_rows)").as("gini_ppm"))
  }

  /** Join-size census for orders ⋈ lineitem on the order key: the EXACT
    * row count the equi-join would produce (Σ_k c_A(k)·c_B(k) over the
    * two per-key count tables), key cardinalities on both sides, the
    * matched-key count, and each side's matched-key coverage (ppm) —
    * the numbers that decide broadcast vs shuffle vs pre-filter BEFORE
    * paying for the join itself. A low coverage_a says most build-side
    * keys never match (pre-filter with a semi-join or bloom); an
    * output far above both inputs says the key is non-selective.
    *
    * Scale shape: each side reduces to its per-key count table
    * map-side; the census joins COUNT TABLES (one row per distinct
    * key), never row data — the same reduction a cost-based optimizer
    * runs, made exact. All arithmetic BIGINT. */
  def joinCensus(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val a = Tables.orders(s, d)
      .groupBy($"o_orderkey".as("k")).agg(count(lit(1)).as("ca"))
    val b = Tables.lineitem(s, d)
      .groupBy($"l_orderkey".as("k")).agg(count(lit(1)).as("cb"))
    val m = a.join(b, Seq("k"))
      .agg(count(lit(1)).as("n_common_keys"),
        sum($"ca" * $"cb").as("join_rows"))
    val ta = a.agg(count(lit(1)).as("n_keys_a"))
    val tb = b.agg(count(lit(1)).as("n_keys_b"))
    m.crossJoin(ta).crossJoin(tb) // three 1-row scalars
      .select($"n_keys_a", $"n_keys_b", $"n_common_keys", $"join_rows",
        expr("n_common_keys * 1000000 div n_keys_a").as("coverage_a_ppm"),
        expr("n_common_keys * 1000000 div n_keys_b").as("coverage_b_ppm"))
  }

  /** Robust per-event-type outlier census: histogram-exact median and
    * MAD (median absolute deviation) of the milli-quantized `value`,
    * and how many events sit outside median ± 3·MAD — the outlier rule
    * mean/stddev gets wrong on heavy-tailed data (the outliers drag
    * the mean toward themselves).
    *
    * Exact integer encoding: v = floor(value·1000) (the fixture values
    * carry 2 decimals, so milli-quantization is lossless); med2 = 2×
    * median (lower+upper middle summed — no fractional averaging);
    * dev2 = |2v − med2| = 2×|v − median|; mad4 = 2×median(dev2) = 4×
    * MAD. The outlier test |v−med| > 3·MAD becomes 2·dev2 > 3·mad4 —
    * integers end to end, bit-reproducible cross-engine.
    *
    * Scale shape: the ONLY full-data pass is the map-side-combined
    * (type, v) histogram; every window/median step runs on that
    * histogram, whose width is bounded by the VALUE DOMAIN (≤ ~500k
    * milli-buckets here) — constant in corpus size, unlike a naive
    * per-type sort of raw rows. Same trick both engines, both passes
    * (value median, then deviation median on the re-keyed histogram). */
  def anomalyMad(s: SparkSession, d: String): DataFrame =
    anomalyMadOver {
      import s.implicits._
      Tables.events(s, d).select($"event_type", $"value")
    }

  /** [[anomalyMad]] over an arbitrary (event_type, value) frame — the
    * scale probe feeds a synthetic domain-bounded stream here. */
  private[graft] def anomalyMadOver(ev: DataFrame): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    val wType = Window.partitionBy($"event_type")
    val wCum = Window.partitionBy($"event_type").orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, 0)
    // per-type 2x-median of a (event_type, v, c) histogram, via windows
    // only — n, the cumulative, and the conditional mins all share the
    // ONE event_type exchange; no broadcast-build jobs, no self-joins.
    def withMedian2(h: DataFrame, out: String): DataFrame =
      h.withColumn("n", sum($"c").over(wType))
        .withColumn("cum", sum($"c").over(wCum))
        .withColumn(out,
          min(when($"cum" >= expr("(n + 1) div 2"), $"v")).over(wType) +
            min(when($"cum" >= expr("n div 2 + 1"), $"v")).over(wType))
    val hist = ev
      .select($"event_type", floor($"value" * 1000).cast("long").as("v"))
      .groupBy($"event_type", $"v").agg(count(lit(1)).as("c"))
    val dev = withMedian2(hist, "m2")
      .select($"event_type", $"m2", abs(lit(2) * $"v" - $"m2").as("v"), $"c")
      .groupBy($"event_type", $"m2", $"v").agg(sum($"c").as("c"))
    withMedian2(dev, "mad4")
      .groupBy($"event_type")
      .agg(
        max($"n").as("n_events"),
        max($"m2").as("med2_milli"),
        max($"mad4").as("mad4_milli"),
        sum(when(lit(2) * $"v" > lit(3) * $"mad4", $"c")
          .otherwise(0L)).as("n_outliers"))
      .orderBy($"event_type")
  }

  /** Per-group EXACT quantiles (p50/p90/p99 of the milli-quantized
    * value per event type) — the SLO-dashboard numbers, computed the
    * way a 100 TB pass must: the lower quantile at rank ⌈n·p/100⌉ read
    * off the same domain-bounded (type, value) histogram the MAD scan
    * uses, never a per-group sort of raw rows. approx_percentile gives
    * bounded error; this gives the exact order statistic, and both
    * engines agree because every step is integer arithmetic on the
    * identical histogram. */
  def groupQuantiles(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val wType = Window.partitionBy($"event_type")
    val wCum = Window.partitionBy($"event_type").orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables.events(s, d)
      .select($"event_type", floor($"value" * 1000).cast("long").as("v"))
      .groupBy($"event_type", $"v").agg(count(lit(1)).as("c"))
      .withColumn("n", sum($"c").over(wType))
      .withColumn("cum", sum($"c").over(wCum))
      .groupBy($"event_type")
      .agg(
        max($"n").as("n_events"),
        min(when($"cum" * 100 >= $"n" * 50, $"v")).as("p50_milli"),
        min(when($"cum" * 100 >= $"n" * 90, $"v")).as("p90_milli"),
        min(when($"cum" * 100 >= $"n" * 99, $"v")).as("p99_milli"))
      .orderBy($"event_type")
  }

  // ----------------------------------------------- census-driven joins

  /** The decision the census exists to inform, made explicit.
    * `hotKeys` is the census' skew evidence: every key owning ≥
    * [[SkewSharePpm]] of the probe — bounded at 10⁶/SkewSharePpm (= 10)
    * keys by construction, driver-side metadata like a broadcast
    * threshold check. Empty for non-salted decisions. Values carry the
    * key column's NATIVE type (Long, String, …) so the isin literals in
    * [[executeDecided]] compare exactly — a cast-to-long here would NPE
    * on non-numeric keys and silently mismatch on lossy ones. */
  final case class JoinDecision(
      strategy: String, // broadcast | salted | shuffle
      buildRows: Long,
      probeRows: Long,
      topSharePpm: Long,
      hotKeys: Seq[Any] = Nil,
      // the NULL key alone owns >= SkewSharePpm of the probe: nulls are
      // excluded from hotKeys (isin(null) never matches), so this flag
      // is how the executor knows a null-ONLY skew wants the
      // null-spread-only plan rather than the no-detail salt-all
      // fallback (which explodes the whole build x NumSalts — the
      // measured-worst manual form)
      nullHot: Boolean = false)

  /** Rows at or under this on the build side → broadcast (stands in for
    * `spark.sql.autoBroadcastJoinThreshold`, but row-based so the
    * decision is engine-reproducible). */
  val BroadcastRowCap = 1000L
  /** Probe-side top-key share at or above this (10%) → salt the key. */
  val SkewSharePpm = 100000L
  /** Salt fan-out for the skewed path. */
  val NumSalts = 8

  /** CLOSE THE PROFILING→PLAN LOOP: consume the join census ([[joinCensus]]
    * / [[skewProfile]] are the diagnostic forms of these inputs) and CHOOSE
    * the join strategy — broadcast when the build side is metadata-sized,
    * salted when one probe key owns ≥ 10% of the rows (the straggler-task
    * profile AQE's skew-join also targets, here decided deterministically
    * ahead of time), plain shuffle otherwise.
    *
    * The two census aggregates are 1-row bounded collects — the same
    * class of driver-side metadata as a broadcast threshold check; this
    * is exactly the decision a cost-based optimizer or AQE makes, made
    * explicit, logged, and testable.
    *
    * `keyCol` names the equi-join key present on BOTH sides (default
    * `"k"`, the gate query's shape). */
  def decideJoin(build: DataFrame, probe: DataFrame,
      keyCol: String = "k"): JoinDecision = {
    val s = build.sparkSession
    import s.implicits._
    // ONE action for both censuses: the build count and the probe
    // (total, top-key) aggregate union into a single 2-row collect —
    // one job instead of two driver round-trips (each census is still
    // its own map-side-combined stage; only the scheduling round-trip
    // and its latency are merged).
    // coalesce: an empty probe yields NULL sum/max from the group-less
    // aggregate — decide (broadcast-or-shuffle, 0, 0) instead of
    // throwing on the non-nullable decode
    val buildRow = build
      .agg(count(lit(1)).as("a"))
      .select(lit(0).as("side"), $"a", lit(0L).as("b"))
    val probeRow = probe
      .groupBy(col(keyCol)).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum($"c"), lit(0L)).as("a"),
        coalesce(max($"c"), lit(0L)).as("b"),
        coalesce(sum(when(col(keyCol).isNull, $"c")), lit(0L)).as("n0"))
      .select(lit(1).as("side"), $"a", $"b", $"n0")
    val census = buildRow
      .withColumn("n0", lit(0L))
      .unionByName(probeRow)
      .as[(Int, Long, Long, Long)].collect()
      .map { case (k, a, b, n0) => k -> ((a, b), n0) }.toMap
    val nb = census(0)._1._1
    val ((np, top), nullCnt) = census(1)
    val share = top * 1000000L / math.max(np, 1L)
    val strat =
      if (nb <= BroadcastRowCap) "broadcast"
      else if (share >= SkewSharePpm) "salted"
      else "shuffle"
    // hot-key set only on the skewed path: ≤ 10⁶/SkewSharePpm keys can
    // each own ≥ SkewSharePpm of the probe, so this collect is bounded
    // metadata regardless of corpus size. Collected in the key's NATIVE
    // type (untyped Row values): a cast-to-long would NPE on string keys
    // and silently never match in executeDecided's isin for lossy key
    // types. Sorted by string form only for a deterministic Seq order.
    // NULL keys are excluded: `isin(null)` never matches, so a null
    // entry in hotKeys would silently leave the null-heavy slice
    // unsalted (salt 0 end to end). Null-keyed probe rows can never
    // produce inner-join output anyway; the salted executor spreads
    // them explicitly (see executeDecided) so a null-heavy probe
    // doesn't survive as the straggler the census just detected.
    val hot: Seq[Any] =
      if (strat != "salted") Nil
      else probe.groupBy(col(keyCol)).agg(count(lit(1)).as("c"))
        .where($"c" * 1000000L >= lit(SkewSharePpm) * lit(np))
        .where(col(keyCol).isNotNull)
        .select(col(keyCol)).collect().toSeq
        .map(_.get(0)).sortBy(String.valueOf(_))
    JoinDecision(strat, nb, np, share, hot,
      nullHot = nullCnt * 1000000L >= SkewSharePpm * math.max(np, 1L))
  }

  /** Execute the decided join: `build(keyCol, …)` ⋈ `probe(keyCol, …)`.
    * All three shapes return identical rows — only the physical plan
    * differs:
    *   - broadcast: `broadcast()` hint on the build side
    *   - salted: build exploded ×[[NumSalts]], probe salted
    *     deterministically from `saltSourceCol`, equi-join on
    *     (keyCol, salt) — the hot key's rows spread across [[NumSalts]]
    *     tasks instead of one
    *   - shuffle: merge hint (sort-merge — the scale-safe default)
    *
    * `saltSourceCol` must be a probe-side column that VARIES within the
    * hot key (a line number, a payload hash — anything non-constant per
    * row); salting from a constant would put the whole hot key back on
    * one task. Defaults are the gate query's `(k, v)` shape. */
  def executeDecided(build: DataFrame, probe: DataFrame,
      decision: JoinDecision, keyCol: String = "k",
      saltSourceCol: String = "v"): DataFrame = {
    decision.strategy match {
      case "broadcast" =>
        probe.join(broadcast(build), Seq(keyCol))
      case "salted"
          if probe.sparkSession.conf
            .get("spark.sql.adaptive.skewJoin.enabled", "true") == "true"
            && probe.sparkSession.conf
            .get("spark.sql.adaptive.enabled", "true") == "true" =>
        // DEFER TO AQE: the 10⁶/10⁷/10⁸ adjudication (ScaleBench
        // salt_vs_aqe, planted 30%-share hot key, row-identical xor
        // across all forms) measured AQE's runtime skew split ahead of
        // every manual form at every scale — 10⁸: AQE 8.4 s vs plain
        // 13.6 s vs targeted-salt 15.4 s vs full-salt 26.9 s; at
        // 10⁶/10⁷ the hot partition is under the split threshold and
        // AQE's no-op overhead is ~0. The census still DETECTS the skew
        // (the decision string stays "salted" — it is the evidence an
        // operator of this name must surface); execution hands the
        // split to the engine layer that can size it at runtime.
        probe.join(build.hint("merge"), Seq(keyCol))
      case "salted" =>
        // No runtime skew splitting available: TARGETED manual salting,
        // the measured-best manual form (15.4 s vs full-salt 26.9 s at
        // 10⁸ — the full explode's cost scales with the build, the
        // targeted one's with the skew).
        // Collision-proof internal name: a user frame may legitimately
        // carry a column called "salt", and clobbering it only on the
        // salted decision would make the three strategies return
        // different schemas depending on the runtime census
        val saltCol = "__graft_salt"
        // TARGETED salting: only rows of the census-identified hot keys
        // are spread — non-hot rows keep salt 0 on both sides, so the
        // build-side explode costs hot-build-rows × NumSalts, not
        // build × NumSalts. The 10⁶/10⁷/10⁸ adjudication (ScaleBench
        // salt_vs_aqe) showed the FULL explode is what made pre-salting
        // lose to AQE's runtime skew split at every scale: its cost
        // scales with the build, while the straggler it buys back
        // scales with the skew. The hot set is driver metadata (≤ 10
        // keys by the SkewSharePpm bound) riding into codegen as an
        // isin literal — no broadcast join stage needed.
        val hotSet = decision.hotKeys
        // empty hotKeys + nullHot = the census found the NULL key as
        // the ONLY >=share slice: the build stays UNEXPLODED (salt 0
        // everywhere) and only the null probe rows spread below —
        // exploding the build would buy nothing (nulls never match).
        // Empty hotKeys WITHOUT the flag = no census detail: salt all,
        // the conservative hand-built-decision fallback.
        val isHot: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
          k => if (hotSet.nonEmpty) k.isin(hotSet: _*)
          else if (decision.nullHot) lit(false)
          else lit(true)
        val b = build.withColumn(saltCol,
          explode(when(isHot(col(keyCol)),
            sequence(lit(0), lit(NumSalts - 1)))
            .otherwise(sequence(lit(0), lit(0)))))
        // salt from a HASH of the source column, not its residue: values
        // stuck in one residue class (constant status codes, small line
        // numbers) would otherwise re-concentrate the hot key on few
        // salts
        // NULL-keyed probe rows also get the spread salt: they can
        // never match an equi-join (so output is unchanged), but with
        // salt 0 they would all hash to ONE task of the exchange — if
        // the census fired because of a null-heavy probe, leaving them
        // unspread preserves exactly the straggler being salted away.
        val p = probe.withColumn(saltCol,
          when(isHot(col(keyCol)) || col(keyCol).isNull,
            pmod(xxhash64(col(saltSourceCol)), lit(NumSalts.toLong))
              .cast("int"))
            .otherwise(lit(0)))
        p.join(b.hint("merge"), Seq(keyCol, saltCol)).drop(saltCol)
      case _ =>
        probe.join(build.hint("merge"), Seq(keyCol))
    }
  }

  /** Gate query: three (build, probe) pairs engineered to hit all three
    * decisions, each executed THROUGH its decision, reporting the census
    * inputs, the choice, and a checksum over the executed join so the
    * oracle verifies the chosen plan produced exactly the right rows:
    *   - nation ⋈ customer — 25 build rows → broadcast
    *   - orders ⋈ lineitem — large build, max 7 rows/key → shuffle
    *   - orderkey%3-collapsed key (key 0 owns ~⅓ of lineitem) with a
    *     DEDUPED build side → salted
    * Decisions are stable across every test SF: nation is constant, and
    * orders ≥ 1500 rows at sf ≥ 0.001. */
  def adaptiveJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    def onecase(name: String, build: DataFrame, probe: DataFrame,
        dec: JoinDecision): DataFrame = {
      executeDecided(build, probe, dec)
        .agg(count(lit(1)).as("join_rows"),
          coalesce(sum($"p" + $"v"), lit(0L)).as("chk"))
        .select(lit(name).as("case_name"), lit(dec.strategy).as("decision"),
          lit(dec.buildRows).as("build_rows"), lit(dec.probeRows).as("probe_rows"),
          lit(dec.topSharePpm).as("top_share_ppm"), $"join_rows", $"chk")
    }
    val aBuild = Tables.nation(s, d)
      .select($"n_nationkey".cast("long").as("k"),
        $"n_regionkey".cast("long").as("p"))
    val aProbe = Tables.customer(s, d)
      .select($"c_nationkey".cast("long").as("k"),
        $"c_custkey".cast("long").as("v"))
    val bBuild = Tables.orders(s, d)
      .select($"o_orderkey".cast("long").as("k"),
        $"o_custkey".cast("long").as("p"))
    val bProbe = Tables.lineitem(s, d)
      .select($"l_orderkey".cast("long").as("k"),
        $"l_linenumber".cast("long").as("v"))
    val skew = when($"l_orderkey" % 3 === 0, 0L).otherwise($"l_orderkey")
    val cProbe = Tables.lineitem(s, d)
      .select(skew.cast("long").as("k"), $"l_linenumber".cast("long").as("v"))
    val cBuild = Tables.orders(s, d)
      .select(when($"o_orderkey" % 3 === 0, 0L).otherwise($"o_orderkey")
        .cast("long").as("k"))
      .groupBy($"k").agg(count(lit(1)).as("p"))
    // r13 (guide §2.6): the three census collects are independent
    // driver round-trips (decideJoin is pure — no shared transients),
    // so they overlap from three driver threads; the decided joins
    // still execute through ONE unioned plan as before.
    val cases = Seq(("a_dim", aBuild, aProbe), ("b_fact", bBuild, bProbe),
      ("c_skew", cBuild, cProbe))
    graft.ops.Par.concurrently(cases.map { case (n, b, p) =>
      () => onecase(n, b, p, decideJoin(b, p))
    })
      .reduce(_.unionByName(_))
      .orderBy($"case_name")
  }

  override def defs: Seq[QueryDef] = Seq(
    QueryDef(
      // per case: census inputs, the decision under the same thresholds,
      // and join_rows/chk recomputed with a plain SQL join — identical
      // output regardless of the physical strategy the decision picked
      "q_adaptive_join", adaptiveJoin, Some("""
        WITH
        a_build AS (SELECT CAST(n_nationkey AS BIGINT) AS k,
                           CAST(n_regionkey AS BIGINT) AS p FROM nation),
        a_probe AS (SELECT CAST(c_nationkey AS BIGINT) AS k,
                           CAST(c_custkey AS BIGINT) AS v FROM customer),
        b_build AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
                           CAST(o_custkey AS BIGINT) AS p FROM orders),
        b_probe AS (SELECT CAST(l_orderkey AS BIGINT) AS k,
                           CAST(l_linenumber AS BIGINT) AS v FROM lineitem),
        c_build AS (SELECT k, CAST(count(*) AS BIGINT) AS p FROM
                      (SELECT CASE WHEN o_orderkey % 3 = 0 THEN 0
                              ELSE o_orderkey END AS k FROM orders)
                    GROUP BY k),
        c_probe AS (SELECT CAST(CASE WHEN l_orderkey % 3 = 0 THEN 0
                           ELSE l_orderkey END AS BIGINT) AS k,
                           CAST(l_linenumber AS BIGINT) AS v FROM lineitem),
        stats AS (
          SELECT 'a_dim' AS case_name,
                 (SELECT count(*) FROM a_build) AS build_rows,
                 (SELECT count(*) FROM a_probe) AS probe_rows,
                 (SELECT max(c) FROM (SELECT count(*) AS c FROM a_probe
                    GROUP BY k)) AS top_cnt,
                 (SELECT count(*) FROM a_probe JOIN a_build USING (k))
                   AS join_rows,
                 (SELECT coalesce(sum(p + v), 0) FROM a_probe
                    JOIN a_build USING (k)) AS chk
          UNION ALL
          SELECT 'b_fact',
                 (SELECT count(*) FROM b_build),
                 (SELECT count(*) FROM b_probe),
                 (SELECT max(c) FROM (SELECT count(*) AS c FROM b_probe
                    GROUP BY k)),
                 (SELECT count(*) FROM b_probe JOIN b_build USING (k)),
                 (SELECT coalesce(sum(p + v), 0) FROM b_probe
                    JOIN b_build USING (k))
          UNION ALL
          SELECT 'c_skew',
                 (SELECT count(*) FROM c_build),
                 (SELECT count(*) FROM c_probe),
                 (SELECT max(c) FROM (SELECT count(*) AS c FROM c_probe
                    GROUP BY k)),
                 (SELECT count(*) FROM c_probe JOIN c_build USING (k)),
                 (SELECT coalesce(sum(p + v), 0) FROM c_probe
                    JOIN c_build USING (k)))
        SELECT case_name,
               CASE WHEN build_rows <= 1000 THEN 'broadcast'
                    WHEN top_cnt * 1000000 // greatest(probe_rows, 1)
                         >= 100000 THEN 'salted'
                    ELSE 'shuffle' END AS decision,
               CAST(build_rows AS BIGINT) AS build_rows,
               CAST(probe_rows AS BIGINT) AS probe_rows,
               CAST(top_cnt * 1000000 // greatest(probe_rows, 1) AS BIGINT)
                 AS top_share_ppm,
               CAST(join_rows AS BIGINT) AS join_rows,
               CAST(chk AS BIGINT) AS chk
        FROM stats ORDER BY case_name""")),
    QueryDef(
      "q_event_transitions", eventTransitions, Some("""
        WITH o AS (
          SELECT user_id, event_type,
                 lag(event_type) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
          FROM events),
        t AS (
          SELECT prev_type, event_type AS next_type,
                 CAST(count(*) AS BIGINT) AS n_trans
          FROM o WHERE prev_type IS NOT NULL
          GROUP BY prev_type, event_type),
        r AS (
          SELECT prev_type, CAST(sum(n_trans) AS BIGINT) AS n_from
          FROM t GROUP BY prev_type)
        SELECT t.prev_type, t.next_type, t.n_trans, r.n_from,
               t.n_trans * 1000000 // r.n_from AS p_ppm
        FROM t JOIN r USING (prev_type)
        ORDER BY prev_type, next_type""")),
    QueryDef(
      "q_skew_profile", (s, d) => skewProfile(s, d), Some("""
        WITH k AS (
          SELECT l_orderkey, CAST(count(*) AS BIGINT) AS cnt
          FROM lineitem GROUP BY l_orderkey),
        rk AS (
          SELECT cnt,
                 CAST(row_number() OVER (ORDER BY cnt, l_orderkey)
                   AS BIGINT) AS i
          FROM k),
        a AS (
          SELECT CAST(count(*) AS BIGINT) AS n_keys,
                 CAST(sum(cnt) AS BIGINT) AS n_rows,
                 CAST(max(cnt) AS BIGINT) AS max_cnt,
                 CAST(sum(i * cnt) AS BIGINT) AS s1
          FROM rk)
        SELECT n_keys, n_rows, max_cnt,
               max_cnt * 1000000 // n_rows AS top_share_ppm,
               (2 * s1 - (n_keys + 1) * n_rows) * 1000000
                 // (n_keys * n_rows) AS gini_ppm
        FROM a""")),
    QueryDef(
      "q_group_quantiles", groupQuantiles, Some("""
        WITH h AS (
          SELECT event_type,
                 CAST(floor(value * 1000) AS BIGINT) AS v,
                 CAST(count(*) AS BIGINT) AS c
          FROM events GROUP BY event_type, v),
        t AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n
              FROM h GROUP BY event_type),
        cu AS (
          SELECT h.event_type, h.v, t.n,
                 CAST(sum(h.c) OVER (PARTITION BY h.event_type
                   ORDER BY h.v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum
          FROM h JOIN t USING (event_type))
        SELECT event_type, max(n) AS n_events,
               min(CASE WHEN cum * 100 >= n * 50 THEN v END) AS p50_milli,
               min(CASE WHEN cum * 100 >= n * 90 THEN v END) AS p90_milli,
               min(CASE WHEN cum * 100 >= n * 99 THEN v END) AS p99_milli
        FROM cu GROUP BY event_type
        ORDER BY event_type""")),
    QueryDef(
      "q_join_census", joinCensus, Some("""
        WITH a AS (
          SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS ca
          FROM orders GROUP BY o_orderkey),
        b AS (
          SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS cb
          FROM lineitem GROUP BY l_orderkey),
        m AS (
          SELECT CAST(count(*) AS BIGINT) AS n_common_keys,
                 CAST(sum(ca * cb) AS BIGINT) AS join_rows
          FROM a JOIN b USING (k)),
        ta AS (SELECT CAST(count(*) AS BIGINT) AS n_keys_a FROM a),
        tb AS (SELECT CAST(count(*) AS BIGINT) AS n_keys_b FROM b)
        SELECT n_keys_a, n_keys_b, n_common_keys, join_rows,
               n_common_keys * 1000000 // n_keys_a AS coverage_a_ppm,
               n_common_keys * 1000000 // n_keys_b AS coverage_b_ppm
        FROM m, ta, tb""")),
    QueryDef(
      "q_anomaly_mad", anomalyMad, Some("""
        WITH h AS (
          SELECT event_type,
                 CAST(floor(value * 1000) AS BIGINT) AS v,
                 CAST(count(*) AS BIGINT) AS c
          FROM events GROUP BY event_type, v),
        t1 AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n
               FROM h GROUP BY event_type),
        c1 AS (
          SELECT h.event_type, h.v, h.c, t1.n,
                 CAST(sum(h.c) OVER (PARTITION BY h.event_type ORDER BY h.v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum
          FROM h JOIN t1 USING (event_type)),
        med AS (
          SELECT event_type,
                 min(CASE WHEN cum >= (n + 1) // 2 THEN v END)
                   + min(CASE WHEN cum >= n // 2 + 1 THEN v END) AS m2,
                 max(n) AS n
          FROM c1 GROUP BY event_type),
        d AS (
          SELECT h.event_type, abs(2 * h.v - med.m2) AS v,
                 CAST(sum(h.c) AS BIGINT) AS c
          FROM h JOIN med USING (event_type)
          GROUP BY h.event_type, abs(2 * h.v - med.m2)),
        t2 AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n
               FROM d GROUP BY event_type),
        c2 AS (
          SELECT d.event_type, d.v, d.c, t2.n,
                 CAST(sum(d.c) OVER (PARTITION BY d.event_type ORDER BY d.v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum
          FROM d JOIN t2 USING (event_type)),
        mad AS (
          SELECT event_type,
                 min(CASE WHEN cum >= (n + 1) // 2 THEN v END)
                   + min(CASE WHEN cum >= n // 2 + 1 THEN v END) AS mad4
          FROM c2 GROUP BY event_type)
        SELECT d.event_type,
               max(med.n) AS n_events,
               max(med.m2) AS med2_milli,
               max(mad.mad4) AS mad4_milli,
               CAST(sum(CASE WHEN 2 * d.v > 3 * mad.mad4 THEN d.c
                 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM d JOIN mad USING (event_type) JOIN med USING (event_type)
        GROUP BY d.event_type
        ORDER BY d.event_type"""))
  )
}
