package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{QueryDef, QueryModule, Tables}

/** Relational breadth beyond the reference's SQL surface (SURVEY §2.5-2.6
  * lists joins/limits/set-ops as absent from the reference; they are table
  * stakes for the engine, so they ship here with oracles).
  *
  * Scale notes baked into each query:
  *  - sums over doubles route through DECIMAL (exact, order-independent —
  *    a straight double sum would be nondeterministic under parallelism);
  *  - dimension joins broadcast (nation/customer side), so the fact scan
  *    never shuffles for the join;
  *  - filters sit directly on the scan so Parquet gets them as
  *    PushedFilters (PlanAuditSpec pins this).
  */
object Relational extends QueryModule {

  /** TPC-H Q1-shaped pricing summary: one hash-aggregate, partial+final. */
  def lineitemAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum($"l_extendedprice".cast("decimal(18,2)")).cast("double")
          .as("sum_price"),
        count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** Predicate-pushdown showcase: date-range + quantity filter reach the
    * parquet scan. */
  def shipdateFilter(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .where($"l_shipdate" >= lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00"))
        && $"l_shipdate" < lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00"))
        && $"l_quantity" > 45.0)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .orderBy($"l_returnflag")
  }

  /** Revenue per nation: fact-side aggregate first (shrinks the join
    * input), then broadcast dimension joins — no fact shuffle beyond the
    * groupBy key. */
  def revenueByNation(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val perCust = Tables.orders(s, d)
      .groupBy($"o_custkey")
      .agg(sum($"o_totalprice".cast("decimal(18,2)")).as("cust_rev"))
    perCust
      .join(broadcast(Tables.customer(s, d)
        .select($"c_custkey", $"c_nationkey")),
        $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(s, d)
        .select($"n_nationkey", $"n_name")),
        $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(sum($"cust_rev").cast("double").as("revenue"),
        count(lit(1)).as("n_customers"))
      .orderBy($"n_name")
  }

  /** Semi-join (EXISTS) + anti-join (NOT EXISTS): orders that do / don't
    * have any heavy lineitem. */
  def orderLineitemSemiAnti(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val heavy = Tables.lineitem(s, d)
      .where($"l_quantity" > 49.0)
      .select($"l_orderkey")
    val o = Tables.orders(s, d)
    val withHeavy = o.join(heavy, $"o_orderkey" === $"l_orderkey", "left_semi")
      .groupBy($"o_orderpriority").agg(count(lit(1)).as("n_with_heavy"))
    val withoutHeavy = o.join(heavy, $"o_orderkey" === $"l_orderkey", "left_anti")
      .groupBy($"o_orderpriority").agg(count(lit(1)).as("n_without_heavy"))
    withHeavy.join(withoutHeavy, Seq("o_orderpriority"), "full_outer")
      .orderBy($"o_orderpriority")
  }

  /** As-of join: attribute every event to the user's most recent
    * purchase at or before it (marketing-attribution shape). Composed
    * from built-ins per the custom-operator ladder's first rung (SURVEY
    * §4.3): union markers and probes tagged, one shuffle on the key, and
    * a carry-forward `last(ignoreNulls)` window — sort-merge-style with
    * NO range-condition join explosion, the shape that survives 100 TB
    * (a theta-join `purchase.ts <= event.ts` would explode to all prior
    * purchases per event). A purchase attributes to itself (markers sort
    * before probes at equal timestamps). */
  /** As-of join WITH TOLERANCE (the kdb `aj`/Flink temporal-join form):
    * each event matches the latest same-user purchase at-or-before it,
    * but only within a 2-hour window — an unboundedly-stale match is no
    * match. Same union + carry-forward shape as [[asofJoin]] (one
    * shuffle, no range explosion); the marker's TIME rides along in a
    * second ignore-nulls carry from the same row, and the bound check is
    * integer µs arithmetic at the end. A probe outside tolerance emits
    * NULLs, preserving the probe set (left-join semantics). */
  def asofTolerance(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tolUs = 7200000000L // 2 hours in epoch micros
    val e = Tables.events(s, d)
    val markers = e.where($"event_type" === "purchase").select(
      $"user_id".as("k"), unix_micros($"ts").as("t_us"), lit(0).as("kind"),
      $"event_id".as("purchase_id"), lit(null).cast("long").as("event_id"))
    val probes = e.select(
      $"user_id".as("k"), unix_micros($"ts").as("t_us"), lit(1).as("kind"),
      lit(null).cast("long").as("purchase_id"), $"event_id")
    val w = Window.partitionBy($"k")
      .orderBy($"t_us", $"kind", $"purchase_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    markers.unionByName(probes)
      .withColumn("lp", last($"purchase_id", ignoreNulls = true).over(w))
      .withColumn("lt",
        last(when($"kind" === 0, $"t_us"), ignoreNulls = true).over(w))
      .where($"kind" === 1)
      .select($"event_id", $"k".as("user_id"),
        when($"t_us" - $"lt" <= tolUs, $"lp").as("purchase_id"),
        when($"t_us" - $"lt" <= tolUs, $"t_us" - $"lt").as("gap_us"))
      .orderBy($"event_id")
  }

  def asofJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, d)
    val markers = e.where($"event_type" === "purchase").select(
      $"user_id".as("k"), $"ts".as("t"), lit(0).as("kind"),
      $"event_id".as("purchase_id"), lit(null).cast("long").as("event_id"))
    val probes = e.select(
      $"user_id".as("k"), $"ts".as("t"), lit(1).as("kind"),
      lit(null).cast("long").as("purchase_id"), $"event_id")
    val w = Window.partitionBy($"k")
      .orderBy($"t", $"kind", $"purchase_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    markers.unionByName(probes)
      .withColumn("last_purchase_id",
        last($"purchase_id", ignoreNulls = true).over(w))
      .where($"kind" === 1)
      .select($"event_id", $"k".as("user_id"), $"last_purchase_id")
      .orderBy($"event_id")
  }

  /** RANGE JOIN without a range-explosion plan: every purchase opens a
    * 30-minute attribution window and the join finds ALL events inside
    * it (many-to-many interval containment — the as-of join's sibling,
    * which keeps only the latest marker). A naive theta-join on
    * `ts BETWEEN start AND end` plans a nested-loop product; instead
    * both sides are keyed into fixed-width time BUCKETS sized to the
    * window, so a window covers exactly 2 buckets and an event exactly 1
    * — the candidate join is a plain equi-join on (user_id, bucket) with
    * the exact range predicate verifying candidates. Shuffle volume is
    * 2x the windows + 1x the events, at any scale. */
  def rangeJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val windowUs = 30L * 60 * 1000000 // 30 min, in epoch micros
    val e = Tables.events(s, d)
    val purchases = e.where($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"),
        unix_micros($"ts").as("p_us"))
      .withColumn("b0", floor($"p_us" / windowUs))
      .withColumn("bucket", explode(array($"b0", $"b0" + 1)))
      .drop("b0")
    val events = e.select($"user_id", $"event_id", unix_micros($"ts").as("e_us"))
      .withColumn("bucket", floor($"e_us" / windowUs))
    purchases.join(events, Seq("user_id", "bucket"))
      .where($"e_us" >= $"p_us" && $"e_us" <= $"p_us" + windowUs &&
        $"event_id" =!= $"purchase_id")
      .groupBy($"purchase_id")
      .agg(count(lit(1)).as("n_in_window"))
      .orderBy($"purchase_id")
  }

  /** Top-3 orders per customer: ranking window after one shuffle on the
    * window key.
    *
    * Bounded-aggregate audit (the rule every top-K surface was tested
    * against in rounds 9-11): the window partition is ONE CUSTOMER's
    * orders — a per-entity count bounded by business activity (TPC-H:
    * ~10 at every SF; real commerce: thousands at most), NOT by corpus
    * size. Scaling the corpus 100× adds customers (more partitions),
    * not orders per customer (partition size), so the per-partition
    * sort stays constant and the exchange is the same one any
    * per-customer aggregate pays — conversion to a bounded aggregate
    * would buy nothing here. Contrast cosineTopK et al., whose
    * candidate sets grew WITH the corpus and were converted. */
  def topOrdersPerCustomer(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(s, d)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where($"rank" <= 3)
      .select($"o_custkey", $"rank", $"o_orderkey",
        $"o_totalprice".cast("decimal(18,2)").cast("double").as("price"))
      .orderBy($"o_custkey", $"rank")
  }

  override def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_lineitem_agg", lineitemAgg, Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_price,
               count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),
    QueryDef(
      "q_shipdate_filter", shipdateFilter, Some("""
        SELECT l_returnflag, count(*) AS n_rows,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
          AND l_quantity > 45.0
        GROUP BY l_returnflag ORDER BY l_returnflag""")),
    QueryDef(
      "q_revenue_by_nation", revenueByNation, Some("""
        WITH pc AS (
          SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS cust_rev
          FROM orders GROUP BY o_custkey)
        SELECT n_name,
               CAST(sum(cust_rev) AS DOUBLE) AS revenue,
               count(*) AS n_customers
        FROM pc
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name""")),
    QueryDef(
      "q_semi_anti_join", orderLineitemSemiAnti, Some("""
        WITH heavy AS (
          SELECT DISTINCT l_orderkey FROM lineitem WHERE l_quantity > 49.0),
        wh AS (
          SELECT o_orderpriority, count(*) AS n_with_heavy FROM orders
          WHERE o_orderkey IN (SELECT l_orderkey FROM heavy)
          GROUP BY o_orderpriority),
        wo AS (
          SELECT o_orderpriority, count(*) AS n_without_heavy FROM orders
          WHERE o_orderkey NOT IN (SELECT l_orderkey FROM heavy)
          GROUP BY o_orderpriority)
        SELECT COALESCE(wh.o_orderpriority, wo.o_orderpriority)
                 AS o_orderpriority,
               n_with_heavy, n_without_heavy
        FROM wh FULL OUTER JOIN wo ON wh.o_orderpriority = wo.o_orderpriority
        ORDER BY o_orderpriority""")),
    QueryDef(
      "q_asof_tolerance", asofTolerance, Some("""
        WITH u AS (
          SELECT user_id AS k, epoch_us(ts) AS t_us, 0 AS kind,
                 event_id AS purchase_id, CAST(NULL AS BIGINT) AS event_id
          FROM events WHERE event_type = 'purchase'
          UNION ALL
          SELECT user_id AS k, epoch_us(ts) AS t_us, 1 AS kind,
                 CAST(NULL AS BIGINT) AS purchase_id, event_id
          FROM events),
        c AS (
          SELECT *,
                 last_value(purchase_id IGNORE NULLS) OVER w AS lp,
                 last_value(CASE WHEN kind = 0 THEN t_us END IGNORE NULLS)
                   OVER w AS lt
          FROM u
          WINDOW w AS (PARTITION BY k ORDER BY t_us, kind, purchase_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT event_id, k AS user_id,
               CASE WHEN t_us - lt <= 7200000000 THEN lp END
                 AS purchase_id,
               CASE WHEN t_us - lt <= 7200000000 THEN t_us - lt END
                 AS gap_us
        FROM c WHERE kind = 1 ORDER BY event_id""")),
    QueryDef(
      "q_asof_join", asofJoin, Some("""
        WITH u AS (
          SELECT user_id AS k, CAST(ts AS TIMESTAMP) AS t, 0 AS kind,
                 event_id AS purchase_id, CAST(NULL AS BIGINT) AS event_id
          FROM events WHERE event_type = 'purchase'
          UNION ALL
          SELECT user_id AS k, CAST(ts AS TIMESTAMP) AS t, 1 AS kind,
                 CAST(NULL AS BIGINT) AS purchase_id, event_id
          FROM events),
        c AS (
          SELECT *,
                 last_value(purchase_id IGNORE NULLS) OVER (
                   PARTITION BY k ORDER BY t, kind, purchase_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS last_purchase_id
          FROM u)
        SELECT event_id, k AS user_id, last_purchase_id
        FROM c WHERE kind = 1 ORDER BY event_id""")),
    QueryDef(
      // oracle = the naive theta join: bucketing must be result-invisible
      "q_range_join", rangeJoin, Some("""
        WITH p AS (
          SELECT user_id, event_id AS purchase_id,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS p_us
          FROM events WHERE event_type = 'purchase'),
        ev AS (
          SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS e_us
          FROM events)
        SELECT purchase_id, count(*) AS n_in_window
        FROM p JOIN ev ON p.user_id = ev.user_id
                      AND ev.e_us >= p.p_us
                      AND ev.e_us <= p.p_us + 1800000000
                      AND ev.event_id <> p.purchase_id
        GROUP BY purchase_id ORDER BY purchase_id""")),
    QueryDef(
      "q_top_orders_per_cust", topOrdersPerCustomer, Some("""
        SELECT o_custkey, rank, o_orderkey, price FROM (
          SELECT o_custkey, o_orderkey,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
                 row_number() OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS rank
          FROM orders) t
        WHERE rank <= 3 ORDER BY o_custkey, rank"""))
  )
}
