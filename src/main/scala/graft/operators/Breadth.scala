package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{QueryDef, QueryModule, Tables}

/** Remaining relational breadth: distinct aggregation, set operations,
  * rollup, and the skew-salting pattern (SURVEY §2.5-2.6 "absent"
  * rows that an engine at 100 TB cannot do without).
  */
object Breadth extends QueryModule {

  /** count(DISTINCT key) per group — planned by Spark as a two-phase
    * expand+aggregate, no driver-side state. */
  def distinctUsers(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .groupBy($"event_type")
      .agg(
        countDistinct($"user_id").as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy($"event_type")
  }

  /** Set ops: users who clicked but never purchased (EXCEPT), and the
    * click∩purchase overlap count (INTERSECT), unioned into one result. */
  def setOps(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, d)
    val clickers = e.where($"event_type" === "click")
      .select($"user_id").distinct()
    val buyers = e.where($"event_type" === "purchase")
      .select($"user_id").distinct()
    val exceptN = clickers.except(buyers)
      .agg(count(lit(1)).as("n")).select(lit("click_no_purchase").as("set"), $"n")
    val intersectN = clickers.intersect(buyers)
      .agg(count(lit(1)).as("n")).select(lit("click_and_purchase").as("set"), $"n")
    val unionN = clickers.union(buyers).distinct()
      .agg(count(lit(1)).as("n")).select(lit("click_or_purchase").as("set"), $"n")
    exceptN.union(intersectN).union(unionN).orderBy($"set")
  }

  /** Rollup over two grouping levels with subtotal rows. */
  def rollupAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n_rows"),
        sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
  }

  /** Skew-safe two-phase aggregation (salting): pre-aggregate on
    * (key, salt) so one hot key spreads over N reducers, then combine.
    * Exact same result as a direct groupBy — which is what the oracle
    * checks — but the shuffle key space is N× wider. On uniform test data
    * this is pure pattern demonstration; on a skewed 100 TB key it is the
    * difference between one straggler task and N balanced ones. */
  def saltedAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val salts = 8
    Tables.events(s, d)
      .withColumn("salt", pmod($"event_id", lit(salts.toLong)))
      .groupBy($"user_id", $"salt")
      .agg(count(lit(1)).as("pn"),
        sum($"value".cast("decimal(18,6)")).as("pv"))
      .groupBy($"user_id")
      .agg(sum($"pn").as("n_events"),
        sum($"pv").cast("double").as("total_value"))
      .orderBy($"user_id")
  }

  /** Skew-safe SALTED JOIN: the big (fact) side gets a random-free,
    * deterministic salt; the small (dimension) side is replicated once
    * per salt value, and the join key becomes (key, salt) — one hot key's
    * rows spread over N reducer partitions instead of one straggler.
    * Exact same rows as the plain join (every fact row meets exactly one
    * replica of its dimension row), which is what the oracle checks.
    * At 100 TB this is the manual fallback when AQE's skew-join split
    * cannot apply (e.g. pre-shuffle bucketing or non-AQE engines); the
    * deterministic salt (pmod of the fact's unique id) keeps the query
    * reproducible across runs and engines. */
  def saltedJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val salts = 8
    val orders = Tables.orders(s, d)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .withColumn("salt", pmod($"o_orderkey", lit(salts.toLong)))
    val customers = Tables.customer(s, d)
      .select($"c_custkey", $"c_mktsegment")
      .crossJoin(s.range(0, salts).select($"id".as("salt")))
    orders
      .join(customers,
        $"o_custkey" === $"c_custkey" && orders("salt") === customers("salt"))
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        sum($"o_totalprice".cast("decimal(18,2)")).cast("double")
          .as("total_price"))
      .orderBy($"c_mktsegment")
  }

  override def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_count_distinct", distinctUsers, Some("""
        SELECT event_type, count(DISTINCT user_id) AS n_users,
               count(*) AS n_events
        FROM events GROUP BY event_type ORDER BY event_type""")),
    QueryDef(
      "q_set_ops", setOps, Some("""
        WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type='click'),
             p AS (SELECT DISTINCT user_id FROM events WHERE event_type='purchase')
        SELECT 'click_and_purchase' AS "set",
               (SELECT count(*) FROM (SELECT * FROM c INTERSECT SELECT * FROM p)) AS n
        UNION ALL
        SELECT 'click_no_purchase',
               (SELECT count(*) FROM (SELECT * FROM c EXCEPT SELECT * FROM p))
        UNION ALL
        SELECT 'click_or_purchase',
               (SELECT count(*) FROM (SELECT * FROM c UNION SELECT * FROM p))
        ORDER BY "set" """)),
    QueryDef(
      "q_rollup", rollupAgg, Some("""
        SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),
    QueryDef(
      "q_salted_agg", saltedAgg, Some("""
        SELECT user_id, count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        FROM events GROUP BY user_id ORDER BY user_id""")),
    QueryDef(
      // oracle = the PLAIN join: salting must be result-invisible
      "q_salted_join", saltedJoin, Some("""
        SELECT c_mktsegment, count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment"""))
  )
}
