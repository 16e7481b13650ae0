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
    // r13: the Expand(x3)+partial-agg otherwise runs on the
    // single-partition bench scan (Par.spread: no-op at scale)
    graft.ops.Par.spread(Tables.lineitem(s, d)
      .select($"l_orderkey", $"l_returnflag", $"l_linestatus",
        $"l_quantity"), $"l_orderkey")
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n_rows"),
        sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
  }

  /** CUBE with grouping_id: all four aggregation grains of
    * (returnflag, linestatus) in one pass, each output row tagged with
    * which columns are aggregated away — the disambiguator ROLLUP's
    * NULLs lack (a NULL group value vs a subtotal row). One Expand
    * (factor 4 = grouping sets) into one hash aggregate, the same
    * planning shape as rollup; grouping_id is the standard bitmask in
    * both engines (1 bit per cubed column, MSB = first). */
  def cubeAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // r13: the Expand(x4)+partial-agg otherwise runs on the
    // single-partition bench scan (Par.spread: no-op at scale)
    graft.ops.Par.spread(Tables.lineitem(s, d)
      .select($"l_orderkey", $"l_returnflag", $"l_linestatus",
        $"l_quantity"), $"l_orderkey")
      .cube($"l_returnflag", $"l_linestatus")
      .agg(
        grouping_id().as("gid"),
        count(lit(1)).as("n_rows"),
        sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .orderBy($"gid", $"l_returnflag".asc_nulls_first,
        $"l_linestatus".asc_nulls_first)
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

  /** String rendering for min/max that both engines reproduce exactly:
    * doubles through DECIMAL(18,2) (straight double→string formatting
    * diverges between engines), timestamps through an explicit pattern
    * (Spark drops ".000", DuckDB keeps engine defaults), everything else
    * through a plain cast. */
  private def renderValue(
      dt: org.apache.spark.sql.types.DataType,
      c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = dt match {
    case org.apache.spark.sql.types.DoubleType =>
      c.cast("decimal(18,2)").cast("string")
    case org.apache.spark.sql.types.TimestampType =>
      date_format(c, "yyyy-MM-dd HH:mm:ss")
    case _ => c.cast("string")
  }

  /** Column PROFILING — the data-quality scan every ingest runs before
    * anything else touches a new drop: per column, row/null counts,
    * exact distinct cardinality, and rendered min/max.
    *
    * Scale shape: one branch per column, each a TWO-LEVEL aggregation —
    * groupBy(value) with map-side partial counts, then a global
    * roll-up of the (value, cnt) groups: n_distinct = count of non-null
    * groups, n_null/n_rows = sums of cnt. No `countDistinct` mixed into
    * a non-distinct aggregate, so Catalyst never plans the
    * row-doubling Expand; each branch's scan is pruned to its ONE
    * column (plan-audited), so at 100 TB this is n_cols cheap columnar
    * passes — embarrassingly parallel, each shuffling only the distinct
    * value groups. The union is of 1-row results: free. */
  def profile(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    val branches = df.schema.fields.toSeq.map { f =>
      df.select(col(f.name).as("v"))
        .groupBy($"v")
        .agg(count(lit(1)).as("cnt"))
        .agg(
          sum($"cnt").as("n_rows"),
          coalesce(sum(when($"v".isNull, $"cnt")), lit(0L)).as("n_null"),
          count($"v").as("n_distinct"), // non-null groups only
          renderValue(f.dataType, min($"v")).as("min_value"),
          renderValue(f.dataType, max($"v")).as("max_value"))
        .select(lit(f.name).as("col_name"), $"n_rows", $"n_null",
          $"n_distinct", $"min_value", $"max_value")
    }
    branches.reduce(_.unionByName(_)).orderBy($"col_name")
  }

  /** Gate form: profile the `orders` table. */
  def profileOrders(s: SparkSession, d: String): DataFrame =
    profile(Tables.orders(s, d))

  /** ONE-PASS approximate profile — the form a 100 TB pipeline actually
    * schedules when n_cols passes are too many: a single scan computes
    * every column's counts, HLL++ distinct estimate, and min/max
    * together (mergeable sketch buffers, no shuffle of value groups at
    * all — only the final 1-row merge moves). Spec-pinned against the
    * exact profile within HLL error bounds; the exact union form above
    * is the oracle-visible gate. */
  def profileOnePass(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    val aggs = df.schema.fields.toSeq.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(c).as(s"${f.name}__n"),
        approx_count_distinct(c).as(s"${f.name}__nd"),
        renderValue(f.dataType, min(c)).as(s"${f.name}__min"),
        renderValue(f.dataType, max(c)).as(s"${f.name}__max"))
    }
    val wide = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val cols = df.schema.fields.toSeq.map { f =>
      struct(lit(f.name).as("col_name"), $"__rows".as("n_rows"),
        ($"__rows" - col(s"${f.name}__n")).as("n_null"),
        col(s"${f.name}__nd").as("n_distinct"),
        col(s"${f.name}__min").as("min_value"),
        col(s"${f.name}__max").as("max_value"))
    }
    wide.select(explode(array(cols: _*)).as("p"))
      .select($"p.*").orderBy($"col_name")
  }

  /** PIVOT — long→wide reshaping (status categories become columns).
    * The value list is EXPLICIT: with it, Spark plans ONE aggregate pass
    * whose cells are (group × value) counters; without it, Spark first
    * runs a distinct-collect job over the pivot column to discover
    * values — an extra corpus pass plus an unbounded driver collect
    * that a 100 TB pipeline must not schedule implicitly. */
  def pivotStatus(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .groupBy($"o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select($"o_orderpriority",
        coalesce($"F", lit(0L)).as("n_f"),
        coalesce($"O", lit(0L)).as("n_o"),
        coalesce($"P", lit(0L)).as("n_p"))
      .orderBy($"o_orderpriority")
  }

  /** UNPIVOT — wide→long (the inverse reshaping): melt the pivoted
    * status columns back into (status, n) rows. A narrow Expand (each
    * input row fans to K output rows in place, no shuffle, no join);
    * gating the [[pivotStatus]] round-trip against the direct GROUP BY
    * proves the two reshapes are lossless inverses. */
  def unpivotStatus(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    pivotStatus(s, d)
      .unpivot(
        Array($"o_orderpriority"),
        Array($"n_f".as("F"), $"n_o".as("O"), $"n_p".as("P")),
        "o_orderstatus", "n")
      .where($"n" > 0)
      .orderBy($"o_orderpriority", $"o_orderstatus")
  }

  /** Per-language length-decile profile: ntile(10) over a TOTAL order
    * (n_chars, then doc_id — NTILE is only deterministic under a total
    * order, and both engines use the standard ⌈n/k⌉-then-⌊n/k⌋ bucket
    * fill), then the per-decile population and char-range. The
    * equi-populated flavor of histogram a curation pipeline uses to set
    * per-language length cutoffs (quantile floors without interpolation
    * semantics entering the picture).
    *
    * Scale: one shuffle on lang for the window, reused by the (lang,
    * decile) aggregate's partial phase; nothing driver-side. */
  def lengthDeciles(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"n_chars", $"doc_id")
    Tables.documents(s, d)
      .select($"lang", $"n_chars", $"doc_id")
      .withColumn("decile", ntile(10).over(w).cast("long"))
      .groupBy($"lang", $"decile")
      .agg(
        count(lit(1)).as("n_docs"),
        min($"n_chars").as("min_chars"),
        max($"n_chars").as("max_chars"))
      .orderBy($"lang", $"decile")
  }

  override def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_length_deciles", lengthDeciles, Some("""
        SELECT lang, decile,
               CAST(count(*) AS BIGINT) AS n_docs,
               min(n_chars) AS min_chars,
               max(n_chars) AS max_chars
        FROM (SELECT lang, n_chars,
                     CAST(ntile(10) OVER (PARTITION BY lang
                       ORDER BY n_chars, doc_id) AS BIGINT) AS decile
              FROM documents)
        GROUP BY lang, decile ORDER BY lang, decile""")),
    QueryDef(
      "q_pivot", pivotStatus, Some("""
        SELECT o_orderpriority,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_f,
               CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_o,
               CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_p
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),
    QueryDef(
      "q_unpivot", unpivotStatus, Some("""
        SELECT o_orderpriority, o_orderstatus,
               CAST(count(*) AS BIGINT) AS n
        FROM orders GROUP BY o_orderpriority, o_orderstatus
        ORDER BY o_orderpriority, o_orderstatus""")),
    QueryDef(
      "q_profile", profileOrders, Some("""
        SELECT 'o_orderkey' AS col_name, count(*) AS n_rows,
               count(*) - count(o_orderkey) AS n_null,
               count(DISTINCT o_orderkey) AS n_distinct,
               CAST(min(o_orderkey) AS VARCHAR) AS min_value,
               CAST(max(o_orderkey) AS VARCHAR) AS max_value
        FROM orders
        UNION ALL
        SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
               count(DISTINCT o_custkey),
               CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
               count(DISTINCT o_orderstatus),
               min(o_orderstatus), max(o_orderstatus)
        FROM orders
        UNION ALL
        SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
               count(DISTINCT o_totalprice),
               CAST(CAST(min(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
               CAST(CAST(max(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_orderdate', count(*), count(*) - count(o_orderdate),
               count(DISTINCT o_orderdate),
               strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S'),
               strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S')
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
               count(DISTINCT o_orderpriority),
               min(o_orderpriority), max(o_orderpriority)
        FROM orders
        ORDER BY col_name""")),
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
      "q_cube", cubeAgg, Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus)
                 AS BIGINT) AS gid,
               count(*) AS n_rows,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_qty
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),
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
