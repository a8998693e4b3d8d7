package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Layout

/** Columnar-analytics surface over the TPC-H-ish tables: scan-heavy
  * aggregation, broadcast star join, event windowing. These anchor the
  * benchmark and prove plan quality (pushdown, broadcast, partial agg).
  */
object AnalyticsQueries {

  def q1(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(expr("l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(decRevenue).cast(DoubleType), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 2).as("avg_qty"),
        round(avg("l_extendedprice"), 2).as("avg_price"),
        count(lit(1)).as("count_order"))

  /** OLAP CUBE over Q1's grouping — all four grouping sets in ONE pass:
    * Spark's Expand operator replicates each post-filter row once per
    * grouping set BEFORE the single hash aggregate, so subtotals and the
    * grand total cost one shuffle, not four scans (the same plan a
    * reporting layer wants at 100 TB: |sets|× map-side rows, partial agg
    * before the exchange). `gid` is the standard grouping bitmask
    * (leftmost column = most significant bit) distinguishing a subtotal
    * NULL from a data NULL. */
  def q1Cube(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(expr("l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'"))
      .cube("l_returnflag", "l_linestatus")
      .agg(grouping_id().as("gid"),
        count(lit(1)).as("cnt"),
        round(sum("l_quantity"), 2).as("sum_qty"),
        // exact decimal sum — the CUBE grand-total row sums the ENTIRE
        // lineitem table, the worst case for association-order round(.,2)
        // boundary flips between engines (see decRevenue)
        round(sum(decRevenue).cast(DoubleType), 2)
          .as("sum_disc_price"))

  def oracleQ1Cube: String =
    s"""SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |  count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty,
      |  round(CAST(sum($DecRevSql) AS DOUBLE), 2) AS sum_disc_price
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin

  def q3(spark: SparkSession, dir: String): DataFrame = {
    val customer = spark.read.parquet(s"$dir/customer.parquet")
      .filter(col("c_mktsegment") === "BUILDING")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .filter(expr("o_orderdate < TIMESTAMP '1996-01-01 00:00:00'"))
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(expr("l_shipdate > TIMESTAMP '1996-01-01 00:00:00'"))
    lineitem
      .join(broadcast(orders), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
      .select("l_orderkey", "revenue", "o_orderdate")
  }

  /** Q18-style large-customer query: the big-big shuffle join shape (the
    * HAVING-filtered lineitem aggregate is far too large to broadcast at
    * real scale — orders⋈aggregate shuffles on orderkey, then the customer
    * dimension broadcasts). Deterministic top-100 via a unique sort key. */
  def q18(spark: SparkSession, dir: String): DataFrame = {
    val big = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_orderkey")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"))
      .filter(col("sum_qty") > 250.0)
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val customer = spark.read.parquet(s"$dir/customer.parquet")
    orders.join(big, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), round(col("o_totalprice"), 2).as("o_totalprice"),
        col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Gap-based sessionization (30-min inactivity) per user. */
  def eventsSessionize(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.Sessionize.batch(TsQueries.rawEvents(spark, dir), 1800.0)

  /** Multi-touch attribution: every click in the 24h before a purchase
    * (same user) — the batch twin of the watermarked stream-stream join
    * in [[graft.streaming.Attribution]]. */
  def eventsAttrib(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.Attribution.batch(TsQueries.rawEvents(spark, dir), 86400.0)

  /** Windowed counter-rate (streaming-expressible Prometheus rate shape):
    * daily tumbling windows per event_type. */
  def eventsRateWindow(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamRate.batch(TsQueries.rawEvents(spark, dir), 86400L)

  def eventsWindow(spark: SparkSession, dir: String): DataFrame =
    TsQueries.rawEvents(spark, dir)
      .groupBy(col("event_type"),
        (floor(col("ts") / 86400.0).cast(DoubleType) * 86400.0).as("day"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))

  /** Backward as-of join: each click enriched with the user's most recent
    * prior-or-equal purchase (value + its age in seconds). (user_id, ts)
    * is unique in the events table, so the match is deterministic. The
    * purchase ts enters as an extra payload column so the age is plain
    * output arithmetic. */
  private def asofBase(spark: SparkSession, dir: String,
                       tolerance: Option[Double]): DataFrame = {
    val ev = TsQueries.rawEvents(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("value").as("click_value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value").as("purchase_value"),
        col("ts").as("purchase_ts"))
    graft.operators.AsofJoin.backward(clicks, purchases, Seq("user_id"),
        tolerance = tolerance)
      .select(col("event_id"), col("user_id"), col("ts"), col("click_value"),
        col("purchase_value"),
        round(col("ts") - col("purchase_ts"), 6).as("purchase_age"))
  }

  def eventsAsof(spark: SparkSession, dir: String): DataFrame =
    asofBase(spark, dir, tolerance = None)

  /** Tolerance-gated as-of join: matches older than 2 hours are nulled
    * (the sensor-staleness contract — "most recent reading, but only if
    * fresh"). */
  def eventsAsofTol(spark: SparkSession, dir: String): DataFrame =
    asofBase(spark, dir, tolerance = Some(7200.0))

  private def asofSides(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val ev = TsQueries.rawEvents(spark, dir)
    (ev.filter(col("event_type") === "click")
       .select(col("event_id"), col("user_id"), col("ts"),
         col("value").as("click_value")),
     ev.filter(col("event_type") === "purchase")
       .select(col("user_id"), col("ts"), col("value").as("purchase_value"),
         col("ts").as("purchase_ts")))
  }

  /** FORWARD as-of: each click matched to the user's next purchase. */
  def eventsAsofFwd(spark: SparkSession, dir: String): DataFrame = {
    val (clicks, purchases) = asofSides(spark, dir)
    graft.operators.AsofJoin.forward(clicks, purchases, Seq("user_id"))
      .select(col("event_id"), col("user_id"), col("ts"), col("click_value"),
        col("purchase_value"),
        round(col("purchase_ts") - col("ts"), 6).as("purchase_gap"))
  }

  /** NEAREST as-of: the temporally closest purchase either way (ties →
    * the earlier one). */
  def eventsAsofNear(spark: SparkSession, dir: String): DataFrame = {
    val (clicks, purchases) = asofSides(spark, dir)
    graft.operators.AsofJoin.nearest(clicks, purchases, Seq("user_id"))
      .select(col("event_id"), col("user_id"), col("ts"), col("click_value"),
        col("purchase_value"),
        round(abs(col("purchase_ts") - col("ts")), 6).as("purchase_dist"))
  }

  def oracleQ1: String =
    s"""SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(CAST(sum($DecRevSql) AS DOUBLE), 2) AS sum_disc_price,
      |  round(avg(l_quantity), 2) AS avg_qty,
      |  round(avg(l_extendedprice), 2) AS avg_price,
      |  count(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  def oracleQ3: String =
    """SELECT l_orderkey, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue, o_orderdate
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  def oracleQ18: String =
    """WITH big AS (
      |  SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
      |  FROM lineitem GROUP BY 1 HAVING round(sum(l_quantity), 2) > 250.0)
      |SELECT c_name, c_custkey, o_orderkey, o_orderdate,
      |  round(o_totalprice, 2) AS o_totalprice, sum_qty
      |FROM orders
      |JOIN big ON o_orderkey = l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  def oracleEventsSessionize: String =
    """WITH e AS (SELECT user_id, epoch(ts) AS t, value FROM events),
      |m AS (SELECT user_id, t, value,
      |    CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t) > 1800.0
      |         THEN 1 ELSE 0 END AS ns
      |  FROM e),
      |s AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY t
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sno FROM m)
      |SELECT user_id, min(t) AS session_start, count(*) AS n_events,
      |  round(sum(value), 2) AS sum_value
      |FROM s GROUP BY user_id, sno""".stripMargin

  /** DuckDB has a native ASOF JOIN — the ideal independent oracle for the
    * sort-merge formulation in [[graft.operators.AsofJoin]]. */
  def oracleEventsAsof: String =
    """SELECT l.event_id, l.user_id, epoch(l.ts) AS ts,
      |  l.value AS click_value, r.value AS purchase_value,
      |  round(epoch(l.ts) - epoch(r.ts), 6) AS purchase_age
      |FROM (SELECT * FROM events WHERE event_type = 'click') l
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      |  ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin

  /** Windowed-rate replica: endpoint selection via composite-ordered
    * row_number (DuckDB's arg_max/min cannot take a struct key). */
  def oracleEventsRateWindow: String =
    """WITH e AS (SELECT event_type, epoch(ts) AS ts, event_id, value FROM events),
      |w AS (SELECT *, floor(ts / 86400) * 86400 AS win_start FROM e),
      |o AS (SELECT *,
      |    row_number() OVER (PARTITION BY event_type, win_start ORDER BY ts, event_id) AS rf,
      |    row_number() OVER (PARTITION BY event_type, win_start ORDER BY ts DESC, event_id DESC) AS rl
      |  FROM w)
      |SELECT event_type, win_start, CAST(count(*) AS BIGINT) AS n_events,
      |  CASE WHEN max(ts) > min(ts) THEN
      |    round((max(CASE WHEN rl = 1 THEN value END) - max(CASE WHEN rf = 1 THEN value END))
      |      / (max(ts) - min(ts)), 6) END AS rate
      |FROM o GROUP BY 1, 2""".stripMargin

  /** Interval-join replica: user equi-key + time-range predicates. */
  def oracleEventsAttrib: String =
    """SELECT p.event_id AS purchase_id, p.user_id,
      |  epoch(p.ts) AS purchase_ts, p.value AS purchase_value,
      |  c.event_id AS click_id,
      |  round(epoch(p.ts) - epoch(c.ts), 6) AS touch_age
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id
      | AND epoch(c.ts) >= epoch(p.ts) - 86400
      | AND epoch(c.ts) <= epoch(p.ts)""".stripMargin

  /** The tolerance mode stated in SQL: the as-of match stands, then
    * every right field is nulled when it is older than the bound. */
  def oracleEventsAsofTol: String =
    """SELECT l.event_id, l.user_id, epoch(l.ts) AS ts,
      |  l.value AS click_value,
      |  CASE WHEN epoch(l.ts) - epoch(r.ts) <= 7200.0 THEN r.value END AS purchase_value,
      |  CASE WHEN epoch(l.ts) - epoch(r.ts) <= 7200.0
      |    THEN round(epoch(l.ts) - epoch(r.ts), 6) END AS purchase_age
      |FROM (SELECT * FROM events WHERE event_type = 'click') l
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      |  ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin

  /** DuckDB ASOF with the comparison flipped = the forward join. */
  def oracleEventsAsofFwd: String =
    """SELECT l.event_id, l.user_id, epoch(l.ts) AS ts,
      |  l.value AS click_value, r.value AS purchase_value,
      |  round(epoch(r.ts) - epoch(l.ts), 6) AS purchase_gap
      |FROM (SELECT * FROM events WHERE event_type = 'click') l
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      |  ON l.user_id = r.user_id AND l.ts <= r.ts""".stripMargin

  /** Nearest = both directed ASOF joins + the closer-wins CASE (ties →
    * backward), stated independently of the engine's one-pass window. */
  def oracleEventsAsofNear: String =
    """WITH l AS (SELECT * FROM events WHERE event_type = 'click'),
      |r AS (SELECT * FROM events WHERE event_type = 'purchase'),
      |bw AS (SELECT l.event_id, r.value AS bv, epoch(l.ts) - epoch(r.ts) AS bage
      |  FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts),
      |fw AS (SELECT l.event_id, r.value AS fv, epoch(r.ts) - epoch(l.ts) AS fage
      |  FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts <= r.ts)
      |SELECT l.event_id, l.user_id, epoch(l.ts) AS ts, l.value AS click_value,
      |  CASE WHEN fv IS NULL THEN bv WHEN bv IS NULL THEN fv
      |       WHEN bage <= fage THEN bv ELSE fv END AS purchase_value,
      |  round(CASE WHEN fv IS NULL THEN bage WHEN bv IS NULL THEN fage
      |       WHEN bage <= fage THEN bage ELSE fage END, 6) AS purchase_dist
      |FROM l JOIN bw USING (event_id) JOIN fw USING (event_id)""".stripMargin

  def oracleEventsWindow: String =
    """SELECT event_type, floor(epoch(ts) / 86400.0) * 86400.0 AS day,
      |  count(*) AS cnt, round(sum(value), 2) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** First-touch conversion funnel view → click → purchase within 6 h:
    * one bounded per-user min-aggregate per step, no per-user event-log
    * windows. */
  def eventsFunnel(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.firstTouch(TsQueries.rawEvents(spark, dir),
      Seq("view", "click", "purchase"), window = 21600.0)

  def oracleEventsFunnel: String =
    """WITH e AS (SELECT user_id, epoch(ts) AS ts, event_type FROM events),
      |s1 AS (SELECT user_id, min(ts) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (SELECT s1.user_id, s1.t1, min(x.ts) AS t2 FROM s1 LEFT JOIN e x
      |  ON x.user_id = s1.user_id AND x.event_type = 'click'
      |     AND x.ts > s1.t1 AND x.ts <= s1.t1 + 21600.0
      |  GROUP BY 1, 2),
      |s3 AS (SELECT s2.user_id, s2.t1, s2.t2, min(x.ts) AS t3 FROM s2 LEFT JOIN e x
      |  ON x.user_id = s2.user_id AND x.event_type = 'purchase'
      |     AND x.ts > s2.t2 AND x.ts <= s2.t1 + 21600.0
      |  GROUP BY 1, 2, 3)
      |SELECT user_id, t1, t2, t3,
      |  CAST(1 + CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END
      |         + CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END AS INT) AS steps_reached,
      |  t3 IS NOT NULL AS converted,
      |  CASE WHEN t3 IS NOT NULL THEN round(t3 - t1, 6) END AS duration
      |FROM s3""".stripMargin

  /** Per-lineitem revenue in EXACT DECIMAL: prices/discounts are 2-decimal
    * money, so casting to DECIMAL(12,2) before the multiply makes every
    * partial sum exact and the aggregate independent of summation order —
    * the property a DOUBLE revenue sum loses at scale, where a last-ULP
    * association difference between engines lands on the round(…,2)
    * half-way boundary and flips the published cent (observed: q5_region
    * at sf1, 1 nation in 5 off by exactly 0.01 before this). Division
    * back to double only AFTER the exact sums (the sums fit a double's
    * 53-bit mantissa with room to spare). */
  private def decRevenue: org.apache.spark.sql.Column =
    col("l_extendedprice").cast("decimal(12,2)") *
      (lit(BigDecimal(1)).cast("decimal(3,2)") -
        col("l_discount").cast("decimal(3,2)"))
  private val DecRevSql: String =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * " +
      "(CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"

  /** Q14-style PROMO revenue share: lineitem ⋈ broadcast(part) over one
    * ship month, conditional revenue ratio — the classic "small dimension
    * drives a conditional aggregate over the fact table" shape. The month
    * filter pushes to the lineitem scan; part broadcasts (it is always
    * dimension-sized); ONE fact scan, zero fact shuffles (the aggregate
    * is global, map-side combined to a single row). */
  def q14Promo(spark: SparkSession, dir: String): DataFrame = {
    val part = spark.read.parquet(s"$dir/part.parquet")
      .select(col("p_partkey"), col("p_type"))
    spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(expr("l_shipdate >= TIMESTAMP '1996-03-01 00:00:00' AND " +
        "l_shipdate < TIMESTAMP '1996-04-01 00:00:00'"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .agg(round(
        lit(100.0) *
          sum(when(col("p_type") === "PROMO", decRevenue)
            .otherwise(lit(BigDecimal(0)))).cast(DoubleType) /
          sum(decRevenue).cast(DoubleType), 4)
        .as("promo_revenue_pct"))
  }

  def oracleQ14Promo: String =
    s"""SELECT round(100.0 *
      |    CAST(sum(CASE WHEN p_type = 'PROMO' THEN $DecRevSql
      |             ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE) /
      |    CAST(sum($DecRevSql) AS DOUBLE), 4) AS promo_revenue_pct
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'""".stripMargin

  /** Q5-style SNOWFLAKE revenue rollup: lineitem ⋈ supplier ⋈ nation ⋈
    * region, one region selected, revenue per nation — the two-hop
    * dimension chain every star schema grows. All three dimensions
    * broadcast (Catalyst collapses them into successive broadcast hash
    * joins on the single fact scan); the region filter prunes through
    * the chain BEFORE the fact join, so non-ASIA suppliers never match.
    * One fact scan, one |nations|-bounded aggregate exchange. */
  def q5Region(spark: SparkSession, dir: String): DataFrame = {
    val region = spark.read.parquet(s"$dir/region.parquet")
      .filter(col("r_name") === "ASIA")
    val nation = spark.read.parquet(s"$dir/nation.parquet")
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val supplier = spark.read.parquet(s"$dir/supplier.parquet")
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    spark.read.parquet(s"$dir/lineitem.parquet")
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .groupBy("n_name")
      .agg(round(sum(decRevenue).cast(DoubleType), 2).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  def oracleQ5Region: String =
    s"""SELECT n_name,
      |  round(CAST(sum($DecRevSql) AS DOUBLE), 2) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY 1""".stripMargin

  /** Q22-style ANTI JOIN: lapsed customers — no orders since 1997-07-01 —
    * listed with their segment and balance (the "missing the other side"
    * reporting shape; every sf has a non-empty answer, unlike the
    * no-orders-ever variant, which is empty on TPC-H-shaped data). The
    * date filter pushes to the orders scan and the side reduces to
    * DISTINCT custkeys BEFORE the join, so the anti probe carries keys,
    * not the fact table, and AQE is free to broadcast it. */
  def q22AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val recent = spark.read.parquet(s"$dir/orders.parquet")
      .filter(expr("o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'"))
      .select(col("o_custkey").as("c_custkey")).distinct()
    spark.read.parquet(s"$dir/customer.parquet")
      .join(recent, Seq("c_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"),
        round(col("c_acctbal"), 2).as("acctbal"))
  }

  def oracleQ22AntiJoin: String =
    """SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS acctbal
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      |                  AND o.o_orderdate >= TIMESTAMP '1997-07-01 00:00:00')""".stripMargin

  /** Per-event 24 h ROLLING window over the user's own stream — a RANGE
    * frame on event time (`RANGE BETWEEN 86400 PRECEDING AND CURRENT
    * ROW`), the standard "activity in the last N hours" feature. The
    * aggregates are count and max on purpose: both are ASSOCIATION-FREE
    * (exact in any engine), where a rolling double SUM would expose the
    * engines' different sliding-frame association (segment tree vs
    * sequential re-scan) to round-6 boundary flips. One shuffle on
    * user_id + one sort — the same cost class as any per-user window;
    * high-cardinality key, no hot partition. */
  def eventsRolling(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts").rangeBetween(-86400L, 0L)
    TsQueries.rawEvents(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("n_24h", count(lit(1)).over(w))
      .withColumn("max_24h", round(max("value").over(w), 6))
      .drop("value")
  }

  def oracleEventsRolling: String =
    """SELECT event_id, user_id, epoch(ts) AS ts,
      |  count(*) OVER w AS n_24h,
      |  round(max(value) OVER w, 6) AS max_24h
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch(ts)
      |             RANGE BETWEEN 86400.0 PRECEDING AND CURRENT ROW)""".stripMargin

  /** Daily event-type PIVOT — the wide reporting matrix (one column per
    * event type). Spark's `pivot` with an EXPLICIT value list compiles to
    * one hash aggregate of conditional counts (no extra distinct-values
    * job, no second shuffle); at 100 TB the map-side partials are
    * |days|×|types| cells regardless of row count. */
  def eventsPivot(spark: SparkSession, dir: String): DataFrame =
    TsQueries.rawEvents(spark, dir)
      .groupBy((floor(col("ts") / 86400.0).cast(LongType) * 86400L).as("day"))
      .pivot("event_type", Seq("view", "click", "purchase", "signup", "error"))
      .count()
      .na.fill(0L)

  def oracleEventsPivot: String =
    """SELECT CAST(floor(epoch(ts) / 86400.0) AS BIGINT) * 86400 AS day,
      |  count(*) FILTER (event_type = 'view') AS view,
      |  count(*) FILTER (event_type = 'click') AS click,
      |  count(*) FILTER (event_type = 'purchase') AS purchase,
      |  count(*) FILTER (event_type = 'signup') AS signup,
      |  count(*) FILTER (event_type = 'error') AS error
      |FROM events GROUP BY 1""".stripMargin

  /** Weekly signup-cohort retention matrix (offset ≤ 8 weeks): two
    * user-keyed map-side-combined aggregates, then a weeks×offsets model
    * frame — no per-user event sort anywhere. */
  def eventsRetention(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Cohort.retention(TsQueries.rawEvents(spark, dir),
      entryType = "signup", maxOffset = 8)

  def oracleEventsRetention: String =
    """WITH e AS (SELECT user_id, CAST(floor(epoch(ts) / 604800.0) AS BIGINT) AS week,
      |             event_type FROM events),
      |cohorts AS (SELECT user_id, min(week) AS cohort_week FROM e
      |            WHERE event_type = 'signup' GROUP BY 1),
      |active AS (SELECT DISTINCT user_id, week FROM e),
      |sizes AS (SELECT cohort_week, count(*) AS cohort_size FROM cohorts GROUP BY 1)
      |SELECT c.cohort_week, CAST(a.week - c.cohort_week AS INT) AS week_offset,
      |  s.cohort_size, count(*) AS active_users,
      |  round(count(*) / CAST(s.cohort_size AS DOUBLE), 6) AS retention
      |FROM cohorts c JOIN active a USING (user_id)
      |JOIN sizes s USING (cohort_week)
      |WHERE a.week - c.cohort_week BETWEEN 0 AND 8
      |GROUP BY 1, 2, 3""".stripMargin

  /** First-order next-event transition matrix with an `__end__` sink —
    * one user-keyed window, then |event_type|²-bounded frames. */
  def eventsTransitions(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Cohort.transitions(TsQueries.rawEvents(spark, dir))

  def oracleEventsTransitions: String =
    """WITH pairs AS (SELECT event_type AS from_type,
      |    coalesce(lead(event_type) OVER (PARTITION BY user_id ORDER BY ts),
      |             '__end__') AS to_type
      |  FROM events),
      |counts AS (SELECT from_type, to_type, count(*) AS cnt FROM pairs GROUP BY 1, 2)
      |SELECT from_type, to_type, cnt,
      |  round(cnt / CAST(sum(cnt) OVER (PARTITION BY from_type) AS DOUBLE), 6) AS prob
      |FROM counts""".stripMargin

  /** Morton key over (user_id, floor(value)) — the layout artifact the
    * z-ordered write sorts by ([[graft.sources.Layout]]); pure shift/
    * mask/or integer arithmetic, exact in any engine. floor() before the
    * long cast on BOTH sides: Spark's double→long cast truncates where
    * DuckDB's rounds, so the cast itself is never trusted with a
    * fractional value. */
  def zorderKey(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"),
        graft.sources.Layout.zValue(col("user_id"),
          floor(col("value")).cast(LongType), bits = 16).as("zkey"))

  def oracleZorderKey: String = {
    val terms = (0 until 16).map { b =>
      s"(((user_id >> $b) & 1) << ${2 * b}) + (((CAST(floor(value) AS BIGINT) >> $b) & 1) << ${2 * b + 1})"
    }.mkString("\n  + ")
    s"""SELECT event_id,
       |  $terms AS zkey
       |FROM events""".stripMargin
  }

  /** Q4-style EXISTS → LEFT SEMI with a RESIDUAL predicate: orders placed
    * in one quarter having at least one lineitem shipped more than 90 days
    * after the order date, counted per priority. The EXISTS condition
    * references BOTH sides (l_shipdate > o_orderdate + 90d) so the semi
    * side cannot pre-reduce to distinct keys — the join carries the
    * residual. What CAN move: the quarter filter pushes to the orders
    * scan, the lineitem scan reads only (l_orderkey, l_shipdate), and the
    * window bounds IMPLY l_shipdate > quarter_start + 90d, a derived
    * pushed filter Catalyst cannot infer across the join (it skips every
    * lineitem shipped before 1996-09-29 at the scan — at 100 TB that is
    * most of the table). Semi-join output ≤ quarter orders; the final
    * aggregate is |priorities|-bounded. */
  def q4Priority(spark: SparkSession, dir: String): DataFrame = {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .filter(expr("o_orderdate >= TIMESTAMP '1996-07-01 00:00:00' AND " +
        "o_orderdate < TIMESTAMP '1996-10-01 00:00:00'"))
    val late = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_shipdate"))
      // derived bound: o_orderdate >= 1996-07-01 ∧ l_shipdate > o+90d
      .filter(expr("l_shipdate > TIMESTAMP '1996-09-29 00:00:00'"))
    orders.join(late,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
  }

  def oracleQ4Priority: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders o
      |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
      |GROUP BY 1""".stripMargin

  /** Q6-style FORECASTING scan: one filtered pass over the fact table, a
    * single global sum — THE pushdown benchmark. All three predicates
    * reach the parquet scan as PushedFilters (shipdate range via min/max
    * row-group stats, discount + quantity bounds), the projection reads
    * exactly three columns, and the aggregate is map-side combined to one
    * row per task — zero data moves until 32 partial rows meet. Revenue
    * (price × discount) in exact decimal like every money sum. */
  def q6Forecast(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(expr("l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND " +
        "l_shipdate < TIMESTAMP '1997-01-01 00:00:00'") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24.0)
      .agg(round(sum(col("l_extendedprice").cast("decimal(12,2)") *
          col("l_discount").cast("decimal(3,2)")).cast(DoubleType), 2)
        .as("revenue"),
        count(lit(1)).as("n_items"))

  def oracleQ6Forecast: String =
    """SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |                       CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE), 2)
      |    AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24.0""".stripMargin

  /** Q7-style VOLUME SHIPPING between two nations: revenue per
    * (supp_nation, cust_nation, ship year) for the two cross pairs. The
    * scale-honest plan: both nation tags prune their side to 2/|nations|
    * of the dimension BEFORE touching the fact — suppliers broadcast into
    * the lineitem scan (supplier is always ≪ fact), customers join orders
    * on custkey (customer is too big to assume broadcastable at 100 TB —
    * that shuffle is Q7's honest first cost; AQE is free to demote it to
    * broadcast when the nation cut makes it small), then one orderkey
    * shuffle joins the two tagged halves. The cross-pair disjunction
    * ((N1,N2) ∨ (N2,N1)) filters tagged rows BEFORE the aggregate; the
    * final groupBy is 2×|years|-bounded. */
  def q7Volume(spark: SparkSession, dir: String): DataFrame = {
    val nation = spark.read.parquet(s"$dir/nation.parquet")
      .filter(col("n_name").isin("NATION_1", "NATION_2"))
      .select(col("n_nationkey"), col("n_name"))
    val supNat = spark.read.parquet(s"$dir/supplier.parquet")
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val custNat = spark.read.parquet(s"$dir/customer.parquet")
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val ordNat = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
      .join(custNat, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("cust_nation"))
    spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(expr("l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND " +
        "l_shipdate < TIMESTAMP '1998-01-01 00:00:00'"))
      .join(broadcast(supNat), col("l_suppkey") === col("s_suppkey"))
      .join(ordNat, col("l_orderkey") === col("o_orderkey"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(round(sum(decRevenue).cast(DoubleType), 2).as("revenue"))
  }

  def oracleQ7Volume: String =
    s"""SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
      |  CAST(year(l_shipdate) AS INT) AS l_year,
      |  round(CAST(sum($DecRevSql) AS DOUBLE), 2) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND ((n2.n_name = 'NATION_1' AND n1.n_name = 'NATION_2')
      |    OR (n2.n_name = 'NATION_2' AND n1.n_name = 'NATION_1'))
      |GROUP BY 1, 2, 3""".stripMargin

  /** Q10-style RETURNED-ITEM report: top-20 customers by returned revenue
    * in one quarter, with name and nation. The scale shape worth copying:
    * aggregate FIRST (custkey-keyed, map-side combined), take the exact
    * top-20 (a 20-row total order — Spark's TakeOrderedAndProject, never
    * a full sort), then BROADCAST those 20 rows back into the customer
    * dimension — the dimension is probed, never shuffled, and the revenue
    * sum is exact decimal so the top-20 cut is association-order-proof
    * (ties broken by custkey). */
  def q10Returns(spark: SparkSession, dir: String): DataFrame = {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .filter(expr("o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND " +
        "o_orderdate < TIMESTAMP '1996-04-01 00:00:00'"))
      .select(col("o_orderkey"), col("o_custkey"))
    val top = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_returnflag") === "R")
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(sum(decRevenue).as("rev_dec"))
      .orderBy(col("rev_dec").desc, col("o_custkey"))
      .limit(20)
    val nation = spark.read.parquet(s"$dir/nation.parquet")
      .select(col("n_nationkey"), col("n_name"))
    spark.read.parquet(s"$dir/customer.parquet")
      .join(broadcast(top), col("c_custkey") === col("o_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      // round the DECIMAL, then cast: round(double, 2) differs between
      // engines on shortest-repr boundaries (Spark routes through
      // BigDecimal.valueOf's string form), while decimal rounding of the
      // same exact sum is half-up in both
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        round(col("rev_dec"), 2).cast(DoubleType).as("revenue"))
  }

  def oracleQ10Returns: String =
    s"""WITH rev AS (
      |  SELECT o_custkey, sum($DecRevSql) AS rev_dec
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE l_returnflag = 'R'
      |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY 1),
      |top AS (SELECT * FROM rev ORDER BY rev_dec DESC, o_custkey LIMIT 20)
      |SELECT c_custkey, c_name, n_name,
      |  CAST(round(rev_dec, 2) AS DOUBLE) AS revenue
      |FROM top JOIN customer ON c_custkey = o_custkey
      |JOIN nation ON c_nationkey = n_nationkey""".stripMargin

  /** Q17-style small-quantity revenue: for one brand's parts, the yearly
    * revenue of lineitems whose quantity is below half that part's average
    * quantity. The textbook plan runs the correlated scalar subquery as a
    * fact self-join (two lineitem scans + two partkey exchanges); here it
    * DECORRELATES into a partitioned window — brand parts broadcast into
    * ONE lineitem scan, avg(l_quantity) OVER (PARTITION BY l_partkey)
    * rides a single partkey shuffle, and the threshold compare is a map.
    * The comparison is exact cross-engine: quantities are integral, so
    * the per-part mean is one IEEE division of exact sums in both
    * engines. Money sums in exact decimal as everywhere. */
  def q17SmallQty(spark: SparkSession, dir: String): DataFrame = {
    val brandParts = spark.read.parquet(s"$dir/part.parquet")
      .filter(col("p_brand") === "Brand#4")
      .select(col("p_partkey"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("l_partkey")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
      .withColumn("avg_qty", avg(col("l_quantity")).over(w))
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .agg(round(
        sum(col("l_extendedprice").cast("decimal(12,2)")).cast(DoubleType)
          / lit(7.0), 2).as("avg_yearly"))
  }

  def oracleQ17SmallQty: String =
    """SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
      |             / 7.0, 2) AS avg_yearly
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand = 'Brand#4'
      |  AND l_quantity < 0.5 * (SELECT avg(l2.l_quantity) FROM lineitem l2
      |                          WHERE l2.l_partkey = p_partkey)""".stripMargin

  /** BUCKETED CO-LOCATED JOIN: both sides written bucketed on the join key
    * (8 buckets, sorted within), then joined through the catalog — the
    * executed sort-merge join has ZERO shuffle exchanges (LayoutSpec pins
    * this on the plan): bucket i only meets bucket i, the network cost a
    * plain fact⋈fact join pays on EVERY run was paid once at write. The
    * merge hint keeps the plan shape independent of the scale factor
    * (broadcast would also be shuffle-free here, but only while one side
    * stays small — bucketing is the lever that still works when both
    * sides are facts). Result = the plain Q-style priority revenue
    * rollup, so the oracle is an ordinary join. */
  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bkt").toString
    Layout.writeBucketed(spark.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_orderpriority")),
      "graft_orders_bkt", s"$tmp/orders", "o_orderkey")
    Layout.writeBucketed(spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")),
      "graft_lineitem_bkt", s"$tmp/lineitem", "l_orderkey")
    Layout.readBucketed(spark, "graft_lineitem_bkt").hint("merge")
      .join(Layout.readBucketed(spark, "graft_orders_bkt"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(round(sum(decRevenue).cast(DoubleType), 2).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  def oracleBucketedJoin: String =
    s"""SELECT o_orderpriority,
      |  round(CAST(sum($DecRevSql) AS DOUBLE), 2) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1""".stripMargin

  /** Q8-style MARKET SHARE: of the revenue EUROPE customers spent on
    * STANDARD parts in 1996–97, what fraction came from NATION_5
    * suppliers, per order year. The plan composes the house patterns:
    * part filter broadcasts into the fact scan (the selective cut,
    * applied FIRST so everything downstream carries only matching
    * lineitems); the customer→nation→region chain prunes orders on the
    * custkey join (orders⋈customer is the honest shuffle — at 100 TB
    * neither side broadcasts; AQE may demote it after the region cut);
    * the supplier nation tag broadcasts; the share is a conditional /
    * total ratio of EXACT DECIMAL sums per year — a 2-row output from
    * one fact scan and two fact-sized shuffles. */
  def q8Share(spark: SparkSession, dir: String): DataFrame = {
    val part = spark.read.parquet(s"$dir/part.parquet")
      .filter(col("p_type") === "STANDARD").select("p_partkey")
    val region = spark.read.parquet(s"$dir/region.parquet")
      .filter(col("r_name") === "EUROPE")
    val custNat = spark.read.parquet(s"$dir/customer.parquet")
      .join(broadcast(spark.read.parquet(s"$dir/nation.parquet")
          .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey")),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .filter(expr("o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND " +
        "o_orderdate < TIMESTAMP '1998-01-01 00:00:00'"))
      .join(custNat, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
    val supNat = spark.read.parquet(s"$dir/supplier.parquet")
      .join(broadcast(spark.read.parquet(s"$dir/nation.parquet")
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    spark.read.parquet(s"$dir/lineitem.parquet")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supNat), col("l_suppkey") === col("s_suppkey"))
      .groupBy("o_year")
      .agg(round(
        sum(when(col("n_name") === "NATION_5", decRevenue)
          .otherwise(lit(BigDecimal(0)))).cast(DoubleType) /
          sum(decRevenue).cast(DoubleType), 6).as("mkt_share"),
        count(lit(1)).as("n_items"))
  }

  def oracleQ8Share: String =
    s"""SELECT CAST(year(o_orderdate) AS INT) AS o_year,
      |  round(CAST(sum(CASE WHEN n2.n_name = 'NATION_5' THEN $DecRevSql
      |                 ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE) /
      |        CAST(sum($DecRevSql) AS DOUBLE), 6) AS mkt_share,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |JOIN region ON n1.n_regionkey = r_regionkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |WHERE p_type = 'STANDARD' AND r_name = 'EUROPE'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY 1""".stripMargin

  /** Q9-style PRODUCT-TYPE PROFIT (adapted: no partsupp table, so the
    * unit cost is modeled as 60% of p_retailprice — the plan shape, not
    * the cost model, is the point): profit on 'red *' parts per
    * (supplier nation, ship year). Both dimensions broadcast into ONE
    * fact scan — the p_name LIKE filter prunes part before the
    * broadcast, no orders join at all (ship year comes from the fact
    * row) — and the aggregate is |nations|×|years|-bounded. All money
    * math in exact decimal: amount = disc price − 0.60·retail·qty. */
  def q9Profit(spark: SparkSession, dir: String): DataFrame = {
    val part = spark.read.parquet(s"$dir/part.parquet")
      .filter(col("p_name").like("red %"))
      .select(col("p_partkey"), col("p_retailprice"))
    val supNat = spark.read.parquet(s"$dir/supplier.parquet")
      .join(broadcast(spark.read.parquet(s"$dir/nation.parquet")
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val amount = decRevenue -
      col("p_retailprice").cast("decimal(12,2)") *
        lit(BigDecimal("0.60")).cast("decimal(3,2)") *
        col("l_quantity").cast("decimal(4,0)")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supNat), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("l_shipdate")).as("o_year"))
      // round the DECIMAL, then cast (the q10Returns lesson): rounding
      // the double flipped a cent on 2/175 rows at sf1 — a 4-decimal
      // exact sum ending in …5 rounds half-up as decimal in both
      // engines, but its double image rounds differently (Spark goes
      // through BigDecimal.valueOf's shortest-repr string)
      .agg(round(sum(amount), 2).cast(DoubleType).as("sum_profit"),
        count(lit(1)).as("n_items"))
  }

  def oracleQ9Profit: String =
    s"""SELECT n_name AS nation, CAST(year(l_shipdate) AS INT) AS o_year,
      |  CAST(round(sum($DecRevSql
      |      - CAST(p_retailprice AS DECIMAL(12,2))
      |        * CAST(0.60 AS DECIMAL(3,2))
      |        * CAST(l_quantity AS DECIMAL(4,0))), 2) AS DOUBLE)
      |    AS sum_profit,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_name LIKE 'red %'
      |GROUP BY 1, 2""".stripMargin

  /** Q13-style CUSTOMER ORDER-COUNT DISTRIBUTION: how many customers
    * placed exactly N orders, zeros included — the two-level aggregate
    * whose scale story is that BOTH levels collapse before they move:
    * orders reduce to one row per custkey (map-side combined), the left
    * join against customer preserves the zero class, and the second
    * groupBy is |distinct counts|-bounded (tiny). No sort anywhere. */
  def q13Distribution(spark: SparkSession, dir: String): DataFrame = {
    val perCust = spark.read.parquet(s"$dir/orders.parquet")
      .groupBy("o_custkey").agg(count(lit(1)).as("c_count"))
    spark.read.parquet(s"$dir/customer.parquet")
      .select("c_custkey")
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("c_count"), lit(0L)).as("c_count"))
      .groupBy("c_count").agg(count(lit(1)).as("custdist"))
  }

  def oracleQ13Distribution: String =
    """SELECT c_count, count(*) AS custdist
      |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      |      FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      |      GROUP BY 1)
      |GROUP BY 1""".stripMargin

  /** Q15-style TOP SUPPLIER(S): the supplier(s) with the maximum revenue
    * over one quarter, ties kept. The revenue table aggregates FIRST
    * (suppkey-keyed, map-side combined, EXACT DECIMAL so the max and the
    * equality join are association-order-proof); the max is a one-row
    * frame broadcast back via crossJoin — never a partition-less window
    * (which would single-task the whole frame) and never a driver-side
    * collect. */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(expr("l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND " +
        "l_shipdate < TIMESTAMP '1996-04-01 00:00:00'"))
      .groupBy(col("l_suppkey"))
      .agg(sum(decRevenue).as("rev_dec"))
    val top = rev.crossJoin(broadcast(
        rev.agg(max(col("rev_dec")).as("max_dec"))))
      .filter(col("rev_dec") === col("max_dec"))
    spark.read.parquet(s"$dir/supplier.parquet")
      .join(broadcast(top), col("s_suppkey") === col("l_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        round(col("rev_dec"), 2).cast(DoubleType).as("total_revenue"))
  }

  def oracleQ15TopSupplier: String =
    s"""WITH rev AS (
      |  SELECT l_suppkey, sum($DecRevSql) AS rev_dec
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY 1)
      |SELECT s_suppkey, s_name, CAST(round(rev_dec, 2) AS DOUBLE) AS total_revenue
      |FROM rev JOIN supplier ON s_suppkey = l_suppkey
      |WHERE rev_dec = (SELECT max(rev_dec) FROM rev)""".stripMargin

  /** Q19-style DISJUNCTIVE predicate join: revenue under an OR-of-ANDs
    * over (p_brand, p_size, l_quantity) — the shape that tests predicate
    * placement, not join strategy. Catalyst extracts each side's LOCAL
    * projection of the cross-side OR and pushes both to the scans (the
    * executed plan shows the (brand ∧ size)-disjunction on the part scan
    * AND the quantity-range disjunction on the lineitem scan — verified
    * in PLANS.md); the explicit l_quantity ≤ 40 bound collapses the
    * pushed disjunction to one range for row-group min/max pruning. The
    * exact mixed branch filter then runs on joined rows. */
  def q19Disjunct(spark: SparkSession, dir: String): DataFrame = {
    val branchPart =
      (col("p_brand") === "Brand#1" && col("p_size").between(1, 15)) ||
      (col("p_brand") === "Brand#2" && col("p_size").between(10, 30)) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(20, 50))
    val part = spark.read.parquet(s"$dir/part.parquet")
      .filter(branchPart).select("p_partkey", "p_brand", "p_size")
    val branchFull =
      (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1.0, 20.0)) ||
      (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
        col("l_quantity").between(10.0, 30.0)) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
        col("l_quantity").between(20.0, 40.0))
    spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_quantity") <= 40.0) // derived common bound
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .filter(branchFull)
      // decimal-round before the double cast (the q10Returns lesson)
      .agg(round(sum(decRevenue), 2).cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  def oracleQ19Disjunct: String =
    s"""SELECT CAST(round(sum($DecRevSql), 2) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity BETWEEN 1 AND 20)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
      |       AND l_quantity BETWEEN 10 AND 30)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
      |       AND l_quantity BETWEEN 20 AND 40)""".stripMargin

  /** Q21-style WAITING SUPPLIER (adapted: lateness = shipped > 60 days
    * after the order date): suppliers who were the ONLY late supplier in
    * a finished multi-supplier order. The textbook formulation is two
    * correlated EXISTS/NOT-EXISTS self-joins on the fact table (three
    * lineitem scans, three orderkey shuffles); here both DECORRELATE
    * into ONE groupBy(orderkey) pass — n_suppliers, distinct late
    * suppliers, the late supplier id, and its late-row count are four
    * aggregates of the same bounded-key reduce — so the fact table is
    * scanned once and shuffled once (plus the honest orders join for the
    * date). The per-supplier rollup joins the supplier dimension
    * broadcast-side; output ordered by (numwait desc, s_name), top 100. */
  def q21Waiting(spark: SparkSession, dir: String): DataFrame = {
    val late = col("l_shipdate") >
      col("o_orderdate") + expr("INTERVAL 60 DAYS")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val perOrder = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey")
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(late, col("l_suppkey"))).as("n_late_supp"),
        max(when(late, col("l_suppkey"))).as("late_supp"),
        sum(when(late, 1L).otherwise(0L)).as("n_late_rows"))
      .filter(col("n_supp") > 1 && col("n_late_supp") === 1)
    val supNat = spark.read.parquet(s"$dir/supplier.parquet")
      .join(broadcast(spark.read.parquet(s"$dir/nation.parquet")
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
    perOrder
      .join(broadcast(supNat), col("late_supp") === col("s_suppkey"))
      .groupBy("s_name", "n_name")
      .agg(sum("n_late_rows").as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  def oracleQ21Waiting: String =
    """SELECT s_name, n_name, count(*) AS numwait
      |FROM lineitem l1
      |JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
      |JOIN supplier ON s_suppkey = l1.l_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY 1, 2
      |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin

  /** SALTED SKEW JOIN: every event joined to its type's global average
    * (per-event deviation) through a 5-key shuffle join — the maximal
    * hot-key case: an unsalted exchange uses 5 of the cluster's
    * partitions no matter how many executors exist. [[graft.operators
    * .SkewJoin.salted]] splits each key across 8 salts (40-way
    * parallelism), the dim replicates 8× (5 rows → 40 — the standard
    * trade: salt the hot side, replicate the small side), and the
    * result is provably the plain join (the oracle IS the plain join).
    * The `shuffle_hash` hint keeps the exercised path honest — at this
    * test size the 5-row dim would broadcast, and a broadcast join has
    * no exchange to skew; at 100 TB the dim that needs this (users,
    * URLs, session keys with Zipf fan-in) does not broadcast. */
  def skewSaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = TsQueries.rawEvents(spark, dir)
      .select("event_id", "event_type", "value")
    val dim = ev.groupBy("event_type")
      .agg(round(avg("value"), 6).as("avg_value"))
    graft.operators.SkewJoin.salted(
        ev, dim.hint("shuffle_hash"), "event_type",
        saltSrc = col("event_id"), nSalts = 8)
      .select(col("event_id"), col("event_type"),
        round(col("value") - col("avg_value"), 6).as("dev"))
  }

  def oracleSkewSaltedJoin: String =
    """WITH dim AS (SELECT event_type, round(avg(value), 6) AS avg_value
      |             FROM events GROUP BY 1)
      |SELECT event_id, e.event_type, round(value - avg_value, 6) AS dev
      |FROM events e JOIN dim USING (event_type)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "skew_salted_join" -> (skewSaltedJoin _),
    "q8_share" -> (q8Share _),
    "q9_profit" -> (q9Profit _),
    "q13_distribution" -> (q13Distribution _),
    "q15_topsupplier" -> (q15TopSupplier _),
    "q19_disjunct" -> (q19Disjunct _),
    "q21_waiting" -> (q21Waiting _),
    "zorder_key" -> (zorderKey _),
    "bucketed_join" -> (bucketedJoin _),
    "q4_priority" -> (q4Priority _),
    "q6_forecast" -> (q6Forecast _),
    "q7_volume" -> (q7Volume _),
    "q10_returns" -> (q10Returns _),
    "q17_smallqty" -> (q17SmallQty _),
    "q1_agg" -> (q1 _),
    "q1_cube" -> (q1Cube _),
    "q3_join" -> (q3 _),
    "q18_topn" -> (q18 _),
    "events_window" -> (eventsWindow _),
    "events_asof" -> (eventsAsof _),
    "events_attrib" -> (eventsAttrib _),
    "events_rate_window" -> (eventsRateWindow _),
    "events_asof_tol" -> (eventsAsofTol _),
    "events_asof_fwd" -> (eventsAsofFwd _),
    "events_asof_near" -> (eventsAsofNear _),
    "events_sessionize" -> (eventsSessionize _),
    "events_funnel" -> (eventsFunnel _),
    "events_retention" -> (eventsRetention _),
    "events_transitions" -> (eventsTransitions _),
    "q22_antijoin" -> (q22AntiJoin _),
    "events_rolling" -> (eventsRolling _),
    "events_pivot" -> (eventsPivot _),
    "q14_promo" -> (q14Promo _),
    "q5_region" -> (q5Region _))

  val oracles: Map[String, String] = Map(
    "skew_salted_join" -> oracleSkewSaltedJoin,
    "q8_share" -> oracleQ8Share,
    "q9_profit" -> oracleQ9Profit,
    "q13_distribution" -> oracleQ13Distribution,
    "q15_topsupplier" -> oracleQ15TopSupplier,
    "q19_disjunct" -> oracleQ19Disjunct,
    "q21_waiting" -> oracleQ21Waiting,
    "zorder_key" -> oracleZorderKey,
    "bucketed_join" -> oracleBucketedJoin,
    "q4_priority" -> oracleQ4Priority,
    "q6_forecast" -> oracleQ6Forecast,
    "q7_volume" -> oracleQ7Volume,
    "q10_returns" -> oracleQ10Returns,
    "q17_smallqty" -> oracleQ17SmallQty,
    "q1_agg" -> oracleQ1,
    "q1_cube" -> oracleQ1Cube,
    "q3_join" -> oracleQ3,
    "q18_topn" -> oracleQ18,
    "events_window" -> oracleEventsWindow,
    "events_asof" -> oracleEventsAsof,
    "events_attrib" -> oracleEventsAttrib,
    "events_rate_window" -> oracleEventsRateWindow,
    "events_asof_tol" -> oracleEventsAsofTol,
    "events_asof_fwd" -> oracleEventsAsofFwd,
    "events_asof_near" -> oracleEventsAsofNear,
    "events_sessionize" -> oracleEventsSessionize,
    "events_funnel" -> oracleEventsFunnel,
    "events_retention" -> oracleEventsRetention,
    "events_transitions" -> oracleEventsTransitions,
    "q22_antijoin" -> oracleQ22AntiJoin,
    "events_rolling" -> oracleEventsRolling,
    "events_pivot" -> oracleEventsPivot,
    "q14_promo" -> oracleQ14Promo,
    "q5_region" -> oracleQ5Region)
}
