package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Sources.table

/** Relational operator surface.
  *
  * The reference has NO relational operators (SURVEY.md §2 "Absent
  * categories" — verified line-by-line): no filters, joins, windows,
  * sorts, or set ops. All of these come from Spark built-ins, so this
  * module is deliberately thin delegation — the declarative plan lets
  * Catalyst do pushdown/pruning/join-selection, which is exactly the
  * 100 TB-scale behavior we want (scan-level `PushedFilters`, broadcast
  * joins for the small dimensions, partial aggregation before shuffles).
  *
  * Every query is deterministic (unique total orderings wherever output
  * order or ties matter) and every double aggregate is rounded the same
  * way in the Spark plan and the DuckDB oracle, so the driver's
  * hash-compare is stable.
  */
object Relational {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: the canonical partial-agg + small-key-space query.
    // At 100 TB this is a full scan whose shuffle is only
    // |returnflag × linestatus| rows per partition thanks to map-side agg.
    "q_pricing_summary" -> { (s, dir) =>
      table(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 4).as("sum_qty"),
          round(sum(col("l_extendedprice")), 4).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 4).as("sum_charge"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          round(avg(col("l_extendedprice")), 6).as("avg_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
    },

    // TPC-H Q3 shape: selective dim filter -> fact join -> top-k revenue.
    "q_top_revenue_orders" -> { (s, dir) =>
      val cust = table(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val ord = table(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val li = table(s, dir, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
        .orderBy(desc("revenue"), asc("l_orderkey"))
        .limit(10)
    },

    // TPC-H Q5 shape: snowflake join through region->nation->cust/supp.
    // Dimensions are broadcast; only the lineitem-orders join shuffles.
    "q_local_supplier_volume" -> { (s, dir) =>
      val region = table(s, dir, "region").filter(col("r_name") === "ASIA")
      val nation = table(s, dir, "nation")
      val cust = table(s, dir, "customer")
      val supp = table(s, dir, "supplier")
      val ord = table(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val li = table(s, dir, "lineitem")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
    },

    // Broadcast-hash join of a fact against two tiny dims.
    "q_join_broadcast_dims" -> { (s, dir) =>
      val cust = table(s, dir, "customer")
      val nation = table(s, dir, "nation")
      val region = table(s, dir, "region")
      cust.join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_customers"),
          round(avg(col("c_acctbal")), 6).as("avg_acctbal"))
    },

    // Left-semi join == EXISTS.
    "q_semi_join" -> { (s, dir) =>
      val cust = table(s, dir, "customer")
      val bigOrders = table(s, dir, "orders").filter(col("o_totalprice") > 400000.0)
      cust.join(bigOrders, cust("c_custkey") === bigOrders("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    },

    // Left-anti join == NOT EXISTS (customers with no high-value order).
    "q_anti_join" -> { (s, dir) =>
      val cust = table(s, dir, "customer")
      val bigOrders = table(s, dir, "orders").filter(col("o_totalprice") > 300000.0)
      cust.join(bigOrders, cust("c_custkey") === bigOrders("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    },

    // Left-outer join: every customer, zero-filled order stats.
    "q_left_outer_join" -> { (s, dir) =>
      val cust = table(s, dir, "customer")
      val big = table(s, dir, "orders").filter(col("o_totalprice") > 300000.0)
      cust.join(big, cust("c_custkey") === big("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_big_orders"),
          round(coalesce(sum(col("o_totalprice")), lit(0.0)), 4).as("big_total"))
    },

    // Full-outer join: 1995 vs 2001 spend per customer, nulls surfaced.
    "q_full_outer_join" -> { (s, dir) =>
      val ord = table(s, dir, "orders")
      def spend(y: Int, out: String) =
        ord.filter(year(col("o_orderdate")) === y)
          .groupBy(col("o_custkey").as(s"ck_$out"))
          .agg(round(sum(col("o_totalprice")), 4).as(out))
      spend(1995, "spend_1995")
        .join(spend(2001, "spend_2001"),
          col("ck_spend_1995") === col("ck_spend_2001"), "full_outer")
        .select(
          coalesce(col("ck_spend_1995"), col("ck_spend_2001")).as("custkey"),
          col("spend_1995"), col("spend_2001"))
    },

    // Ranking window: top-2 orders per customer.
    "q_window_rank" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      table(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    },

    // Analytic window frame: per-supplier running revenue + lag.
    // NOTE sf0.1 lineitem contains duplicate (l_orderkey, l_linenumber)
    // rows — the ordering includes the value columns so it is total up
    // to FULL duplicates, which are prefix-sum-interchangeable.
    "q_window_running" -> { (s, dir) =>
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(asc("l_shipdate"), asc("l_orderkey"), asc("l_linenumber"),
          asc("l_quantity"), asc("l_extendedprice"))
      table(s, dir, "lineitem")
        .withColumn("running_qty",
          sum(col("l_quantity")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("prev_qty", lag(col("l_quantity"), 1).over(w))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          round(col("running_qty"), 4).as("running_qty"), col("prev_qty"))
    },

    // RANGE window frame: value-based lookback (trailing 30 days).
    "q_window_range_frame" -> { (s, dir) =>
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("ship_epoch"))
        .rangeBetween(-30L * 86400L, 0L)
      table(s, dir, "lineitem")
        .withColumn("ship_epoch", unix_timestamp(col("l_shipdate")))
        .withColumn("qty_30d", round(sum(col("l_quantity")).over(w), 4))
        .select("l_suppkey", "l_orderkey", "l_linenumber", "qty_30d")
    },

    // min_by/max_by: value at the extreme of another (unique) column.
    "q_min_max_by" -> { (s, dir) =>
      table(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(
          max_by(col("o_orderstatus"), col("o_orderkey")).as("latest_status"),
          round(min_by(col("o_totalprice"), col("o_orderkey")), 4).as("first_price"),
          max(col("o_orderkey")).as("max_orderkey"))
    },

    // Global sort + limit: planned as TakeOrderedAndProject (per-partition
    // top-k, no full sort) — scale-safe.
    "q_sort_limit" -> { (s, dir) =>
      table(s, dir, "lineitem")
        .orderBy(desc("l_extendedprice"), asc("l_orderkey"), asc("l_linenumber"))
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(20)
    },

    // Set operations.
    "q_union_distinct" -> { (s, dir) =>
      table(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .union(table(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
        .distinct()
    },
    "q_intersect" -> { (s, dir) =>
      val ord = table(s, dir, "orders")
      ord.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey").as("custkey"))
        .intersect(ord.filter(year(col("o_orderdate")) === 2001).select(col("o_custkey").as("custkey")))
    },
    "q_except" -> { (s, dir) =>
      val ord = table(s, dir, "orders")
      ord.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey").as("custkey"))
        .except(ord.filter(year(col("o_orderdate")) === 2001).select(col("o_custkey").as("custkey")))
    },

    // Multi-dimensional aggregates.
    "q_rollup" -> { (s, dir) =>
      table(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 4).as("sum_qty"))
    },
    "q_cube" -> { (s, dir) =>
      table(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 4).as("sum_price"))
    },

    // Statistical aggregates.
    "q_statistics" -> { (s, dir) =>
      table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("covar_qty_price"),
          round(stddev_samp(col("l_discount")), 6).as("std_discount"),
          round(variance(col("l_tax")), 6).as("var_tax"))
    },

    // DISTINCT aggregation.
    "q_distinct_agg" -> { (s, dir) =>
      table(s, dir, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(countDistinct(col("c_nationkey")).as("n_nations"),
          count(lit(1)).as("n_customers"))
    },

    // Scalar function library: string/math/date/conditional expressions.
    "q_scalar_functions" -> { (s, dir) =>
      table(s, dir, "part")
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("name_upper"),
          length(col("p_name")).as("name_len"),
          substring(col("p_brand"), 1, 5).as("brand_prefix"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          round(col("p_retailprice") * 1.1, 2).as("price_up"),
          abs(col("p_size") - 25).as("size_dist"),
          when(col("p_size") > 25, "large").otherwise("small").as("size_class"))
    },
    "q_date_functions" -> { (s, dir) =>
      table(s, dir, "orders")
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("order_year"),
          month(col("o_orderdate")).as("order_month"),
          dayofmonth(col("o_orderdate")).as("order_day"),
          quarter(col("o_orderdate")).as("order_quarter"),
          date_format(col("o_orderdate"), "yyyy-MM").as("order_ym"))
    },

    // JSON extraction (events.props is a JSON string column).
    "q_json_extract" -> { (s, dir) =>
      graft.sources.Sources.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          round(avg(col("value")), 6).as("avg_value"))
    },

    // CASE WHEN bucketing + HAVING (post-aggregation filter).
    "q_having" -> { (s, dir) =>
      table(s, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(round(sum(col("l_quantity")), 4).as("total_qty"),
          count(lit(1)).as("n_items"))
        .filter(col("total_qty") > 1000.0)
    },
    "q_case_buckets" -> { (s, dir) =>
      table(s, dir, "orders")
        .withColumn("bucket",
          when(col("o_totalprice") < 100000.0, "low")
            .when(col("o_totalprice") < 300000.0, "mid")
            .otherwise("high"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), round(min(col("o_totalprice")), 4).as("min_price"),
          round(max(col("o_totalprice")), 4).as("max_price"))
    },

    // Scalar subquery shape: compare each row to its group's aggregate.
    // Spark-first: a broadcast join against the (tiny) per-nation aggregate
    // instead of a correlated subquery re-planned per row.
    "q_above_nation_avg" -> { (s, dir) =>
      val cust = table(s, dir, "customer")
      val natAvg = cust.groupBy(col("c_nationkey").as("nk"))
        .agg(avg(col("c_acctbal")).as("nation_avg"))
      cust.join(broadcast(natAvg), col("c_nationkey") === col("nk"))
        .filter(col("c_acctbal") > col("nation_avg"))
        .select(col("c_custkey"), col("c_nationkey"),
          round(col("c_acctbal"), 2).as("acctbal"),
          round(col("nation_avg"), 6).as("nation_avg"))
    },

    // Correlated scalar subquery via the SQL surface — Catalyst
    // decorrelates it into the same broadcast-join shape as
    // q_above_nation_avg, but through the subquery planner.
    "q_correlated_subquery" -> { (s, dir) =>
      table(s, dir, "customer").createOrReplaceTempView("customer_cs")
      s.sql(
        """SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS acctbal
          |FROM customer_cs c1
          |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer_cs c2
          |                   WHERE c2.c_nationkey = c1.c_nationkey)
          |""".stripMargin)
    },

    "q_union_all" -> { (s, dir) =>
      val ord = table(s, dir, "orders")
      ord.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey").as("custkey"))
        .union(ord.filter(year(col("o_orderdate")) === 1996)
          .select(col("o_custkey").as("custkey")))
        .groupBy(col("custkey")).agg(count(lit(1)).as("n"))
    },
    "q_intersect_all" -> { (s, dir) =>
      val ord = table(s, dir, "orders")
      ord.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey").as("custkey"))
        .intersectAll(ord.filter(year(col("o_orderdate")) === 1996)
          .select(col("o_custkey").as("custkey")))
    },
    "q_except_all" -> { (s, dir) =>
      val ord = table(s, dir, "orders")
      ord.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey").as("custkey"))
        .exceptAll(ord.filter(year(col("o_orderdate")) === 1996)
          .select(col("o_custkey").as("custkey")))
    },

    // GROUPING SETS via SQL surface (also exercises spark.sql entry).
    "q_grouping_sets" -> { (s, dir) =>
      table(s, dir, "lineitem").createOrReplaceTempView("lineitem_gs")
      s.sql(
        """SELECT l_returnflag, l_linestatus, count(1) AS n,
          |       round(sum(l_extendedprice), 4) AS sum_price
          |FROM lineitem_gs
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
          |""".stripMargin)
    },

    // Filter + projection pushdown showcase: only 3 columns read, range
    // predicate reaches the parquet scan.
    "q_filter_project" -> { (s, dir) =>
      table(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-02-01").cast("timestamp") &&
          col("l_quantity") > 45.0)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    },
  )

  val oracles: Map[String, String] = Map(
    "q_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  round(sum(l_extendedprice), 4) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(avg(l_extendedprice), 6) AS avg_price,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(1) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q_top_revenue_orders" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1999-01-01'
        |GROUP BY 1, 2
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q_local_supplier_volume" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name""".stripMargin,
    "q_join_broadcast_dims" ->
      """SELECT r_name, count(1) AS n_customers,
        |  round(avg(c_acctbal), 6) AS avg_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)""".stripMargin,
    "q_left_outer_join" ->
      """SELECT c_custkey, count(o_orderkey) AS n_big_orders,
        |  round(coalesce(sum(o_totalprice), 0.0), 4) AS big_total
        |FROM customer
        |LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000.0) o
        |  ON c_custkey = o_custkey
        |GROUP BY c_custkey""".stripMargin,
    "q_full_outer_join" ->
      """WITH a AS (
        |  SELECT o_custkey AS ck, round(sum(o_totalprice), 4) AS spend_1995
        |  FROM orders WHERE year(o_orderdate) = 1995 GROUP BY o_custkey),
        |b AS (
        |  SELECT o_custkey AS ck, round(sum(o_totalprice), 4) AS spend_2001
        |  FROM orders WHERE year(o_orderdate) = 2001 GROUP BY o_custkey)
        |SELECT coalesce(a.ck, b.ck) AS custkey, spend_1995, spend_2001
        |FROM a FULL OUTER JOIN b ON a.ck = b.ck""".stripMargin,
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 2""".stripMargin,
    "q_window_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  round(sum(l_quantity) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_qty,
        |  lag(l_quantity, 1) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity, l_extendedprice) AS prev_qty
        |FROM lineitem""".stripMargin,
    "q_window_range_frame" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  round(sum(l_quantity) OVER (
        |    PARTITION BY l_suppkey ORDER BY epoch(l_shipdate)
        |    RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW), 4) AS qty_30d
        |FROM lineitem""".stripMargin,
    "q_min_max_by" ->
      """SELECT o_custkey,
        |  arg_max(o_orderstatus, o_orderkey) AS latest_status,
        |  round(arg_min(o_totalprice, o_orderkey), 4) AS first_price,
        |  max(o_orderkey) AS max_orderkey
        |FROM orders GROUP BY o_custkey""".stripMargin,
    "q_sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20""".stripMargin,
    "q_union_distinct" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION SELECT s_nationkey FROM supplier""".stripMargin,
    "q_intersect" ->
      """SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 2001""".stripMargin,
    "q_except" ->
      """SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 2001""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(1) AS n,
        |  round(sum(l_quantity), 4) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(1) AS n,
        |  round(sum(o_totalprice), 4) AS sum_price
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "q_statistics" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        |  round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
        |  round(stddev_samp(l_discount), 6) AS std_discount,
        |  round(var_samp(l_tax), 6) AS var_tax
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_distinct_agg" ->
      """SELECT c_mktsegment, count(DISTINCT c_nationkey) AS n_nations,
        |  count(1) AS n_customers
        |FROM customer GROUP BY c_mktsegment""".stripMargin,
    "q_scalar_functions" ->
      """SELECT p_partkey,
        |  upper(p_name) AS name_upper,
        |  CAST(length(p_name) AS INTEGER) AS name_len,
        |  substring(p_brand, 1, 5) AS brand_prefix,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  round(p_retailprice * 1.1, 2) AS price_up,
        |  CAST(abs(p_size - 25) AS INTEGER) AS size_dist,
        |  CASE WHEN p_size > 25 THEN 'large' ELSE 'small' END AS size_class
        |FROM part""".stripMargin,
    "q_date_functions" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS order_year,
        |  CAST(month(o_orderdate) AS INTEGER) AS order_month,
        |  CAST(day(o_orderdate) AS INTEGER) AS order_day,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
        |  strftime(o_orderdate, '%Y-%m') AS order_ym
        |FROM orders""".stripMargin,
    "q_json_extract" ->
      """SELECT event_type, count(1) AS n,
        |  CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
        |  round(avg(value), 6) AS avg_value
        |FROM events GROUP BY event_type""".stripMargin,
    "q_having" ->
      """SELECT l_suppkey, round(sum(l_quantity), 4) AS total_qty,
        |  count(1) AS n_items
        |FROM lineitem GROUP BY l_suppkey
        |HAVING sum(l_quantity) > 1000.0""".stripMargin,
    "q_case_buckets" ->
      """SELECT CASE WHEN o_totalprice < 100000.0 THEN 'low'
        |            WHEN o_totalprice < 300000.0 THEN 'mid'
        |            ELSE 'high' END AS bucket,
        |  count(1) AS n, round(min(o_totalprice), 4) AS min_price,
        |  round(max(o_totalprice), 4) AS max_price
        |FROM orders GROUP BY 1""".stripMargin,
    "q_above_nation_avg" ->
      """SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS acctbal,
        |  round(nation_avg, 6) AS nation_avg
        |FROM customer
        |JOIN (SELECT c_nationkey AS nk, avg(c_acctbal) AS nation_avg
        |      FROM customer GROUP BY c_nationkey) t ON c_nationkey = nk
        |WHERE c_acctbal > nation_avg""".stripMargin,
    "q_correlated_subquery" ->
      """SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS acctbal
        |FROM customer c1
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer c2
        |                   WHERE c2.c_nationkey = c1.c_nationkey)""".stripMargin,
    "q_union_all" ->
      """SELECT custkey, count(1) AS n FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
        |  UNION ALL
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996) t
        |GROUP BY custkey""".stripMargin,
    "q_intersect_all" ->
      """SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
        |INTERSECT ALL
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996""".stripMargin,
    "q_except_all" ->
      """SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
        |EXCEPT ALL
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996""".stripMargin,
    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(1) AS n,
        |  round(sum(l_extendedprice), 4) AS sum_price
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))""".stripMargin,
    "q_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-02-01'
        |  AND l_quantity > 45.0""".stripMargin,
  )
}
