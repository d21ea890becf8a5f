package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Sources
import graft.sources.Sources.table

/** Second relational coverage batch: the remaining classic TPC-H query
  * shapes adapted to this schema (EXISTS/NOT-EXISTS decorrelation,
  * promo-share ratio, disjunctive predicate pushdown, distinct-count
  * per group), plus operator surface Spark exposes that round 1 didn't
  * yet declare — unpivot, lateral/positional explode, map and struct
  * functions, ordered string aggregation, width_bucket histograms,
  * sequence generation, IGNORE NULLS window navigation, linear
  * regression aggregates, per-group top-k, and gaps-and-islands.
  *
  * Scale notes, same discipline as [[Relational]]: dimensions are
  * explicit `broadcast()`, aggregations are partial-then-final, window
  * queries shuffle once on their partition keys, and generated rows
  * (sequence/explode) multiply AFTER the scan filter, never before.
  */
object Relational2 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Multi-grain aggregation in ONE pass: ROLLUP(region, nation) emits
    // the nation, region-subtotal, and grand-total grains from a single
    // Expand+partial-agg plan — at 100 TB this replaces three separate
    // scans/shuffles with one (Expand multiplies rows AFTER the
    // map-side partial aggregation keys them, so the shuffle carries
    // one row per (grain, group), not 3x the fact table).
    "q_rollup_revenue" -> { (s, dir) =>
      table(s, dir, "orders")
        .join(table(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(table(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(table(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 4).as("revenue"))
        .select(coalesce(col("r_name"), lit("ALL")).as("region"),
          coalesce(col("n_name"), lit("ALL")).as("nation"),
          col("n_orders"), col("revenue"))
    },
    // CUBE(status, year): all four grains of a 2-attribute cube in one
    // Expand pass; same shuffle-volume argument as q_rollup_revenue.
    "q_cube_orders" -> { (s, dir) =>
      table(s, dir, "orders")
        .withColumn("yr", year(col("o_orderdate")))
        .cube(col("o_orderstatus"), col("yr"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 4).as("revenue"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("yr"), lit(-1)).as("yr"),
          col("n_orders"), col("revenue"))
    },
    // TPC-H Q4 shape: correlated EXISTS — Catalyst decorrelates to a
    // left-semi join on the fact table; no per-row subquery execution.
    "q_exists_subquery" -> { (s, dir) =>
      table(s, dir, "orders").createOrReplaceTempView("orders_ex")
      table(s, dir, "lineitem").createOrReplaceTempView("lineitem_ex")
      s.sql(
        """SELECT o_orderpriority, count(*) AS n_orders
          |FROM orders_ex
          |WHERE o_orderdate >= timestamp '1996-01-01'
          |  AND o_orderdate < timestamp '1997-01-01'
          |  AND EXISTS (SELECT 1 FROM lineitem_ex
          |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
          |GROUP BY o_orderpriority""".stripMargin)
    },

    // TPC-H Q22 shape: scalar subquery threshold + NOT EXISTS anti join.
    "q_idle_customers" -> { (s, dir) =>
      table(s, dir, "customer").createOrReplaceTempView("customer_ic")
      table(s, dir, "orders").createOrReplaceTempView("orders_ic")
      s.sql(
        """SELECT c_mktsegment, count(*) AS n_cust,
          |  round(sum(c_acctbal), 4) AS total_bal
          |FROM customer_ic c
          |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer_ic
          |                   WHERE c_acctbal > 0.0)
          |  AND NOT EXISTS (SELECT 1 FROM orders_ic o
          |                  WHERE o.o_custkey = c.c_custkey
          |                    AND o.o_orderdate >= TIMESTAMP '1999-01-01')
          |GROUP BY c_mktsegment""".stripMargin)
    },

    // TPC-H Q14 shape: conditional-share ratio after a broadcast join.
    "q_promo_revenue" -> { (s, dir) =>
      val li = table(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      li.join(broadcast(table(s, dir, "part").select("p_partkey", "p_type")),
          col("l_partkey") === col("p_partkey"))
        .agg(
          round(sum(when(col("p_type") === "PROMO", rev).otherwise(0.0)), 4).as("promo_rev"),
          round(sum(rev), 4).as("total_rev"))
        .select(
          round(lit(100.0) * col("promo_rev") / col("total_rev"), 6).as("promo_pct"),
          col("promo_rev"), col("total_rev"))
    },

    // TPC-H Q19 shape: OR-of-ANDs across both join sides — exercises
    // disjunctive predicate handling (the per-side implied filters are
    // still pushed to the scans by Catalyst's constraint propagation).
    "q_disjunctive_filter" -> { (s, dir) =>
      val li = table(s, dir, "lineitem")
      val pt = broadcast(table(s, dir, "part").select("p_partkey", "p_brand", "p_size"))
      li.join(pt, col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#11" && col("p_size").between(1, 15) &&
            col("l_quantity") >= 10.0) ||
          (col("p_brand") === "Brand#12" && col("p_size").between(10, 30) &&
            col("l_quantity") < 20.0) ||
          (col("p_brand") === "Brand#13" && col("p_size").between(20, 50) &&
            col("l_quantity").between(5.0, 35.0)))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("revenue"), count(lit(1)).as("n_lines"))
    },

    // TPC-H Q16 shape: distinct suppliers per (brand, size) — a
    // two-phase distinct aggregate over the fact-dim join.
    "q_brand_supplier_count" -> { (s, dir) =>
      val pt = broadcast(table(s, dir, "part")
        .filter(col("p_type") =!= "PROMO")
        .select("p_partkey", "p_brand", "p_size"))
      table(s, dir, "lineitem").select("l_partkey", "l_suppkey")
        .join(pt, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"))
    },

    // unpivot (wide -> long): the inverse of q_pivot.
    "q_unpivot" -> { (s, dir) =>
      val agg = table(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(round(sum(col("o_totalprice")), 4).as("total"),
          round(avg(col("o_totalprice")), 6).as("average"),
          count(lit(1)).cast("double").as("n_orders"))
      agg.unpivot(Array(col("o_orderstatus")),
        Array(col("total"), col("average"), col("n_orders")),
        "metric", "value")
    },

    // positional lateral explode: (doc, position, token) triples.
    "q_lateral_posexplode" -> { (s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(graft.operators.TextAnalysis.tokens(col("text")))
            .as(Seq("pos", "token")))
        .filter(col("pos") < 5)
    },

    // map construction + lookup + traversal functions, scalar outputs.
    "q_map_functions" -> { (s, dir) =>
      val toks = graft.operators.TextAnalysis.tokens(col("text"))
      table(s, dir, "documents")
        .withColumn("toks", toks)
        .withColumn("m", map_from_arrays(
          array(lit("n_tokens"), lit("n_distinct")),
          array(size(col("toks")).cast("long"),
            size(array_distinct(col("toks"))).cast("long"))))
        .select(col("doc_id"),
          element_at(col("m"), "n_tokens").as("m_tokens"),
          element_at(col("m"), "n_distinct").as("m_distinct"),
          size(col("m")).as("m_size"),
          array_join(map_keys(col("m")), ",").as("m_keys"),
          map_contains_key(col("m"), "n_tokens").as("m_has_key"),
          aggregate(map_values(col("m")), lit(0L), (a, v) => a + v).as("m_sum"))
    },

    // struct construction, field access, struct-in-array element access.
    "q_struct_functions" -> { (s, dir) =>
      table(s, dir, "supplier")
        .withColumn("st", struct(col("s_name").as("name"), col("s_acctbal").as("bal")))
        .withColumn("arr", array(col("st"), struct(lit("sentinel").as("name"),
          lit(0.0).as("bal"))))
        .select(col("s_suppkey"),
          col("st").getField("name").as("st_name"),
          round(col("st").getField("bal"), 4).as("st_bal"),
          element_at(col("arr"), 2).getField("name").as("arr2_name"),
          size(col("arr")).as("arr_len"))
    },

    // ordered string aggregation (LISTAGG shape): deterministic via
    // explicit sort of the collected list, never collect order.
    "q_string_agg" -> { (s, dir) =>
      table(s, dir, "supplier")
        .join(broadcast(table(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(array_join(array_sort(collect_list(col("s_name"))), "|").as("suppliers"),
          count(lit(1)).as("n_supp"))
    },

    // width_bucket histogram: fixed-width bins with under/overflow bins.
    "q_histogram" -> { (s, dir) =>
      table(s, dir, "orders")
        .select(width_bucket(col("o_totalprice"), lit(0.0), lit(600000.0), lit(12))
          .as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"))
    },

    // sequence generation + explode: month starts covering each order's
    // quarter. Generation happens AFTER the key filter (150x fewer rows
    // into the explode than a generate-then-filter plan).
    "q_sequence_months" -> { (s, dir) =>
      table(s, dir, "orders")
        .filter(col("o_orderkey") % 100 === 0)
        .select(col("o_orderkey"),
          explode(sequence(
            date_trunc("month", col("o_orderdate")).cast("date"),
            add_months(date_trunc("month", col("o_orderdate")).cast("date"), 3),
            expr("interval 1 month"))).as("month_date"))
        .select(col("o_orderkey"),
          date_format(col("month_date"), "yyyy-MM-dd").as("month_str"))
    },

    // IGNORE NULLS window navigation: last seen value of a sparse
    // (mostly-null) column — the fill-forward pattern.
    "q_window_ignore_nulls" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      table(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          last(when(col("o_orderstatus") === "F", col("o_orderpriority")),
            ignoreNulls = true).over(w).as("last_f_priority"))
    },

    // linear-regression aggregate family (corr/covar/regr_*).
    "q_regr_stats" -> { (s, dir) =>
      table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("covar_qp"),
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 6).as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4).as("intercept"),
          round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6).as("r2"),
          regr_count(col("l_extendedprice"), col("l_quantity")).as("n_pairs"))
    },

    // per-group top-k: rank inside the group, never a global sort.
    "q_topk_per_group" -> { (s, dir) =>
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      table(s, dir, "orders")
        .join(broadcast(table(s, dir, "customer").select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"), col("rn"))
    },

    // same rows as q_topk_per_group, via the bounded-buffer Aggregator
    // instead of a window: map-side partials keep only k values, so at
    // scale the shuffle moves k·partitions rows per key, not the group
    "q_topk_per_group_agg" -> { (s, dir) =>
      import s.implicits._
      val pairs = table(s, dir, "orders")
        .join(broadcast(table(s, dir, "customer").select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"), col("o_totalprice"), col("o_orderkey"))
        .as[(String, Double, Long)]
        .map(r => (r._1, (r._2, r._3)))
      implicit val bestFirst: Ordering[(Double, Long)] =
        new Ordering[(Double, Long)] {
          def compare(a: (Double, Long), b: (Double, Long)): Int = {
            val c = java.lang.Double.compare(b._1, a._1) // price desc
            if (c != 0) c else java.lang.Long.compare(a._2, b._2)
          }
        }
      graft.core.MapReduce.topKPerKey(pairs, 3)
        .flatMap { case (seg, items) =>
          items.zipWithIndex.map { case ((price, id), i) => (seg, id, price, i + 1) }
        }
        .toDF("c_mktsegment", "o_orderkey", "o_totalprice", "rn")
    },

    // gaps-and-islands: consecutive same-type runs per user via the
    // row_number-difference trick (two windows, one shuffle on user_id).
    "q_gaps_islands" -> { (s, dir) =>
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val byUserType = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      Sources.events(s, dir)
        .select(col("user_id"), col("event_type"),
          (row_number().over(byUser) - row_number().over(byUserType)).as("grp"))
        .groupBy(col("user_id"), col("event_type"), col("grp"))
        .agg(count(lit(1)).as("len"))
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n_islands"), max(col("len")).as("max_len"))
    },
  )

  private val topkPerGroupOracle: String =
    """WITH r AS (
      |  SELECT c_mktsegment, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY c_mktsegment
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders JOIN customer ON o_custkey = c_custkey)
      |SELECT c_mktsegment, o_orderkey, o_totalprice, rn FROM r WHERE rn <= 3""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_rollup_revenue" ->
      """SELECT coalesce(r_name, 'ALL') AS region,
        |  coalesce(n_name, 'ALL') AS nation,
        |  count(1)::BIGINT AS n_orders,
        |  round(sum(o_totalprice), 4) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,
    "q_cube_orders" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(year(o_orderdate)::INT, -1) AS yr,
        |  count(1)::BIGINT AS n_orders,
        |  round(sum(o_totalprice), 4) AS revenue
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, year(o_orderdate)::INT)""".stripMargin,
    "q_exists_subquery" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority""".stripMargin,
    "q_idle_customers" ->
      """SELECT c_mktsegment, count(*) AS n_cust,
        |  round(sum(c_acctbal), 4) AS total_bal
        |FROM customer c
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
        |                   WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY c_mktsegment""".stripMargin,
    "q_promo_revenue" ->
      """WITH s AS (
        |  SELECT
        |    round(sum(CASE WHEN p_type = 'PROMO'
        |      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END), 4) AS promo_rev,
        |    round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01')
        |SELECT round(100.0 * promo_rev / total_rev, 6) AS promo_pct,
        |  promo_rev, total_rev FROM s""".stripMargin,
    "q_disjunctive_filter" ->
      """SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        |  count(1) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 10.0)
        |   OR (p_brand = 'Brand#12' AND p_size BETWEEN 10 AND 30 AND l_quantity < 20.0)
        |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 20 AND 50
        |       AND l_quantity BETWEEN 5.0 AND 35.0)""".stripMargin,
    "q_brand_supplier_count" ->
      """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS n_supp
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_type <> 'PROMO'
        |GROUP BY p_brand, p_size""".stripMargin,
    "q_unpivot" ->
      """WITH a AS (
        |  SELECT o_orderstatus, round(sum(o_totalprice), 4) AS total,
        |    round(avg(o_totalprice), 6) AS average,
        |    count(1)::DOUBLE AS n_orders
        |  FROM orders GROUP BY o_orderstatus)
        |SELECT o_orderstatus, 'total' AS metric, total AS value FROM a
        |UNION ALL
        |SELECT o_orderstatus, 'average' AS metric, average AS value FROM a
        |UNION ALL
        |SELECT o_orderstatus, 'n_orders' AS metric, n_orders AS value FROM a""".stripMargin,
    "q_lateral_posexplode" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |u AS (
        |  SELECT doc_id, toks,
        |    unnest(range(1, least(len(toks), 5) + 1)) AS i
        |  FROM t)
        |SELECT doc_id, (i - 1)::INTEGER AS pos, toks[i] AS token FROM u""".stripMargin,
    "q_map_functions" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  len(toks)::BIGINT AS m_tokens,
        |  len(list_distinct(toks))::BIGINT AS m_distinct,
        |  2 AS m_size,
        |  'n_tokens,n_distinct' AS m_keys,
        |  TRUE AS m_has_key,
        |  (len(toks) + len(list_distinct(toks)))::BIGINT AS m_sum
        |FROM t""".stripMargin,
    "q_struct_functions" ->
      """SELECT s_suppkey,
        |  s_name AS st_name,
        |  round(s_acctbal, 4) AS st_bal,
        |  'sentinel' AS arr2_name,
        |  2 AS arr_len
        |FROM supplier""".stripMargin,
    "q_string_agg" ->
      """SELECT n_name,
        |  string_agg(s_name, '|' ORDER BY s_name) AS suppliers,
        |  count(1) AS n_supp
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q_histogram" ->
      """WITH b AS (
        |  SELECT CASE WHEN o_totalprice >= 600000.0 THEN 13
        |              WHEN o_totalprice < 0.0 THEN 0
        |              ELSE CAST(floor(o_totalprice / 50000.0) + 1 AS BIGINT)
        |         END AS bucket
        |  FROM orders)
        |SELECT bucket, count(1) AS n FROM b GROUP BY bucket""".stripMargin,
    "q_sequence_months" ->
      """WITH u AS (
        |  SELECT o_orderkey,
        |    unnest(generate_series(date_trunc('month', o_orderdate),
        |      date_trunc('month', o_orderdate) + INTERVAL 3 MONTH,
        |      INTERVAL 1 MONTH)) AS md
        |  FROM orders WHERE o_orderkey % 100 = 0)
        |SELECT o_orderkey, strftime(md, '%Y-%m-%d') AS month_str FROM u""".stripMargin,
    "q_window_ignore_nulls" ->
      """SELECT o_custkey, o_orderkey,
        |  last_value(CASE WHEN o_orderstatus = 'F' THEN o_orderpriority END
        |    IGNORE NULLS) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_f_priority
        |FROM orders""".stripMargin,
    "q_regr_stats" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
        |  round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qp,
        |  round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
        |  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
        |  regr_count(l_extendedprice, l_quantity) AS n_pairs
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_topk_per_group" -> topkPerGroupOracle,
    // SAME oracle object: the Aggregator path must reproduce the
    // window path exactly, so they share one spec by construction
    "q_topk_per_group_agg" -> topkPerGroupOracle,
    "q_gaps_islands" ->
      """WITH e AS (
        |  SELECT user_id, event_type, ts::TIMESTAMP AS ts, event_id FROM events),
        |r AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      - row_number() OVER (PARTITION BY user_id, event_type
        |          ORDER BY ts, event_id) AS grp
        |  FROM e),
        |i AS (
        |  SELECT user_id, event_type, grp, count(1) AS len
        |  FROM r GROUP BY 1, 2, 3)
        |SELECT user_id, event_type, count(1) AS n_islands, max(len) AS max_len
        |FROM i GROUP BY 1, 2""".stripMargin,
  )
}
