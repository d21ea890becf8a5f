package graft.queries

import graft.SparkSpec
import graft.SparkEntry

/** Plan-shape assertions for the second relational batch — same
  * discipline as [[RelationalSpec]]: the oracle gate owns correctness,
  * these pin the scale properties of the physical plans. */
class Relational2Spec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.executedPlan.toString

  test("EXISTS decorrelates to a semi join, NOT EXISTS to an anti join") {
    // correlated subqueries must become joins (no per-row subquery
    // re-execution) — the decorrelation that makes these run at scale
    assert(plan("q_exists_subquery").contains("LeftSemi"),
      "EXISTS did not decorrelate to a left-semi join")
    assert(plan("q_idle_customers").contains("LeftAnti"),
      "NOT EXISTS did not decorrelate to a left-anti join")
  }

  test("new dimension joins broadcast") {
    assert(plan("q_promo_revenue").contains("BroadcastHashJoin"))
    assert(plan("q_disjunctive_filter").contains("BroadcastHashJoin"))
    assert(plan("q_topk_per_group").contains("BroadcastHashJoin"))
  }

  test("disjunctive filter pushes the part-side predicate to its scan") {
    // the OR-of-ANDs references both sides; the part-only disjunction
    // (brand/size) must still reach the part scan as a pushed filter
    val p = plan("q_disjunctive_filter")
    // part scan: the brand/size disjunction, extracted from the cross-
    // side OR-of-ANDs and pushed to parquet
    assert(p.contains("Or(Or(And(EqualTo(p_brand"), p)
    // lineitem scan: the quantity disjunction likewise
    assert(p.contains("Or(Or(GreaterThanOrEqual(l_quantity"), p)
  }

  test("topk-per-group filters rank inside the window, no global sort") {
    // row_number + filter(rn <= 3) should run the rank-limit pushdown:
    // each partition keeps a bounded group, and there is no global Sort
    val p = plan("q_topk_per_group")
    assert(p.contains("WindowGroupLimit") || !p.contains("Sort [o_totalprice"),
      s"expected per-group limited window, got:\n$p")
  }

  test("histogram bucket counts cover all orders exactly once") {
    val total = SparkEntry.queries("q_histogram")(spark, sf0001)
      .agg(org.apache.spark.sql.functions.sum("n")).collect()(0).getLong(0)
    val orders = graft.sources.Sources.table(spark, sf0001, "orders").count()
    assert(total === orders)
  }
}
