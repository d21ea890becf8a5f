package graft.queries

import graft.SparkSpec
import graft.SparkEntry

/** Plan-shape assertions for the TPC-H-shaped batch — the oracle gate
  * owns correctness; these pin the scale properties of the plans. */
class TpchQueriesSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.executedPlan.toString

  test("Q6 scan: filters pushed to parquet, schema pruned to used columns") {
    val p = plan("q_forecast_revenue")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate") ||
      p.contains("IsNotNull(l_shipdate)"), p)
    // projection prunes the 11-column lineitem to the 4 referenced ones
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey"), readSchema)
    assert(readSchema.contains("l_extendedprice"), readSchema)
  }

  test("nation/region dimension joins broadcast; facts never broadcast") {
    for (q <- Seq("q_volume_shipping", "q_market_share", "q_returned_items")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q: no broadcast join\n$p")
      // lineitem must not end up on a broadcast build side at any SF:
      // broadcasting the fact table would OOM a real cluster
      assert(!p.linesIterator.exists(l =>
        l.contains("BroadcastExchange") && l.contains("lineitem")), q)
    }
  }

  test("top-k queries use TakeOrderedAndProject, not a global sort") {
    for (q <- Seq("q_shipping_priority", "q_returned_items", "q_large_orders")) {
      assert(plan(q).contains("TakeOrderedAndProject"), s"$q plan:\n${plan(q)}")
    }
  }

  test("Q13 keeps zero-order customers (left join not collapsed)") {
    val dist = SparkEntry.queries("q_custdist")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val customers = graft.sources.Sources.table(spark, sf0001, "customer").count()
    assert(dist.values.sum === customers, "every customer counted exactly once")
    // the data at this SF has no zero-order customer, so pin the
    // semantics via the plan: the outer join must survive optimization
    assert(plan("q_custdist").contains("LeftOuter"), plan("q_custdist"))
  }

  test("Q15 returns every supplier tied at the max (rounded compare)") {
    val rows = SparkEntry.queries("q_top_supplier")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("total_revenue")).distinct
    assert(revs.length === 1, "all returned suppliers share the max revenue")
  }
}
