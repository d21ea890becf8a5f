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
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    for (q <- Seq("q_volume_shipping", "q_market_share", "q_returned_items")) {
      // sparkPlan, not executedPlan: AdaptiveSparkPlanExec hides its
      // inner plan from collect(); exchanges aren't inserted yet at
      // this stage, so inspect the broadcast joins' BUILD SIDES
      val exec = SparkEntry.queries(q)(spark, sf0001)
        .queryExecution.sparkPlan
      val bhj = exec.collect { case j: BroadcastHashJoinExec => j }
      assert(bhj.nonEmpty, s"$q: no broadcast join\n$exec")
      // lineitem must not end up on a broadcast build side at any SF:
      // broadcasting the fact table would OOM a real cluster — check
      // the SUBTREE under each build side, not single plan lines
      bhj.foreach { j =>
        val build = j.buildSide match {
          case BuildLeft => j.left
          case BuildRight => j.right
        }
        assert(!build.toString.contains("lineitem"),
          s"$q broadcasts the fact table:\n$build")
      }
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
