package graft.queries

import graft.SparkSpec
import graft.SparkEntry

/** Plan-shape pins for the round-13 operators: the scale properties
  * asserted against the physical plan so a refactor can't silently
  * regress them. */
class Round13PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.executedPlan.toString

  test("KN scoring: all three model joins are hash joins (broadcast at " +
      "this scale), never nested-loop or cartesian") {
    for (q <- Seq("q_bigram_kn_score", "q_bigram_kn_incremental_persisted")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q:\n$p")
      // the bigram/context/continuation lookups are equi-joins — the
      // shape that shuffles (or broadcasts) on the natural key when the
      // model is large, never a row-pair explosion
      assert(p.contains("HashJoin"), s"$q:\n$p")
    }
  }

  test("clamped CDC keeps the unclamped scale shape: one map-side pass " +
      "to chunk, aggregation only at the audit rollup") {
    val p = plan("q_cdc_clamped")
    // chunking itself is mapPartitions — no join anywhere in the plan
    assert(!p.contains("Join"), p)
    assert(p.contains("MapPartitions") || p.contains("SerializeFromObject"), p)
  }

  test("per-group weighted sample: the rank filter is a WindowGroupLimit " +
      "(only ~n rows per group per partition reach the exchange)") {
    val p = plan("q_weighted_sample_per_group")
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("Join"), p)
  }

  test("wide k-means|| weighting: the broadcast side is the BOUNDED " +
      "candidate table, and the min survives as a partial+final " +
      "aggregation (map-side combined shuffle of compact rows)") {
    val p = plan("q_kmeanspar_init_wide")
    assert(p.contains("BroadcastNestedLoopJoin BuildRight, Cross") ||
      p.contains("BroadcastNestedLoopJoin"), p)
    // per-row min over candidates: partial_min before the exchange
    assert(p.contains("partial_min") || p.contains("partial_count"), p)
  }

  test("IVF-by-kmeans|| probe plan: no cartesian; the probe/corpus " +
      "candidate join is the cell equi-join") {
    val p = plan("q_ann_ivf_kmeanspar_topk")
    assert(!p.contains("CartesianProduct"), p)
    // neighbors join probes on the cell key — a hash join, so the
    // probed-cells-only pruning actually happens at the join
    assert(p.contains("HashJoin"), p)
  }
}
