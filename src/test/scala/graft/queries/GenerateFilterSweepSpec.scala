package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.catalyst.expressions.{Expression, GreaterThan, Literal, Size}
import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

/** Standing sweep for the InferFiltersFromGenerate blowup: under a
  * non-outer explode, Spark synthesizes `size(e) > 0`, and predicate
  * pushdown inlines the exploded alias's WHOLE defining chain into that
  * filter — multi-layer interpreted higher-order-function pipelines get
  * re-evaluated per input row, sometimes many times over (the
  * q_chunk_sentences incident: chunk_ids appeared 26x in the plan and
  * the query ran 33.5s for 1.5 MB of text; 0.85s once fixed).
  *
  * The sanctioned pattern for exploding an EXPENSIVE computed array is
  * `explode_outer`/`posexplode_outer` + an isNotNull filter on the
  * generated column (the rule skips outer generators; row-identical).
  * Cheap generator inputs (a split/tokenize duplicated once into the
  * scan filter) are fine and common — the sweep only fails when the
  * size() argument's expression tree is large, the signature of an
  * inlined alias chain.
  *
  * Traversal goes through [[AdaptiveSparkPlanHelper]]: under AQE the
  * executed plan's root is an AdaptiveSparkPlanExec LEAF, so a plain
  * `plan.collect` never descends into the real operators and the sweep
  * would pass vacuously for every query containing an exchange. */
class GenerateFilterSweepSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private val maxInlinedSizeArg = 1000

  private def offendingSizeArgs(e: Expression): Seq[String] =
    e.collect {
      case GreaterThan(s: Size, Literal(0, _))
          if s.child.toString.length > maxInlinedSizeArg =>
        s.child.toString.take(160)
    }

  test("no query carries an inferred size(e) > 0 filter over a large " +
      "inlined expression (use explode_outer + isNotNull for computed arrays)") {
    var filtersSeen = 0
    val dirty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        val plan = q(spark, sf0001).queryExecution.executedPlan
        // collect() from AdaptiveSparkPlanHelper descends through
        // AdaptiveSparkPlanExec / QueryStageExec boundaries
        val conds = collect(plan) {
          case f: FilterExec => Seq(f.condition)
          case sc: FileSourceScanExec => sc.dataFilters
        }.flatten
        filtersSeen += conds.size
        val hits = conds.flatMap(offendingSizeArgs)
        if (hits.isEmpty) None else Some(s"$name: ${hits.head}")
    }
    // the sweep must actually be LOOKING at filters — if the traversal
    // ever goes blind (plan hierarchy change), fail loudly instead of
    // passing vacuously
    assert(filtersSeen > 100,
      s"sweep inspected only $filtersSeen filter conditions across the " +
        "whole registry — traversal is broken, not the queries")
    assert(dirty.isEmpty,
      s"inferred-generate filter blowups:\n${dirty.mkString("\n")}")
  }
}
