package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.catalyst.expressions.{Expression, GreaterThan, Literal, Size}
import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec, SparkPlan}

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
  * inlined alias chain. */
class GenerateFilterSweepSpec extends SparkSpec {

  private val maxInlinedSizeArg = 1000

  private def offendingSizeArgs(e: Expression): Seq[String] =
    e.collect {
      case GreaterThan(s: Size, Literal(0, _))
          if s.child.toString.length > maxInlinedSizeArg =>
        s.child.toString.take(160)
    }

  test("no query carries an inferred size(e) > 0 filter over a large " +
      "inlined expression (use explode_outer + isNotNull for computed arrays)") {
    val dirty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        val plan: SparkPlan = q(spark, sf0001).queryExecution.executedPlan
        val conds = plan.collect {
          case f: FilterExec => Seq(f.condition)
          case sc: FileSourceScanExec => sc.dataFilters
        }.flatten
        val hits = conds.flatMap(offendingSizeArgs)
        if (hits.isEmpty) None else Some(s"$name: ${hits.head}")
    }
    assert(dirty.isEmpty,
      s"inferred-generate filter blowups:\n${dirty.mkString("\n")}")
  }
}
