package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.execution.LogicalRDD

/** Round-12 plan pins: the A/V container's compute-once mux and the
  * native language-ID screen staying out of interpreted HOF land. */
class Round12PlanSpec extends SparkSpec {

  test("q_av_container_features: both modality legs read ONE lazily-" +
      "checkpointed mux RDD — the container is built once, not per leg") {
    val df = graft.SparkEntry.queries("q_av_container_features")(spark, sf0001)
    val rdds = df.queryExecution.analyzed.collect {
      case l: LogicalRDD => l.rdd.id
    }
    // two LogicalRDD leaves (video leg + audio leg), one underlying RDD:
    // if the legs ever stop sharing the checkpoint, the expensive
    // mux (PNG encode × frames + PCM pack per doc) silently doubles
    assert(rdds.size === 2, s"expected 2 checkpoint reads, got $rdds")
    assert(rdds.distinct.size === 1,
      s"legs read DIFFERENT mux RDDs — container built twice: $rdds")
  }

  test("language-ID screen is the native count_in — no interpreted " +
      "ArrayFilter/ArrayTransform HOFs in the executed plan") {
    val plan = graft.SparkEntry.queries("q_lang_id")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("count_in"), s"count_in missing from plan:\n$plan")
    // the composed form this replaced: size(filter(transform(...)))
    // — CodegenFallback, one interpreted lambda per token per list
    assert(!plan.contains("array_filter") && !plan.contains("ArrayFilter"),
      s"interpreted HOF back in the lang-id plan:\n$plan")
    assert(!plan.contains("array_transform") && !plan.contains("ArrayTransform"),
      s"interpreted lowering pre-pass back in the lang-id plan:\n$plan")
  }

  // (No plan pin on q_curation_summary: its quality stage sits behind
  // curate's lazy localCheckpoint, so the outer query's executed plan
  // is truncated at a LogicalRDD leaf and never shows the screen —
  // the q_lang_id pin above covers the same code path, countIn.)

  test("q_waiting_suppliers scans the fact table ONCE — the single-chain " +
      "decorrelation can't silently regress to a multi-scan form") {
    val df = graft.SparkEntry.queries("q_waiting_suppliers")(spark, sf0001)
    df.collect() // materialize the AQE final plan
    // AdaptiveSparkPlan.toString prints the Initial Plan too — scope
    // the scan count to the final section only
    val finalPlan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val liScans = "lineitem\\.parquet".r.findAllIn(finalPlan).length
    // a two-consumer formulation double-scanned: its branches picked
    // up different pushed null-filters, defeating ReuseExchange —
    // pinned here so the one-scan shape survives refactors
    assert(liScans === 1,
      s"expected exactly 1 lineitem scan, got $liScans:\n$finalPlan")
  }

  test("q_phash_neardup candidates stay a banded equi-join (no BNLJ, " +
      "no cartesian) and q_cdc chunking shuffles only for aggregation") {
    val pairs = graft.SparkEntry.queries("q_phash_neardup")(spark, sf0001)
    pairs.collect()
    val pp = pairs.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!pp.contains("BroadcastNestedLoopJoin") &&
      !pp.contains("CartesianProduct"),
      s"phash candidate join degraded from the pigeonhole equi-join:\n$pp")
    // CDC per-doc audit: the chunker is one mapPartitions pass; the
    // only exchange is the per-doc aggregation's
    val chunks = graft.SparkEntry.queries("q_cdc_chunks")(spark, sf0001)
    chunks.collect()
    val cp = chunks.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(cp).length
    assert(exchanges <= 1,
      s"expected at most 1 exchange in the CDC chunk audit, got $exchanges:\n$cp")
  }
}
