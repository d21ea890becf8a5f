package graft.queries

import graft.SparkSpec
import graft.SparkEntry

/** Plan-shape pins for the round-4 scale fixes — asserted against the
  * physical plan so a refactor can't silently regress them. */
class Round4PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.executedPlan.toString

  test("decile stats: the only window is keyed by the range bucket (no global sort)") {
    val p = plan("q_decile_stats")
    assert(!p.contains("ntile"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
    val windows = p.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windows.size === 1, s"expected 1 keyed window:\n${windows.mkString("\n")}")
    assert(windows.head.contains("], [__bkt"),
      s"window must partition by the range bucket:\n${windows.head}")
  }

  test("zipf slope: top-N via TakeOrderedAndProject, no window at all") {
    val p = plan("q_zipf_slope")
    assert(p.contains("TakeOrderedAndProject(limit=10000"), p)
    assert(!p.contains("Window ["), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("minhash LSH: band join is a value-keyed equi-join (SortMerge or Hash), no murmur3 band keys") {
    val p = plan("q_neardup_minhash_lsh")
    assert(!p.contains("murmur3"), p)
    assert(p.contains("band_key"), p)
  }

  test("semantic neardup: candidate generation is an equi-join on the cluster id") {
    val p = plan("q_semantic_neardup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("cluster"), p)
  }

  test("persisted incremental dedup: corpus side scans the bucketed table") {
    val p = plan("q_dedup_incremental_persisted")
    assert(p.contains("graft_corpus_shingles"), p)
    // the bloom probe prunes the corpus scan before any join
    assert(p.contains("bloom_probe"), p)
  }

  test("persisted minhash index: candidates join the stored band index and sig table") {
    val p = plan("q_minhash_incremental_persisted")
    assert(p.contains("graft_corpus_minhash_bands"), p)
    assert(p.contains("graft_corpus_minhash_sigs"), p)
    // corpus signatures come from storage, never recomputed: documents
    // scans belong to the batch side only (2 consumers of the cached
    // signatures; a corpus-side recompute would double the count)
    val docScans = p.linesIterator
      .count(l => l.contains("FileScan") && l.contains("documents.parquet"))
    assert(docScans <= 2, s"expected only batch-side documents scans:\n$p")
  }
}
