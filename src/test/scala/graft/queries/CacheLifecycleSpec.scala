package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.GraftCacheProbe

/** Engine-wide cache-lifecycle sweep: after ANY public query surface
  * entry builds AND runs, Spark's CacheManager must be empty — every
  * internal `cache()` was unpersisted before its operator returned
  * (trainers' try/finally contract), and anything that must outlive
  * the call used eager `localCheckpoint(true)` instead (GC-owned,
  * never registered in CacheManager — see [[GraftCacheProbe]]).
  *
  * This catches the historical lexicalTopK failure mode structurally:
  * a lazily-consumed internal cache() that no code path can ever
  * unpersist, pinning executor storage per CALL for the session's
  * lifetime. Any future operator that reintroduces the pattern fails
  * here by query name the moment it is wired into SparkEntry.
  *
  * The contract's known trades, accepted deliberately:
  *  - localCheckpoint truncates lineage, so a lost executor fails the
  *    query (caller retries) instead of transparently recomputing as
  *    cache() would — correct-but-retried beats a storage pin that
  *    grows with every call; production deployments that must survive
  *    executor loss mid-query swap in reliable `checkpoint()` with a
  *    checkpoint dir at the same sites.
  *  - a LAZY localCheckpoint of a shuffle-containing subtree
  *    materializes its stages when the frame is BUILT (AQE computes
  *    the final plan via toRdd), so plan-only consumers pay real jobs.
  *    Operators therefore prefer ReuseExchange-unpersisted forms where
  *    the reused subtree ends in an exchange (tfidf, minhash, simhash,
  *    cooccurrence); the remaining checkpointed shuffle subtrees
  *    (prefix ranking windows, stored-index batch signatures) would
  *    replay a per-consumer sort if unpersisted — the dearer trade. */
class CacheLifecycleSpec extends SparkSpec {

  test("every SparkEntry query leaves CacheManager empty after " +
      "building and running (no un-unpersisted internal cache)") {
    assert(GraftCacheProbe.isEmpty(spark),
      s"cache dirty before sweep: ${GraftCacheProbe.describe(spark)}")
    val dirty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        q(spark, sf0001).count() // build + run: exercises train loops
        if (GraftCacheProbe.isEmpty(spark)) None
        else {
          spark.catalog.clearCache() // isolate subsequent queries
          Some(name)
        }
    }
    assert(dirty.isEmpty,
      s"queries leaving cached frames behind: ${dirty.mkString(", ")}")
  }
}
