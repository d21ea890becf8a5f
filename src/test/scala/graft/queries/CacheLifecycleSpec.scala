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
  * here by query name the moment it is wired into SparkEntry. */
class CacheLifecycleSpec extends SparkSpec {

  test("every SparkEntry query leaves CacheManager empty after " +
      "building and running (no un-unpersisted internal cache)") {
    assert(GraftCacheProbe.isEmpty(spark), "cache dirty before sweep")
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
