package org.apache.spark.sql

/** Test-only probe into Spark's `private[sql]` CacheManager.
  *
  * Why CacheManager and not `sparkContext.getPersistentRDDs`: the
  * engine's lifecycle contract distinguishes two persistence kinds.
  * Internal `cache()`/`persist()` calls MUST be unpersisted before an
  * operator returns (a cached frame referenced by a returned plan is
  * pinned for as long as the caller holds the result — the historical
  * lexicalTopK leak). `localCheckpoint` blocks (eager for frames that
  * feed driver-side training loops, lazy where plan building must stay
  * job-free) are the sanctioned alternative: they never register in
  * CacheManager and the ContextCleaner frees them when the frame
  * becomes unreachable, so they are invisible here but transiently
  * visible in getPersistentRDDs. CacheManager emptiness is therefore
  * exactly the "no un-unpersisted internal cache survives the call"
  * assertion. */
object GraftCacheProbe {
  def isEmpty(spark: SparkSession): Boolean =
    spark.sharedState.cacheManager.isEmpty

  /** First plan lines of every cached entry — names the leaker when
    * the emptiness assertion fails (a bare boolean cost a round-14
    * hunt). The backing list is `private`, so this reads it
    * reflectively and degrades to a shrug if the field moves. */
  def describe(spark: SparkSession): Seq[String] =
    try {
      val cm = spark.sharedState.cacheManager
      val f = cm.getClass.getDeclaredField("cachedData")
      f.setAccessible(true)
      f.get(cm).asInstanceOf[Iterable[_]].toSeq
        .map(_.toString.linesIterator.take(3).mkString(" | ").take(300))
    } catch {
      case e: Throwable => Seq(s"<cachedData not readable: $e>")
    }
}
