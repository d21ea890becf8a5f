package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on
  * `$SPARK_GRAFT_SF_DIR`, prints ONE JSON line.
  *
  * Methodology: each query is materialized via the `noop` sink (forces
  * full computation of every output column without driver-side collect),
  * after one untimed warm-up pass over the whole set (JIT + parquet
  * footer caches; the driver's per-round numbers should measure the
  * engine, not JVM cold start). The table cache is CLEARED before every
  * timed query: several operators `.cache()` intermediates internally
  * (shingle tables, label loops), and CacheManager substitutes those
  * cached plans into any later canonically-equal query — without the
  * clear, the warm-up pass would pre-materialize them and the timed
  * pass would measure cached-table scans instead of real work.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def exec(name: String): Double = {
      spark.catalog.clearCache() // no cross-query or warm-up cache reuse
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    // optional dev filter: `runMain graft.Bench q_a q_b` times only
    // those queries (the driver invokes with no args — unaffected)
    val names0 = SparkEntry.queries.keys.toSeq.sorted
    val names = if (args.nonEmpty) names0.filter(args.contains) else names0
    names.foreach(exec) // warm-up pass, untimed
    val results = names.map(n => n -> exec(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // a failed query reports -1.0 for its own slot; exclude it from the
    // total (a failure must not make the benchmark look FASTER) and name
    // it explicitly so a broken query can't hide in the sum
    val (failed, ok) = results.partition(_._2 < 0.0)
    val total = ok.map(_._2).sum
    val failedJson = failed.map("\"" + _._1 + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":$failedJson,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
