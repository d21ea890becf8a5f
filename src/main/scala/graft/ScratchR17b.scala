package graft

import org.apache.spark.sql.SparkSession

/** Throwaway round-17 probe: which declared queries are bottlenecked by
  * AQE's fanout-blind partition coalescing? Times each query's noop
  * materialization with coalescing ON (bench default) and OFF in one
  * JVM — a large ON/OFF ratio marks a pinned-exchange candidate. */
object ScratchR17b {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(n: String): Double = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    args.foreach { n =>
      val on = Seq(run(n), run(n)).min
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val off = Seq(run(n), run(n)).min
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
      println(f"COALPROBE $n%-36s on=$on%7.3f off=$off%7.3f ratio=${on / off}%5.2f")
    }
    spark.stop()
  }
}
