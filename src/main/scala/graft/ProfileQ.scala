package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: split a query's wall clock into CONSTRUCTION (building the
  * DataFrame — which for operators with eager internal actions like
  * localCheckpoint(true) / trainCentroids / guard counts already runs
  * Spark jobs) and EXECUTION (the noop-sink materialization the bench
  * times). A query whose time sits in construction is bounded by
  * driver-sequential job count, not by the plan the explain file shows
  * — the two need different optimizations (guide §2.6 job overlap vs
  * §2/§3 plan surgery).
  *
  * Usage: runMain graft.ProfileQ <query...> [--sf <dir>] [--runs N]
  * Bench session shape (local[$SPARK_GRAFT_CPUS], shuffle = cpus, AQE).
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val sfIdx = args.indexOf("--sf")
    val dir = if (sfIdx >= 0) args(sfIdx + 1) else "/root/testdata/sf0.1"
    val a1 = if (sfIdx >= 0) args.patch(sfIdx, Nil, 2) else args
    val rIdx = a1.indexOf("--runs")
    val runs = if (rIdx >= 0) a1(rIdx + 1).toInt else 3
    val names = (if (rIdx >= 0) a1.patch(rIdx, Nil, 2) else a1).toSeq
    require(names.nonEmpty, "usage: ProfileQ <query...> [--sf dir] [--runs N]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val rows = (1 to runs).map { _ =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        System.gc()
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, dir)
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
      }
      val c = rows.map(_._1).sorted.apply(runs / 2)
      val e = rows.map(_._2).sorted.apply(runs / 2)
      println(f"$n%-40s construct=$c%7.3fs execute=$e%7.3fs  " +
        rows.map { case (a, b) => f"[$a%.2f+$b%.2f]" }.mkString(" "))
    }
    spark.stop()
  }
}
