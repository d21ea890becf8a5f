package graft

import org.apache.spark.sql.SparkSession

/** Round-17 plan snapshot tool: writes each named query's
  * `.explain("formatted")` output — followed by the post-AQE executed
  * plan after a noop-sink materialization (the plan the claims in
  * OPTIMIZATION_r17.md are checked against) — to
  * `plans/r17/<query>_<tag>.txt`.
  *
  * Usage: runMain graft.PlanDumpR17 <tag> <query...> [--sf <dir>]
  * e.g.   runMain graft.PlanDumpR17 before q_fivegram_kn_estd
  *
  * Uses the bench's exact session shape (local[$SPARK_GRAFT_CPUS],
  * shuffle.partitions = cpus, AQE on) so the captured join strategies
  * and exchange counts are the ones the bench actually pays.
  */
object PlanDumpR17 {
  def main(args: Array[String]): Unit = {
    val sfIdx = args.indexOf("--sf")
    val dir = if (sfIdx >= 0) args(sfIdx + 1) else "/root/testdata/sf0.1"
    val rest = if (sfIdx >= 0) args.patch(sfIdx, Nil, 2) else args
    val tag = rest.headOption.getOrElse("before")
    val names = rest.drop(1)
    require(names.nonEmpty, "usage: PlanDumpR17 <tag> <query...> [--sf dir]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = java.nio.file.Paths.get("plans/r17")
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { n =>
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      val df = SparkEntry.queries(n)(spark, dir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // materialize THIS DataFrame's own QueryExecution (a noop write
      // would re-plan a copy and leave df's AQE un-finalized): every
      // declared query returns oracle-checkable row counts, so collect
      // is bounded
      df.collect()
      val executed = df.queryExecution.executedPlan.toString
      java.nio.file.Files.writeString(outDir.resolve(s"${n}_$tag.txt"),
        s"== explain(formatted) ==\n$formatted\n" +
          s"== executed plan (post-AQE, after noop materialization) ==\n$executed\n")
      println(s"wrote plans/r17/${n}_$tag.txt")
    }
    spark.stop()
  }
}
