package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed physical plan (post-AQE) of one or all
  * registered queries. Usage: runMain graft.PlanDump [queryName] [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_pricing_summary")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (name == "all") SparkEntry.queries.keys.toSeq.sorted else Seq(name)
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      df.collect() // materialize AQE final plan
      println(s"=== $n ===")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
