package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: measure scaling slope of representative operators by
  * self-unioning the sf0.1 inputs N× (ids offset per copy so key
  * cardinality scales too). A near-linear slope backs SCALE.md's claims;
  * a superlinear one exposes a pair-explosion or a driver bottleneck.
  *
  * Usage: runMain graft.ScaleProbe [multiplier]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(8)
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def amplify(df: DataFrame, idCols: Seq[String], n: Int): DataFrame =
      (0 until n).map { i =>
        idCols.foldLeft(df)((d, c) =>
          d.withColumn(c, col(c) + lit(i.toLong * 100000000L)))
      }.reduce(_ union _)

    def time(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name%-28s $s%8.2f s"); s
    }

    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val ev = sources.Sources.events(spark, dir)
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    for (n <- Seq(1, mult)) {
      println(s"=== multiplier $n ===")
      val liN = amplify(li, Seq("l_orderkey"), n)
      val evN = amplify(ev, Seq("event_id", "user_id"), n)
      val docsN = amplify(docs, Seq("doc_id"), n)
      time(s"agg_q1_${n}x") {
        liN.groupBy("l_returnflag", "l_linestatus")
          .agg(sum("l_quantity"), avg("l_extendedprice"), count(lit(1)))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"window_running_${n}x") {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("l_suppkey").orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        liN.withColumn("r", sum("l_quantity").over(w))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"sessionize_${n}x") {
        operators.Events.sessionize(evN, "30 minutes")
          .write.format("noop").mode("overwrite").save()
      }
      time(s"minhash_lsh_${n}x") {
        operators.Dedup.minHashLshPairs(docsN, "doc_id", "text", 3, 0.8)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
