package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/** Throwaway round-17 probe (VERDICT item 8 — measure FIRST): is the
  * connected-components loop paying per-iteration cost proportional to
  * `defaultParallelism` rather than to data size at bench scale, and
  * does a size-matched coalesce before each round's localCheckpoint
  * reduce it? Reports per-iteration wall time, scheduled task count
  * (SparkListener), and the checkpointed frame's partition count for
  * the CURRENT loop shape vs a coalesce(n) variant. */
object ScratchR17c {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tasks = new AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          tasks.incrementAndGet()
      })
    import graft.operators.Dedup
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    // the q_dedup_clusters feed, checkpointed so both loop variants
    // start from identical materialized pairs (pair build excluded
    // from loop timings)
    val pairs = Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text",
      n = 3, threshold = 0.8).localCheckpoint(true)
    println(s"PROBE pairs=${pairs.count()}")

    def cc(coalesceN: Int): (DataFrame, Seq[String]) = {
      val log = scala.collection.mutable.Buffer[String]()
      val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
        .union(pairs.select(col("b").as("src"), col("a").as("dst")))
        .cache()
      var labels0 = edges.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("label"),
          lit(false).as("__changed"))
      if (coalesceN > 0) labels0 = labels0.coalesce(coalesceN)
      var labels = labels0.localCheckpoint(true)
      def propagate(ls: DataFrame): DataFrame = {
        val neighborMin = edges
          .join(ls.select(col("id").as("dst"), col("label")), "dst")
          .groupBy(col("src").as("id"))
          .agg(min(col("label")).as("nbr_label"))
        ls.select(col("id"), col("label")).join(neighborMin, Seq("id"))
          .select(col("id"),
            least(col("label"), col("nbr_label")).as("label"),
            (col("nbr_label") < col("label")).as("__changed"))
      }
      var iter = 0
      var converged = false
      while (iter < 20 && !converged) {
        val t0 = System.nanoTime()
        val tk0 = tasks.get()
        var next0 = propagate(labels)
        if (coalesceN > 0) next0 = next0.coalesce(coalesceN)
        val next = next0.localCheckpoint(true)
        val changed = next.filter(col("__changed")).count()
        graft.core.Checkpoints.free(labels)
        labels = next
        converged = changed == 0L
        iter += 1
        log += f"PROBE   iter=$iter wall=${(System.nanoTime() - t0) / 1e9}%6.3f " +
          f"tasks=${tasks.get() - tk0}%4d parts=${next.rdd.getNumPartitions}%3d " +
          f"changed=$changed"
      }
      edges.unpersist()
      (labels, log.toSeq)
    }

    def timed(label: String)(f: => (DataFrame, Seq[String])): Unit = {
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      val tk0 = tasks.get()
      val (res, log) = f
      val n = res.count()
      println(f"PROBE $label loop_total=${(System.nanoTime() - t0) / 1e9}%6.3f " +
        f"tasks=${tasks.get() - tk0} labels=$n")
      log.foreach(println)
      graft.core.Checkpoints.free(res)
    }

    // alternate to cancel JVM warm-up drift
    for (round <- 1 to 3) {
      println(s"PROBE === round $round ===")
      timed("current ")(cc(0))
      timed("coalesce1")(cc(1))
    }
    spark.stop()
  }
}
