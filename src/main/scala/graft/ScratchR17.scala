package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway round-17 probe (not part of any query path): size the
  * audio-fingerprint self-join fanout so the optimization targets the
  * real cost (guide §1 measure-first). */
object ScratchR17 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.multimodal.Multimodal
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(length(encode(col("text"), "UTF-8")) > 0)
    val media = Multimodal.asMedia(
      docs.withColumn("payload", encode(col("text"), "UTF-8")),
      "doc_id", "payload", "text/plain")
    val fps = Multimodal.audioFingerprints(
      Multimodal.encodePcmWav(media, sampleRate = 8000),
      frameSize = 64, peaksPerFrame = 2, fanout = 3, maxDt = 8).toDF()
      .localCheckpoint(true)
    val n = fps.count()
    val buckets = fps.groupBy("hash").agg(count(lit(1)).as("c"),
      countDistinct("id").as("ids"))
    val stats = buckets.agg(count(lit(1)).as("n_hashes"),
      max(col("c")).as("max_bucket"),
      sum(col("c") * col("c")).as("sum_c2"),
      max(col("ids")).as("max_ids"),
      sum(when(col("ids") > 1000, 1).otherwise(0)).as("n_capped")).collect()(0)
    println(s"PROBE fps_rows=$n n_hashes=${stats.getLong(0)} " +
      s"max_bucket=${stats.getLong(1)} sum_c2=${stats.getLong(2)} " +
      s"max_ids=${stats.getLong(3)} capped_hashes=${stats.getLong(4)}")
    // top 10 buckets
    buckets.orderBy(desc("c")).limit(10).collect().foreach(r =>
      println(s"PROBE bucket hash=${r.getInt(0)} c=${r.getLong(1)} ids=${r.getLong(2)}"))
    // bisect the real query shape: rare legs, votes agg, best-offset agg
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val rare = fps.groupBy(col("hash"))
      .agg(countDistinct(col("id")).as("__ids"))
      .filter(col("__ids") <= 1000).select(col("hash"))
    val fr = fps.join(rare, Seq("hash"))
    timed("fr_noop")(fr.write.format("noop").mode("overwrite").save())
    val joined = fr.select(col("hash"), col("id").as("a"), col("frame").as("fa"))
      .join(fr.select(col("hash"), col("id").as("b"), col("frame").as("fb")),
        Seq("hash"))
      .filter(col("a") < col("b"))
    timed("join_noop")(joined.write.format("noop").mode("overwrite").save())
    val votes = joined
      .groupBy(col("a"), col("b"), (col("fa") - col("fb")).as("offset"))
      .agg(count(lit(1)).as("votes"))
    timed("votes_noop")(votes.write.format("noop").mode("overwrite").save())
    val best = votes.groupBy(col("a"), col("b"))
      .agg(max_by(struct(col("offset"), col("votes")),
        struct(col("votes"), (-col("offset")).as("__negoff"))).as("__best"))
      .filter(col("__best.votes") >= 10)
    timed("best_noop")(best.write.format("noop").mode("overwrite").save())
    // config experiments on the votes aggregate
    def withConf[A](pairs: (String, String)*)(f: => A): A = {
      val olds = pairs.map { case (k, _) =>
        k -> scala.util.Try(spark.conf.get(k)).toOption }
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      try f finally olds.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k) }
    }
    withConf("spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      timed("votes_noop_nocoalesce")(
        votes.write.format("noop").mode("overwrite").save())
    }
    withConf("spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8m") {
      timed("votes_noop_adv8m")(
        votes.write.format("noop").mode("overwrite").save())
    }
    withConf("spark.sql.codegen.aggregate.fastHashMap.capacityBit" -> "22") {
      timed("votes_noop_bigfastmap")(
        votes.write.format("noop").mode("overwrite").save())
    }
    timed("votes_noop_again")(
      votes.write.format("noop").mode("overwrite").save())
    // the candidate fix: ONE pinned repartition on (a, b) feeding BOTH
    // aggregates (hash(a,b) clusters (a,b,offset) too) — AQE cannot
    // coalesce a user exchange with an explicit N
    val np2 = spark.sessionState.conf.numShufflePartitions
    val votes2 = joined
      .select(col("a"), col("b"), (col("fa") - col("fb")).as("offset"))
      .repartition(np2, col("a"), col("b"))
      .groupBy(col("a"), col("b"), col("offset"))
      .agg(count(lit(1)).as("votes"))
    val best2 = votes2.groupBy(col("a"), col("b"))
      .agg(max_by(struct(col("offset"), col("votes")),
        struct(col("votes"), (-col("offset")).as("__negoff"))).as("__best"))
      .filter(col("__best.votes") >= 10)
    timed("best2_pinned_noop")(
      best2.write.format("noop").mode("overwrite").save())
    // pin the join-side exchange as well: both legs share ONE
    // reused non-coalescible shuffle on the hash
    val fr3 = fr.repartition(np2, col("hash"))
    val joined3 = fr3
      .select(col("hash"), col("id").as("a"), col("frame").as("fa"))
      .join(fr3.select(col("hash"), col("id").as("b"), col("frame").as("fb")),
        Seq("hash"))
      .filter(col("a") < col("b"))
    val votes3 = joined3
      .select(col("a"), col("b"), (col("fa") - col("fb")).as("offset"))
      .repartition(np2, col("a"), col("b"))
      .groupBy(col("a"), col("b"), col("offset"))
      .agg(count(lit(1)).as("votes"))
    val best3 = votes3.groupBy(col("a"), col("b"))
      .agg(max_by(struct(col("offset"), col("votes")),
        struct(col("votes"), (-col("offset")).as("__negoff"))).as("__best"))
      .filter(col("__best.votes") >= 10)
    timed("best3_bothpinned_noop")(
      best3.write.format("noop").mode("overwrite").save())
    timed("best3_again")(
      best3.write.format("noop").mode("overwrite").save())
    println("PROBE best3 exchanges:")
    best3.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Reused"))
      .take(12).foreach(l => println("PROBE   " + l.trim.take(130)))
    spark.stop()
  }
}
