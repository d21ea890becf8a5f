package graft

import org.apache.spark.sql.functions._

/** Round-15 invariants: the pruned KN model's plan + storage claims,
  * the spectral audio path's shuffle-free plan, the BFD packer's
  * exchange shape and its measured win over greedy, and the 5-gram
  * DoReMi composition's budget. */
class Round15Spec extends SparkSpec {

  test("q_fivegram_kn_pruned: the pruned ladder keeps the hash-join " +
      "plan — no cartesian, no nested-loop, every lookup an equi-join") {
    val p = graft.SparkEntry.queries("q_fivegram_kn_pruned")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("HashJoin"), p)
  }

  test("pruning bites and the audit agrees with the model: stored " +
      "order-5/4 tables shrink by exactly the audited type counts") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .withColumn("text", coalesce(col("text"), lit("")))
    val m = graft.operators.NgramLm.knCountsPruned(docs, "doc_id", "text",
      n = 5, thresholds = k => if (k >= 4) 1L else 0L)
    val audit = graft.SparkEntry.queries("q_kn_pruned_size")(spark, sf0001)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    for (k <- 4 to 5) {
      val (raw, kept, pruned) = audit(k)
      assert(kept === m.grams(k).count(), s"order $k stored size")
      assert(raw === kept + pruned)
      assert(pruned > 0, s"order $k: θ=1 pruned nothing — no singletons?")
    }
    // orders 2-3 are unpruned by the flagship thresholds
    assert(audit(2)._3 === 0L && audit(3)._3 === 0L)
  }

  test("q_audio_spectral: record-parallel end to end — no hash/range " +
      "exchange; at most the single read-side fan-out (round 16)") {
    val df = graft.SparkEntry.queries("q_audio_spectral")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    // round 16: tiny single-split inputs fan out once at asMedia
    // (Parallelism.fanOut, a round-robin exchange of the raw payloads)
    // so the FFT mapPartitions runs at cluster parallelism; the
    // computation itself stays shuffle-free — no hash or range
    // partitioning anywhere, and nothing above the decode.
    val hashOrRange = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") ||
        l.contains("Exchange rangepartitioning"))
    assert(hashOrRange === 0, s"expected no data shuffle:\n$p")
    val roundRobin = p.linesIterator.count(_.contains("roundrobin"))
    assert(roundRobin <= 1, s"expected at most the one read-side fan-out:\n$p")
  }

  test("q_seq_packing_bfd: ONE hash exchange (the group/shard cell " +
      "shuffle), no window, no join") {
    val df = graft.SparkEntry.queries("q_seq_packing_bfd")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 1, s"expected exactly 1 exchange:\n$p")
    assert(!p.contains("Window"), p)
    assert(!p.contains("Join"), p)
  }

  test("packing efficiency: BFD never overflows capacity; greedy " +
      "next-fit does — the measured comparison the operator exists for") {
    val rows = graft.SparkEntry
      .queries("q_seq_packing_efficiency")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(4))).toMap // method -> (chunks, overflow)
    assert(rows("bfd")._2 === 0L,
      s"BFD overflowed ${rows("bfd")._2} tokens")
    assert(rows("greedy")._2 > 0L,
      "greedy did not overflow on this corpus — comparison is vacuous")
  }

  test("q_fivegram_kn_pruned_persisted: the stored pruned model " +
      "round-trips — scoring from the read-back tables matches the " +
      "in-memory model exactly") {
    val rows = graft.SparkEntry
      .queries("q_fivegram_kn_pruned_persisted")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(rows.nonEmpty)
    // recompute without persistence: split-train a pruned model and
    // score the test split directly
    val docs = graft.operators.Sampling.split(
      spark.read.parquet(s"$sf0001/documents.parquet")
        .withColumn("text", coalesce(col("text"), lit(""))),
      col("doc_id"), 12, 2)
    val m = graft.operators.NgramLm.knCountsPruned(
      docs.filter(col("split") =!= "test"), "doc_id", "text", n = 5,
      thresholds = k => if (k >= 4) 1L else 0L)
    val direct = graft.operators.NgramLm.scoreWithPrunedModel(
        docs.filter(col("split") === "test"), m, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(rows === direct)
  }

  test("q_audio_fingerprint_matches: candidate generation is the hash " +
      "equi-join — no cartesian, the vote window partitioned by pair") {
    val df = graft.SparkEntry
      .queries("q_audio_fingerprint_matches")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("HashJoin"), p)
    val unpartitionedWindow = p.linesIterator.exists(l =>
      l.contains("Window") && l.contains("partitionBy=[]"))
    assert(!unpartitionedWindow, p)
  }

  test("q_audio_fp_incremental_persisted: the stored index round-trips " +
      "— lookup against the read-back landmarks matches the in-memory " +
      "index exactly") {
    val rows = graft.SparkEntry
      .queries("q_audio_fp_incremental_persisted")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val docs = graft.operators.Sampling.split(
      spark.read.parquet(s"$sf0001/documents.parquet")
        .filter(length(encode(col("text"), "UTF-8")) > 0),
      col("doc_id"), 12, 2)
    def fps(df: org.apache.spark.sql.DataFrame) =
      graft.multimodal.Multimodal.audioFingerprints(
        graft.multimodal.Multimodal.encodePcmWav(
          graft.multimodal.Multimodal.asMedia(
            df.withColumn("payload", encode(col("text"), "UTF-8")),
            "doc_id", "payload", "text/plain"),
          sampleRate = 8000),
        frameSize = 64, peaksPerFrame = 2, fanout = 3, maxDt = 8)
    val direct = graft.multimodal.Multimodal.audioFingerprintLookup(
        fps(docs.filter(col("split") === "test")),
        fps(docs.filter(col("split") =!= "test")), minVotes = 10L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows === direct)
  }

  test("q_audio_spectral_neardup: the SemDeDup composition keeps the " +
      "cell-join shape — no cartesian over the corpus") {
    val p = graft.SparkEntry
      .queries("q_audio_spectral_neardup")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_doremi_kn5 composes the 5-gram loss inside the exchange " +
      "budget and still sums weights to ~1 on the simplex") {
    val df = graft.SparkEntry.queries("q_doremi_kn5")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val wsum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wsum - 1.0) < 1e-3, s"weights sum $wsum")
    assert(rows.forall(_.getAs[Int]("keep256") >= 1))
  }
}
