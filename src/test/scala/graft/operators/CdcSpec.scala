package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gear content-defined chunking: kernel determinism, the
  * re-synchronization property that makes CDC dedup work, and the
  * chunk/dedup frames. */
class CdcSpec extends SparkSpec {

  private def bytes(n: Int, seed: Int): Array[Byte] = {
    // deterministic pseudo-random bytes (no java.util.Random state
    // ambiguity across JVMs): splitmix-style scramble of the index
    Array.tabulate(n) { i =>
      val x = (i.toLong + seed) * 0x9E3779B97F4A7C15L
      ((x >>> 33) & 0xff).toByte
    }
  }

  test("cutEnds is a pure function of content and chunks tile the payload") {
    val p = bytes(4096, seed = 7)
    val c1 = Cdc.cutEnds(p, maskBits = 6)
    val c2 = Cdc.cutEnds(p, maskBits = 6)
    assert(c1.toSeq === c2.toSeq)
    assert(c1.nonEmpty, "4 KiB of random bytes must contain ~64 cuts")
    // average chunk length ~2^6: loose sanity bounds
    assert(c1.length > 16 && c1.length < 256, s"got ${c1.length} cuts")
    assert(c1.forall(i => i >= 0 && i < p.length))
  }

  test("boundaries re-synchronize after an insertion (the CDC property)") {
    val tail = bytes(2048, seed = 11)
    val a = bytes(100, seed = 3) ++ tail
    val b = bytes(137, seed = 5) ++ tail // different-length prefix
    def tailCuts(p: Array[Byte], skip: Int): Set[Int] =
      Cdc.cutEnds(p, 6).filter(_ >= skip + 32).map(_ - skip).toSet
    // cuts 32+ bytes into the shared tail are position-shifted copies
    // of each other: the hash window forgets the prefix entirely
    assert(tailCuts(a, 100) === tailCuts(b, 137))
    assert(tailCuts(a, 100).nonEmpty)
  }

  test("chunks emits tiling slices and identical payloads chunk identically") {
    import spark.implicits._
    val p = bytes(1000, seed = 42)
    val df = Seq((1L, p), (2L, p), (3L, bytes(500, seed = 9)))
      .toDF("id", "payload")
    val ch = Cdc.chunks(df, "id", "payload", maskBits = 5).cache()
    try {
      // chunks tile: offsets/lengths reconstruct the payload exactly
      val rows = ch.filter(col("id") === 1L)
        .orderBy("chunk_idx")
        .select("offset", "length", "chunk")
        .collect()
      var pos = 0
      rows.foreach { r =>
        assert(r.getInt(0) === pos)
        val slice = r.getAs[Array[Byte]](2)
        assert(slice.length === r.getInt(1))
        assert(slice.toSeq === p.slice(pos, pos + slice.length).toSeq)
        pos += slice.length
      }
      assert(pos === p.length)
      // identical payloads -> identical chunk sets
      val h1 = ch.filter(col("id") === 1L).select("chunk_idx", "offset", "length").collect().map(_.toSeq).toSet
      val h2 = ch.filter(col("id") === 2L).select("chunk_idx", "offset", "length").collect().map(_.toSeq).toSet
      assert(h1 === h2)
      // dedup stats see the duplicate payload: ratio strictly positive
      val stats = Cdc.dedupStats(ch).collect()(0)
      assert(stats.getAs[Long]("total_chunks") > stats.getAs[Long]("distinct_chunks"))
      assert(stats.getAs[Double]("dedup_ratio") > 0.0)
    } finally ch.unpersist()
  }

  test("streaming CDC chunk probe: union over micro-batches == one-shot batch") {
    import graft.sources.Sources
    val docs = Sources.table(spark, sf0001, "documents")
      .filter(length(encode(col("text"), "UTF-8")) > 0)
      .withColumn("payload", encode(col("text"), "UTF-8"))
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val newDocs = docs.filter(col("doc_id") % 2 === 1)
      .select("doc_id", "payload")
    val stored = Cdc.chunks(corpus, "doc_id", "payload", maskBits = 6)
      .select(col("chunk")).distinct()
      .withColumn("chunk_hash", xxhash64(col("chunk")))
      .cache()
    val tmp = java.nio.file.Files.createTempDirectory("graft_cdc_stream").toFile
    tmp.deleteOnExit()
    newDocs.repartition(3).write.mode("overwrite").parquet(tmp.getAbsolutePath)
    val stream = spark.readStream
      .schema(newDocs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(tmp.getAbsolutePath)
    val out = graft.streaming.StreamingOps
      .streamingCdcChunks(stream, "doc_id", "payload", stored, maskBits = 6)
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Int, Int, Boolean)]
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = out.writeStream.outputMode("append").foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        collected.synchronized {
          batches += id
          collected ++= batch.collect().map(r =>
            (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getBoolean(4)))
        }: Unit
    }.start()
    try {
      q.processAllAvailable()
      val oneShot = graft.streaming.StreamingOps
        .streamingCdcChunks(newDocs, "doc_id", "payload", stored, maskBits = 6)
        .collect().map(r =>
          (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getBoolean(4)))
        .toSet
      assert(batches.distinct.size > 1, "expected multiple micro-batches")
      assert(collected.toSet === oneShot)
      assert(oneShot.exists(_._5), "planted duplicates should reuse chunks across the split")
      assert(oneShot.exists(!_._5), "unique content should produce fresh chunks")
    } finally {
      q.stop()
      stored.unpersist()
    }
  }

  // ---- the clamped production backstop (round 13, VERDICT r12 #4) ----

  test("clampedCutEnds: adversarial constant bytes are forced to cut at " +
      "maxLen — chunk sizes bounded where the unclamped form is unbounded") {
    // a constant payload never hits the gear mask (one unbounded chunk
    // unclamped); the clamp must force a cut every maxLen bytes
    val p = Array.fill[Byte](10000)(0x41)
    assert(Cdc.cutEnds(p, maskBits = 6).isEmpty,
      "constant bytes must produce no mask hits at these parameters")
    val cuts = Cdc.clampedCutEnds(p, maskBits = 6, minLen = 16, maxLen = 256)
    assert(cuts.toSeq === (255 until 10000 by 256).toSeq,
      "forced cuts every maxLen bytes")
    import spark.implicits._
    val ch = Cdc.chunksClamped(Seq((1L, p)).toDF("id", "payload"),
      "id", "payload", maskBits = 6, minLen = 16, maxLen = 256)
    val lens = ch.select("length").collect().map(_.getInt(0))
    assert(lens.forall(_ <= 256), s"chunk rows must stay <= maxLen: ${lens.max}")
    assert(lens.sum === 10000, "chunks still tile the payload")
  }

  test("clampedCutEnds: identical to unclamped wherever unclamped cut " +
      "spacing is already within [minLen, maxLen]") {
    val p = bytes(8192, seed = 21)
    val unclamped = Cdc.cutEnds(p, maskBits = 6)
    // derive bounds that the unclamped spacing already satisfies
    val spacings = (unclamped.head + 1) +:
      unclamped.sliding(2).filter(_.length == 2).map(w => w(1) - w(0)).toSeq
    val lo = spacings.min
    // hi must also exceed the cut-less tail after the LAST mask hit,
    // or the clamp would force extra cuts there that unclamped lacks
    val hi = math.max(spacings.max, p.length - 1 - unclamped.last + 1)
    val clamped = Cdc.clampedCutEnds(p, maskBits = 6, minLen = lo, maxLen = hi)
    assert(clamped.toSeq === unclamped.toSeq,
      s"in-bounds spacing [$lo, $hi] must leave cuts untouched")
    // and with a TIGHTER min, early mask hits are skipped but the hash
    // stays continuous: every clamped cut is either an unclamped
    // candidate or a forced cut (no new content positions invented)
    val tight = Cdc.clampedCutEnds(p, maskBits = 6,
      minLen = lo + 1, maxLen = hi + 64)
    val candSet = unclamped.toSet
    var prev = -1
    tight.foreach { c =>
      assert(candSet.contains(c) || c - prev == hi + 64,
        s"cut $c is neither a mask hit nor a forced cut")
      prev = c
    }
  }

  test("clamped chunks re-synchronize after an insertion once an " +
      "in-bounds mask hit re-anchors the sequence") {
    val tail = bytes(4096, seed = 31)
    val a = bytes(100, seed = 3) ++ tail
    val b = bytes(137, seed = 5) ++ tail
    def tailCuts(p: Array[Byte], skip: Int): Seq[Int] =
      Cdc.clampedCutEnds(p, 6, minLen = 8, maxLen = 512)
        .filter(_ >= skip + 32).map(_ - skip).toSeq
    val ta = tailCuts(a, 100)
    val tb = tailCuts(b, 137)
    // forced cuts chain from the differing prefixes, so alignment can
    // lag; after the first SHARED in-bounds cut the sequences must
    // agree exactly (content has re-anchored both)
    val shared = ta.toSet.intersect(tb.toSet)
    assert(shared.nonEmpty, "sequences never re-synchronized")
    val anchor = shared.min
    assert(ta.dropWhile(_ < anchor) === tb.dropWhile(_ < anchor),
      "post-anchor cuts must be identical")
  }

  test("q_cdc_chunks and q_cdc_dedup run green on the corpus") {
    val per = graft.SparkEntry.queries("q_cdc_chunks")(spark, sf0001)
    assert(per.count() > 0)
    assert(per.columns.toSeq === Seq("doc_id", "n_chunks", "max_len", "min_len"))
    val stats = graft.SparkEntry.queries("q_cdc_dedup")(spark, sf0001).collect()(0)
    // the corpus carries injected exact duplicates -> shared chunks
    assert(stats.getAs[Long]("total_chunks") > stats.getAs[Long]("distinct_chunks"))
  }
}
