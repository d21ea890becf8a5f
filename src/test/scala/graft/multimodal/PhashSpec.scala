package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** dHash perceptual fingerprint: kernel bits, the real-codec round
  * trip, and the pigeonhole banding of the Hamming pair join. */
class PhashSpec extends SparkSpec {

  test("dHash64 sets a bit exactly when the left cell mean is below the right") {
    // 2x1 image, 1x1 grid: one comparison between the two pixels
    assert(Multimodal.dHash64(2, 1, Array(10, 20), 1, 1) === 1L)
    assert(Multimodal.dHash64(2, 1, Array(20, 10), 1, 1) === 0L)
    assert(Multimodal.dHash64(2, 1, Array(10, 10), 1, 1) === 0L) // strict <
  }

  test("dHash64 monotone columns set all 64 bits; constant image sets none") {
    // pixel value = x: every grid column's mean strictly increases, so
    // all 8x8 comparisons fire -> all 64 bits -> -1L as a signed long
    val ramp = Array.tabulate(16 * 8)(i => i % 16)
    assert(Multimodal.dHash64(16, 8, ramp, 8, 8) === -1L)
    val flat = Array.fill(16 * 8)(7)
    assert(Multimodal.dHash64(16, 8, flat, 8, 8) === 0L)
  }

  test("dHash64 leaves bits clear in rows short images never reach") {
    // h=1: only grid row 0 is populated; rows 1..7 have s=n=0 on both
    // sides of every comparison, so bits 8..63 stay 0 with no special
    // casing (cross-multiplied sums are 0 < 0 = false)
    val hash = Multimodal.dHash64(16, 1, Array.tabulate(16)(x => x), 8, 8)
    assert((hash >>> 8) === 0L)
    assert((hash & 0xffL) === 0xffL) // row 0 ramp fires all 8 bits
  }

  test("dHash through the real PNG round trip equals the raw-pixel kernel") {
    import spark.implicits._
    val payloads = Seq(
      1L -> "the quick brown fox jumps over the lazy dog and keeps going",
      2L -> "a",
      3L -> ("z" * 100))
    val media = Multimodal.encodeGrayPng(Multimodal.asMedia(
      payloads.toDF("doc_id", "text")
        .withColumn("payload", encode(col("text"), "UTF-8")),
      "doc_id", "payload", "text/plain"), width = 16)
    val got = Multimodal.dHash(media).as[(Long, Long)].collect().toMap
    payloads.foreach { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val h = math.max(1, (bytes.length + 15) / 16)
      val px = Array.tabulate(16 * h)(i =>
        if (i < bytes.length) bytes(i) & 0xff else 0)
      assert(got(id) === Multimodal.dHash64(16, h, px, 8, 8),
        s"doc $id: PNG round trip diverged from the raw kernel")
    }
  }

  test("dHashPairs finds pairs up to maxHamming and no further") {
    import spark.implicits._
    // base; 3 bits flipped inside block 0 (pigeonhole: blocks 1-3 still
    // agree, so the candidate join finds it); 4 bits flipped one per
    // block (every block differs AND hamming 4 > 3 -> excluded)
    val base = 0x0123456789abcdefL
    val ham3 = base ^ 0x7L
    val ham4 = base ^ ((1L << 0) | (1L << 16) | (1L << 32) | (1L << 48))
    val hashes = Seq(1L -> base, 2L -> ham3, 3L -> ham4, 4L -> base)
      .toDF("id", "phash")
    val pairs = Multimodal.dHashPairs(hashes, maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs.contains((1L, 2L, 3)))
    assert(pairs.contains((1L, 4L, 0)))
    assert(pairs.contains((2L, 4L, 3)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("dHashCrossPairs: batch probes a stored block index, self-ids excluded") {
    import spark.implicits._
    val base = 0x0123456789abcdefL
    val corpus = Seq(10L -> base, 11L -> (base ^ 0xf0f0L))
      .toDF("id", "phash")
    val batch = Seq(20L -> (base ^ 0x3L), 21L -> 0x7777777777777777L)
      .toDF("id", "phash")
    val blocks = Multimodal.dHashBlocks(corpus, maxHamming = 3)
    val got = Multimodal.dHashCrossPairs(batch, blocks, maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    // 20 vs 10: hamming 2 (two flipped bits) — found; 20 vs 11: 2+8=10
    // bits — out; 21 matches nothing
    assert(got === Set((20L, 10L, 2)))
  }

  test("streaming dHash probe: union over micro-batches == one-shot batch") {
    import org.apache.spark.sql.functions.{length => slen}
    val docs = graft.sources.Sources.table(spark, sf0001, "documents")
      .filter(slen(encode(col("text"), "UTF-8")) > 0)
    def media(df: org.apache.spark.sql.DataFrame) =
      Multimodal.encodeGrayPng(Multimodal.asMedia(
        df.withColumn("payload", encode(col("text"), "UTF-8")),
        "doc_id", "payload", "text/plain"), width = 16)
    val corpusBlocks = Multimodal.dHashBlocks(
      Multimodal.dHash(media(docs.filter(col("doc_id") % 2 === 0))),
      maxHamming = 3).cache()
    // the stream carries already-encoded PNG payloads (media rows)
    val newMedia = media(docs.filter(col("doc_id") % 2 === 1)).toDF()
      .select(col("id").as("doc_id"), col("payload"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_phash_stream").toFile
    tmp.deleteOnExit()
    newMedia.repartition(3).write.mode("overwrite").parquet(tmp.getAbsolutePath)
    val stream = spark.readStream.schema(newMedia.schema)
      .option("maxFilesPerTrigger", "1").parquet(tmp.getAbsolutePath)
    val out = graft.streaming.StreamingOps.streamingDHashPairs(
      stream, "doc_id", "payload", "image/png", corpusBlocks)
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = out.writeStream.outputMode("append").foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        collected.synchronized {
          batches += id
          collected ++= batch.collect().map(r =>
            (r.getLong(0), r.getLong(1), r.getInt(2)))
        }: Unit
    }.start()
    try {
      q.processAllAvailable()
      val oneShot = graft.streaming.StreamingOps.streamingDHashPairs(
          newMedia, "doc_id", "payload", "image/png", corpusBlocks)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(batches.distinct.size > 1, "expected multiple micro-batches")
      assert(collected.toSet === oneShot)
      assert(oneShot.nonEmpty, "planted duplicates should pair across the split")
    } finally {
      q.stop()
      corpusBlocks.unpersist()
    }
  }

  test("q_image_phash and q_phash_neardup run and agree on duplicates") {
    val phash = graft.SparkEntry.queries("q_image_phash")(spark, sf0001)
    assert(phash.count() > 0)
    assert(phash.columns.toSeq === Seq("doc_id", "b0", "b1", "b2", "b3"))
    val pairs = graft.SparkEntry.queries("q_phash_neardup")(spark, sf0001)
    // the corpus carries injected exact duplicates: identical text ->
    // identical pixels -> hamming 0, so the pair set is non-empty
    assert(pairs.filter(col("hamming") === 0).count() > 0)
  }
}
