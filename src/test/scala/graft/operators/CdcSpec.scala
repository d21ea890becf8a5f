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

  test("q_cdc_chunks and q_cdc_dedup run green on the corpus") {
    val per = graft.SparkEntry.queries("q_cdc_chunks")(spark, sf0001)
    assert(per.count() > 0)
    assert(per.columns.toSeq === Seq("doc_id", "n_chunks", "max_len", "min_len"))
    val stats = graft.SparkEntry.queries("q_cdc_dedup")(spark, sf0001).collect()(0)
    // the corpus carries injected exact duplicates -> shared chunks
    assert(stats.getAs[Long]("total_chunks") > stats.getAs[Long]("distinct_chunks"))
  }
}
