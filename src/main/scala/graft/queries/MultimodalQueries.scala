package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.sources.Sources.table

/** Multimodal pipeline queries: documents' text bytes become media
  * payloads (no media tables in the test data). q_multimodal_features
  * runs a REAL codec round trip — text bytes packed into an 8-bit gray
  * image, compressed to PNG by `javax.imageio`, decoded back, features
  * from the decoded raster. Pixels are a deterministic function of the
  * text, so dimensions and mean luminance are oracle-checked even
  * though the intermediate PNG byte stream is codec-internal; the
  * pooled-band embedding is exercised via its dimension here and
  * value-checked in MultimodalSpec.
  */
object MultimodalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_features" -> { (s, dir) =>
      val media = Multimodal.asMedia(
        table(s, dir, "documents").withColumn("payload", encode(col("text"), "UTF-8")),
        "doc_id", "payload", "text/plain")
      Multimodal.decodeImageFeatures(Multimodal.encodeGrayPng(media, width = 16))
        .toDF()
        .select(col("id").as("doc_id"), col("width"), col("height"),
          col("mean_pixel"), size(col("embedding")).as("embedding_dim"))
    },
    // frame sampling + resize, verified arithmetically: frame sizes and
    // the resized byte count are functions of payload length alone
    "q_multimodal_frames" -> { (s, dir) =>
      val media = Multimodal.asMedia(
        table(s, dir, "documents").withColumn("payload", encode(col("text"), "UTF-8")),
        "doc_id", "payload", "text/plain")
      val frames = Multimodal.sampleFrames(media, frameSize = 64, maxFrames = 5)
        .toDF()
        .groupBy(col("id").as("doc_id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(length(col("frame_bytes"))).as("sum_frame_bytes"))
      val resized = Multimodal.resize(media, factor = 4).toDF()
        .select(col("id").as("doc_id"),
          length(col("payload")).cast("long").as("n_resized_bytes"))
      frames.join(resized, Seq("doc_id"))
    },
  )

  val oracles: Map[String, String] = Map(
    // text is ASCII, so utf-8 byte values == codepoints; the image is
    // 16 pixels wide, zero-padded to full rows, so mean luminance =
    // byte sum / (16 * rows)
    "q_multimodal_features" ->
      """SELECT doc_id,
        |  16 AS width,
        |  greatest(ceil(octet_length(encode(text)) / 16.0), 1)::INTEGER AS height,
        |  round(coalesce(list_sum(list_transform(string_split(text, ''),
        |          x -> unicode(x))), 0)
        |        / (16 * greatest(ceil(octet_length(encode(text)) / 16.0), 1)),
        |        4) AS mean_pixel,
        |  8 AS embedding_dim
        |FROM documents""".stripMargin,
    // frame count = min(maxFrames, ceil(len/frameSize)); the sampled
    // frames cover the first min(len, maxFrames*frameSize) bytes;
    // resize(4) keeps every 4th byte -> ceil(len/4)
    "q_multimodal_frames" ->
      """SELECT doc_id,
        |  CAST(least(5, ceil(octet_length(encode(text)) / 64.0)) AS BIGINT) AS n_frames,
        |  CAST(least(octet_length(encode(text)), 320) AS BIGINT) AS sum_frame_bytes,
        |  CAST(ceil(octet_length(encode(text)) / 4.0) AS BIGINT) AS n_resized_bytes
        |FROM documents
        |WHERE octet_length(encode(text)) > 0""".stripMargin,
  )
}
