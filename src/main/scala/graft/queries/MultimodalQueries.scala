package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.sources.Sources.table

/** Multimodal pipeline query: documents' text bytes stand in for media
  * payloads (no real media in the test tables). The byte-statistics
  * columns are oracle-checked; the stub embedding is exercised via its
  * dimension (full vector checks live in MultimodalSpec).
  */
object MultimodalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_features" -> { (s, dir) =>
      val media = Multimodal.asMedia(
        table(s, dir, "documents").withColumn("payload", encode(col("text"), "UTF-8")),
        "doc_id", "payload", "text/plain")
      Multimodal.decodeFeatures(media)
        .toDF()
        .select(col("id").as("doc_id"), col("n_bytes"), col("mean_byte"),
          size(col("embedding")).as("embedding_dim"))
    },
  )

  val oracles: Map[String, String] = Map(
    // text is ASCII, so utf-8 byte stats == codepoint stats
    "q_multimodal_features" ->
      """SELECT doc_id,
        |  octet_length(encode(text))::BIGINT AS n_bytes,
        |  round(list_avg(list_transform(string_split(text, ''), x -> unicode(x))), 4) AS mean_byte,
        |  8 AS embedding_dim
        |FROM documents""".stripMargin,
  )
}
