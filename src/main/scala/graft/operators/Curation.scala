package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composed form of the pipeline this
  * engine exists for:
  *
  *   quality filter → near-dup clustering → one survivor per cluster →
  *   deterministic train/valid/test split
  *
  * Each stage is an existing operator; this module only fixes the
  * composition order (filter FIRST so clustering never pays for rows
  * that were leaving anyway — at 100 TB the quality gate typically
  * drops a large fraction of the corpus before the expensive pair
  * join).
  */
object Curation {

  /** Returns the curated corpus: one surviving doc per near-dup
    * cluster among quality-passing docs, tagged with its split. */
  def curate(docs: DataFrame, minTokens: Long = 10L,
      jaccardThreshold: Double = 0.8, train16: Int = 12,
      valid16: Int = 2): DataFrame = {
    // quality feeds shingling (multiple consumers inside the pair join)
    // AND the survivor join — cache so the tokenCount+langId scan of the
    // full corpus runs once
    val quality = docs
      .withColumn("__n_tokens", TextAnalysis.tokenCount(col("text")).cast("long"))
      .filter(col("__n_tokens") >= minTokens &&
        TextAnalysis.langId(col("text")) =!= "und")
      .drop("__n_tokens")
      .cache()
    val pairs = Dedup.ngramJaccardPairsPrefix(quality, "doc_id", "text",
      n = 3, threshold = jaccardThreshold)
    val clusters = Dedup.connectedComponents(
      quality.select(col("doc_id").as("id")), pairs)
    val survivors = quality
      .join(clusters, quality("doc_id") === clusters("doc_id"))
      .filter(clusters("doc_id") === col("cluster_rep"))
      .select(quality("doc_id"), col("text"), col("lang"), col("source"))
    Sampling.split(survivors, col("doc_id"), train16, valid16)
  }
}
