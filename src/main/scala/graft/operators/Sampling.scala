package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and splitting — the
  * train/valid/test primitive of an LLM-data pipeline.
  *
  * `rand()`-based sampling is seed- and partitioning-dependent;
  * content-hash bucketing is not: the same row lands in the same split
  * on any cluster, any partitioning, any engine that computes md5 the
  * same way (which is what makes it DuckDB-oracle-able — and, in
  * production, what makes a 100 TB split reproducible across reruns and
  * incremental appends). */
object Sampling {

  /** 16-way bucket id from the first hex nibble of md5(key). */
  def hashBucket16(key: Column): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, 1), 16, 10)
      .cast("int")

  /** Keep rows whose bucket < keep16 (keep16/16 sampling fraction). */
  def sampleByHash(df: DataFrame, key: Column, keep16: Int): DataFrame =
    df.filter(hashBucket16(key) < keep16)

  /** Labeled train/valid/test split: buckets [0, train16) → train,
    * [train16, train16+valid16) → valid, rest → test. */
  def split(df: DataFrame, key: Column, train16: Int, valid16: Int): DataFrame =
    df.withColumn("split",
      when(hashBucket16(key) < train16, "train")
        .when(hashBucket16(key) < train16 + valid16, "valid")
        .otherwise("test"))
}
