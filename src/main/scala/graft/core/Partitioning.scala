package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Partitioning utilities — the engine-side answer to SURVEY.md §2 row 5.
  *
  * The reference's PARTITION state is an explicit no-op ("ZMQ PUSH/PULL
  * load balances for us", `server.py:243-247`): record-level fair
  * queuing, no key partitioner at all. On Spark the shuffle IS hash
  * partitioning; what an engine must add for 100 TB is SKEW handling —
  * a single hot key (empty document fingerprint, null-ish user, stopword
  * shingle) otherwise pins one reducer while 999 executors idle.
  */
object Partitioning {

  /** Explicit co-partitioning by key: one hash shuffle now, reused by
    * every downstream key-wise op (Catalyst sees the partitioning and
    * elides its own exchanges). */
  def byKey(df: DataFrame, numPartitions: Int, keys: Column*): DataFrame =
    df.repartition(numPartitions, keys: _*)

  /** Two-stage salted aggregation for skewed keys: stage 1 aggregates on
    * (key, salt) — spreading a hot key over `saltBuckets` reducers —
    * stage 2 merges the per-salt partials. Works for any algebraic
    * aggregate (sum/count/min/max here); identical results to the direct
    * groupBy, verified by oracle.
    *
    * The salt must be deterministic per ROW but uniform per KEY:
    * hashing a unique row id does that without RNG. */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
      saltCol: Column, saltBuckets: Int): DataFrame =
    df.select(key.as("k"), value.as("v"),
        pmod(xxhash64(saltCol), lit(saltBuckets)).as("salt"))
      .groupBy(col("k"), col("salt"))
      .agg(sum(col("v")).as("part_sum"), count(lit(1)).as("part_n"))
      .groupBy(col("k"))
      .agg(sum(col("part_sum")).as("sum_v"), sum(col("part_n")).as("n"))
}
