package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-6 operators: PassJoin edit-distance blocking and the SCD2
  * interval builder. */
class Round6Spec extends SparkSpec {
  import spark.implicits._

  // ---- editDistancePairs ----

  private def pairs(df: org.apache.spark.sql.DataFrame, k: Int) =
    Dedup.editDistancePairs(df, "id", "s", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("editDistancePairs: hand cases — substitutions, indels, misses") {
    val df = Seq(
      (1L, "kitten"), (2L, "sitting"),   // classic ed = 3
      (3L, "kitten"),                    // exact dup of 1 -> ed 0
      (4L, "mitten"),                    // ed 1 to kitten
      (5L, "flawless"),                  // far from everything
      (6L, "lawless"))                   // ed 1 to flawless (prefix delete)
      .toDF("id", "s")
    assert(pairs(df, 3) === Set(
      (1L, 2L, 3), (1L, 3L, 0), (1L, 4L, 1), (3L, 4L, 1),
      (2L, 3L, 3), (2L, 4L, 3), (5L, 6L, 1)))
  }

  test("editDistancePairs: strings shorter than k+1 use the catch-all bucket, still exact") {
    // len <= k strings can't host k+1 non-empty segments
    val df = Seq((1L, "ab"), (2L, "ba"), (3L, "abcd"), (4L, "zzzz"), (5L, "b"))
      .toDF("id", "s")
    val got = pairs(df, 2)
    // naive truth
    val want = (for {
      (i, a) <- Seq((1L, "ab"), (2L, "ba"), (3L, "abcd"), (4L, "zzzz"), (5L, "b"))
      (j, b) <- Seq((1L, "ab"), (2L, "ba"), (3L, "abcd"), (4L, "zzzz"), (5L, "b"))
      if i < j
      d = levDriver(a, b) if d <= 2
    } yield (i, j, d)).toSet
    assert(got === want)
  }

  test("editDistancePairs == naive all-pairs on sf0.001 32-char prefixes (lossless blocking)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id").as("id"), substring(col("text"), 1, 32).as("s"))
    val seg = pairs(docs, 4)
    val naive = Dedup.editDistancePairsNaive(docs, "id", "s", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(seg === naive)
    assert(naive.nonEmpty) // corpus actually exercises the operator
  }

  test("editDistancePairsNaive refuses oversized inputs") {
    val big = spark.range(0, 200).select(col("id"), lit("x").as("s"))
    intercept[IllegalArgumentException] {
      Dedup.editDistancePairsNaive(big, "id", "s", 1, maxRows = 100L)
    }
  }

  /** Driver-side reference Levenshtein for hand-case truth. */
  private def levDriver(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  // ---- scd2Intervals ----

  test("scd2Intervals: consecutive equal values merge; half-open tiling; open interval is current") {
    val M = 60L * 1000000L
    val df = Seq(
      (1L, 10L, "free", 0L),
      (2L, 10L, "free", 5 * M),   // same value -> no new interval
      (3L, 10L, "pro", 10 * M),   // change
      (4L, 10L, "free", 20 * M),  // change back (reopens a free interval)
      (5L, 20L, "pro", 3 * M))    // single-event key -> one open interval
      .toDF("event_id", "user_id", "event_type", "ts_us")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
    val got = Events.scd2Intervals(df, "user_id", "event_type", "ts", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4)))
      .toSet
    assert(got === Set(
      (10L, "free", 0L, 10 * M, 0),
      (10L, "pro", 10 * M, 20 * M, 0),
      (10L, "free", 20 * M, Long.MaxValue, 1),
      (20L, "pro", 3 * M, Long.MaxValue, 1)))
  }

  test("scd2Intervals: per-key intervals tile time with no gaps or overlaps") {
    val iv = Events.scd2Intervals(
      graft.sources.Sources.events(spark, sf0001),
      "user_id", "event_type", "ts", "event_id")
    // every non-current interval's valid_to equals the next valid_from
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("valid_from")
    val bad = iv.withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .filter(col("is_current") === 0 && col("valid_to") =!= col("next_from"))
      .count()
    assert(bad === 0L)
    // exactly one current interval per key
    val multiCurrent = iv.filter(col("is_current") === 1)
      .groupBy("user_id").count().filter(col("count") =!= 1).count()
    assert(multiCurrent === 0L)
  }
}
