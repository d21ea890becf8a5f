package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface: the same event-time operators as
  * graft.operators.Events, run incrementally.
  *
  * The reference is strictly batch — one finite run per server lifetime
  * (`server.py:95`, state machine ends at COLLECT `server.py:260-263`) —
  * so this is extension surface. Batch/streaming share semantics by
  * construction: `window`/`session_window` are the same Catalyst
  * operators in both modes, which StreamingSpec verifies by comparing a
  * streamed result against the batch operator on the same data.
  */
object StreamingOps {

  /** Raw schema of the events parquet (ts is TIMESTAMP(NANOS), which
    * Spark reads as long under nanosAsLong). */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over an events parquet path (the events.parquet
    * dir itself, NOT the sf dir — a file source globs every file under
    * its path, and sibling tables would surface as all-null rows), ts
    * truncated to micros exactly like the batch reader (Sources.events). */
  def eventsStream(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(eventsRawSchema)
      .format("parquet")
      .load(path)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Watermarked tumbling-window counts — the streaming twin of
    * Events.tumblingAgg. With watermarking, state for windows older
    * than the watermark is dropped, so state size is bounded by
    * (watermark horizon / width) × |event types| regardless of stream
    * length — the property that matters on an unbounded 100 TB/day
    * stream. */
  def windowedCounts(events: DataFrame, width: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(unix_micros(col("w.start")).as("window_start_us"),
        col("event_type"), col("n"), col("sum_value"))

  /** Streaming gap sessionization — session_window under watermark,
    * same strict-gap semantics as the batch operator. */
  def sessionCounts(events: DataFrame, gap: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("user_id"), unix_micros(col("sw.start")).as("session_start_us"),
        col("n_events"), col("sum_value"))

  /** Streaming exact dedup: drop repeated event_ids, keeping state only
    * within the watermark horizon — the unbounded-stream form of
    * graft.operators.Dedup.exact (state is bounded; an id recurring
    * after the horizon would re-emit, the standard at-scale tradeoff). */
  def dedupEvents(events: DataFrame, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  case class UserEvent(user_id: Long, value: Double)
  case class UserTotals(user_id: Long, n_events: Long, sum_value: Double)

  /** Custom keyed state via mapGroupsWithState: running per-user totals,
    * updated per micro-batch. The state object is O(1) per user — the
    * shape any bespoke sessionizer/attributor takes when windowed
    * operators can't express it. */
  def runningUserTotals(events: DataFrame): Dataset[UserTotals] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("value")).as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserTotals, UserTotals](GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[UserEvent], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(user, 0L, 0.0))
          var n = prev.n_events
          var s = prev.sum_value
          rows.foreach { e => n += 1; s += e.value }
          val next = UserTotals(user, n, math.round(s * 10000.0) / 10000.0)
          state.update(next)
          next
      }
  }
}
