package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def mkEvents(rows: (Long, Long, String, Long)*) = // id, user, type, ts_us
    rows.toDF("event_id", "user_id", "event_type", "ts_us")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withColumn("value", lit(1.0))
      .drop("ts_us")

  test("asofPrior: inclusive backward match, latest right wins") {
    val M = 60L * 1000000L
    val df = mkEvents(
      (1L, 1L, "view", 0L),
      (2L, 1L, "view", 10 * M),
      (3L, 1L, "purchase", 10 * M), // equal ts -> inclusive match to id 2
      (4L, 1L, "purchase", 25 * M), // latest prior view is id 2
      (5L, 2L, "purchase", 5 * M),  // no prior view for user 2 -> dropped
      (6L, 2L, "view", 6 * M))
    val got = Events.asofPrior(df,
      col("event_type") === "purchase", col("event_type") === "view")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSet
    assert(got === Set((3L, 2L, 0L), (4L, 2L, 15 * M)))
  }

  test("sessionize: >30-minute gap splits; exact-boundary gap stays in-session") {
    val M = 60L * 1000000L
    val df = mkEvents(
      (1L, 1L, "click", 0L),
      (2L, 1L, "click", 29 * M),          // same session (< 30 min)
      (3L, 1L, "click", 29 * M + 30 * M), // exactly 30 min -> SAME session
      (4L, 1L, "click", 120 * M),         // 61 min gap -> new session
      (5L, 2L, "click", 0L))
    val got = Events.sessionize(df, "30 minutes")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start_us"),
        r.getAs[Long]("n_events")))
      .toSet
    assert(got === Set((1L, 0L, 3L), (1L, 120 * M, 1L), (2L, 0L, 1L)))
  }

  test("transitions: ordered per user with event_id tiebreak") {
    val df = mkEvents(
      (1L, 1L, "a", 0L), (2L, 1L, "b", 1L), (3L, 1L, "a", 2L),
      (4L, 2L, "b", 0L), (5L, 2L, "a", 1L))
    val got = Events.transitions(df)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got === Map(("a", "b") -> 1L, ("b", "a") -> 2L))
  }

  test("funnel: strict order required, stages narrow monotonically") {
    val M = 60L * 1000000L
    val df = mkEvents(
      // user 1: full ordered funnel
      (1L, 1L, "view", 0L), (2L, 1L, "click", 1 * M), (3L, 1L, "purchase", 2 * M),
      // user 2: click BEFORE first view -> stops at view stage
      (4L, 2L, "click", 0L), (5L, 2L, "view", 1 * M),
      // user 3: view then click, no purchase
      (6L, 3L, "view", 0L), (7L, 3L, "click", 5 * M),
      // user 4: purchase only -> reaches nothing (no view)
      (8L, 4L, "purchase", 0L))
    val got = Events.funnel(df, Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(got === Map("view" -> 3L, "click" -> 2L, "purchase" -> 1L))
  }

  test("cohortRetention: offsets computed from week starts, one count per user-week") {
    val W = 7L * 24 * 3600 * 1000000L
    // user 1 first seen week 0, active weeks 0 and 2 (twice — counted once)
    // user 2 first seen week 1, active week 1 only
    val df = mkEvents(
      (1L, 1L, "view", 0L), (2L, 1L, "view", 2 * W), (3L, 1L, "click", 2 * W + 1000L),
      (4L, 2L, "view", 1 * W))
    val got = Events.cohortRetention(df)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    // epoch 0 is Thu 1970-01-01; its week start is Mon 1969-12-29
    assert(got === Map(
      ("1969-12-29", 0) -> 1L, ("1969-12-29", 2) -> 1L,
      ("1970-01-05", 0) -> 1L))
  }

  test("decayedSum: weights halve per half-life from the newest event") {
    import org.apache.spark.sql.functions._
    // user 1: value 8 at t_max, value 8 one half-life earlier -> 8 + 4
    // user 2: value 2 two half-lives before t_max -> 0.5
    val hlUs = 3600L * 1000000L // 1 hour in micros
    val df = Seq(
      (1L, 2L * hlUs, 8.0), (1L, 1L * hlUs, 8.0), (2L, 0L, 2.0))
      .toDF("user_id", "us", "value")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"), col("value"))
    val got = Events.decayedSum(df, col("user_id"), col("ts"), col("value"),
        halfLifeHours = 1.0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got === Map(1L -> (2L, 12.0), 2L -> (1L, 0.5)))
  }

  test("decayedSum: float-sum tolerance contract — partitioning perturbs the " +
      "sum far inside the 6-decimal oracle rounding at test scale") {
    import org.apache.spark.sql.functions.col
    // The operator's scaladoc documents that the 6-decimal hash compare
    // relies on cross-engine summation-order agreement only up to ~1 ulp
    // per term, and that this gets fuzzier as group sizes grow with sf
    // (a near-boundary 7th decimal can flip). This pins the claim at
    // test scale: two radically different partitionings (1 partition vs
    // 7 hashed on an unrelated key => different intra-group add orders)
    // agree within 1e-9 relative — orders of magnitude inside the
    // rounding. If this ever fails at a larger sf, the documented fix
    // is an epsilon compare or a per-group sorted sum, not a tighter
    // rounding.
    val ev = graft.sources.Sources.events(spark, sf001)
    def run(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      Events.decayedSum(df, col("user_id"), col("ts"), col("value"),
          halfLifeHours = 24.0)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val a = run(ev.repartition(1))
    val b = run(ev.repartition(7, col("event_type")))
    assert(a.keySet === b.keySet)
    a.foreach { case (k, va) =>
      val vb = b(k)
      assert(math.abs(va - vb) <= 1e-9 * math.max(1.0, math.abs(va)),
        s"user $k: $va vs $vb diverge beyond the documented tolerance")
    }
  }

  test("gapFillDaily: daily agg is partial+final, spine join broadcasts") {
    import org.apache.spark.sql.functions.col
    val ord = spark.read.parquet(s"$sf0001/orders.parquet")
    val plan = Events.gapFillDaily(ord, col("o_orderdate"), col("o_totalprice"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum"), s"daily agg must map-side combine:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"spine join must broadcast:\n$plan")
  }

  test("gapFillDaily: missing days appear as zero rows flagged is_gap") {
    import org.apache.spark.sql.functions._
    // days 1, 1, 4 present -> spine 1..4, gaps at 2 and 3
    val df = Seq(
      ("2024-03-01 10:00:00", 5.0), ("2024-03-01 12:00:00", 7.0),
      ("2024-03-04 01:00:00", 2.0))
      .toDF("ts", "v").select(col("ts").cast("timestamp").as("ts"), col("v"))
    val got = Events.gapFillDaily(df, col("ts"), col("v"))
      .orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getDouble(1), r.getInt(2))).toList
    assert(got === List(
      ("2024-03-01", 12.0, 0), ("2024-03-02", 0.0, 1),
      ("2024-03-03", 0.0, 1), ("2024-03-04", 2.0, 0)))
  }
}
