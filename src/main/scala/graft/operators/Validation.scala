package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — the "check the table before
  * training on it" gate (the public shape is AWS Deequ / Great
  * Expectations): a battery of constraints evaluated in ONE aggregation
  * pass over the table, emitting one row per constraint with the
  * measured metric and a pass flag.
  *
  * Scale shape: every constraint compiles to an aggregate expression
  * (conditional violation counts, row counts, distinct counts), so N
  * constraints cost one scan with map-side combine — not N scans.
  * Exact `unique` needs a distinct aggregate (the one genuinely
  * shuffle-bearing metric); swap in approx_count_distinct when a
  * sketch-grade answer is acceptable at 100 TB.
  *
  * Results are integers — fully oracle-comparable, no floats.
  */
object Validation {

  /** One constraint: a name, a metric AGGREGATE, and a predicate over
    * the aggregated metric value. */
  final case class Check(name: String, metric: Column, pass: Column => Column)

  /** count of rows violating `pred` (0 == clean; empty table is clean). */
  def noViolations(name: String, pred: Column): Check =
    Check(name,
      coalesce(sum(when(pred, lit(0L)).otherwise(lit(1L))), lit(0L)),
      m => m === 0L)

  def notNull(c: String): Check =
    noViolations(s"not_null($c)", col(c).isNotNull)

  def inRange(c: String, lo: Double, hi: Double): Check =
    noViolations(s"in_range($c)",
      col(c).isNotNull && col(c) >= lo && col(c) <= hi)

  def accepted(c: String, values: Seq[String]): Check =
    noViolations(s"accepted($c)", col(c).isin(values.map(lit): _*))

  def nonEmpty(): Check =
    Check("non_empty", count(lit(1)), m => m > 0L)

  /** duplicate-key count: rows − distinct keys (0 == unique). */
  def unique(c: String): Check =
    Check(s"unique($c)", count(lit(1)) - countDistinct(col(c)), m => m === 0L)

  /** Evaluate all checks in one aggregation pass; one output row per
    * check: (constraint, metric, passed 0/1). */
  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      c.metric.cast("long").as(s"__m_$i")
    }
    val rows = checks.zipWithIndex.map { case (c, i) =>
      val m = col(s"__m_$i")
      struct(lit(c.name).as("constraint"), m.as("metric"),
        c.pass(m).cast("int").as("passed"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rows: _*)).as("r"))
      .select(col("r.constraint").as("constraint"),
        col("r.metric").as("metric"), col("r.passed").as("passed"))
  }

  /** One-pass column profiler — the "describe the table" audit every
    * ingest runs before anything trains on it: per column, row/null/
    * distinct counts plus min/max (numeric columns natively, string
    * columns lexicographically; each family in its own typed column so
    * no cross-engine float formatting ever round-trips through text).
    * All columns profile in ONE aggregation.
    *
    * Distinct counts default to `approx_count_distinct` (HLL++,
    * rsd = 1%): profiling is exactly the use case where ±2% on a
    * distinct count changes nothing, and the approx form keeps the
    * whole profile a single map-side-combinable scan with O(16 KB)
    * state per column. `exactDistinct = true` switches to exact
    * `countDistinct` — Spark then plans ONE Expand over all distinct
    * columns (rows × |distinct cols + 1| intermediate, a full distinct
    * shuffle per high-cardinality column): affordable on a bounded
    * sample, measured 7× slower than approx on sf0.1 lineitem, and the
    * wrong default at 100 TB. The contract between the two is pinned
    * by `q_profile_lineitem`'s `distinct_within_5pct` column (rsd 1% →
    * 5% is 5σ).
    *
    * Task-binary footprint: HLL++ at rsd 0.01 carries a ~2^14-register
    * aggregation buffer PER PROFILED COLUMN in the partial-aggregate
    * stage's serialized plan — ~2.4 MiB at 4 columns (the bench tail's
    * "large task binary" warning; BASELINE.md round-14 note). That is
    * a constant of (columns × registers(rsd)), broadcast once per
    * stage, never per task or per row — but profiling very wide
    * column lists in ONE call, or tightening rsd (halving it ≈ 4× the
    * registers), grows it linearly/quadratically; chunk the column
    * list across calls if the driver warns. */
  def profile(df0: DataFrame, cols: Seq[String],
      exactDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    // NO read-side fan-out here, by measurement: profiling is ONE
    // map-side-combined aggregation pass, and at bench scale the
    // fan-out exchange costs more than 32-way HLL++ updates save —
    // even projected to the profiled columns first, the round-robin
    // repartition's local sort + shuffle of 600k rows measured
    // q_profile_lineitem at 4.2s (full-width: 6.1s) vs 2.7s baseline
    // in a healthy window, while at production input sizes the guard
    // makes fanOut a no-op anyway — so the branch could only ever
    // slow the measured case. Contrast the fanned-out families
    // (codecs, FFT, explodes): their per-row CPU is orders of
    // magnitude heavier than an HLL register update.
    val df = df0.select(cols.distinct.map(col): _*)
    val numeric: Set[String] = df.schema.fields
      .filter(f => f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
      .map(_.name).toSet
    val aggs = cols.flatMap { c =>
      val d = if (exactDistinct) countDistinct(col(c))
        else approx_count_distinct(col(c), 0.01)
      Seq(
        count(lit(1)).as(s"__n_$c"),
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
          .as(s"__null_$c"),
        d.as(s"__d_$c"),
        (if (numeric(c)) min(col(c)).cast("double") else lit(null).cast("double"))
          .as(s"__minn_$c"),
        (if (numeric(c)) max(col(c)).cast("double") else lit(null).cast("double"))
          .as(s"__maxn_$c"),
        (if (numeric(c)) lit(null).cast("string") else min(col(c)).cast("string"))
          .as(s"__mins_$c"),
        (if (numeric(c)) lit(null).cast("string") else max(col(c)).cast("string"))
          .as(s"__maxs_$c"))
    }
    val rows = cols.map { c =>
      struct(lit(c).as("column"), col(s"__n_$c").as("n_rows"),
        col(s"__null_$c").as("n_null"), col(s"__d_$c").as("n_distinct"),
        col(s"__minn_$c").as("min_num"), col(s"__maxn_$c").as("max_num"),
        col(s"__mins_$c").as("min_str"), col(s"__maxs_$c").as("max_str"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rows: _*)).as("r"))
      .select(col("r.column").as("column"), col("r.n_rows").as("n_rows"),
        col("r.n_null").as("n_null"), col("r.n_distinct").as("n_distinct"),
        col("r.min_num").as("min_num"), col("r.max_num").as("max_num"),
        col("r.min_str").as("min_str"), col("r.max_str").as("max_str"))
  }

  /** Piggyback the [[validate]] metrics onto an EXISTING job instead of
    * paying a separate scan: `df.observe` evaluates the same aggregate
    * expressions inside whatever action next materializes `df` (a
    * write, a downstream aggregation), and the returned
    * `Observation` yields the metrics afterwards. At 100 TB this is
    * the difference between "validate then write" (two scans) and
    * "validate WHILE writing" (one). Constraint names become metric
    * keys; read them as `obs.get(name)` after the action completes.
    * Restriction inherited from `observe`: no distinct aggregates —
    * [[unique]] checks stay in the scan-bearing [[validate]] path. */
  def observedValidate(df: DataFrame, checks: Seq[Check])
      : (DataFrame, org.apache.spark.sql.Observation) = {
    require(checks.nonEmpty, "need at least one check")
    val obs = org.apache.spark.sql.Observation()
    val aggs = checks.map(c => c.metric.cast("long").as(c.name))
    (df.observe(obs, aggs.head, aggs.tail: _*), obs)
  }
}
