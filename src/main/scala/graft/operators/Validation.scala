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
}
