package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-7 wave: scale-safe approx modes for the two exact-aggregate
  * paths the round-6 audit flagged — drift profile cutpoints
  * (`approx_percentile`) and the column profiler's distinct counts
  * (`approx_count_distinct`, contract spec in ValidationSpec). */
class Round7bSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events =
    graft.sources.Sources.events(spark, sf0001)

  test("referenceProfile approxCutpoints: per-bin reference mass within " +
      "one bin mass of the exact profile") {
    val nBins = 16
    val exact = Drift.referenceProfile(events, "value", nBins)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    val approx = Drift.referenceProfile(events, "value", nBins,
        approxCutpoints = true)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(exact.keySet === (0 until nBins).toSet)
    assert(approx.keySet === exact.keySet)
    val total = exact.values.sum.toDouble
    assert(approx.values.sum.toLong === total.toLong) // mass conserved
    (0 until nBins).foreach { b =>
      assert(math.abs(approx(b) - exact(b)) <= total / nBins,
        s"bin $b: approx ${approx(b)} vs exact ${exact(b)} " +
          s"(bin mass ${total / nBins})")
    }
  }

  test("psiKs approxCutpoints: finite scores, zero drift on identical " +
      "samples, same totals as exact") {
    val e = Drift.psiKs(events, events, "value", 8).collect().head
    val a = Drift.psiKs(events, events, "value", 8, approxCutpoints = true)
      .collect().head
    // identical ref/cur bin identically whatever the cutpoints are
    assert(a.getDouble(0) === 0.0 && a.getDouble(1) === 0.0)
    assert(a.getLong(2) === e.getLong(2) && a.getLong(3) === e.getLong(3))
  }

  test("approx profile plan shape matches exact: one scan per side, " +
      "percentile replaced by the sketch aggregate") {
    val plan = Drift.referenceProfile(events, "value", 16,
        approxCutpoints = true)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("approx_percentile") || plan.contains("percentile_approx"),
      plan)
    assert(!plan.toLowerCase.contains("window"), plan)
  }
}
