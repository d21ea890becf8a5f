package graft.queries

import graft.SparkSpec

/** Accuracy bounds for the sketch-backed queries (rows-only at the
  * driver's oracle gate, so their numeric quality is pinned here). */
class SketchQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("q_hll_reaggregate: day→month sketch union within 5% of exact") {
    val rows = graft.SparkEntry.queries("q_hll_reaggregate")(spark, sf001)
      .select($"est_users".cast("double"), $"exact_users".cast("double"))
      .as[(Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (est, exact) =>
      assert(exact > 0.0)
      val relErr = math.abs(est - exact) / exact
      // lgConfigK=14 → RSE ≈ 0.8%; 5% is a generous stability bound
      assert(relErr < 0.05, s"est=$est exact=$exact relErr=$relErr")
    }
  }

  test("q_hll_reaggregate is deterministic across runs") {
    val a = graft.SparkEntry.queries("q_hll_reaggregate")(spark, sf0001)
      .orderBy($"week").collect().toSeq
    val b = graft.SparkEntry.queries("q_hll_reaggregate")(spark, sf0001)
      .orderBy($"week").collect().toSeq
    assert(a === b)
  }
}
