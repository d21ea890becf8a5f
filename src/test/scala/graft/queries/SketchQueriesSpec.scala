package graft.queries

import graft.SparkSpec

/** Accuracy bounds for the sketch-backed queries (rows-only at the
  * driver's oracle gate, so their numeric quality is pinned here). */
class SketchQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("hll day→week sketch union within 5% of exact (tighter than the query's 10% gate)") {
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Sources.events(spark, sf001)
      .select(date_trunc("week", col("ts")).cast("date").as("week"),
        to_date(col("ts")).as("day"), col("user_id"))
    val daily = ev.groupBy(col("week"), col("day"))
      .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
    val weekly = daily.groupBy(col("week"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_users"))
    val exact = ev.groupBy(col("week"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    val rows = weekly.join(exact, Seq("week"))
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

  test("q_hll_reaggregate: the in-query error contract holds") {
    val rows = graft.SparkEntry.queries("q_hll_reaggregate")(spark, sf001)
      .select($"est_within_10pct").as[Boolean].collect()
    assert(rows.nonEmpty && rows.forall(identity))
  }

  test("q_hll_reaggregate is deterministic across runs") {
    val a = graft.SparkEntry.queries("q_hll_reaggregate")(spark, sf0001)
      .orderBy($"week").collect().toSeq
    val b = graft.SparkEntry.queries("q_hll_reaggregate")(spark, sf0001)
      .orderBy($"week").collect().toSeq
    assert(a === b)
  }
}
