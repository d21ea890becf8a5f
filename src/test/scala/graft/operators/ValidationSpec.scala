package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ValidationSpec extends SparkSpec {
  import spark.implicits._

  private def run(df: org.apache.spark.sql.DataFrame,
      checks: Seq[Validation.Check]): Map[String, (Long, Int)] =
    Validation.validate(df, checks).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2)))).toMap

  test("constraint battery: violations counted, pass flags correct") {
    val df = Seq(
      (1L, Some(10.0), "A"),
      (2L, Some(200.0), "B"),  // out of range, bad flag
      (3L, None, "A"),         // null value
      (3L, Some(5.0), "A"))    // duplicate id
      .toDF("id", "v", "flag")
    val got = run(df, Seq(
      Validation.nonEmpty(),
      Validation.notNull("v"),
      Validation.inRange("v", 0.0, 100.0),
      Validation.accepted("flag", Seq("A")),
      Validation.unique("id")))
    assert(got("non_empty") === ((4L, 1)))
    assert(got("not_null(v)") === ((1L, 0)))
    assert(got("in_range(v)") === ((2L, 0)))  // null AND out-of-range both violate
    assert(got("accepted(flag)") === ((1L, 0)))
    assert(got("unique(id)") === ((1L, 0)))
  }

  test("clean table passes everything; empty table fails only non_empty") {
    val clean = Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v")
    val g1 = run(clean, Seq(Validation.nonEmpty(), Validation.notNull("v"),
      Validation.unique("id")))
    assert(g1.values.forall(_._2 == 1))
    val empty = clean.filter(lit(false))
    val g2 = run(empty, Seq(Validation.nonEmpty(), Validation.notNull("v"),
      Validation.unique("id")))
    assert(g2("non_empty") === ((0L, 0)))
    assert(g2("not_null(v)") === ((0L, 1)))
    assert(g2("unique(id)") === ((0L, 1)))
  }

  test("one scan: the battery plans a single aggregate over the table (plus distinct)") {
    val df = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val p = Validation.validate(df, Seq(Validation.nonEmpty(),
      Validation.notNull("l_orderkey"),
      Validation.inRange("l_quantity", 1.0, 50.0)))
      .queryExecution.executedPlan.toString
    assert(p.linesIterator.count(_.contains("FileScan")) === 1, p)
  }

  test("profile: numeric and string columns, nulls and distincts exact") {
    val df = Seq((1L, Option(2.0), Option("b")), (2L, None, Option("a")),
      (3L, Option(5.0), None), (3L, Option(5.0), Option("a")))
      .toDF("id", "v", "s")
    val got = Validation.profile(df, Seq("id", "v", "s"), exactDistinct = true)
      .collect().map(r => r.getString(0) -> r).toMap
    val id = got("id")
    assert(id.getLong(1) === 4L && id.getLong(2) === 0L && id.getLong(3) === 3L)
    assert(id.getDouble(4) === 1.0 && id.getDouble(5) === 3.0)
    assert(id.isNullAt(6) && id.isNullAt(7))
    val v = got("v")
    assert(v.getLong(2) === 1L && v.getLong(3) === 2L)
    assert(v.getDouble(4) === 2.0 && v.getDouble(5) === 5.0)
    val s = got("s")
    assert(s.getLong(2) === 1L && s.getLong(3) === 2L)
    assert(s.isNullAt(4) && s.isNullAt(5))
    assert(s.getString(6) === "a" && s.getString(7) === "b")
  }

  test("profile: one scan for the whole battery") {
    val df = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val p = Validation.profile(df, Seq("l_orderkey", "l_returnflag"))
      .queryExecution.executedPlan.toString
    assert(p.linesIterator.count(_.contains("FileScan")) === 1, p)
  }

  test("profile default (approx distinct): no Expand in the plan, " +
      "counts within 5% of exact") {
    val df = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val cols = Seq("l_orderkey", "l_quantity", "l_returnflag")
    // the scale contract: the default profile never Expand-multiplies
    // rows (exactDistinct=true plans one Expand per table scan)
    val approxPlan = Validation.profile(df, cols)
      .queryExecution.executedPlan.toString
    assert(!approxPlan.contains("Expand"), approxPlan)
    val exactPlan = Validation.profile(df, cols, exactDistinct = true)
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"), exactPlan)
    // the accuracy contract: rsd 1% sketch within 5% (5 sigma) of exact
    def distincts(exact: Boolean) =
      Validation.profile(df, cols, exactDistinct = exact).collect()
        .map(r => r.getString(0) -> r.getLong(3)).toMap
    val a = distincts(false)
    val e = distincts(true)
    cols.foreach { c =>
      assert(math.abs(a(c) - e(c)) <= 0.05 * e(c),
        s"$c: approx ${a(c)} vs exact ${e(c)}")
    }
  }

  test("observedValidate: metrics ride the main action, values match validate") {
    val df = Seq((1L, 10.0), (2L, -3.0), (3L, 7.0)).toDF("id", "v")
    val checks = Seq(Validation.nonEmpty(),
      Validation.inRange("v", 0.0, 100.0))
    val (observed, obs) = Validation.observedValidate(df, checks)
    // ONE action materializes data AND metrics — no second scan
    val n = observed.count()
    assert(n === 3L)
    val m = obs.get
    assert(m("non_empty") === 3L)
    assert(m("in_range(v)") === 1L) // one violation
  }
}
