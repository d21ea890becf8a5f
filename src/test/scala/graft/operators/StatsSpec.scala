package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("histogram: equi-width buckets, max lands in last bucket") {
    val df = (0 to 100).map(_.toDouble).toDF("v")
    val got = Stats.histogram(df, "v", 10)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    // [0,100] in 10 buckets of width 10; 0..9 -> b0 ... 90..99 -> b9, 100 clamps to b9
    assert(got === (0 until 9).map(b => b -> 10L).toMap + (9 -> 11L))
  }

  test("histogram: single bucket swallows everything") {
    val df = Seq(1.0, 2.0, 3.0).toDF("v")
    val got = Stats.histogram(df, "v", 1).collect()
    assert(got.map(r => (r.getInt(0), r.getLong(1))).toSeq === Seq((0, 3L)))
  }

  test("winsorizedStats: clamping changes mean only when outliers present") {
    // group a: one huge outlier; group b: uniform
    val df = (Seq.tabulate(99)(i => ("a", i.toDouble + 1)) :+ ("a", 1e9)) ++
      Seq.tabulate(10)(i => ("b", 5.0))
    val got = Stats.winsorizedStats(df.toDF("g", "v"), "g", "v", 0.05, 0.95)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // group a's mean without clamping would be ~1e7; winsorized must be < 100
    assert(got("a") < 100.0)
    assert(got("b") === 5.0)
  }

  test("madOutliers: flags the planted outlier, not the bulk") {
    val df = (Seq.tabulate(20)(i => ("g", 100.0 + (i % 5))) :+ ("g", 1000.0))
      .toDF("g", "v")
    val got = Stats.madOutliers(df, "g", "v", 3.0).collect()
    assert(got.map(_.getDouble(1)).toSeq === Seq(1000.0))
    assert(got.head.getDouble(2) > 3.0) // n_mads well past the threshold
  }

  test("tableChecksum: invariant to partitioning/order, sensitive to content") {
    val df = (1L to 1000L).map(i => (i, s"v$i")).toDF("k", "v")
    def sum(d: org.apache.spark.sql.DataFrame) =
      Stats.tableChecksum(d, Seq("k", "v")).collect().head
    val base = sum(df)
    assert(base.getLong(0) === 1000L)
    assert(sum(df.repartition(17)) === base)
    assert(sum(df.orderBy(desc("v"))) === base)
    val tweaked = sum(df.withColumn("v",
      when(col("k") === 500L, "changed").otherwise(col("v"))))
    assert(tweaked.getLong(1) !== base.getLong(1))
  }

  test("madOutliers: zero-MAD groups are skipped entirely") {
    // >half identical values -> MAD = 0; nothing can be flagged
    val df = (Seq.fill(10)(("g", 7.0)) :+ ("g", 99.0)).toDF("g", "v")
    assert(Stats.madOutliers(df, "g", "v", 3.0).count() === 0L)
  }

  test("winsorizedStats: sketch mode tracks the exact form") {
    // the production (bounded-state) percentile path must agree with
    // the exact oracle-parity path to well under the clamp's own width
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
    def collect(acc: Option[Int]) =
      Stats.winsorizedStats(li, "l_returnflag", "l_extendedprice",
          0.05, 0.95, sketchAccuracy = acc)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = collect(None)
    val approx = collect(Some(10000))
    assert(exact.keySet === approx.keySet)
    exact.foreach { case (g, e) =>
      assert(math.abs(approx(g) - e) / math.abs(e) < 0.01,
        s"group $g: exact=$e approx=${approx(g)}")
    }
  }
}
