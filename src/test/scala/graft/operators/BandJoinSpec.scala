package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BandJoinSpec extends SparkSpec {
  import spark.implicits._

  test("selfBandJoin equals naive theta join, including cross-bucket pairs") {
    // width 1.0 -> values 0.9/1.05 sit in DIFFERENT buckets but qualify;
    // 0.9/2.0 sit in adjacent buckets and do NOT qualify
    val df = Seq((1L, "k", 0.9), (2L, "k", 1.05), (3L, "k", 2.0),
      (4L, "k", 2.05), (5L, "other", 1.0), (6L, "k", 7.0))
      .toDF("id", "brand", "v")
    val got = BandJoin.selfBandJoin(df, "id", "v", 1.0, "brand")
      .select("a", "b").as[(Long, Long)].collect().toSet
    val naive = df.as("x").join(df.as("y"),
        $"x.brand" === $"y.brand" && $"x.id" < $"y.id" &&
          abs($"x.v" - $"y.v") <= 1.0)
      .select($"x.id", $"y.id").as[(Long, Long)].collect().toSet
    assert(got === naive)
    assert(got === Set((1L, 2L), (2L, 3L), (2L, 4L), (3L, 4L)))
  }

  test("selfBandJoin emits each qualifying pair exactly once") {
    // same-bucket pairs are generated in both orientations pre-distinct
    val df = Seq((1L, "k", 5.0), (2L, "k", 5.0), (3L, "k", 5.1))
      .toDF("id", "brand", "v")
    val rows = BandJoin.selfBandJoin(df, "id", "v", 1.0, "brand").collect()
    assert(rows.length === 3)
    assert(rows.map(r => (r.getLong(1), r.getLong(2))).distinct.length === 3)
  }
}
