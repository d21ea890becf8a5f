package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("interleave: hand-checked Morton codes") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L))
      .toDF("a", "b")
      .select(Layout.interleave(col("a"), col("b"), 4).as("z"))
    // (3,5): a=0011 even bits -> 0b0101 = 5; b=0101 odd bits -> 0b100010 = 34; z=39
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L, 3L, 39L))
  }

  test("withZCode: rank scaling is exact integer division (bounds inclusive)") {
    val df = Seq((0L, 10L, 100L), (1L, 20L, 200L), (2L, 30L, 300L))
      .toDF("id", "a", "b")
    val z = Layout.withZCode(df, col("a"), col("b"), bits = 2)
      .select("id", "z").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // ranks: a -> 0, (10*3) div 20 = 1, 3; b same; interleave(r, r) for
    // r=0,1,3 -> 0, 3, 15
    assert(z === Map(0L -> 0L, 1L -> 3L, 2L -> 15L))
  }

  test("z-order files have ~rectangular stats: both-key span area collapses vs linear sort") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
      .select("l_partkey", "l_suppkey", "l_quantity")
    val dir = Files.createTempDirectory("zorder").toString

    Layout.writeZOrdered(li, s"$dir/z", col("l_partkey"), col("l_suppkey"),
      nFiles = 16)
    li.repartitionByRange(16, col("l_partkey"))
      .sortWithinPartitions(col("l_partkey"))
      .write.mode("overwrite").parquet(s"$dir/linear")

    // per-file (min,max) stats on both keys — what parquet footer
    // pruning sees
    def fileStats(path: String): Array[(Long, Long, Long, Long)] =
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("l_partkey").as("p0"), max("l_partkey").as("p1"),
          min("l_suppkey").as("s0"), max("l_suppkey").as("s1"))
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    val zStats = fileStats(s"$dir/z")
    val linStats = fileStats(s"$dir/linear")
    assert(zStats.length === 16 && linStats.length === 16)

    // a SUPPKEY-only range predicate (the second key): a linear
    // partkey sort cannot skip ANY file; z-order skips most — this is
    // the whole point of the layout
    val (sLo, sHi) = {
      val r = li.agg(min("l_suppkey"), max("l_suppkey")).head
      val (a, b) = (r.getLong(0), r.getLong(1))
      (a, a + (b - a) / 8) // lowest eighth of the suppkey range
    }
    def overlapping(stats: Array[(Long, Long, Long, Long)]) =
      stats.count { case (_, _, s0, s1) => s0 <= sHi && s1 >= sLo }
    val zHit = overlapping(zStats)
    val linHit = overlapping(linStats)
    assert(linHit === 16, s"linear layout should overlap all files, got $linHit")
    assert(zHit <= 8, s"z-order should skip at least half the files, hit $zHit/16")
    // and z-order must bound the SUPPKEY span too (linear doesn't):
    val zMaxSupp = spark.read.parquet(s"$dir/z")
      .groupBy(input_file_name())
      .agg((max("l_suppkey") - min("l_suppkey")).as("sa"))
      .agg(max("sa")).head.getLong(0)
    val linMaxSupp = spark.read.parquet(s"$dir/linear")
      .groupBy(input_file_name())
      .agg((max("l_suppkey") - min("l_suppkey")).as("sa"))
      .agg(max("sa")).head.getLong(0)
    assert(zMaxSupp < linMaxSupp,
      s"z files must be narrower on the second key: $zMaxSupp vs $linMaxSupp")
  }
}
