package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  test("semiJoin equals exact left-semi join (false positives removed)") {
    val fact = (1L to 2000L).map(i => (i, i % 100)).toDF("k", "payload")
    val dim = Seq(5L, 10L, 9999L).toDF("dk") // 9999 matches nothing
    val got = BloomPrune.semiJoin(fact, "k", dim, "dk",
      expectedItems = 10L, numBits = 64L) // tiny filter -> forces false positives
      .select("k").as[Long].collect().toSet
    assert(got === Set(5L, 10L))
  }

  test("bloom filter never false-negatives: every dim key passes the sketch") {
    val dim = (1L to 500L).toDF("dk")
    val bf = BloomPrune.keyFilter(dim, "dk", 500L, 4096L)
    graft.functions.GraftFunctions.register(spark)
    val passed = dim
      .filter(call_function("bloom_contains", lit(bf), xxhash64(col("dk"))))
      .count()
    assert(passed === 500L)
  }

  test("mixed key types: INT dim against BIGINT fact still matches (xxhash64 is type-sensitive)") {
    val fact = (1L to 100L).toDF("k") // bigint
    val dim = Seq(5, 10).toDF("dk")   // int
    val got = BloomPrune.semiJoin(fact, "k", dim, "dk")
      .as[Long].collect().toSet
    assert(got === Set(5L, 10L))
  }

  test("empty dim side yields empty result") {
    val fact = (1L to 10L).toDF("k")
    val dim = Seq.empty[Long].toDF("dk")
    assert(BloomPrune.semiJoin(fact, "k", dim, "dk").count() === 0L)
  }
}
