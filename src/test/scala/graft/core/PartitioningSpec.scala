package graft.core

import graft.SparkSpec
import graft.operators.Sampling
import org.apache.spark.sql.functions._

class PartitioningSpec extends SparkSpec {
  import spark.implicits._

  test("saltedSumCount == direct groupBy on a skewed distribution") {
    // 10k rows of one hot key + sparse tail — the case salting exists for
    val rows = (1 to 10000).map(i => ("hot", i.toDouble, i.toLong)) ++
      (1 to 50).map(i => (s"k$i", i.toDouble, 100000L + i))
    val df = rows.toDF("k", "v", "row_id").repartition(8)
    val direct = df.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val salted = Partitioning.saltedSumCount(df, col("k"), col("v"),
      saltCol = col("row_id"), saltBuckets = 16)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted === direct)
  }

  test("HotKeyAwarePartitioner: hot keys isolated, all keys co-located") {
    val data = (1 to 1000).map(i => (if (i % 2 == 0) "hot" else s"k${i % 17}", i))
    val rdd = spark.sparkContext.parallelize(data, 8)
    val parted = Partitioning.partitionByHotKeys(rdd, 5, Seq("hot"))
    assert(parted.getNumPartitions === 5)
    val byPartition = parted.mapPartitionsWithIndex { (pi, it) =>
      Iterator((pi, it.map(_._1).toSet))
    }.collect().toMap
    // hot key alone on its reserved partition
    assert(byPartition(0) === Set("hot"))
    // every key lives in exactly one partition (co-location)
    val keyHomes = byPartition.toSeq.flatMap { case (pi, ks) => ks.map(_ -> pi) }
    assert(keyHomes.size === keyHomes.map(_._1).distinct.size)
    // counts preserved
    assert(parted.count() === 1000L)
  }

  test("saltedJoin == plain equi-join; salt spreads the hot key; no broadcast") {
    // one hot fact key (90% of rows) + tail, dim too "big" to broadcast
    val fact = ((1 to 9000).map(i => (1L, i.toLong)) ++
      (1 to 1000).map(i => ((i % 20 + 2).toLong, 100000L + i)))
      .toDF("fk", "row_id")
    val dim = (1L to 25L).map(k => (k, s"name$k")).toDF("dk", "dname")
    val plain = fact.join(dim, col("fk") === col("dk"))
      .groupBy("dname").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val salted = Partitioning.saltedJoin(fact, dim, "fk", "dk",
        saltFrom = Seq(col("row_id")), saltBuckets = 8)
      val p = salted.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastHashJoin"), p)
      assert(p.contains("__salt"), "join key must include the salt\n" + p)
      val got = salted.groupBy("dname").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === plain)
      // the hot key's rows really land in multiple buckets
      val buckets = fact.filter(col("fk") === 1L)
        .select(pmod(xxhash64(col("row_id")), lit(8)).cast("int"))
        .distinct().count()
      assert(buckets === 8L)
    }
  }

  test("stratified sample: per-stratum rates, default applies to unlisted strata") {
    val df = (1L to 400L).map(i => (i, if (i % 2 == 0) "big" else "other"))
      .toDF("id", "stratum")
    val kept = Sampling.sampleByHashStratified(df, col("id"), col("stratum"),
        Map("big" -> 4), default16 = 16)
      .groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("other") === 200L, "default 16/16 keeps everything")
    // rate 4/16 on a hash is ~a quarter; exact membership is what the
    // oracle checks — here pin it's a strict, deterministic subset
    assert(kept("big") > 0L && kept("big") < 200L)
    val again = Sampling.sampleByHashStratified(df.repartition(7), col("id"),
        col("stratum"), Map("big" -> 4), default16 = 16)
      .agg(org.apache.spark.sql.functions.sum(col("id"))).collect()(0).getLong(0)
    val first = Sampling.sampleByHashStratified(df, col("id"), col("stratum"),
        Map("big" -> 4), default16 = 16)
      .agg(org.apache.spark.sql.functions.sum(col("id"))).collect()(0).getLong(0)
    assert(again === first, "membership must not depend on partitioning")
  }

  test("rebalanceByTokens: smallest keeps all; dominant cut; >256x clamps to 1/256") {
    // A: 32 docs x 100 tokens = 3200; B: 2 x 100 = 200 (the min);
    // C: 600 docs x 100 = 60000, a 300x stratum — would floor to 0
    val df = ((1L to 32L).map(i => (i, "A", 100L)) ++
      Seq((100L, "B", 100L), (101L, "B", 100L)) ++
      (1000L to 1599L).map(i => (i, "C", 100L)))
      .toDF("id", "stratum", "n_tokens")
    val out = Sampling.rebalanceByTokens(df, col("id"), col("stratum"),
      col("n_tokens"))
    val kept = out.groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("B") === 2L, "min stratum computes keep256 = 256 -> all kept")
    // A's rate: floor(256*200/3200) = 16 of 256 buckets
    val aExpected = df.filter(col("stratum") === "A")
      .filter(Sampling.hashBucket256(col("id")) < 16)
      .select("id").collect().map(_.getLong(0)).toSet
    val aIds = out.filter(col("stratum") === "A").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(aIds === aExpected, "A keeps exactly buckets 0..15")
    // C floors to 0 but is clamped to 1 bucket — sampled, never dropped
    val cExpected = df.filter(col("stratum") === "C")
      .filter(Sampling.hashBucket256(col("id")) < 1)
      .select("id").collect().map(_.getLong(0)).toSet
    val cIds = out.filter(col("stratum") === "C").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(cIds === cExpected && cIds.nonEmpty,
      "300x stratum keeps exactly bucket 0, not nothing")
    // null strata are excluded from rates AND output
    val withNull = df.union(Seq((9999L, null: String, 1L))
      .toDF("id", "stratum", "n_tokens"))
    val nullOut = Sampling.rebalanceByTokens(withNull, col("id"),
      col("stratum"), col("n_tokens"))
    assert(nullOut.filter(col("stratum").isNull).count() === 0L)
    assert(nullOut.filter(col("stratum") === "B").count() === 2L,
      "a null group's tiny total must not poison the min")
  }

  test("hash split: deterministic membership, partition-invariant, covers all") {
    val docs = graft.sources.Sources.table(spark, sf0001, "documents")
    def splits(parts: Int) = Sampling.split(docs.repartition(parts),
        col("doc_id"), train16 = 12, valid16 = 2)
      .select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = splits(2)
    assert(a === splits(7), "split membership depends on partitioning")
    assert(a.values.toSet === Set("train", "valid", "test"))
    // sample == the train+valid+test decomposition's prefix buckets
    val sampled = Sampling.sampleByHash(docs, col("doc_id"), keep16 = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sampled.nonEmpty && sampled.size < a.size)
  }
}
