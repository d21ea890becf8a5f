package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-10 second wave: exact heavy hitters (sketch-candidates +
  * exact-recount) and the seeded epoch shuffle. */
class Round10bSpec extends SparkSpec {
  import spark.implicits._

  // ---- exactHeavyHitters ----

  /** Zipf-ish corpus: item i repeated ceil(1000/i) times — a heavy head
    * over a long tail. */
  private def zipfItems: DataFrame =
    (1 to 200).flatMap(i => Seq.fill(1000 / i)(s"w$i")).toDF("item")

  private def naiveHitters(df: DataFrame, phi: Double): Set[(String, Long)] = {
    val n = df.count()
    df.groupBy("item").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > lit(n.toDouble * phi))
      .as[(String, Long)].collect().toSet
  }

  test("exactHeavyHitters == naive groupBy-HAVING on a zipf corpus, " +
      "invariant to partitioning and to sketch capacity") {
    val df = zipfItems
    val want = naiveHitters(df, 0.02)
    assert(want.nonEmpty && want.size < 200, s"bad fixture: ${want.size}")
    for (parts <- Seq(2, 32); tracked <- Seq(0, 512)) {
      val got = Stats
        .exactHeavyHitters(df.repartition(parts), col("item"), 0.02, tracked)
        .as[(String, Long)].collect().toSet
      assert(got === want, s"parts=$parts tracked=$tracked")
    }
  }

  test("exactHeavyHitters: nulls ignored, empty input yields empty " +
      "output, undersized sketch refused") {
    val withNulls = Seq(Some("a"), None, Some("a"), Some("b"), None)
      .toDF("item")
    val got = Stats.exactHeavyHitters(withNulls, col("item"), 0.5)
      .as[(String, Long)].collect().toSet
    assert(got === Set(("a", 2L))) // 2 of 3 non-null rows > 0.5
    assert(Stats.exactHeavyHitters(
      Seq.empty[String].toDF("item"), col("item"), 0.1).count() === 0L)
    intercept[IllegalArgumentException] {
      Stats.exactHeavyHitters(withNulls, col("item"), 0.001,
        maxItemsTracked = 100) // 100 * 0.001 < 4: no-false-negative bound broken
    }
  }

  test("exactHeavyHitters plan: the recount join broadcasts the " +
      "candidates — never a sort-merge join or full-vocabulary shuffle") {
    val p = Stats.exactHeavyHitters(zipfItems, col("item"), 0.02)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("exactHeavyHittersByKey == per-group naive groupBy-HAVING; " +
      "groups never bleed into each other") {
    // two groups with DIFFERENT heavy heads: g0 is zipf over w1..w200,
    // g1 is uniform over 5 items (all heavy)
    val df = ((1 to 200).flatMap(i => Seq.fill(1000 / i)(("g0", s"w$i"))) ++
      (0 until 500).map(i => ("g1", s"u${i % 5}"))).toDF("k", "item")
    val want = df.groupBy("k", "item").agg(count(lit(1)).as("cnt"))
      .join(df.groupBy("k").agg(count(lit(1)).as("n")), Seq("k"))
      .filter(col("cnt") > col("n") * 0.02)
      .select("k", "item", "cnt").as[(String, String, Long)].collect().toSet
    val got = Stats
      .exactHeavyHittersByKey(df.repartition(32), col("k"), col("item"), 0.02)
      .as[(String, String, Long)].collect().toSet
    assert(got === want)
    // g1's uniform items are exactly its 5 hitters; none leak into g0
    assert(got.filter(_._1 == "g1").map(_._2) ===
      Set("u0", "u1", "u2", "u3", "u4"))
    assert(got.filter(_._1 == "g0").forall(r => r._2.startsWith("w")))
  }

  test("heavyHittersFromState: merged split states reproduce the " +
      "one-shot exactHeavyHitters answer exactly") {
    import graft.streaming.StreamingOps
    val df = zipfItems.withColumn("i", monotonically_increasing_id())
    val a = df.filter(col("i") % 2 === 0).select("item")
    val b = df.filter(col("i") % 2 === 1).select("item")
    val merged = StreamingOps.mergeTopKStates(
      StreamingOps.topKState(a, Seq.empty, "item", 512),
      StreamingOps.topKState(b, Seq.empty, "item", 512), Seq.empty)
    val incremental = Stats
      .heavyHittersFromState(merged, df.select("item"), col("item"), 0.02, 512)
      .as[(String, Long)].collect().toSet
    val oneShot = Stats
      .exactHeavyHitters(df.select("item"), col("item"), 0.02, 512)
      .as[(String, Long)].collect().toSet
    assert(incremental === oneShot)
    assert(incremental === naiveHitters(df.select("item"), 0.02))
  }

  // ---- empty-corpus edge for the trained language IDs ----

  test("langIdSoftmax and langIdTrained on an empty corpus: empty " +
      "output with the full schema, no crash") {
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang")
    val sm = TextAnalysis.langIdSoftmax(empty, "doc_id", "text", "lang",
      Seq("aa", "bb"), steps = 1, lr = 1.0)
    assert(sm.count() === 0L)
    assert(sm.columns.toSet === Set("id", "p_aa", "p_bb", "lang_pred"))
    val tr = TextAnalysis.langIdTrained(empty, "doc_id", "text", "lang",
      Seq("aa", "bb"), steps = 1, lr = 1.0)
    assert(tr.count() === 0L)
    assert(tr.columns.contains("lang_pred"))
  }

  // ---- char_ngram_features: native == the SQL chain it replaced ----

  test("CharNgramFeaturesExpr: bit-identical to the transform/filter " +
      "SQL chain on ascii, CJK, emoji, short, and empty inputs") {
    graft.functions.GraftFunctions.register(spark)
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs",
      "你好世界你好", // CJK
      "café naïve résumé",
      "😀😁😂 mixed 🎉", // surrogate pairs
      "a", "", "ab", "  spaced   out  ")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t").selectExpr("id", "lower(coalesce(t, '')) as __t")
    val n = 2; val dim = 32
    val both = df.selectExpr("id",
      s"char_ngram_features(__t, $n, $dim) as native",
      s"""transform(sequence(0, ${dim - 1}),
        b -> round(cast(size(filter(
          case when length(__t) < $n then cast(array() as array<bigint>)
          else transform(sequence(1, length(__t) - ${n - 1}),
            i -> cast(conv(substring(md5(cast(substring(__t, i, $n) as binary)),
              1, 15), 16, 10) as bigint) % ${dim}L) end,
          x -> x = b)) as double)
          / greatest(size(case when length(__t) < $n
              then cast(array() as array<bigint>)
              else transform(sequence(1, length(__t) - ${n - 1}),
                i -> cast(conv(substring(md5(cast(substring(__t, i, $n) as binary)),
                  1, 15), 16, 10) as bigint) % ${dim}L) end), 1), 6)) as hof""")
    assert(both.filter(not(col("native") <=> col("hof"))).count() === 0L)
    val nulled = spark.sql(
      s"select char_ngram_features(cast(null as string), $n, $dim) as v")
    assert(nulled.head().isNullAt(0))
  }

  // ---- seededShuffleShards ----

  private def docs100: DataFrame = (1L to 100L).toDF("doc_id")

  test("seededShuffleShards: pure function of (seed, id) — identical at " +
      "2 and 32 partitions; a different seed produces a different order") {
    def run(parts: Int, seed: String): Seq[(Long, Int, Int)] =
      Layout.seededShuffleShards(docs100.repartition(parts), "doc_id", seed, 8)
        .as[(Long, Int, Int)].collect().toSeq.sorted
    val a = run(2, "epoch0")
    assert(a === run(32, "epoch0"))
    assert(a !== run(2, "epoch1"))
  }

  test("seededShuffleShards: every shard in [0, k); positions dense " +
      "1..n_shard within each shard") {
    val out = Layout.seededShuffleShards(docs100, "doc_id", "s", 8)
    assert(out.filter(col("shard") < 0 || col("shard") >= 8).count() === 0L)
    // per shard, positions are exactly 1..count (sum + max pin both)
    val bad = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), max(col("pos")).as("mx"),
        sum(col("pos")).as("sm"))
      .filter(col("mx") =!= col("n") ||
        col("sm") =!= col("n") * (col("n") + 1) / 2)
    assert(bad.count() === 0L)
    assert(out.count() === 100L)
  }

  test("seededShuffleShards plan: the ranking window is shard-" +
      "partitioned — no single-partition global window") {
    val p = Layout.seededShuffleShards(docs100, "doc_id", "s", 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("Window"), p)
    assert(!p.contains("Window [") || !p.contains("partitionBy=[]"), p)
    assert(p.contains("hashpartitioning(shard"), p)
  }
}
