package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-3 additions to TextAnalysis (charEntropy) and Events
  * (cumulativeUsers, activityStreaks). */
class StatsTextEventsSpec extends SparkSpec {
  import spark.implicits._

  test("charEntropy: uniform chars -> log2(alphabet); constant -> 0; empty -> 0") {
    val got = Seq("abcd", "aaaa", "", "ab").toDF("text")
      .select(col("text"), round(TextAnalysis.charEntropy(col("text")), 9).as("h"))
      .as[(String, Double)].collect().toMap
    assert(got === Map("abcd" -> 2.0, "aaaa" -> 0.0, "" -> 0.0, "ab" -> 1.0))
  }

  test("charEntropy: skewed distribution matches hand-computed value") {
    // "aab": p(a)=2/3, p(b)=1/3 -> H = 2/3*log2(3/2) + 1/3*log2(3)
    val expected = 2.0 / 3 * (math.log(1.5) / math.log(2)) +
      1.0 / 3 * (math.log(3.0) / math.log(2))
    val got = Seq("aab").toDF("text")
      .select(TextAnalysis.charEntropy(col("text"))).as[Double].head()
    assert(math.abs(got - expected) < 1e-12)
  }

  test("compressionRatio: boilerplate compresses far below prose; empty = 1.0") {
    val docs = Seq(
      (1L, "the " * 500),                                   // pure repetition
      (2L, (1 to 200).map(i => s"w${i * 7919 % 1000}x$i").mkString(" ")), // high-entropy
      (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.compressionRatio(docs, "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    assert(got(1L) < 0.05)
    assert(got(2L) > 0.3)
    assert(got(3L) === 1.0)
    // deterministic: a second run scores identically
    val again = TextAnalysis.compressionRatio(docs, "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    assert(again === got)
  }

  private def ev(rows: (Long, Long, String)*) = // user, day-offset, type
    rows.zipWithIndex.map { case ((u, d, t), i) => (i.toLong, u, t, d) }
      .toDF("event_id", "user_id", "event_type", "d")
      .withColumn("ts", timestamp_seconds(col("d") * 86400L + 3600L))
      .withColumn("value", lit(1.0)).drop("d")

  test("cumulativeUsers: users count once, on their first day") {
    val df = ev((1L, 0L, "a"), (1L, 0L, "b"), (1L, 2L, "a"), // user 1: day 0
      (2L, 1L, "a"), (2L, 2L, "a"),                          // user 2: day 1
      (3L, 2L, "a"))                                         // user 3: day 2
    val got = Events.cumulativeUsers(df)
      .orderBy("day")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 1L), (1L, 2L), (1L, 3L)))
  }

  test("weightedSampleByHash: weight 0 never kept, huge weight always kept, deterministic") {
    val df = (1L to 200L).map(i => (i, if (i <= 50) 0L else if (i <= 100) 100000L else 400L))
      .toDF("id", "w")
    val kept = Sampling.weightedSampleByHash(df, col("id"), col("w"), 0.00125)
      .select("id").as[Long].collect().toSet
    assert(kept.forall(_ > 50))                      // zero-weight rows never kept
    assert((51L to 100L).forall(kept.contains))      // p capped at 1 -> always kept
    val mid = kept.count(_ > 100)                    // p = 0.5 for the rest
    assert(mid > 25 && mid < 75)
    val again = Sampling.weightedSampleByHash(df, col("id"), col("w"), 0.00125)
      .select("id").as[Long].collect().toSet
    assert(again === kept)                           // content-hash determinism
  }

  test("weightedSampleExact: exactly n rows, heavy rows overrepresented, " +
      "deterministic, partitioning-invariant") {
    // 100 light rows (w=1) + 100 heavy rows (w=100): A-ES priorities
    // ln(u)/w concentrate the top-n heavily on the big weights
    val df = (1L to 200L).map(i => (i, if (i <= 100) 1L else 100L))
      .toDF("id", "w")
    val top = Sampling.weightedSampleExact(df, col("id"), col("w"), n = 50)
    val ids = top.select("id").as[Long].collect()
    assert(ids.length === 50, "exact sample size")
    assert(ids.count(_ > 100) > 40,
      s"heavy rows must dominate a 100:1 weighted draw: ${ids.count(_ > 100)}")
    val again = Sampling.weightedSampleExact(df.repartition(13),
      col("id"), col("w"), n = 50).select("id").as[Long].collect()
    assert(again.toSeq === ids.toSeq, "pure function of (keys, weights)")
  }

  test("weightedSampleExact: non-positive weights are unsampleable — " +
      "w=0 (ln/0 = −∞) and w<0 (flipped sign would dominate) never drawn") {
    // without the guard, the two w=-5 rows would deterministically own
    // the top of the priority order (ln(u)/w > 0 only for them) and
    // the w=0 rows would inject −Infinity priorities
    val df = ((1L to 20L).map(i => (i, 10L)) ++
        Seq((98L, 0L), (99L, -5L), (100L, -5L))).toDF("id", "w")
    val ids = Sampling.weightedSampleExact(df, col("id"), col("w"), n = 10)
      .select("id").as[Long].collect().toSet
    assert(ids.size === 10)
    assert(ids.forall(_ <= 20L), s"non-positive-weight rows drawn: $ids")
  }

  test("weightedSampleExactPerGroup: exactly n per group, heavy rows " +
      "dominate, deterministic, group-limit plan") {
    // per group: 50 light (w=1) + 50 heavy (w=100) rows
    val df = (1L to 300L).map { i =>
      (i, s"g${i % 3}", if ((i / 3) % 2 == 0L) 1L else 100L)
    }.toDF("id", "g", "w")
    val out = Sampling.weightedSampleExactPerGroup(
      df, col("g"), col("id"), col("w"), n = 20)
    val sizes = out.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(sizes === Map("g0" -> 20L, "g1" -> 20L, "g2" -> 20L))
    val heavyShare = out.filter(col("w") === 100L).count()
    assert(heavyShare > 48, s"heavy rows must dominate a 100:1 draw: $heavyShare")
    val again = Sampling.weightedSampleExactPerGroup(
        df.repartition(13), col("g"), col("id"), col("w"), n = 20)
      .select("g", "id", "sample_rank").collect().map(_.toSeq).toSet
    assert(again === out.select("g", "id", "sample_rank")
      .collect().map(_.toSeq).toSet)
    // the rank filter pushes into a per-partition group limit, so only
    // ~n rows per group per partition reach the exchange
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("bottomKPerGroup: exactly k per group, deterministic, group-limit plan") {
    val df = (1L to 500L).map(i => (i, s"g${i % 3}")).toDF("id", "g")
    val out = Sampling.bottomKPerGroup(df, col("g"), col("id"), 7)
    val sizes = out.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(sizes === Map("g0" -> 7L, "g1" -> 7L, "g2" -> 7L))
    val a = out.select("g", "id").as[(String, Long)].collect().toSet
    val b = Sampling.bottomKPerGroup(df.repartition(13), col("g"), col("id"), 7)
      .select("g", "id").as[(String, Long)].collect().toSet
    assert(a === b) // membership is a pure function of the keys
    // the rank filter is pushed into a WindowGroupLimit, so only ~k rows
    // per group per partition reach the shuffle
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("balanceLabels: every label downsamples to the rarest's count") {
    // labels: a x5, b x2, c x9 -> all keep exactly 2
    val df = ((1L to 5L).map((_, "a")) ++ (6L to 7L).map((_, "b")) ++
      (8L to 16L).map((_, "c"))).toDF("id", "lbl")
    val out = Sampling.balanceLabels(df, col("lbl"), col("id"))
    val sizes = out.groupBy("lbl").count().as[(String, Long)].collect().toMap
    assert(sizes === Map("a" -> 2L, "b" -> 2L, "c" -> 2L))
    // membership is a pure function of the keys
    val a = out.select("lbl", "id").as[(String, Long)].collect().toSet
    val b = Sampling.balanceLabels(df.repartition(7), col("lbl"), col("id"))
      .select("lbl", "id").as[(String, Long)].collect().toSet
    assert(a === b)
  }

  test("activityStreaks: islands split on gaps, duplicate days collapse") {
    val df = ev(
      (1L, 0L, "a"), (1L, 1L, "a"), (1L, 1L, "b"), (1L, 2L, "a"), // 0-2: streak 3
      (1L, 5L, "a"),                                              // 5: streak 1
      (2L, 4L, "a"))
    val got = Events.activityStreaks(df)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === Set((1L, 3L, 2L, 4L), (2L, 1L, 1L, 1L)))
  }
}
