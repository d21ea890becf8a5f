package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Interpolated Kneser–Ney bigram scoring: hand-replayed formula,
  * OOV handling, partitioning invariance. */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  private def anchor6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("bigrams: consecutive pairs, short docs emit nothing") {
    val df = Seq((1L, "a b c"), (2L, "solo"), (3L, ""), (4L, "x  y"))
      .toDF("doc_id", "text")
    val got = NgramLm.bigrams(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set((1L, "a", "b"), (1L, "b", "c"), (4L, "x", "y")))
  }

  test("bigramKnScores matches a hand-computed KN replay, including " +
      "the unseen-context and floored-OOV paths") {
    // corpus: "a b", "a b", "a c" -> bigrams (a,b)x2, (a,c)x1
    //   big: (a,b)->2, (a,c)->1; ctx: a->(c1=3, nf=2)
    //   cont: b->1, c->1; T=2
    val corpus = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    // scored doc 10: "a b" (seen), doc 11: "z b" (unseen context ->
    // Pcont(b) = 1/2), doc 12: "z q" (unseen continuation -> floor)
    val docs = Seq((10L, "a b"), (11L, "z b"), (12L, "z q"))
      .toDF("doc_id", "text")
    val got = NgramLm.bigramKnScores(corpus, docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val d = 0.75
    // doc 10: max(2-D,0)/3 + D*2/3 * (1/2)
    val p10 = (2.0 - d) / 3.0 + d * 2.0 / 3.0 * 0.5
    assert(got(10L) === ((1L, anchor6(anchor6(math.log10(p10))))))
    // doc 11: unseen context z -> P = Pcont(b) = 1/2
    assert(got(11L) === ((1L, anchor6(anchor6(math.log10(0.5))))))
    // doc 12: Pcont(q) = 0 -> floored at 1e-12 -> log10 = -12
    assert(got(12L) === ((1L, -12.0)))
  }

  test("scores are invariant to input partitioning") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .withColumn("text", coalesce(col("text"), lit("")))
    val a = NgramLm.bigramKnScores(docs, docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val b = NgramLm.bigramKnScores(docs.repartition(13), docs.repartition(7),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(a === b)
    assert(a.nonEmpty)
  }

  // ---- order-n generalization (round 14) ----

  test("ngramWindows: length-3 consecutive windows, short docs emit " +
      "nothing") {
    val df = Seq((1L, "a b c d"), (2L, "a b"), (3L, ""), (4L, "x  y z"))
      .toDF("doc_id", "text")
    val got = NgramLm.ngramWindows(df, "doc_id", "text", 3)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSet
    assert(got === Set((1L, "a", "b", "c"), (1L, "b", "c", "d"),
      (4L, "x", "y", "z")))
  }

  test("trigram KN hand-replay: seen chain, backoff to bigram, backoff " +
      "to continuation unigram, floored OOV") {
    // corpus trigrams: (a,b,c)x2, (a,b,d)x1
    //   c3: (a,b,c)->2, (a,b,d)->1;      x3: (a,b)->(tot 3, nf 2)
    //   c2 (adjusted): (b,c)->1, (b,d)->1; x2: b->(tot 2, nf 2)
    //   c1: c->1, d->1;                   T = |c2| = 2
    val corpus = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a b d"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (10L, "a b c"), // full order-3 hit
      (11L, "z b c"), // ctx (z,b) unseen -> P = P2(c|b)
      (12L, "z z c"), // ctx (z,z) and (z) unseen -> P = P1(c)
      (13L, "z z q")  // q unseen everywhere -> floored at 1e-12
    ).toDF("doc_id", "text")
    val got = NgramLm.knScores(corpus, docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val d = 0.75
    val p1c = 1.0 / 2.0
    val p2 = math.max(1.0 - d, 0.0) / 2.0 + d * 2.0 / 2.0 * p1c
    val p3 = math.max(2.0 - d, 0.0) / 3.0 + d * 2.0 / 3.0 * p2
    assert(got(10L) === ((1L, anchor6(anchor6(math.log10(p3))))))
    assert(got(11L) === ((1L, anchor6(anchor6(math.log10(p2))))))
    assert(got(12L) === ((1L, anchor6(anchor6(math.log10(p1c))))))
    assert(got(13L) === ((1L, -12.0)))
  }

  test("order-5 KN: a fully-seen single-window chain scores exactly " +
      "1.0 at every level (logp 0), an OOV tail word floors to -12") {
    // self-trained one-doc corpus: every table has one row with c=1,
    // every tot=nf=1, T=1 -> P_k = 0.25/1 + 0.75*1/1*P_{k-1} with
    // P_1 = 1, so P_k == 1.0 exactly at every backoff level
    val corpus = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val docs = Seq((10L, "a b c d e"), (11L, "a b c d q"))
      .toDF("doc_id", "text")
    val got = NgramLm.knScores(corpus, docs, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(10L) === ((1L, 0.0)))
    // q: P1 = 0 and every numerator count is 0 -> P = 0 -> floor
    assert(got(11L) === ((1L, -12.0)))
  }

  test("generalized order-2 path == bigramKnScores on real docs " +
      "(same tables, same fold, same anchors)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .withColumn("text", coalesce(col("text"), lit("")))
    val viaBigram = NgramLm.bigramKnScores(docs, docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val counts = NgramLm.knCounts(docs, "doc_id", "text", 2)
    val t = counts(2).count()
    val viaN = NgramLm.scoreWithKnCounts(docs, counts, t, "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(viaN === viaBigram)
    assert(viaN.nonEmpty)
  }

  test("estimateDiscount: Chen-Goodman n1/(n1+2*n2) from the " +
      "count-of-counts, 6dp-anchored; degenerate count-of-counts " +
      "degrade deterministically (fallback 0.75, (0,1) clamp)") {
    // bigram counts (a,b)->2, (a,c)->1 -> n1=1, n2=1 -> D = 1/3
    val corpus = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val counts = NgramLm.knCounts(corpus, "doc_id", "text", 2)
    assert(NgramLm.estimateDiscount(counts(2)) === 0.333333)
    // every type repeats 3x -> n1 = n2 = 0 -> the fixed default (the
    // sf0.1 synthetic corpus IS this case — small vocab, heavy repeats)
    val degenerate = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"))
      .toDF("doc_id", "text")
    val dc = NgramLm.knCounts(degenerate, "doc_id", "text", 2)
    assert(NgramLm.estimateDiscount(dc(2)) === 0.75)
    // all singletons, no doubletons -> raw D = 1.0, clamped into (0,1)
    val singletons = Seq((1L, "a b"), (2L, "a c"), (3L, "a d"))
      .toDF("doc_id", "text")
    val sc = NgramLm.knCounts(singletons, "doc_id", "text", 2)
    assert(NgramLm.estimateDiscount(sc(2)) === 0.999999)
  }

  test("order-3 scores are invariant to input partitioning") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .withColumn("text", coalesce(col("text"), lit("")))
    val a = NgramLm.knScores(docs, docs, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val b = NgramLm.knScores(docs.repartition(13), docs.repartition(7),
        "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(a === b)
    assert(a.nonEmpty)
  }

  // ---- count-table pruning (round 15) ----

  test("knCountsPruned: statistics before pruning — hand-replayed " +
      "order-2 mass-to-backoff, distribution still sums to 1") {
    // c2: (a,b)->2, (a,c)->1; θ_2 = 1 prunes (a,c).
    // Unpruned stats: ctx a -> tot=3, nf=2, ptot=1, pn=1;
    //   D = n1/(n1+2n2) = 1/3 anchored = 0.333333 (UNPRUNED
    //   count-of-counts: the singleton (a,c) must be visible to D);
    //   cont: b->1, c->1; T=2.
    val corpus = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val m = NgramLm.knCountsPruned(corpus, "doc_id", "text", n = 2,
      thresholds = k => if (k == 2) 1L else 0L)
    assert(m.t === 2L)
    assert(m.discounts(2) === 0.333333)
    // the stored gram table dropped the singleton
    val grams = m.grams(2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(grams === Map(("a", "b") -> 2L))
    // the rollup kept UNPRUNED totals + the pruned-mass integers
    val ctx = m.ctxs(2).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(ctx === Map("a" -> ((3L, 2L, 1L, 1L))))
    val d = 0.333333
    val gamma = (d * 2 + (1 - d * 1)) / 3 // (D·nf + (ptot − D·pn))/tot
    val got = NgramLm.scoreWithPrunedModel(
        Seq((10L, "a b"), (11L, "a c")).toDF("doc_id", "text"),
        m, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // surviving gram: discounted prob + backoff; pruned gram: backoff
    // through Pcont only — and the two Ps sum to exactly 1 with
    // Pcont(b) = Pcont(c) = 1/2
    val pB = (2.0 - d) / 3.0 + gamma * 0.5
    val pC = gamma * 0.5
    assert(math.abs((pB + pC) - 1.0) < 1e-12)
    assert(got(10L) === anchor6(math.log10(pB)))
    assert(got(11L) === anchor6(math.log10(pC)))
  }

  test("θ = 0 pruned model scores identically to the unpruned scorer") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .withColumn("text", coalesce(col("text"), lit("")))
    val m = NgramLm.knCountsPruned(docs, "doc_id", "text", n = 3,
      thresholds = _ => 0L)
    val viaPruned = NgramLm.scoreWithPrunedModel(docs, m,
        "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val counts = NgramLm.knCounts(docs, "doc_id", "text", 3, pin = true)
    val ds = (2 to 3).map(k => k -> NgramLm.estimateDiscount(counts(k))).toMap
    val viaFull = NgramLm.scoreWithKnCounts(docs, counts, counts(2).count(),
        "doc_id", "text", 3, discounts = ds)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(viaPruned === viaFull)
    assert(viaPruned.nonEmpty)
  }

  test("knCountsPruned refuses unigram pruning and negative thresholds") {
    val corpus = Seq((1L, "a b c")).toDF("doc_id", "text")
    val e1 = intercept[IllegalArgumentException] {
      NgramLm.knCountsPruned(corpus, "doc_id", "text", 2, _ => 1L)
    }
    assert(e1.getMessage.contains("unigram"))
    val e2 = intercept[IllegalArgumentException] {
      NgramLm.knCountsPruned(corpus, "doc_id", "text", 2,
        k => if (k == 1) 0L else -1L)
    }
    assert(e2.getMessage.contains(">= 0"))
  }

  test("pruned scoring is invariant to input partitioning") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .withColumn("text", coalesce(col("text"), lit("")))
    val thr = (k: Int) => if (k >= 3) 1L else 0L
    val a = NgramLm.scoreWithPrunedModel(docs,
        NgramLm.knCountsPruned(docs, "doc_id", "text", 3, thr),
        "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val b = NgramLm.scoreWithPrunedModel(docs.repartition(7),
        NgramLm.knCountsPruned(docs.repartition(13), "doc_id", "text", 3, thr),
        "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(a === b)
    assert(a.nonEmpty)
  }
}
