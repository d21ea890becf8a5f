package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed n-gram language-model quality scoring — the classic
  * corpus-filtering signal (CCNet/fastText-era pipelines score every
  * candidate document under a reference-corpus LM and keep the
  * low-perplexity head). [[graft.operators.TextAnalysis]] already has
  * the unigram log-prob score; this is the interpolated Kneser–Ney
  * BIGRAM model (Kneser & Ney 1995; Chen & Goodman 1998 — published
  * algorithms), the smallest LM where smoothing actually matters.
  *
  * Model = THREE DataFrames of exact integer counts, never driver
  * state (at 100 TB the bigram table is itself large — it stays
  * distributed, persistable as bucketed tables keyed on their join
  * keys, and scoring is a JOIN, not a broadcast of a vocabulary):
  *   - `big(w1, w2, c12)`   bigram counts (one shuffle on the pair)
  *   - `ctx(w1, c1, nf)`    per-context totals: c1 = Σ_w2 c12 and
  *                          nf = |{w2 : c12 > 0}| — ONE aggregation
  *                          over `big`, map-side combined
  *   - `cont(w2, nb)`       continuation counts |{w1 : c12 > 0}|
  * plus the scalar `T` = |distinct bigram types| (the one number that
  * reaches the driver).
  *
  * Interpolated KN with absolute discount D:
  *   P(w2|w1) = max(c12 − D, 0)/c1  +  (D · nf(w1)/c1) · Pcont(w2)
  *   Pcont(w2) = nb(w2)/T
  * Unseen context w1 → P = Pcont(w2); unseen w2 → Pcont = 0; every
  * probability is floored at 1e−12 before the log so an
  * out-of-vocabulary bigram contributes a large-but-finite penalty
  * instead of −∞ (deterministic, documented — the floor IS the OOV
  * penalty). Per-bigram log10 is anchored `floor(x·1e6 + 0.5)/1e6`
  * (log10 can differ by an ulp across libm implementations — the
  * A-ES/ln convention), and the per-doc mean is anchored again, so a
  * DuckDB oracle replays scores bit-for-bit.
  *
  * Scale shape: tokenize + bigram-explode are per-row projections (no
  * shuffle); training is two aggregations (pair-keyed, then
  * w1-keyed); scoring joins the document bigrams against the three
  * count tables on their natural keys — plain equi-joins that
  * broadcast when the model is small and shuffle when it isn't, with
  * one final doc-keyed aggregation. No all-pairs stage anywhere.
  */
object NgramLm {

  /** Engine-portable 6-decimal anchor (see Sampling/Retrieval). */
  private def anchor6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6

  /** Whitespace tokens (the house split: `\s+`, empties dropped). */
  private def toks(textCol: Column): Column =
    filter(split(textCol, "\\s+"), t => t =!= "")

  /** One row per consecutive token pair of `textCol`:
    * `(id, w1, w2)` — zip_with over two slices, one codegen'd
    * projection + explode, no shuffle. Docs with < 2 tokens emit
    * nothing. */
  def bigrams(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // NO read-side fan-out here, by same-box A/B measurement: at order
    // 2 the pair explode is one zip_with over the token array — too
    // cheap to repay 32-way staging of every downstream stage
    // (q_bigram_kn_score measured 1.62× SLOWER fanned, anchors ~1.15,
    // while the order-≥3 window explode in [[ngramWindows]] measured
    // 2× faster and keeps its fan-out). At production input sizes the
    // fan-out was a guarded no-op anyway, so removing it only changes
    // (and speeds) the measured case.
    df.select(col(idCol).as("id"), col(textCol).as("__txt"))
      .select(col("id"), toks(col("__txt")).as("__t"))
      .withColumn("__bg", explode(zip_with(
        slice(col("__t"), lit(1), greatest(size(col("__t")) - 1, lit(0))),
        slice(col("__t"), lit(2), greatest(size(col("__t")) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))))
      .select(col("id"), col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
  }

  /** The trained model's three count tables, as one pass over the
    * corpus: `big(w1, w2, c12)`, `ctx(w1, c1, nf)`, `cont(w2, nb)` —
    * each keyed on its scoring-join key, so they persist naturally as
    * bucketed tables (see the q_bigram_kn_incremental_persisted
    * lifecycle). */
  /** With `pin = true` the bigram table is EAGERLY localCheckpoint'ed
    * before ctx/cont derive from it: all three tables' consumers (the
    * persisted lifecycle's three writes, or self-contained scoring's
    * join legs) otherwise each re-run the corpus tokenize+count
    * shuffle — the [[knCounts]] pin rationale at order 2. */
  def bigramModel(corpus: DataFrame, idCol: String,
      textCol: String, pin: Boolean = false)
      : (DataFrame, DataFrame, DataFrame) = {
    val big0 = bigrams(corpus, idCol, textCol)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val big = if (pin) big0.localCheckpoint(true) else big0
    val ctx = big.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("nf"))
    val cont = big.groupBy(col("w2")).agg(count(lit(1)).as("nb"))
    (big, ctx, cont)
  }

  /** The per-bigram scoring stage: `(id, w1, w2, logp)` — bigram
    * explode + three equi-joins against the model tables + the KN
    * interpolation, every step stateless, so it applies UNCHANGED to a
    * streaming `docs` frame (stream-static equi-joins are append-legal;
    * see graft.streaming.StreamingOps.streamingBigramKnScores). The
    * doc-level rollup lives in [[scoreWithModel]] — a per-doc groupBy,
    * fine in batch but a STATEFUL aggregation on an unbounded stream,
    * which is why the stage boundary sits here. */
  def scoredBigrams(docs: DataFrame, big: DataFrame, ctx: DataFrame,
      cont: DataFrame, t: Long, idCol: String, textCol: String,
      discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, s"discount in (0,1), got $discount")
    require(t > 0, "empty model")
    val d = lit(discount)
    val pcont = coalesce(col("nb").cast("double"), lit(0.0)) / lit(t.toDouble)
    val p = when(col("c1").isNotNull,
        greatest(col("c12").cast("double") - d, lit(0.0)) / col("c1") +
          d * col("nf").cast("double") / col("c1") * pcont)
      .otherwise(pcont)
    bigrams(docs, idCol, textCol)
      .join(big.withColumnRenamed("c12", "__c12raw"), Seq("w1", "w2"), "left")
      .withColumn("c12", coalesce(col("__c12raw"), lit(0L))).drop("__c12raw")
      .join(ctx, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .select(col("id"), col("w1"), col("w2"),
        anchor6(log10(greatest(p, lit(1e-12)))).as("logp"))
  }

  /** Score `docs` against a GIVEN model (trained here or read back
    * from persisted tables — the count tables are the model artifact;
    * `t` = |distinct bigram types|, recomputable from `big` with one
    * aggregate). Three equi-joins + one doc-keyed aggregation. The doc
    * mean sums the anchored logps as EXACT INTEGER micro-units (round
    * 14, the [[scoreWithKnCounts]] convention): a floating `avg` is
    * summation-order-dependent, and Spark's partial aggregation vs the
    * oracle's scan order can land an ulp apart — right on a 6dp anchor
    * boundary that flips the last digit. A long sum is
    * order-independent, so both engines divide the identical integer. */
  def scoreWithModel(docs: DataFrame, big: DataFrame, ctx: DataFrame,
      cont: DataFrame, t: Long, idCol: String, textCol: String,
      discount: Double = 0.75): DataFrame =
    scoredBigrams(docs, big, ctx, cont, t, idCol, textCol, discount)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        anchor6(sum(round(col("logp") * 1e6).cast("long")).cast("double")
          / lit(1e6) / count(lit(1))).as("avg_logp"))

  /** Score every `docs` row under a KN bigram model trained on
    * `corpus` (pass the same frame for self-scoring). Output:
    * `(id, n_bigrams, avg_logp)` for docs with ≥ 1 bigram —
    * avg_logp is the mean anchored log10 probability, the
    * perplexity-proxy a curation gate thresholds on. */
  def bigramKnScores(corpus: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, discount: Double = 0.75): DataFrame = {
    val (big, ctx, cont) = bigramModel(corpus, idCol, textCol)
    // the single driver-resident model scalar: |distinct bigram types|
    val t = big.count()
    scoreWithModel(docs, big, ctx, cont, t, idCol, textCol, discount)
  }

  // ------------------------------------------------------------------
  // Order-n interpolated Kneser–Ney (round 14). The deployed CCNet
  // filter is a 5-GRAM KenLM; the bigram above was the smallest LM
  // where smoothing matters, and its table shape generalizes directly:
  // one count table per order, each keyed on its scoring-join key, with
  // backoff CHAINED through the orders. Lower-order tables hold
  // KenLM-style ADJUSTED (continuation) counts derived from the order
  // above (Heafield et al. 2013 "Scalable Modified Kneser-Ney";
  // Chen & Goodman 1998 eq. for interpolated KN):
  //   counts(n)(w1..wn)  = raw n-gram counts        (one corpus shuffle)
  //   counts(k)(w1..wk)  = |{v : counts(k+1)(v,w1..wk) > 0}|
  //                      = one GROUP BY over counts(k+1) — the rows of
  //                        counts(k+1) are already distinct (k+1)-grams,
  //                        so COUNT(*) by the k-word suffix IS the
  //                        distinct-predecessor count. n-1 bounded
  //                        aggregations total, never a driver vocabulary.
  //   T = Σ_w counts(1)(w) = |rows of counts(2)| — the one driver scalar,
  //       recomputable from the stored order-2 table with one aggregate.
  // Scoring joins a document's n-gram windows against 2n-1 tables
  // (counts(k) on its k-gram, its context rollup on the k-1 prefix,
  // counts(1) on the last word) — all natural-key equi-joins that
  // broadcast when the model is small and shuffle when it isn't — then
  // folds the interpolation from the continuation unigram upward:
  //   P_1(w)        = counts(1)(w) / T            (0 when unseen)
  //   P_k(w | ctx)  = max(c_k − D_k, 0)/tot_k
  //                   + D_k · nf_k / tot_k · P_{k-1}    when ctx seen
  //                 = P_{k-1}                           when ctx unseen
  // with the bigram file's exact operation order, 1e-12 floor, and 6dp
  // log10/mean anchoring, so a DuckDB oracle replays every bit.
  // ------------------------------------------------------------------

  /** One row per length-`n` consecutive token window:
    * `(id, w1 … wn)` — one codegen-friendly projection (sequence of
    * window starts → fixed-length slices) + explode, no shuffle. Docs
    * with < n tokens emit nothing (the bigram convention at n = 2). */
  def ngramWindows(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"order must be >= 1, got $n")
    // same read-side fan-out as [[bigrams]] — the n-gram slice explode
    // is the CPU-heavy stage of every KN train/score pass
    graft.core.Parallelism.fanOut(
        df.select(col(idCol).as("id"), col(textCol).as("__txt")))
      .select(col("id"), toks(col("__txt")).as("__t"))
      .filter(size(col("__t")) >= n) // also keeps `sequence` ascending
      .withColumn("__g", explode(transform(
        sequence(lit(1), size(col("__t")) - lit(n - 1)),
        i => slice(col("__t"), i, lit(n)))))
      .select(col("id") +:
        (1 to n).map(k => element_at(col("__g"), k).as(s"w$k")): _*)
  }

  /** The order-`n` model: count tables for every order 1..n, each
    * `(w1 … wk, c)`. `tables(n)` is raw counts; `tables(k < n)` are the
    * adjusted continuation counts (see the section comment). Each table
    * is keyed on its scoring-join key, so the whole model persists as
    * bucketed tables (the q_trigram_kn_incremental_persisted
    * lifecycle); T recomputes as `tables(2).count()`. */
  /** With `pin = true` every order's table is EAGERLY
    * localCheckpoint'ed as it is derived: self-contained scoring reads
    * each order through 2-3 consumers (its gram join, its context
    * rollup, its discount estimate), and without the pin each consumer
    * re-runs the whole derivation chain back to the corpus — measured
    * 13.8s → well under half on the 5-gram estimated-discount query at
    * sf0.1. n-1 small pin jobs; blocks are ContextCleaner-reclaimed
    * (never the CacheManager — the cache-lifecycle sweep). Callers
    * that persist the tables instead (the bucketed-table lifecycle)
    * keep the default lazy chain. */
  def knCounts(corpus: DataFrame, idCol: String, textCol: String,
      n: Int, pin: Boolean = false): Map[Int, DataFrame] = {
    require(n >= 2, s"order must be >= 2, got $n")
    def maybePin(df: DataFrame): DataFrame =
      if (pin) df.localCheckpoint(true) else df
    val top = maybePin(ngramWindows(corpus, idCol, textCol, n)
      .groupBy((1 to n).map(k => col(s"w$k")): _*)
      .agg(count(lit(1)).as("c")))
    (n - 1 to 1 by -1).foldLeft(Map(n -> top)) { (acc, k) =>
      val derived = acc(k + 1)
        .groupBy((2 to k + 1).map(j => col(s"w$j").as(s"w${j - 1}")): _*)
        .agg(count(lit(1)).as("c"))
      // order 1 has exactly ONE consumer (the continuation join), and
      // it derives from the already-pinned order 2 — a pin job there
      // costs more than the one re-aggregation it saves (measured)
      acc + (k -> (if (k == 1) derived else maybePin(derived)))
    }
  }

  /** Per-context rollup of an order-k count table: `(w1 … w(k-1),
    * tot = Σ c, nf = |followers|)` — one map-side-combined aggregation,
    * derived (not stored): the count tables are the model artifact. */
  private def ctxOf(countsK: DataFrame, k: Int): DataFrame =
    countsK.groupBy((1 until k).map(j => col(s"w$j")): _*)
      .agg(sum(col("c")).as("tot"), count(lit(1)).as("nf"))

  /** Chen–Goodman estimated absolute discount for one order's count
    * table: D = n1 / (n1 + 2·n2) from the count-of-counts (n1 = types
    * seen once, n2 = twice) — ONE bounded aggregate (two longs reach
    * the driver), anchored to 6dp like every driver-resident model
    * scalar so the oracle's CTE replays the identical literal.
    *
    * Degenerate count-of-counts degrade DETERMINISTICALLY instead of
    * failing (both cases are real: the sf0.1 synthetic corpus has a
    * small vocabulary where every bigram repeats 3+ times, n1=n2=0):
    * no singletons or doubletons at all → the fixed default 0.75; and
    * the estimate is clamped into (0,1) — n2=0 alone would give the
    * out-of-range D=1 (no discounting evidence), n1=0 alone D=0. The
    * oracle replays the same CASE + clamp, so the fallback is part of
    * the verified contract, not an escape hatch. */
  def estimateDiscount(countsK: DataFrame): Double = {
    val row = countsK.agg(
      sum(when(col("c") === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(col("c") === 2, 1L).otherwise(0L)).as("n2")).head()
    // an EMPTY count table (corpus where every doc is shorter than the
    // order) sums to null — the same "no discounting evidence" case as
    // n1 = n2 = 0, so it takes the same deterministic 0.75 default
    // rather than an opaque NPE at getLong
    discountOf(
      if (row.isNullAt(0)) None else Some(row.getLong(0)),
      if (row.isNullAt(1)) None else Some(row.getLong(1)))
  }

  /** The shared Chen–Goodman scalar: D = n1/(n1 + 2·n2), 6dp-anchored
    * and clamped into (0,1); missing/degenerate count-of-counts take
    * the deterministic 0.75 default ([[estimateDiscount]]'s contract,
    * factored so the batched estimator below is bit-identical). */
  private def discountOf(n1Opt: Option[Long], n2Opt: Option[Long]): Double =
    (n1Opt, n2Opt) match {
      case (Some(n1), Some(n2)) if n1 + 2 * n2 != 0 =>
        math.max(math.min(
          math.floor(n1.toDouble / (n1 + 2.0 * n2) * 1e6 + 0.5) / 1e6,
          0.999999), 0.000001)
      case _ => 0.75
    }

  /** [[estimateDiscount]] for several orders in ONE Spark action, plus
    * each order's stored type count: per order one bounded aggregate
    * leg (n1, n2, ntypes = COUNT(*)), union'd into a single ≤|orders|-row
    * collect — replacing one driver round-trip PER ORDER (an order-5
    * estimated-discount model paid 5 actions: 4 discounts + the
    * T = |order-2 types| count; this is 1). The per-order scalar math
    * is [[discountOf]], shared with the one-table path, so estimates
    * are bit-identical. `types(2)` is the model scalar T. */
  def discountStats(counts: Map[Int, DataFrame], orders: Seq[Int])
      : (Map[Int, Double], Map[Int, Long]) = {
    require(orders.nonEmpty && orders.forall(counts.contains),
      s"missing orders ${orders.filterNot(counts.contains).mkString(",")}")
    val legs = orders.map { k =>
      counts(k).agg(
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("c") === 2, 1L).otherwise(0L)).as("n2"),
          count(lit(1)).as("ntypes"))
        .select(lit(k).as("ord"), col("n1"), col("n2"), col("ntypes"))
    }
    val rows = legs.reduce(_ unionAll _).collect()
    val ds = rows.map { r =>
      r.getInt(0) -> discountOf(
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))
    }.toMap
    val types = rows.map(r => r.getInt(0) -> r.getLong(3)).toMap
    (ds, types)
  }

  /** The per-window scoring stage: `(id, w1 … wn, logp)` — n-gram
    * explode + 2n-1 equi-joins + the chained KN interpolation, every
    * step stateless (the [[scoredBigrams]] streaming argument applies
    * unchanged; the doc rollup lives in [[scoreWithKnCounts]]).
    * `discounts(k)` is order k's absolute discount (uniform 0.75 by
    * default; [[estimateDiscount]] per order for the estimated
    * variant). */
  def scoredNgrams(docs: DataFrame, counts: Map[Int, DataFrame], t: Long,
      idCol: String, textCol: String, n: Int,
      discounts: Int => Double = _ => 0.75): DataFrame = {
    require(n >= 2, s"order must be >= 2, got $n")
    require((1 to n).forall(counts.contains), s"model is missing orders " +
      s"${(1 to n).filterNot(counts.contains).mkString(",")}")
    require(t > 0, "empty model")
    (2 to n).foreach { k =>
      val d = discounts(k)
      require(d > 0 && d < 1, s"discount($k) in (0,1), got $d")
    }
    // order k's tables join on the LAST k window words: rename the
    // model's w1..wk to w(n-k+1)..wn so every leg is a plain
    // using-columns equi-join against the window frame
    val joined = (2 to n).foldLeft(
      ngramWindows(docs, idCol, textCol, n)
        .join(counts(1).select(col("w1").as(s"w$n"), col("c").as("__nb")),
          Seq(s"w$n"), "left")) { (acc, k) =>
      val gramKeys = (1 to k).map(j => s"w${n - k + j}")
      val ctxKeys = gramKeys.init
      val gram = counts(k).select(
        (1 to k).map(j => col(s"w$j").as(s"w${n - k + j}")) :+
          col("c").as(s"__c$k"): _*)
      val ctx = ctxOf(counts(k), k).select(
        (1 until k).map(j => col(s"w$j").as(s"w${n - k + j}")) ++
          Seq(col("tot").as(s"__tot$k"), col("nf").as(s"__nf$k")): _*)
      acc.join(gram, gramKeys, "left").join(ctx, ctxKeys, "left")
    }
    // fold the interpolation upward from the continuation unigram, in
    // the bigram stage's exact operation order at every level
    val p = (2 to n).foldLeft(
      coalesce(col("__nb").cast("double"), lit(0.0)) / lit(t.toDouble)) {
      (pPrev, k) =>
        val d = lit(discounts(k))
        when(col(s"__tot$k").isNotNull,
          greatest(coalesce(col(s"__c$k"), lit(0L)).cast("double") - d,
            lit(0.0)) / col(s"__tot$k") +
            d * col(s"__nf$k").cast("double") / col(s"__tot$k") * pPrev)
          .otherwise(pPrev)
    }
    joined.select(col("id") +: (1 to n).map(k => col(s"w$k")) :+
      anchor6(log10(greatest(p, lit(1e-12)))).as("logp"): _*)
  }

  /** Score `docs` against a GIVEN order-n model (trained here or read
    * back from persisted bucketed tables): `(id, n_ngrams, avg_logp)`
    * for docs with ≥ 1 full window. The doc mean is computed over the
    * anchored logps as EXACT INTEGER micro-units (each logp is an
    * anchored multiple of 1e-6, so `round(logp·1e6)` recovers that
    * integer exactly): a plain floating `avg` depends on summation
    * order, and Spark's partial aggregation vs the oracle's scan order
    * can land an ulp apart — on a 6dp anchor boundary that flips the
    * last digit (observed on 1-2 docs per 500 at order 3/5, where
    * windows per doc are larger than the bigram case). A long sum is
    * order-independent, so both engines divide the identical integer. */
  def scoreWithKnCounts(docs: DataFrame, counts: Map[Int, DataFrame],
      t: Long, idCol: String, textCol: String, n: Int,
      discounts: Int => Double = _ => 0.75): DataFrame =
    scoredNgrams(docs, counts, t, idCol, textCol, n, discounts)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_ngrams"),
        anchor6(sum(round(col("logp") * 1e6).cast("long")).cast("double")
          / lit(1e6) / count(lit(1))).as("avg_logp"))

  /** Self-contained order-n KN scoring: train on `corpus`, score
    * `docs`, with every order's count table pinned once
    * (`knCounts(pin = true)` — each order has 2-3 consumers among the
    * scoring legs; see the pin rationale there). Production at scale
    * uses the PERSISTED bucketed-table lifecycle instead — see
    * q_trigram_kn_incremental_persisted. */
  def knScores(corpus: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, n: Int,
      discounts: Int => Double = _ => 0.75): DataFrame = {
    val counts = knCounts(corpus, idCol, textCol, n, pin = true)
    val t = counts(2).count()
    scoreWithKnCounts(docs, counts, t, idCol, textCol, n, discounts)
  }

  // ------------------------------------------------------------------
  // Count-table pruning (round 15). At 100 TB the RAW top-order table
  // is itself corpus-scale — the published load-shedding lever is
  // KenLM-style minimum-count pruning (Heafield et al. 2013 "Scalable
  // Modified Kneser-Ney Language Model Estimation", §4.2; SRILM's
  // -prune-lowprobs lineage): drop order-k entries whose count is at
  // or below a per-order threshold θ_k, with ALL smoothing statistics
  // computed BEFORE pruning so the model's math stays honest:
  //   - lower-order ADJUSTED counts derive from the UNPRUNED order
  //     above (pruning is storage load-shedding, not a statistics
  //     change — the continuation evidence of a pruned 5-gram is real)
  //   - each order's Chen–Goodman discount estimates from the UNPRUNED
  //     count-of-counts (singletons are exactly what θ=1 prunes; the
  //     discount must see them)
  //   - the per-context rollup (tot = Σc, nf = followers) aggregates
  //     the UNPRUNED table, and the mass of pruned entries flows to
  //     the BACKOFF: per context the rollup also stores the exact
  //     integers ptot = Σ_{pruned w} c and pn = |pruned w|, and
  //     scoring's interpolation coefficient becomes
  //       γ(ctx) = (D·(nf − pn) + (ptot − D·pn·0) … ) / tot
  //              = (D·nf + (ptot − D·pn)) / tot
  //     i.e. the discounted probability max(c − D, 0)/tot of every
  //     pruned entry (c ≥ 1 > D, so c − D exactly) is redistributed
  //     through P_{k−1} — the distribution still sums to 1 per seen
  //     context, exactly as unpruned KN does. pn = ptot = 0 reduces
  //     γ to the unpruned D·nf/tot bit-for-bit.
  // The stored model becomes: PRUNED gram tables (the big win — a
  // web-scale order-5 table is dominated by singletons, Good–Turing
  // n1 ≈ 50% of types) + per-context rollups keyed on (k−1)-grams
  // (bounded by the order-(k−1) table, the already-small side) + the
  // per-order anchored discounts + T. Unlike the unpruned model the
  // rollups must persist (they can no longer be re-derived from the
  // pruned grams), which is why [[PrunedKnModel]] carries them
  // explicitly; every table keeps its natural scoring-join key, so the
  // bucketed-persistence lifecycle applies unchanged.
  // ------------------------------------------------------------------

  /** A pruned order-n KN model: `grams(k)` are the θ_k-pruned count
    * tables (k = 1..n; order 1 never prunes — it is the interpolation
    * floor), `ctxs(k)` the per-context rollups with the pruned-mass
    * integers (k = 2..n), `discounts(k)` the per-order Chen–Goodman
    * estimates (anchored driver scalars), `t` = |unpruned order-2
    * types|. */
  case class PrunedKnModel(grams: Map[Int, DataFrame],
      ctxs: Map[Int, DataFrame], discounts: Map[Int, Double], t: Long)

  /** Train an order-n KN model with per-order minimum-count pruning:
    * entries with `c <= thresholds(k)` are dropped from order k's
    * stored gram table AFTER every statistic (adjusted lower-order
    * counts, count-of-counts discounts, context rollups, T) is taken
    * from the unpruned ladder — the Heafield et al. 2013 discipline.
    * `thresholds(1)` must be 0 (KenLM refuses unigram pruning for the
    * same reason: the continuation unigram is the interpolation
    * floor). The full ladder is pinned once ([[knCounts]] pin = true)
    * and each derived table reads it as blocks; the UNPRUNED top-order
    * table never persists — at scale it exists only as the shuffle
    * feeding these aggregations. */
  def knCountsPruned(corpus: DataFrame, idCol: String, textCol: String,
      n: Int, thresholds: Int => Long): PrunedKnModel = {
    require(n >= 2, s"order must be >= 2, got $n")
    require(thresholds(1) == 0L,
      s"unigram pruning is not allowed (got threshold ${thresholds(1)}); " +
        "the continuation unigram is the interpolation floor")
    (2 to n).foreach(k => require(thresholds(k) >= 0L,
      s"threshold($k) must be >= 0, got ${thresholds(k)}"))
    val full = knCounts(corpus, idCol, textCol, n, pin = true)
    // one action for all per-order discounts AND T (was n actions)
    val (ds, types) = discountStats(full, 2 to n)
    val t = types(2)
    val ctxs = (2 to n).map { k =>
      val th = thresholds(k)
      k -> full(k).groupBy((1 until k).map(j => col(s"w$j")): _*)
        .agg(sum(col("c")).as("tot"), count(lit(1)).as("nf"),
          sum(when(col("c") <= th, col("c")).otherwise(0L)).as("ptot"),
          sum(when(col("c") <= th, 1L).otherwise(0L)).as("pn"))
    }.toMap
    val grams = (1 to n).map { k =>
      val th = thresholds(k)
      k -> (if (th <= 0L) full(k) else full(k).filter(col("c") > th))
    }.toMap
    PrunedKnModel(grams, ctxs, ds, t)
  }

  /** The per-window scoring stage against a PRUNED model — the
    * [[scoredNgrams]] join ladder with the stored rollups instead of
    * derived ones and the pruned-mass backoff coefficient:
    *   P_k(w|ctx) = max(c_k − D_k, 0)/tot
    *                + (D_k·nf + (ptot − D_k·pn))/tot · P_{k−1}
    * when ctx is seen (c_k = 0 for pruned or unseen grams), P_{k−1}
    * when unseen. ptot − D·pn is the exact pruned discounted mass
    * Σ_{pruned}(c − D) — two stored integers and the anchored D, so
    * the oracle replays it without any floating stored state. Same
    * operation order, 1e-12 floor, and 6dp anchoring as every KN
    * scorer. */
  def scoredNgramsPruned(docs: DataFrame, model: PrunedKnModel,
      idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 2, s"order must be >= 2, got $n")
    require((1 to n).forall(model.grams.contains) &&
      (2 to n).forall(model.ctxs.contains), "model is missing orders")
    require(model.t > 0, "empty model")
    val joined = (2 to n).foldLeft(
      ngramWindows(docs, idCol, textCol, n)
        .join(model.grams(1)
            .select(col("w1").as(s"w$n"), col("c").as("__nb")),
          Seq(s"w$n"), "left")) { (acc, k) =>
      val gramKeys = (1 to k).map(j => s"w${n - k + j}")
      val ctxKeys = gramKeys.init
      val gram = model.grams(k).select(
        (1 to k).map(j => col(s"w$j").as(s"w${n - k + j}")) :+
          col("c").as(s"__c$k"): _*)
      val ctx = model.ctxs(k).select(
        (1 until k).map(j => col(s"w$j").as(s"w${n - k + j}")) ++
          Seq(col("tot").as(s"__tot$k"), col("nf").as(s"__nf$k"),
            col("ptot").as(s"__ptot$k"), col("pn").as(s"__pn$k")): _*)
      acc.join(gram, gramKeys, "left").join(ctx, ctxKeys, "left")
    }
    val p = (2 to n).foldLeft(
      coalesce(col("__nb").cast("double"), lit(0.0)) /
        lit(model.t.toDouble)) { (pPrev, k) =>
      val d = lit(model.discounts(k))
      when(col(s"__tot$k").isNotNull,
        greatest(coalesce(col(s"__c$k"), lit(0L)).cast("double") - d,
          lit(0.0)) / col(s"__tot$k") +
          (d * col(s"__nf$k").cast("double") +
            (col(s"__ptot$k").cast("double") -
              d * col(s"__pn$k").cast("double"))) / col(s"__tot$k") * pPrev)
        .otherwise(pPrev)
    }
    joined.select(col("id") +: (1 to n).map(k => col(s"w$k")) :+
      anchor6(log10(greatest(p, lit(1e-12)))).as("logp"): _*)
  }

  /** Doc-level rollup over [[scoredNgramsPruned]] — the exact
    * integer-micro-unit mean of [[scoreWithKnCounts]]. */
  def scoreWithPrunedModel(docs: DataFrame, model: PrunedKnModel,
      idCol: String, textCol: String, n: Int): DataFrame =
    scoredNgramsPruned(docs, model, idCol, textCol, n)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_ngrams"),
        anchor6(sum(round(col("logp") * 1e6).cast("long")).cast("double")
          / lit(1e6) / count(lit(1))).as("avg_logp"))
}
