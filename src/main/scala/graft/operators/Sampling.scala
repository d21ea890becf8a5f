package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and splitting — the
  * train/valid/test primitive of an LLM-data pipeline.
  *
  * `rand()`-based sampling is seed- and partitioning-dependent;
  * content-hash bucketing is not: the same row lands in the same split
  * on any cluster, any partitioning, any engine that computes md5 the
  * same way (which is what makes it DuckDB-oracle-able — and, in
  * production, what makes a 100 TB split reproducible across reruns and
  * incremental appends). */
object Sampling {

  /** 16-way bucket id from the first hex nibble of md5(key). */
  def hashBucket16(key: Column): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, 1), 16, 10)
      .cast("int")

  /** 256-way bucket id from the first hex byte of md5(key) — for rates
    * finer than 1/16 (a crawl-vs-rare-language ratio is often 100x+). */
  def hashBucket256(key: Column): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, 2), 16, 10)
      .cast("int")

  /** Keep rows whose bucket < keep16 (keep16/16 sampling fraction). */
  def sampleByHash(df: DataFrame, key: Column, keep16: Int): DataFrame =
    df.filter(hashBucket16(key) < keep16)

  /** Labeled train/valid/test split: buckets [0, train16) → train,
    * [train16, train16+valid16) → valid, rest → test. */
  def split(df: DataFrame, key: Column, train16: Int, valid16: Int): DataFrame =
    df.withColumn("split",
      when(hashBucket16(key) < train16, "train")
        .when(hashBucket16(key) < train16 + valid16, "valid")
        .otherwise("test"))

  /** Stratified deterministic sampling: a per-stratum keep rate (in
    * sixteenths), defaulting for unlisted strata — the "oversample
    * rare languages, downsample the crawl" mix knob. Same content-hash
    * determinism as [[sampleByHash]], so the mix is reproducible across
    * engines and reruns. */
  def sampleByHashStratified(df: DataFrame, key: Column, strataCol: Column,
      keep16ByStratum: Map[String, Int], default16: Int): DataFrame = {
    val rate = keep16ByStratum.foldLeft(lit(default16)) {
      case (acc, (stratum, k)) => when(strataCol === stratum, k).otherwise(acc)
    }
    df.filter(hashBucket16(key) < rate)
  }

  /** Temporal train/holdout split: rows at or before the fraction-`q`
    * timestamp cutoff → train, later rows → test. A HASH split of
    * time-series data leaks the future into training (a model scored
    * on the test split has already seen temporally-interleaved
    * neighbors); the time-ordered split is the leakage-safe form for
    * forecasting-shaped tasks — the time-axis sibling of the
    * cluster-level q_leakage_safe_split.
    *
    * The cutoff is the exact `q`-quantile of `tsCol`, computed IN-PLAN
    * and broadcast back as a one-row aggregate (the `Events.decayedSum`
    * anchor pattern) — no driver action, no second scan of anything
    * but the one-row join build side. Floored to whole seconds so the
    * boundary is engine-portable (linear-interpolation quantiles agree
    * across engines only up to float ulps; a second-granularity floor
    * absorbs that). Exact percentile buffers the column being split
    * ONCE in one aggregation — acceptable for a per-dataset constant;
    * swap `approx_percentile` in when even that pass is too much (the
    * cutoff then shifts within sketch error, uniformly for all rows).
    */
  def temporalSplit(df: DataFrame, tsCol: Column, q: Double): DataFrame = {
    require(q > 0.0 && q < 1.0, s"split fraction must be in (0,1): $q")
    // integer `div`, never float-divide-then-cast: Spark truncates a
    // double→long cast, DuckDB rounds — the one-second boundary row
    // would differ between engines
    val cutoff = df
      .agg(floor(percentile(unix_micros(tsCol), lit(q))).as("__cut_us"))
      .select(expr("__cut_us div 1000000").as("__cut_s"))
    df.withColumn("__us", unix_micros(tsCol))
      .crossJoin(broadcast(cutoff))
      .withColumn("split",
        when(expr("__us div 1000000") <= col("__cut_s"), "train")
          .otherwise("test"))
      .drop("__us", "__cut_s")
  }

  /** 32-bit uniform in [0, 1) from the first 8 hex chars of md5(key) —
    * the finer-grained sibling of [[hashBucket256]] for per-row keep
    * probabilities. */
  def hashUniform(key: Column): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long").cast("double") / lit(4294967296.0)

  /** Weighted Bernoulli sampling, deterministic: keep a row iff
    * `hashUniform(key) < min(1, weight * scale)` — P(keep) proportional
    * to the row's weight (e.g. token count), capped at 1. The
    * content-hash uniform makes the sample reproducible across engines,
    * reruns, partitionings, and incremental appends: a row's fate
    * depends only on its key. One codegen'd filter, no shuffle, no
    * state — the 100 TB-friendly way to downsample by importance
    * (length-weighted, quality-weighted) without a global pass. */
  def weightedSampleByHash(df: DataFrame, key: Column, weight: Column,
      scale: Double): DataFrame =
    df.filter(hashUniform(key) < least(lit(1.0), weight.cast("double") * scale))

  /** EXACT-size weighted sample without replacement (Efraimidis &
    * Spirakis' A-ES priorities — public algorithm), deterministic: each
    * row's priority is `ln(u)/w` with `u` an md5-derived uniform in
    * (0, 1) (the `+0.5` offset keeps u strictly positive, so ln is
    * finite), and the `n` LARGEST priorities win — distributionally
    * the weighted without-replacement draw, where [[weightedSampleByHash]]
    * only hits the target size in expectation. Priorities are anchored
    * `floor(x·1e6 + 0.5)/1e6` (the portable idiom — ln may differ by an
    * ulp across libm implementations) with the key as tiebreak, so the
    * sample is a pure function of (keys, weights, salt).
    *
    * A-ES is defined over strictly positive weights (`ln(u)/0` is
    * −∞; a NEGATIVE weight flips ln(u) positive and would
    * deterministically dominate the top-n — silently wrong, not just
    * degenerate), so non-positive-weight rows are dropped up front:
    * P(draw) ∝ w means w ≤ 0 rows are unsampleable by definition, and
    * an explicit filter beats both a silent wrong answer and a
    * data-dependent runtime failure.
    *
    * Scale shape: one codegen'd projection + TakeOrderedAndProject —
    * no full shuffle: each partition locally top-n's, then up to n rows
    * PER PARTITION converge on the single take-ordered reducer, which
    * emits the final n. Output carries the priority in `es_priority`. */
  def weightedSampleExact(df: DataFrame, key: Column, weight: Column,
      n: Int, salt: String = "es"): DataFrame = {
    require(n > 0)
    val u = (conv(substring(md5(
        concat(key.cast("string"), lit(":" + salt)).cast("binary")),
        1, 8), 16, 10).cast("long").cast("double") + lit(0.5)) /
      lit(4294967296.0)
    df.filter(weight.cast("double") > 0)
      .withColumn("es_priority",
        floor(log(u) / weight.cast("double") * 1e6 + 0.5) / 1e6)
      .orderBy(desc("es_priority"), key.asc)
      .limit(n)
  }

  /** [[weightedSampleExact]] PER GROUP: exactly `n` rows from every
    * group, drawn weighted-without-replacement by the same
    * deterministic A-ES priorities (anchored `ln(u)/w`, key tiebreak;
    * non-positive weights dropped up front — same precondition). The
    * stratified form of the exact draw — "exactly 100 docs per
    * language, length-weighted" — where [[bottomKPerGroup]] draws
    * uniformly. One shuffle on the group key; Spark rewrites the
    * rank filter into a per-partition WindowGroupLimit, so only ~n
    * rows per group per partition reach the exchange. Output carries
    * `es_priority` and the 1-based `sample_rank` within the group. */
  def weightedSampleExactPerGroup(df: DataFrame, groupCol: Column,
      key: Column, weight: Column, n: Int,
      salt: String = "es"): DataFrame = {
    require(n > 0)
    val u = (conv(substring(md5(
        concat(key.cast("string"), lit(":" + salt)).cast("binary")),
        1, 8), 16, 10).cast("long").cast("double") + lit(0.5)) /
      lit(4294967296.0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(desc("es_priority"), key.asc)
    df.filter(weight.cast("double") > 0)
      .withColumn("es_priority",
        floor(log(u) / weight.cast("double") * 1e6 + 0.5) / 1e6)
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= n)
  }

  /** Exactly-k-per-group deterministic sample: the k rows whose
    * `md5(key)` sorts lowest within each group — a uniform
    * without-replacement sample whose membership is a pure function of
    * the keys, so it's stable across engines, reruns, partitionings,
    * and (unlike a rate-based sample) has a FIXED size per group.
    * One shuffle on the group key; Spark rewrites the rank-filter into
    * a per-partition group-limit (WindowGroupLimit) so only ~k rows per
    * group per partition reach the exchange. The eyeball-a-fixed-
    * sample-per-stratum primitive for corpus QA at any scale. */
  def bottomKPerGroup(df: DataFrame, groupCol: Column, key: Column,
      k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(md5(key.cast("string").cast("binary")).asc, key.asc)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .withColumnRenamed("__rk", "sample_rank")
  }

  /** Class-parity downsampling: every label keeps exactly as many rows
    * as the RAREST label, chosen as the lowest-md5 members (the
    * [[bottomKPerGroup]] order) — the classifier-training balance step.
    * The per-label quota is derived from the data in the same plan (a
    * label-cardinality aggregate broadcast back), so the operator is a
    * single label-keyed shuffle plus a bounded broadcast — no driver
    * round-trip, no second scan. Deterministic: membership is a pure
    * function of the keys, stable across engines and partitionings. */
  def balanceLabels(df: DataFrame, labelCol: Column, key: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(labelCol).orderBy(md5(key.cast("string").cast("binary")).asc, key.asc)
    val minN = df.groupBy(labelCol).agg(count(lit(1)).as("__n"))
      .agg(min(col("__n")).as("__mn"))
    df.withColumn("__rk", row_number().over(w))
      .crossJoin(broadcast(minN))
      .filter(col("__rk") <= col("__mn"))
      .drop("__rk", "__mn")
  }

  /** Token-budget mix rebalancing: sample every stratum down (by
    * content hash, in 256ths) so no stratum contributes more than
    * ~the smallest stratum's token total — the equal-share data-mix
    * primitive. Rates are derived FROM the data in the same plan (two
    * bounded aggregations + a broadcast join; `256·min/total` in exact
    * integer arithmetic, so the oracle reproduces it bit-for-bit); the
    * smallest stratum keeps all 256 buckets by construction, and every
    * stratum keeps AT LEAST one bucket — a >256x dominant stratum is
    * clamped to a 1/256 sample rather than silently dropped (the
    * sixteenths granularity of [[hashBucket16]] would floor a >16x
    * stratum to zero). Rows with a NULL stratum are EXCLUDED from both
    * the rate computation and the output (a null group would otherwise
    * poison the min() while its own rows vanish in the join). */
  def rebalanceByTokens(df: DataFrame, key: Column, strataCol: Column,
      nTokensCol: Column): DataFrame = {
    val rows = df.withColumn("__stratum", strataCol)
      .withColumn("__n_tokens", nTokensCol.cast("long"))
      .filter(col("__stratum").isNotNull)
    val totals = rows.groupBy(col("__stratum"))
      .agg(sum(col("__n_tokens")).as("__t"))
    val target = totals.agg(min(col("__t")).as("__tmin"))
    val rates = totals.crossJoin(broadcast(target))
      .select(col("__stratum"),
        greatest(expr("(256 * __tmin) div __t"), lit(1L))
          .cast("int").as("__keep256"))
    rows.join(broadcast(rates), Seq("__stratum"))
      .filter(hashBucket256(key) < col("__keep256"))
      .drop("__stratum", "__n_tokens", "__keep256")
  }

  /** Target-share mixing: downsample so surviving token shares hit an
    * EXPLICIT mixture (integer `parts`, e.g. en→2, zh→1 = 2:1) at the
    * maximum achievable total — the third mixing primitive alongside
    * equal-share ([[rebalanceByTokens]]) and temperature
    * ([[temperatureMix]]), and the one an actual training-mix spec
    * compiles to ("50% web, 30% code, 20% books").
    *
    * The achievable total is bounded per stratum by kept_d ≤ t_d: with
    * scaled capacity S_d = (t_d·P) div p_d (P = Σ parts), the binding
    * stratum sets T* = min_d S_d and every stratum keeps
    * (256·T*) div S_d buckets (≤ 256; the binding stratum keeps all
    * 256) — ALL exact integer arithmetic (`div`), so the oracle replays
    * membership bit-for-bit, and the factored form keeps every
    * intermediate under 2^63 at 100 TB (S ~ tokens·P ≤ 2^54, 256·T* ≤
    * 2^62 — the naive 256·p·T* crosses 2^63). Strata not in `parts`
    * are excluded (part 0 — the mix spec IS the filter). Same plan
    * shape as the siblings: one bounded aggregation, a broadcast rate
    * join, a hash filter. 100 TB cost: one stratum-keyed pass + a
    * scan-bound filter. */
  def targetMix(df: DataFrame, key: Column, strataCol: Column,
      nTokensCol: Column, parts: Map[String, Int]): DataFrame = {
    require(parts.nonEmpty && parts.values.forall(_ > 0),
      "parts must be positive")
    val total = parts.values.sum
    val partExpr = parts.foldLeft(lit(null).cast("long")) {
      case (acc, (stratum, p)) => when(col("__stratum") === stratum, p.toLong)
        .otherwise(acc)
    }
    val rows = df.withColumn("__stratum", strataCol)
      .withColumn("__n_tokens", nTokensCol.cast("long"))
      .withColumn("__p", partExpr)
      .filter(col("__p").isNotNull)
    val capacities = rows.groupBy(col("__stratum"), col("__p"))
      .agg(sum(col("__n_tokens")).as("__t"))
      .withColumn("__s", expr(s"(__t * ${total}L) div __p"))
    val tstar = capacities.agg(min(col("__s")).as("__tstar"))
    val rates = capacities.crossJoin(broadcast(tstar))
      .select(col("__stratum"),
        greatest(expr("(256L * __tstar) div __s"), lit(1L))
          .cast("int").as("__keep256"))
    rows.join(broadcast(rates), Seq("__stratum"))
      .filter(hashBucket256(key) < col("__keep256"))
      .drop("__stratum", "__n_tokens", "__p", "__keep256")
  }

  /** Temperature-based domain mixing at α = ½: downsample each stratum
    * so the surviving token shares are ∝ (natural share)^α — the
    * mixture-reweighting rule of the large-LM pretraining recipes
    * (sample domains proportionally to p^α, α < 1 flattens the mix so
    * the head domain stops drowning the tail without equalizing shares
    * outright the way [[rebalanceByTokens]] does). Keep rate per
    * stratum is √(t_min/t) — the rarest stratum keeps everything, a
    * stratum with 100× its tokens keeps ~1/10 — clamped to ≥ 1/256 so
    * no stratum is silently dropped.
    *
    * α is FIXED at ½ because the rate must be a pure function both
    * engines compute bit-identically: IEEE-754 requires `sqrt` (like
    * `/`) to be correctly rounded, so `floor(256·√(t_min/t))` cannot
    * straddle an integer across engines — whereas `pow(x, α)` for
    * general α carries a ≥1-ulp libm tolerance (Java Math.pow vs
    * DuckDB's C pow) that could flip the floor and silently change the
    * sample. Other temperatures that are dyadic sqrt-chains (¼, ¾)
    * would extend the same way. Same null-stratum exclusion and
    * plan shape as [[rebalanceByTokens]]: two bounded aggregations,
    * one broadcast join, membership a pure function of the key. */
  def temperatureMix(df: DataFrame, key: Column, strataCol: Column,
      nTokensCol: Column): DataFrame = {
    val rows = df.withColumn("__stratum", strataCol)
      .withColumn("__n_tokens", nTokensCol.cast("long"))
      .filter(col("__stratum").isNotNull)
    val totals = rows.groupBy(col("__stratum"))
      .agg(sum(col("__n_tokens")).as("__t"))
    val target = totals.agg(min(col("__t")).as("__tmin"))
    val rates = totals.crossJoin(broadcast(target))
      .select(col("__stratum"),
        greatest(
          floor(lit(256.0) * sqrt(col("__tmin").cast("double") /
            col("__t").cast("double"))),
          lit(1L)).cast("int").as("__keep256"))
    rows.join(broadcast(rates), Seq("__stratum"))
      .filter(hashBucket256(key) < col("__keep256"))
      .drop("__stratum", "__n_tokens", "__keep256")
  }

  private def anchor6d(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
  private def micro6(x: Double): Long = math.round(x * 1e6)

  /** DoReMi-style domain-mixture OPTIMIZATION (Xie et al., NeurIPS
    * 2023 "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
    * Pretraining" — published algorithm): exponentiated-gradient
    * ascent on the domain simplex, upweighting the domains where the
    * supplied loss is worst, with the paper's RUNNING AVERAGE of the
    * iterates as the output mixture. Generalized to a SUPPLIED per-row
    * loss column (the paper recomputes proxy-model losses between
    * steps while training — the EG update + averaging, the part that
    * DECIDES the mixture, is this operator; any quality/perplexity
    * score the pipeline already has plugs in, e.g. the KN-LM
    * `avg_logp` negated).
    *
    * Per step t: u_d = α_{t-1,d} · exp(η · L_d), α_t = u / Σu; output
    * weight_d = mean over steps of α_{t,d}; keep256_d scales weights
    * into downsample-only rates relative to the NATURAL token shares
    * (rate ∝ weight/share, the largest ratio keeps everything — the
    * [[temperatureMix]] membership discipline, so application is the
    * same broadcast-rates + md5-bucket filter).
    *
    * Determinism/portability (the DuckDB-oracle contract): the
    * per-domain mean loss sums the (6dp-ANCHORED — precondition, all
    * house score columns are) losses as exact integer micro-units;
    * every α and u is 6dp-anchored as computed, so each step's
    * normalizer Σu is an exact long sum of micro-units and the one
    * libm call (`exp`, ±1 ulp across engines) is absorbed by the
    * anchor exactly like `ln`/`log10` in the A-ES/KN operators.
    *
    * Scale shape: ONE stratum-keyed map-side-combined aggregation over
    * the corpus; the EG loop is driver-local over the BOUNDED domain
    * table (O(domains) rows — a mixture over more than ~10k domains is
    * no longer a mixture; guarded), O(domains · steps) scalar work.
    * Output: `(domain, n_docs, sum_tokens, mean_loss, weight,
    * keep256)`, one row per domain. */
  def doremiWeights(df: DataFrame, strataCol: Column, lossCol: Column,
      nTokensCol: Column, eta: Double = 0.5, steps: Int = 4): DataFrame = {
    require(eta > 0, s"eta must be positive, got $eta")
    require(steps >= 1, s"steps must be >= 1, got $steps")
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df.withColumn("__stratum", strataCol.cast("string"))
      .filter(col("__stratum").isNotNull)
      .withColumn("__loss", lossCol.cast("double"))
      .withColumn("__n_tokens", nTokensCol.cast("long"))
    val dom = rows.groupBy(col("__stratum"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__n_tokens")).as("sum_tokens"),
        sum(round(col("__loss") * 1e6).cast("long")).as("__lm"))
      .collect()
      .map { r =>
        // null aggregate sums (an all-null loss or token column) would
        // otherwise surface as an opaque NPE at getLong; a zero-token
        // domain would divide its way to Infinity rates that silently
        // clamp to keep256 = 1 — both are caller data bugs, named here
        val name = r.getString(0)
        require(!r.isNullAt(2) && !r.isNullAt(3),
          s"doremiWeights: domain '$name' has all-null " +
            s"${if (r.isNullAt(3)) "loss" else "token"} values — " +
            "losses and token counts must be non-null")
        val st = r.getLong(2)
        require(st > 0,
          s"doremiWeights: domain '$name' has sum_tokens = $st — every " +
            "domain needs a positive token mass for a rate to exist")
        (name, r.getLong(1), st, r.getLong(3))
      }
      .sortBy(_._1)
    require(dom.nonEmpty, "doremiWeights: no non-null domains")
    require(dom.length <= 10000,
      s"doremiWeights: ${dom.length} domains — not a mixture; bucket first")
    val nDom = dom.length
    val meanLoss = dom.map { case (_, nDocs, _, lm) =>
      anchor6d(lm.toDouble / 1e6 / nDocs)
    }
    var alpha = Array.fill(nDom)(anchor6d(1.0 / nDom))
    val avgMicro = Array.fill(nDom)(0L)
    for (_ <- 1 to steps) {
      val u = Array.tabulate(nDom)(d =>
        anchor6d(alpha(d) * math.exp(eta * meanLoss(d))))
      val zMicro = u.map(micro6).sum
      alpha = Array.tabulate(nDom)(d =>
        anchor6d(u(d) / (zMicro.toDouble / 1e6)))
      for (d <- 0 until nDom) avgMicro(d) += micro6(alpha(d))
    }
    val weight = Array.tabulate(nDom)(d =>
      anchor6d(avgMicro(d).toDouble / 1e6 / steps))
    val totTokens = dom.map(_._3).sum
    val rate = Array.tabulate(nDom)(d =>
      weight(d) / (dom(d)._3.toDouble / totTokens.toDouble))
    val rMax = rate.max
    dom.indices.map { d =>
      val (name, nDocs, sumTokens, _) = dom(d)
      (name, nDocs, sumTokens, meanLoss(d), weight(d),
        math.max(math.floor(256.0 * (rate(d) / rMax)).toLong, 1L).toInt)
    }.toDF("domain", "n_docs", "sum_tokens", "mean_loss", "weight",
      "keep256")
  }

  /** Apply a [[doremiWeights]] mixture: keep rows whose md5 bucket
    * falls under their domain's optimized rate — the same broadcast
    * keep-rates + hash-membership shape as [[temperatureMix]] /
    * [[targetMix]], so membership is a pure function of the key
    * (reproducible across reruns, appends, engines). */
  def doremiMix(df: DataFrame, key: Column, strataCol: Column,
      lossCol: Column, nTokensCol: Column, eta: Double = 0.5,
      steps: Int = 4): DataFrame = {
    val rates = doremiWeights(df, strataCol, lossCol, nTokensCol, eta, steps)
      .select(col("domain").as("__stratum"), col("keep256").as("__keep256"))
    df.withColumn("__stratum", strataCol.cast("string"))
      .filter(col("__stratum").isNotNull)
      .join(broadcast(rates), Seq("__stratum"))
      .filter(hashBucket256(key) < col("__keep256"))
      .drop("__stratum", "__keep256")
  }
}
