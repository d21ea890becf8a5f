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
    val t = toks(col(textCol))
    df.select(col(idCol).as("id"), t.as("__t"))
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
  def bigramModel(corpus: DataFrame, idCol: String,
      textCol: String): (DataFrame, DataFrame, DataFrame) = {
    val big = bigrams(corpus, idCol, textCol)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
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
    * aggregate). Three equi-joins + one doc-keyed aggregation. */
  def scoreWithModel(docs: DataFrame, big: DataFrame, ctx: DataFrame,
      cont: DataFrame, t: Long, idCol: String, textCol: String,
      discount: Double = 0.75): DataFrame =
    scoredBigrams(docs, big, ctx, cont, t, idCol, textCol, discount)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        anchor6(avg(col("logp"))).as("avg_logp"))

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
}
