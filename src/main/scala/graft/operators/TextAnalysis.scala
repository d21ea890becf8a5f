package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data pipelines, over a string column.
  *
  * All column functions here are built from `org.apache.spark.sql.
  * functions._` higher-order array functions (codegen'd, no UDFs), so a
  * 100 TB documents scan stays a single whole-stage-codegen'd pass:
  * tokenize once, derive every feature from the token array.
  *
  * The reference has no text operators — its word-count example
  * (`example.py:22-29`) is the closest thing, and [[tokens]] matches its
  * whitespace tokenization semantics.
  */
object TextAnalysis {

  /** Whitespace tokens, empties dropped (python `str.split()` semantics,
    * reference `example.py:24`). */
  def tokens(c: Column): Column =
    filter(split(c, "\\s+"), t => t =!= "")

  /** BPE-ish subword-boundary tokens: alpha runs, digit runs, and
    * single punctuation marks — a cheap deterministic proxy for a real
    * BPE vocab (tokenizer libs aren't in this container). */
  def bpeishTokens(c: Column): Column =
    regexp_extract_all(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  def tokenCount(c: Column): Column = size(tokens(c))

  /** English-ish stopwords used for quality ratio + language ID. */
  val StopwordsEn: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that", "for", "on", "with")
  val StopwordsDe: Seq[String] =
    Seq("der", "die", "das", "und", "ist", "von", "mit", "ein", "eine", "nicht")
  val StopwordsFr: Seq[String] =
    Seq("le", "les", "et", "des", "une", "est", "dans", "pour", "que", "qui")
  val StopwordsEs: Seq[String] =
    Seq("el", "los", "las", "y", "una", "es", "en", "por", "como", "pero")

  /** Stopword-hit count via the native codegen'd
    * [[graft.functions.CountInExpr]] (duplicates counted). The
    * previous `size(filter(toks, isInCollection))` form went through a
    * higher-order function — CodegenFallback, one interpreted lambda
    * per token per list; the language-ID screen runs four lists per
    * doc, which made the quality gate the hot scan of every curation
    * composition (q_curation_summary's 5s at sf0.1 was mostly this).
    * `lowercase = true` folds the equally-interpreted
    * `transform(toks, lower)` pre-pass into the same loop
    * (`UTF8String.toLowerCase` — the identical lowering `lower` does). */
  private def countIn(toks: Column, words: Seq[String],
      lowercase: Boolean = false): Column =
    org.apache.spark.sql.graft.GraftColumns.column(
      graft.functions.CountInExpr(
        org.apache.spark.sql.graft.GraftColumns.expression(toks),
        words, lowercase))

  /** Quality features: char/token counts, mean token length, stopword
    * ratio, alphanumeric ratio. NULL-free doubles rounded to 6 so the
    * DuckDB oracle hash-matches. */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    df.withColumn("toks", toks)
      .withColumn("n_chars_calc", length(col(textCol)).cast("long"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("avg_token_len",
        round(aggregate(col("toks"), lit(0L), (acc, t) => acc + length(t))
          .cast("double") / greatest(col("n_tokens"), lit(1L)), 6))
      .withColumn("stopword_ratio",
        round(countIn(col("toks"), StopwordsEn).cast("double") /
          greatest(col("n_tokens"), lit(1L)), 6))
      .withColumn("alnum_ratio",
        round(length(regexp_replace(col(textCol), "[^A-Za-z0-9]", ""))
          .cast("double") / greatest(col("n_chars_calc"), lit(1L)), 6))
      .drop("toks")
  }

  /** Heuristic language ID: stopword-hit argmax over {en, de, fr, es}
    * with a fixed tie-break order (en > de > fr > es), 'und' when no
    * list hits. Deterministic — mirrored exactly by the DuckDB oracle.
    */
  def langId(textCol: Column): Column =
    langIdFromTokens(tokens(lower(textCol)))

  /** [[langId]] over ALREADY-LOWERCASED, already-materialized tokens —
    * for fused single-tokenization pipelines (Catalyst does not CSE a
    * repeated split(), see [[wordNgrams]]). Lowercasing per token
    * inside the count loop (`lowercaseInCount = true`) is identical to
    * tokenizing `lower(text)`: lowercasing never creates or removes
    * whitespace — and it replaces the interpreted
    * `transform(toks, lower)` pre-pass callers used to need. */
  def langIdFromTokens(toksLower: Column,
      lowercaseInCount: Boolean = false): Column = {
    val en = countIn(toksLower, StopwordsEn, lowercaseInCount)
    val de = countIn(toksLower, StopwordsDe, lowercaseInCount)
    val fr = countIn(toksLower, StopwordsFr, lowercaseInCount)
    val es = countIn(toksLower, StopwordsEs, lowercaseInCount)
    when(en === 0 && de === 0 && fr === 0 && es === 0, "und")
      .when(en >= de && en >= fr && en >= es, "en")
      .when(de >= fr && de >= es, "de")
      .when(fr >= es, "fr")
      .otherwise("es")
  }

  /** Hashed character-n-gram count features — the fastText-style
    * featurizer (Joulin et al. 2016: language ID and text
    * classification over hashed char-ngram bags): every char n-gram of
    * the lowercased text hashes into one of `dim` buckets
    * (md5-derived, the [[Dedup.md5Hash60]] family DuckDB replays
    * exactly), bucket counts normalize by the doc's total n-gram count
    * and round to 6 decimals — a dense `array<double>` feature vector
    * ready for [[Classification.trainLogReg]]. Output: `id`, any
    * `carry` columns verbatim, `features`.
    *
    * Pure projection — no explode, no shuffle, scan-bound: the
    * native [[graft.functions.CharNgramFeaturesExpr]] builds the
    * whole vector in one codegen'd O(chars + dim) histogram loop, one
    * md5 per n-gram. (The earlier SQL-composed form ran `dim`
    * interpreted `filter` passes over a per-position bucket array —
    * higher-order functions are CodegenFallback — O(chars·dim)
    * interpreted lambda calls per doc, measured as 7.1s of each
    * lang-ID query's ~6s at sf0.1. Same math bit-for-bit: the DuckDB
    * oracles' replay chain is unchanged.)
    * Multibyte-safe: both engines index substrings by code point and
    * md5 the UTF-8 bytes, so CJK text hashes identically. */
  def charNgramHashFeatures(df: DataFrame, idCol: String, textCol: String,
      n: Int = 2, dim: Int = 32, carry: Seq[String] = Nil): DataFrame = {
    require(n > 0 && dim > 0, "need n > 0 and dim > 0")
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select((col(idCol).as("id") +: carry.map(col)) :+
        lower(coalesce(col(textCol), lit(""))).as("__t"): _*)
      .withColumn("features", expr(s"char_ngram_features(__t, $n, $dim)"))
      .drop("__t")
  }

  /** TRAINED language ID — the upgrade path from the [[langId]]
    * stopword screen: one-vs-rest logistic regression per language
    * over [[charNgramHashFeatures]] hashed char-bigram features (the
    * fastText recipe at its linear core), trained in-plan by
    * [[Classification.trainLogReg]] against the labeled `langCol`,
    * prediction = argmax of the per-language UNROUNDED margins —
    * monotone-equivalent to the sigmoid argmax but immune to 6dp
    * sigmoid saturation (ties break to the earlier language in
    * `langs` — a fixed total order).
    * Output: `id`, one `s_<lang>` score column (6dp) per language,
    * `lang_pred`.
    *
    * Fully value-oracled: the features are md5/round-portable and the
    * GD trajectory is 6-decimal-anchored per step, so DuckDB replays
    * every model's weights exactly (the q_lr_train_score recipe ×
    * |langs|). Scale shape: training cost is |langs| × steps bounded
    * aggregation jobs over the feature table (at 100 TB you train on
    * a labeled SAMPLE — the standard fastText recipe — and the
    * feature build is a pure projection); scoring is one stateless
    * codegen'd projection, identical for batch and streaming. The
    * feature table is eagerly localCheckpoint'ed so the |langs| ×
    * (steps+1) training scans don't recompute the featurization
    * (winnowCrossPairs lifecycle — blocks freed on GC, no
    * session-lifetime pin). */
  def langIdTrained(df: DataFrame, idCol: String, textCol: String,
      langCol: String, langs: Seq[String], steps: Int = 2,
      lr: Double = 10.0, n: Int = 2, dim: Int = 32): DataFrame = {
    require(langs.nonEmpty, "need at least one language")
    val feats = charNgramHashFeatures(df, idCol, textCol, n, dim,
      carry = Seq(langCol)).localCheckpoint(true)
    val models: Seq[(String, Seq[Double])] = langs.map { l =>
      l -> Classification.trainLogReg(feats, "id", "features",
        col(langCol) === l, steps, lr)
    }
    val scored = models.foldLeft(feats) { case (acc, (l, w)) =>
      acc.withColumn(s"__m_$l", graft.functions.VectorDot(
          concat(array(lit(1.0)), col("features")), typedlit(w)))
        .withColumn(s"s_$l",
          round(lit(1.0) / (lit(1.0) + exp(-col(s"__m_$l"))), 6))
    }
    // argmax on the UNROUNDED margins (monotone in the sigmoids), ties
    // to the earlier language in `langs`: confident models saturate
    // every sigmoid to 1.000000 at 6dp, where a rounded-score argmax
    // collapses to the tie-break — the constant-classifier failure
    // Round8Spec pins. The margin's left-to-right VectorDot fold is
    // bit-identical to the oracle's list_sum(list_transform(...)), so
    // the margin comparison stays exactly replayable.
    val pred = langs.zipWithIndex.init.foldRight(lit(langs.last)) {
      case ((l, i), acc) =>
        when(langs.drop(i + 1).map(m => col(s"__m_$l") >= col(s"__m_$m"))
          .reduce(_ && _), lit(l)).otherwise(acc)
    }
    scored.withColumn("lang_pred", pred)
      .select(col("id") +: langs.map(l => col(s"s_$l")) :+
        col("lang_pred"): _*)
  }

  /** SOFTMAX language ID — the calibrated multiclass form of
    * [[langIdTrained]], and the actual fastText recipe: ONE multinomial
    * model ([[Classification.trainSoftmax]]) over the same hashed
    * char-ngram features instead of |langs| independent one-vs-rest
    * sigmoids. The difference matters for the scores, not just
    * elegance: independently-trained sigmoid scores are not comparable
    * across classes (a class whose feature mass concentrates in fewer
    * buckets learns systematically larger margins), while softmax
    * posteriors share one denominator per row and sum to 1 — `p_<lang>`
    * IS the class posterior a downstream mixer can threshold on.
    * Output: `id`, one `p_<lang>` (6dp) per language, `lang_pred` =
    * argmax on the unrounded margins (saturation-proof, ties to the
    * earlier language in `langs`).
    *
    * Fully value-oracled: md5/round-portable features + the
    * 9dp-gradient/6dp-weight anchored trajectory of
    * [[Classification.trainSoftmax]] — DuckDB replays every step with
    * unrolled CTEs sharing one softmax denominator per row. Scale
    * shape: training is `steps` bounded aggregation jobs (K·(dim+1)
    * doubles to the driver per step — ONE job per step, not one per
    * class per step, the concrete win over [[langIdTrained]]'s |langs|
    * separate trainings); scoring is one stateless codegen'd
    * projection, batch/streaming identical. */
  def langIdSoftmax(df: DataFrame, idCol: String, textCol: String,
      langCol: String, langs: Seq[String], steps: Int = 2,
      lr: Double = 10.0, n: Int = 2, dim: Int = 32): DataFrame = {
    require(langs.nonEmpty, "need at least one language")
    // scanned steps (training) + 1 (scoring) times — eager
    // localCheckpoint, blocks freed on GC (the langIdTrained lifecycle)
    val feats = charNgramHashFeatures(df, idCol, textCol, n, dim,
      carry = Seq(langCol)).localCheckpoint(true)
    val ws0 = Classification.trainSoftmax(feats, "id", "features",
      col(langCol), langs, steps, lr)
    // empty corpus: trainSoftmax returns Nil per class; score with the
    // bias-only zero model so the (empty) output keeps its full schema
    // instead of tripping scoreSoftmax's non-empty-weights require
    val ws = if (ws0.exists(_.isEmpty)) ws0.map(_ => Seq(0.0)) else ws0
    Classification.scoreSoftmax(feats, "id", "features", langs, ws,
      predCol = "lang_pred")
  }

  /** Per-document character Shannon entropy (bits/char) — the standard
    * gibberish/boilerplate signal (low entropy = repeated chars or
    * padding, high = random noise). Native Catalyst expression
    * ([[graft.functions.CharEntropy]]): one linear codegen'd pass per
    * row, no explode, no shuffle. Returns 0.0 for empty text. Callers
    * get registration for free via every entry point's
    * `GraftFunctions.register`. */
  def charEntropy(c: Column): Column =
    call_function("char_entropy", c)

  /** Per-document deflate compression ratio (compressed/raw bytes) —
    * the classic repetition/boilerplate quality signal (cf. Gopher's
    * repetition filters): boilerplate and templated text compress far
    * below natural prose. JDK zlib at a fixed level is deterministic,
    * so the score is reproducible across reruns and partitionings.
    *
    * `mapPartitions` is the deliberate escape hatch here (same as the
    * multimodal codecs): the Deflater is native, stateful, and reused
    * across the partition's rows — a per-row UDF would allocate one per
    * document. Map-only, no shuffle; scales embarrassingly. Empty text
    * scores 1.0 (defined incompressible). */
  def compressionRatio(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(6)
        val buf = new Array[Byte](8192)
        it.map { case (id, text) =>
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          var total = 0L
          if (bytes.nonEmpty) {
            deflater.reset()
            deflater.setInput(bytes)
            deflater.finish()
            while (!deflater.finished()) total += deflater.deflate(buf)
          }
          (id, if (bytes.isEmpty) 1.0 else total.toDouble / bytes.length)
        }
      }.toDF("doc_id", "comp_ratio")
  }

  /** HTML → text extraction (trafilatura-lite): drop script/style
    * blocks and comments wholesale (their CONTENT is code, not prose),
    * strip remaining tags, decode the six entities that dominate web
    * text (`&amp;` decoded LAST so `&amp;lt;` cannot double-decode),
    * collapse whitespace. The boilerplate-ingest step that runs before
    * every quality/dedup operator on a crawl.
    *
    * Deliberately regex-chain + literal-replace only: one codegen'd
    * projection, scan-bound at 100 TB, and portable to the oracle —
    * RE2 and Java both support `(?is)` inline flags and lazy
    * quantifiers, and `replace` is literal in both engines. A full
    * HTML5 parser is NOT this operator's job (malformed-markup
    * recovery, DOM pruning, main-content detection are model-shaped
    * problems); this is the deterministic 99% path. */
  def stripHtml(c: Column): Column = {
    // Two separate passes so the close tag must MATCH the open tag
    // (a single alternation regex would swallow `<script>…</style>…`
    // as one block and drop the content after the mismatched close);
    // still backref-free, so RE2/DuckDB-portable
    val noScript = regexp_replace(c,
      "(?is)<script[^>]*>.*?</script\\s*>", " ")
    val noBlocks = regexp_replace(noScript,
      "(?is)<style[^>]*>.*?</style\\s*>", " ")
    val noComments = regexp_replace(noBlocks, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComments, "<[^>]+>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (acc, (ent, ch)) =>
        replace(acc, lit(ent), lit(ch))
      }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Content fingerprint: md5 of the whitespace-normalized, lowercased
    * text — exact-dedup grade. */
  def md5Fingerprint(c: Column): Column =
    md5(trim(regexp_replace(lower(c), "\\s+", " ")).cast("binary"))

  /** Rolling-hash fingerprint via the native [[graft.functions.RollingHash]]
    * Catalyst expression (codegen'd). */
  def rollingHashFingerprint(df: DataFrame, textCol: String): Column = {
    graft.functions.RollingHash.register(df.sparkSession)
    expr(s"rolling_hash($textCol)")
  }

  /** Winnowing fingerprints (Schleimer et al., SIGMOD '03 — the MOSS
    * algorithm): hash every char `k`-gram of the whitespace-normalized
    * text (md5-derived 60-bit ints, the [[graft.operators.Dedup.md5Hash60]]
    * family DuckDB replays exactly), then keep the MINIMUM hash of each
    * sliding window of `window` consecutive k-gram hashes. The selected
    * set is position-independent and guarantees that any shared
    * substring of length ≥ k + window - 1 contributes at least one
    * shared fingerprint — the local-dup detection property rolling a
    * single whole-doc hash ([[rollingHashFingerprint]]) cannot give.
    * Output: (id, fps sorted-distinct array). Docs shorter than
    * k + window - 1 normalized chars have no complete window and are
    * absent.
    *
    * Scale shape: entirely array-local per row (two higher-order
    * transforms, no explode until a caller joins on fingerprints), so
    * the operator itself is a narrow map at any scale; cost is one md5
    * per character position, the price of robust local fingerprints.
    * Density is 2/(window+1) of positions selected (the winnowing
    * paper's expectation), so downstream join fanout shrinks with
    * `window`. */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, window: Int = 4): DataFrame =
    df.select(col(idCol).as("id"),
        trim(regexp_replace(lower(col(textCol)), "\\s+", " ")).as("__s"))
      .filter(length(col("__s")) >= k + window - 1)
      // CRITICAL plan shape: the normalized string and the hash array
      // are LET-BOUND via transform(array(x), v -> ...) so each is
      // computed once per row. Referencing a projected alias from
      // inside a HOF lambda lets the optimizer inline the producing
      // expression into the lambda body, re-evaluating it PER ELEMENT
      // — O(len²) md5+regex per document (observed: minutes per 500
      // docs). The lambda-variable binding evaluates the value exactly
      // once, by construction, independent of optimizer behavior.
      .select(col("id"), expr(
        s"""element_at(transform(array(__s), s ->
           |  element_at(transform(array(
           |      transform(sequence(1, length(s) - ${k - 1}), i ->
           |        cast(conv(substring(md5(cast(substring(s, i, $k) as binary)),
           |                  1, 15), 16, 10) as bigint))), hs ->
           |    array_sort(array_distinct(
           |      transform(sequence(1, size(hs) - ${window - 1}),
           |        j -> array_min(slice(hs, j, $window)))))), 1)), 1)"""
          .stripMargin).as("fps"))

  /** Scale-path winnowing: same selection guarantees and output shape
    * as [[winnowFingerprints]], with the per-position md5 replaced by
    * the native rolling dual-polynomial scan
    * ([[graft.functions.WinnowFpsExpr]]) — one O(len) pass, a handful
    * of integer ops per position (measured: the md5 form's hash scan
    * was the single most expensive stage in the engine at sf0.1). The
    * hash family differs (so fingerprint VALUES differ), but every
    * selection property — density 2/(window+1), shared-substring
    * guarantee, position independence — is family-agnostic, and the
    * polynomial pair is replayed exactly by the DuckDB oracle in
    * 64-bit integer SQL. Prefer this form everywhere; the md5 form
    * remains as the cross-validation reference. */
  def winnowFingerprintsFast(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, window: Int = 4): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    // tiny single-split inputs fan out so the rolling-hash scan — the
    // dominant cost of every winnow path — runs at cluster parallelism
    // (Parallelism scaladoc; a no-op at production input sizes)
    graft.core.Parallelism.fanOut(
        df.select(col(idCol).as("id"), col(textCol).as("__raw")))
      .select(col("id"),
        trim(regexp_replace(lower(coalesce(col("__raw"), lit(""))), "\\s+", " "))
          .as("__s"))
      .filter(length(col("__s")) >= k + window - 1)
      .select(col("id"),
        expr(s"winnow_fps(__s, $k, $window)").as("fps"))
  }

  /** Term frequencies per (id, term): one explode + count. No read-side
    * fan-out — tokenize + explode is cheap per row; the round-16 driver
    * bench measured the fanned form 0.79x on q_tfidf. */
  def termFrequencies(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), col(textCol).as("__raw"))
      .select(col("id"), tokens(col("__raw")).as("__toks"))
      .select(col("id"), explode(col("__toks")).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))

  /** TF-IDF with the smooth idf `ln(N / df)`: two aggregations (term
    * frequencies, document frequencies) joined on term. N is computed
    * IN-PLAN (a one-row count aggregate broadcast onto the df table —
    * the [[graft.operators.Events.decayedSum]] anchor idiom), so
    * building this plan runs no driver job. The term join carries no
    * broadcast hint: a web-scale vocabulary is 10⁸+ terms and a forced
    * broadcast would OOM, while AQE still broadcasts it at runtime
    * whenever it actually fits. */
  def tfIdf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = df.agg(count(lit(1)).cast("double").as("__n"))
    val tf = termFrequencies(df, idCol, textCol)
    val dfreq = tf.groupBy("term").agg(countDistinct(col("id")).as("df"))
    tf.join(dfreq.crossJoin(broadcast(n)), "term")
      .withColumn("tfidf", round(col("tf") * log(col("__n") / col("df")), 6))
      .select(col("id"), col("term"), col("tf"), col("df"), col("tfidf"))
  }

  /** Sparse TF-IDF cosine similarity join: pairs (a < b) with
    * `cos(w_a, w_b) >= threshold` over the documents' TF-IDF weight
    * vectors — the lexical-overlap near-dup signal that, unlike
    * n-gram Jaccard, weighs RARE shared terms heavily and ignores
    * boilerplate. Candidate generation is the inverted-index equi-join
    * on the term (only pairs sharing >= 1 term materialize — the
    * standard sparse similarity-join shape, cf. V-SMART-Join); the dot
    * product accumulates per-term weight PRODUCTS in the same join.
    *
    * Engine-portability: weights are the 6-decimal TF-IDF scaled to
    * integers (`round(tfidf·10⁶)`), and dot products/norms aggregate
    * those integers EXACTLY (decimal accumulator — no float
    * summation-order noise), so the oracle reproduces cosines
    * bit-for-bit from the same integers.
    *
    * `maxTermDf` (0 = off) drops terms with document frequency above
    * the cap from candidate generation AND scoring — the stopword-term
    * join-fanout bound at corpus scale. Unlike the Jaccard cap this
    * changes scores (capped terms leave the vector), which is the
    * standard production trade: ubiquitous terms carry ~zero idf
    * weight anyway. The oracle-checked query runs uncapped. */
  def tfidfCosinePairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, maxTermDf: Long = 0L): DataFrame = {
    // weight table feeds norms + both join sides UNPERSISTED: the
    // weight subtree ends in the term-frequency aggregation's exchange,
    // and identical subtrees below an exchange are materialized ONCE by
    // Spark's ReuseExchange — the expensive tokenize/explode scan is
    // shared across all consumers with no persistence at all. NOT
    // cache() (un-unpersistable here — the result is consumed lazily —
    // so it would pin a CacheManager entry per call until session end:
    // the historical lexicalTopK leak, swept by CacheLifecycleSpec) and
    // NOT localCheckpoint (under AQE, building the checkpoint RDD
    // materializes every shuffle stage — plan building would run jobs,
    // the Round5PlanSpec pin). Callers who want an explicitly
    // materialized weight table compose the FromWeights form.
    val w0 = tfIdf(df, idCol, textCol)
      .select(col("id"), col("term"), col("df"),
        round(col("tfidf") * 1e6).cast("long").as("w"))
    val w = if (maxTermDf <= 0) w0 else w0.filter(col("df") <= maxTermDf)
    val norms = w.groupBy("id")
      .agg(sum((col("w") * col("w")).cast("decimal(38,0)")).as("n2"))
    val prods = w.select(col("term"), col("id").as("a"), col("w").as("wa"))
      .join(w.select(col("term"), col("id").as("b"), col("w").as("wb")),
        Seq("term"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b")
      .agg(sum((col("wa") * col("wb")).cast("decimal(38,0)")).as("dot"))
    prods
      .join(norms.select(col("id").as("a"), col("n2").as("na2")), Seq("a"))
      .join(norms.select(col("id").as("b"), col("n2").as("nb2")), Seq("b"))
      .withColumn("cos", col("dot").cast("double") /
        sqrt(col("na2").cast("double") * col("nb2").cast("double")))
      .filter(col("cos") >= threshold)
      .select(col("a"), col("b"), round(col("cos"), 6).as("cos"))
  }

  /** Incremental (batch-vs-corpus) TF-IDF cosine join: score a NEW
    * ingest batch against an existing corpus — the production shape of
    * [[tfidfCosinePairs]] at 100 TB, where the self-join's Σ df² term
    * fanout is replaced by Σ df_batch·df_corpus (linear in the batch).
    * IDF and document frequencies come from the CORPUS only (the
    * corpus is the model; batch terms unseen in the corpus carry no
    * weight — standard OOV handling, so a batch doc of pure novel
    * vocabulary scores 0 against everything). Same integer-exact
    * arithmetic as the self-join form. */
  def tfidfCosineCrossPairs(batch: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, threshold: Double,
      maxTermDf: Long = 0L, maxTermDfFrac: Double = 0.0): DataFrame = {
    val model = tfidfCorpusModel(corpus, idCol, textCol, maxTermDf, maxTermDfFrac)
    // the weight tables feed norms + the dot-product join UNPERSISTED:
    // each side's subtree ends in the term-frequency aggregation's
    // exchange, so ReuseExchange materializes the expensive
    // tokenize/explode scan once per side — no CacheManager pin (the
    // lexicalTopK leak, swept by CacheLifecycleSpec) and no
    // localCheckpoint (under AQE the checkpoint RDD's construction
    // materializes every shuffle stage, so plan building would run
    // jobs — the Round5PlanSpec pin). REPEATED callers (probe loops,
    // streaming triggers) own materialization by composing
    // tfidfWeights + tfidfCosineCrossFromWeights (the streaming twin
    // graft.streaming.StreamingOps.incrementalTfidfCosine unpersists
    // its cached batch side per trigger).
    val wc = tfidfWeights(termFrequencies(corpus, idCol, textCol), model)
    val wb = tfidfWeights(termFrequencies(batch, idCol, textCol), model)
    tfidfCosineCrossFromWeights(wb, wc, threshold)
  }

  /** Corpus-side TF-IDF model: one row per surviving corpus term with
    * its document frequency and the corpus document count `__n`
    * attached (the one-row broadcast-aggregate idiom — N is in-plan, so
    * building the model runs no driver job). `maxTermDf` (absolute) and
    * `maxTermDfFrac` (fraction of N, resolved in-plan) drop ubiquitous
    * terms from candidate generation AND scoring — the stopword-term
    * join-fanout bound at corpus scale. */
  def tfidfCorpusModel(corpus: DataFrame, idCol: String, textCol: String,
      maxTermDf: Long = 0L, maxTermDfFrac: Double = 0.0): DataFrame = {
    val n = corpus.agg(count(lit(1)).cast("double").as("__n"))
    val dfreq = termFrequencies(corpus, idCol, textCol)
      .groupBy("term").agg(countDistinct(col("id")).as("df"))
      .crossJoin(broadcast(n))
    val capped = if (maxTermDf <= 0) dfreq else dfreq.filter(col("df") <= maxTermDf)
    if (maxTermDfFrac <= 0) capped
    else capped.filter(col("df") <= floor(col("__n") * maxTermDfFrac).cast("long"))
  }

  /** Integer-exact TF-IDF weights for a term-frequency table against a
    * corpus model: `(id, term, w)` with `w = round(round(tf·idf,6)·10⁶)`.
    * The term join is deliberately NOT hint-broadcast: the model is
    * vocabulary-sized (10⁸+ terms at web scale — a forced broadcast is
    * a driver/executor OOM at 100×); AQE still converts it to a
    * broadcast join at runtime when the surviving vocabulary fits. */
  def tfidfWeights(tf: DataFrame, model: DataFrame): DataFrame =
    tf.join(model, "term")
      .select(col("id"), col("term"),
        round(round(col("tf") * log(col("__n") / col("df")), 6) * 1e6)
          .cast("long").as("w"))

  /** Batch-vs-corpus cosine join over PRE-WEIGHTED `(id, term, w)`
    * sides — the caller owns caching/lifecycle (see
    * [[tfidfCosineCrossPairs]]); each side feeds two consumers (its
    * norm and the dot-product join), so uncached inputs compute twice. */
  def tfidfCosineCrossFromWeights(wb: DataFrame, wc: DataFrame,
      threshold: Double): DataFrame = {
    def norms(w: DataFrame): DataFrame = w.groupBy("id")
      .agg(sum((col("w") * col("w")).cast("decimal(38,0)")).as("n2"))
    val prods = wb.select(col("term"), col("id").as("batch_id"), col("w").as("wa"))
      .join(wc.select(col("term"), col("id").as("corpus_id"), col("w").as("wb")),
        Seq("term"))
      .filter(col("batch_id") =!= col("corpus_id"))
      .groupBy("batch_id", "corpus_id")
      .agg(sum((col("wa") * col("wb")).cast("decimal(38,0)")).as("dot"))
    prods
      .join(norms(wb).select(col("id").as("batch_id"), col("n2").as("na2")),
        Seq("batch_id"))
      .join(norms(wc).select(col("id").as("corpus_id"), col("n2").as("nb2")),
        Seq("corpus_id"))
      .withColumn("cos", col("dot").cast("double") /
        sqrt(col("na2").cast("double") * col("nb2").cast("double")))
      .filter(col("cos") >= threshold)
      .select(col("batch_id"), col("corpus_id"),
        round(col("cos"), 6).as("cos"))
  }

  /** BM25 relevance of every document against a fixed query term set —
    * the retrieval-side ranking a RAG/eval pipeline runs over the
    * curated corpus (Robertson et al.'s Okapi BM25):
    * `score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`
    * with `idf = ln((N − df + 0.5)/(df + 0.5) + 1)` (the Lucene form —
    * non-negative for ubiquitous terms).
    *
    * Scale shape: corpus statistics (N, avgdl) are one-row broadcast
    * aggregates computed IN-PLAN; the explode is filtered to QUERY
    * terms before anything shuffles, so the term aggregation and the
    * df table are |query|-bounded regardless of corpus size — one
    * tokenize pass + two tiny aggregations, no vocabulary-sized
    * anything. Per-doc term scores are summed through a sorted bounded
    * array fold (≤ |query| terms per doc), so the float summation
    * ORDER is data-defined and the 6-decimal rounding is engine-portable
    * (the [[graft.operators.Events.decayedSum]] caveat engineered away).
    * Returns (id, bm25, n_matched_terms) for docs matching ≥ 1 term. */
  def bm25Scores(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "need at least one query term")
    val qset = queryTerms.distinct
    val dls = df.select(col(idCol).as("id"),
      tokenCount(col(textCol)).cast("double").as("dl"))
    val stats = dls.agg(count(lit(1)).cast("double").as("__n"),
      avg(col("dl")).as("__avgdl"))
    val tf = df.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("w"))
      .filter(col("w").isInCollection(qset))
      .groupBy("id", "w").agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy("w").agg(count(lit(1)).cast("double").as("df"))
    tf.join(broadcast(dfreq), "w") // |query|-row table: genuinely bounded
      .join(dls, Seq("id"))
      .crossJoin(broadcast(stats))
      .withColumn("__s",
        log((col("__n") - col("df") + 0.5) / (col("df") + 0.5) + 1) *
          col("tf") * (k1 + 1) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("__avgdl"))))
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("w"), col("__s").as("s"))))
        .as("__arr"))
      .select(col("id"),
        round(aggregate(col("__arr"), lit(0.0),
          (acc, x) => acc + x.getField("s")), 6).as("bm25"),
        size(col("__arr")).cast("long").as("n_matched_terms"))
  }

  /** Inverted-index statistics: per term, document frequency, total
    * term count, and the smallest posting id (the full posting-list
    * build is the same shuffle with collect_list instead of min). */
  def invertedIndexStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    termFrequencies(df, idCol, textCol)
      .groupBy("term")
      .agg(countDistinct(col("id")).as("df"),
        sum(col("tf")).as("total_tf"),
        min(col("id")).as("first_id"))

  /** Gopher-style repetition signal: the fraction of word n-grams that
    * are repeats of an earlier n-gram in the same doc
    * (`1 - distinct/total`, 0 for docs shorter than n tokens). High
    * values flag boilerplate/spam — a standard pre-training quality
    * gate. Single codegen'd pass: tokens materialized once, n-grams
    * derived per row, no shuffle at all. NULL text scores as an empty
    * doc (0, 0, 0.0) — without the coalesce, size(null) would emit a
    * plausible-looking (-1, -1, 0.0) row. */
  def repetitionFeatures(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    df.select(col(idCol), tokens(coalesce(col(textCol), lit(""))).as("__toks"))
      .withColumn("__ngrams", ngramsFromTokens(col("__toks"), n))
      .select(col(idCol),
        size(col("__ngrams")).cast("long").as("n_ngrams"),
        size(array_distinct(col("__ngrams"))).cast("long").as("n_distinct"),
        round(when(size(col("__ngrams")) > 0,
          lit(1.0) - size(array_distinct(col("__ngrams"))).cast("double") /
            size(col("__ngrams")))
          .otherwise(0.0), 6).as("rep_ratio"))

  /** Unigram language-model scoring — the classic perplexity-proxy
    * quality gate: train a unigram LM on the corpus itself
    * (`p(w) = count(w) / total`), score each doc by its mean negative
    * log-probability. Low-probability-dense docs are gibberish/noise
    * candidates; unusually LOW scores flag boilerplate.
    *
    * Two shuffles at any scale: one vocabulary-sized term count
    * (map-side combined) and one per-doc re-aggregation. The frequency
    * join carries NO broadcast hint — a web-scale vocabulary is 10⁸+
    * distinct tokens and a forced broadcast is a driver OOM (the same
    * reasoning as [[tfidfWeights]]); AQE broadcasts it at runtime
    * whenever it actually fits. No OOV smoothing is needed because the
    * LM is trained on the scored corpus; to score against a FOREIGN
    * reference LM, pass its freq table in place of the self-computed
    * one. */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("w"))
    val freq = tok.groupBy("w").agg(count(lit(1)).as("c"))
    val tot = freq.agg(sum(col("c")).cast("double").as("t"))
    tok.join(freq, "w")
      .crossJoin(broadcast(tot))
      .groupBy(col("id"))
      .agg(round(avg(-log(col("c") / col("t"))), 6).as("avg_neg_logprob"),
        count(lit(1)).as("n_tokens"))
  }

  /** Consecutive-token bigrams of `textCol` as one row per (id, w1, w2)
    * — the pair stream both the model trainer and the scorer consume.
    * Array-local (`transform` over `sequence`), so the only wide op a
    * caller adds is its own groupBy/join; docs with fewer than two
    * tokens produce no pairs. */
  private def bigramPairs(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    df.select(col(idCol).as("id"), tokens(col(textCol)).as("__t"))
      .filter(size(col("__t")) >= 2)
      // let-bind the token array (the winnowFingerprints idiom) so the
      // tokenizing split runs once per row, not once per pair position
      .select(col("id"), explode(expr(
        "element_at(transform(array(__t), t -> " +
          "transform(sequence(1, size(t) - 1), i -> named_struct(" +
          "'w1', element_at(t, i), 'w2', element_at(t, i + 1)))), 1)"))
        .as("__p"))
      .select(col("id"), col("__p.w1"), col("__p.w2"))

  /** Bigram language-model scoring with add-k smoothing — the
    * KenLM/CCNet-style fluency filter one step up from
    * [[unigramLogProb]]: train bigram/context counts on `corpus`,
    * score each `docs` row by its average negative log-probability
    *   -avg ln( (c(w1,w2)+k) / (c(w1)+k·V) )
    * over its consecutive token pairs (V = corpus vocabulary size, so
    * unseen pairs and unseen contexts degrade to the smoothed floor
    * instead of -inf). Docs with fewer than two tokens score no pairs
    * and are absent from the output.
    *
    * Scale shape: the model is two grouped counts with map-side
    * combine — bigram counts keyed by (w1,w2) and context counts by w1
    * (counted over the same pair stream, so c(w1) is exactly the
    * denominator Σ_w c(w1,w)). Scoring is two left joins on those keys
    * with NO broadcast hint: a web corpus has 10⁹+ distinct bigrams
    * and a forced broadcast is a driver OOM (the [[unigramLogProb]] /
    * [[tfidfWeights]] reasoning); AQE broadcasts whenever the model
    * actually fits. V and k·V ride along as a one-row broadcast
    * aggregate. No UDFs, no driver state — the model never leaves the
    * cluster. */
  def bigramLogProb(docs: DataFrame, corpus: DataFrame, idCol: String,
      textCol: String, addK: Double = 0.5): DataFrame = {
    val cp = bigramPairs(corpus, idCol, textCol)
    val big = cp.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val ctx = cp.groupBy("w1").agg(count(lit(1)).as("c1"))
    val vocab = corpus
      .select(explode(tokens(col(textCol))).as("w"))
      .agg(countDistinct(col("w")).cast("double").as("v"))
    bigramPairs(docs, idCol, textCol)
      .join(big, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("id"),
        (-log((coalesce(col("c2"), lit(0L)) + lit(addK)) /
          (coalesce(col("c1"), lit(0L)) + lit(addK) * col("v")))).as("__nlp"))
      .groupBy(col("id"))
      .agg(round(avg(col("__nlp")), 6).as("avg_neg_logprob"),
        count(lit(1)).as("n_bigrams"))
  }

  /** Deterministic sequence packing: assign docs to fixed-capacity
    * training chunks (`capacity` tokens) by contiguous fill within
    * each `groupCol` partition, ordered by id — the
    * "concat docs into 4k-token training sequences" step of a
    * pre-training pipeline, reproducible across reruns because the
    * order is data-defined (id), not partitioning-defined.
    * A doc spanning a chunk boundary belongs to the chunk where its
    * first token lands. One window (running sum) per group — groups
    * pack independently, so the shuffle is on the group key and skew
    * is bounded by the largest group. */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, capacity: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(idCol))
    df.select(col(idCol), col(groupCol),
        tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .select(col(idCol), col(groupCol), col("n_tokens"),
        floor((col("__cum") - col("n_tokens")) / lit(capacity.toDouble))
          .cast("int").as("chunk_id"))
  }

  /** Best-fit-decreasing sequence packing (Krell et al. 2021 — the
    * published upgrade over [[packSequences]]' contiguous next-fit,
    * which strands up to a full `capacity` of padding per boundary):
    * within each (`groupCol`, shard) cell, docs sort by token count
    * DESCENDING (doc id breaks ties — the deterministic, data-defined
    * order) and each goes into the open chunk with the smallest
    * remaining capacity that still fits, via the codegen'd
    * [[graft.functions.BfdBinIdsExpr]] fold. Oversized docs open their
    * own (never-reused) chunk.
    *
    * Scale shape: packing quality needs the whole cell's length
    * distribution in one place, so each cell materializes as ONE
    * sorted array — bounded by the `shards` knob, which md5-splits
    * every group into deterministic sub-cells (membership a pure
    * function of the id: reproducible across reruns, appends,
    * engines). At 100 TB you size `shards` so a cell is a few hundred
    * thousand docs (the bin-pool quality loss from sharding is
    * negligible — Krell et al. pack per batch for the same reason);
    * the shuffle is one groupBy on (group, shard), skew bounded by
    * cell size by construction. Output: doc id, group, `shard`,
    * `n_tokens`, and the 0-based `chunk_id` unique within its
    * (group, shard) cell. */
  def packSequencesBestFit(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, capacity: Long, shards: Int = 1): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    require(shards >= 1, s"shards must be >= 1, got $shards")
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(col(idCol).as("__id"), col(groupCol).as("__grp"),
        tokenCount(col(textCol)).cast("long").as("__n"),
        (graft.operators.Sampling.hashBucket256(col(idCol)) % shards)
          .as("shard"))
      .groupBy(col("__grp"), col("shard"))
      // struct sorts lexicographically: (−n, id) ascending IS
      // (n desc, id asc) — the BFD "decreasing" order
      .agg(sort_array(collect_list(struct((-col("__n")).as("nn"),
        col("__id").as("id"), col("__n").as("n")))).as("__ds"))
      .withColumn("__bins", graft.functions.BfdBinIds(
        expr("transform(__ds, x -> x.n)"), lit(capacity)))
      .select(col("__grp"), col("shard"),
        explode(arrays_zip(col("__ds"), col("__bins"))).as("__z"))
      .select(col("__z.__ds.id").as(idCol),
        col("__grp").as(groupCol), col("shard"),
        col("__z.__ds.n").as("n_tokens"),
        col("__z.__bins").as("chunk_id"))
  }

  /** Word n-grams from an ALREADY-MATERIALIZED token array column.
    * 1-based element_at keeps semantics identical to the DuckDB oracle's
    * 1-based list indexing. */
  def ngramsFromTokens(toks: Column, n: Int): Column =
    // sequence(a, b) DESCENDS when b < a — guard short docs explicitly
    when(size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Word n-grams (space-joined) straight from a text column.
    *
    * ONLY for single-expression convenience on small inputs: Catalyst
    * does not CSE the embedded tokenization, so each element_at
    * re-splits the string (~3·#ngrams splits per row). Hot paths must
    * materialize `tokens(c)` with withColumn first and use
    * [[ngramsFromTokens]] — ~100× less work per row. */
  def wordNgrams(c: Column, n: Int): Column =
    ngramsFromTokens(tokens(c), n)

  /** Sliding-window token chunks with overlap — the pretraining/RAG
    * chunker: chunk i covers tokens [i·stride, i·stride + chunkSize).
    * The last chunk is partial; docs whose token count <= chunkSize
    * yield exactly one chunk; empty docs yield none. One explode over a
    * per-row computed chunk count — no shuffle, no self-join; output
    * volume is ~n_tokens/stride rows per doc, the minimum possible. */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      "need 0 < stride <= chunkSize")
    val nChunksMinus1 =
      when(col("__n") <= chunkSize, lit(0))
        .otherwise(ceil((col("__n") - chunkSize) / lit(stride.toDouble)))
        .cast("int")
    df.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
      .withColumn("chunk_id", explode(sequence(lit(0), nChunksMinus1)))
      .select(col("doc_id"), col("chunk_id"),
        concat_ws(" ",
          slice(col("__toks"), col("chunk_id") * stride + 1, lit(chunkSize)))
          .as("chunk_text"),
        least(lit(chunkSize), col("__n") - col("chunk_id") * stride)
          .cast("bigint").as("n_tokens"))
  }

  /** Sentence-boundary-aware chunking — the RAG/embedding chunker that
    * never splits a sentence: consecutive sentences pack greedily into
    * chunks of at most `maxTokens` whitespace tokens; a sentence longer
    * than the cap becomes its own oversized chunk (truncating it is the
    * embedder's decision, not the chunker's). Sentence boundary =
    * terminal punctuation followed by whitespace, marked with a \u0001
    * sentinel via a capture-group replace — RE2 (the oracle's regex
    * engine) has no lookbehind, so the sentinel split is the portable
    * form. Inter-sentence whitespace collapses to a single space in the
    * rebuilt chunk (both engines replay the same split+join).
    *
    * The greedy capacity-reset recurrence is NOT window-expressible
    * (each boundary depends on the running remainder), but it IS a
    * sequential fold over one document's sentences — and it only
    * needs to carry CHUNK IDS, not chunk text. Two zero-shuffle
    * passes: (1) the native [[graft.functions.ChunkIdsExpr]] assigns
    * each sentence its chunk id in one codegen'd O(sentences) loop
    * (the earlier `aggregate`-HOF fold appended to an accumulator
    * array per element — each concat copies the whole ids array,
    * O(sentences²) copying per doc, measured as 50s of the 300s
    * sf0.1 bench total); (2) the boundary positions (where the id
    * changes) slice the sentence array per chunk and `array_join`
    * builds each chunk's text exactly ONCE — O(total chars). Zero shuffles, zero self-joins, pure projection. At
    * 100 TB this is scan-bound and embarrassingly parallel; the
    * DuckDB oracle replays the identical recurrence as a recursive
    * CTE. Output: `doc_id`, `chunk_id` (0-based), `n_tokens`,
    * `chunk_text`. */
  def chunkBySentences(df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int): DataFrame = {
    require(maxTokens > 0, "need maxTokens > 0")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val marked = regexp_replace(col(textCol), "([.!?])\\s+", "$1\u0001")
    df.select(col(idCol).as("doc_id"), split(marked, "\u0001").as("__sents"))
      .withColumn("__zs", expr(
        "filter(transform(__sents, s -> named_struct(" +
          "'s', s, " +
          "'n', cast(size(filter(split(s, '\\\\s+'), t -> t <> '')) as bigint)))," +
          " x -> x.n > 0)"))
      // pass 1: greedy capacity-reset fold over token counts only —
      // each sentence gets its 0-based chunk id (no string copying)
      .withColumn("__ids", expr(
        s"chunk_ids(transform(__zs, x -> x.n), ${maxTokens}L)"))
      // pass 2: boundary starts (1-based positions where the id
      // changes); transform's index IS the chunk id, each chunk's
      // sentences sliced + joined exactly once
      .withColumn("__starts", expr(
        "case when size(__ids) = 0 then cast(array() as array<int>) " +
          "else filter(sequence(1, size(__ids)), " +
          "i -> i = 1 or element_at(__ids, i) != element_at(__ids, i - 1)) end"))
      .withColumn("__spans", expr(
        "transform(__starts, (st, c) -> named_struct('st', st, 'len', " +
          "if(c + 2 <= size(__starts), element_at(__starts, c + 2), " +
          "size(__zs) + 1) - st))"))
      .withColumn("__chunks", expr("""
        transform(__spans, (sp, c) -> named_struct(
          'ck', c,
          'txt', array_join(
            transform(slice(__zs, sp.st, sp.len), z -> z.s), ' '),
          'ntok', aggregate(slice(__zs, sp.st, sp.len),
            cast(0 as bigint), (a, z) -> a + z.n)))"""))
      // explode_OUTER + a post-filter on the generated column, NOT
      // explode: InferFiltersFromGenerate synthesizes `size(e) > 0`
      // under a non-outer explode, and pushing that filter below the
      // alias chain INLINES the whole HOF pipeline into one giant
      // interpreted expression (chunk_ids appeared 26x in the plan,
      // re-evaluated per row in the scan's DataFilters AND the Filter
      // node — measured 33s -> 0.4s at sf0.1 for this one change).
      // The rule skips outer explodes; empty/null chunk arrays emit
      // one null row that the cheap generated-column filter drops —
      // row-identical to the non-outer form.
      .select(col("doc_id"), explode_outer(col("__chunks")).as("__c"))
      .filter(col("__c").isNotNull)
      .select(col("doc_id"), col("__c.ck").as("chunk_id"),
        col("__c.ntok").as("n_tokens"), col("__c.txt").as("chunk_text"))
  }

  /** Vocabulary coverage: build the top-`topN` corpus vocabulary
    * (count desc, word asc — deterministic at ties) and report each
    * doc's out-of-vocabulary token count/rate — the tokenizer-coverage
    * audit run before committing to a vocab size. The vocab is
    * bounded (topN rows) and broadcast; the corpus side is one explode
    * + one map-side-combined aggregation per pass. */
  def vocabCoverage(df: DataFrame, idCol: String, textCol: String,
      topN: Int): DataFrame = {
    val tok = df.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("w"))
    val vocab = tok.groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), asc("w")).limit(topN)
      .select(col("w"), lit(1).as("__in"))
    tok.join(broadcast(vocab), Seq("w"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1).otherwise(0)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        round(col("n_oov") / col("n_tokens"), 6).as("oov_rate"))
  }

  // ---- PII scrubbing ----
  // Pattern subset chosen to be semantics-identical between Java regex
  // (Spark) and RE2 (DuckDB oracle): character classes, +/{m,}, \b.
  /** Email-shaped spans. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** Digit runs (ids, phone fragments, account numbers). */
  val NumberRe = "[0-9]+"

  /** Redact email-shaped spans then digit runs. Order matters: the email
    * pattern must see the raw text (its local part may contain digits).
    * Pure projection — codegen'd regexp_replace, no shuffle; at corpus
    * scale this is scan-bound, exactly like the quality scorers. */
  def maskPii(c: Column): Column =
    regexp_replace(regexp_replace(c, EmailRe, "<EMAIL>"),
      NumberRe, "<NUM>")

  /** Count of spans [[maskPii]] would redact (emails + digit runs) —
    * the audit metric reported per source/shard. */
  def piiSpanCount(c: Column): Column =
    regexp_count(regexp_replace(c, EmailRe, "<EMAIL>"), lit(NumberRe)) +
      regexp_count(c, lit(EmailRe))

  /** Gopher's "≥2 distinct required stopwords" indicator set (Rae et
    * al. 2021, table A1) — distinct from the ratio-scoring lists above:
    * presence of these is a naturalness test, not a language signal. */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher/C4-style composite quality filter: the standard rule
    * battery (word-count bounds, mean-word-length band, alphabetic-word
    * fraction, symbol density, bullet/ellipsis line shape, required
    * stopwords) evaluated per document in ONE codegen'd projection —
    * no shuffle, no UDF, scan-bound at any corpus size. Each rule
    * emits its signal AND its pass flag, because at 100 TB the
    * actionable output is "which rule killed how many docs per source",
    * not a bare boolean; `keep` is the conjunction.
    *
    * Thresholds are the published Gopher defaults (word count tuned
    * down to ≥10 for this corpus's short synthetic docs; production
    * uses 50; `minStopHits` likewise tunable — the synthetic corpus is
    * not English prose, so a pipeline over it lowers the stopword
    * naturalness bar rather than discarding everything). All ratios
    * round to 6dp so the DuckDB oracle hash-matches float-for-float. */
  def gopherQualityFilter(df: DataFrame, idCol: String, textCol: String,
      minWords: Long = 10L, maxWords: Long = 100000L,
      minStopHits: Long = 2L): DataFrame = {
    val nW = greatest(col("n_words"), lit(1L))
    val nL = greatest(col("n_lines"), lit(1L))
    df.select(col(idCol), coalesce(col(textCol), lit("")).as("__t"))
      .withColumn("__toks", tokens(col("__t")))
      .withColumn("__lines", filter(split(col("__t"), "\n"), l => l =!= ""))
      .withColumn("n_words", size(col("__toks")).cast("long"))
      .withColumn("n_lines", size(col("__lines")).cast("long"))
      .withColumn("mean_word_len",
        round(aggregate(col("__toks"), lit(0L), (a, t) => a + length(t))
          .cast("double") / nW, 6))
      .withColumn("frac_alpha_words",
        round(size(filter(col("__toks"), t => t.rlike("[A-Za-z]")))
          .cast("double") / nW, 6))
      // '#' occurrences + '...' occurrences (the ellipsis char and the
      // three-dot spelling), per word — Gopher's symbol-to-word ratio
      .withColumn("symbol_ratio", round((
        (length(col("__t")) - length(regexp_replace(col("__t"), "#", ""))) +
          regexp_count(col("__t"), lit("\\.\\.\\.|…")))
        .cast("double") / nW, 6))
      .withColumn("frac_bullet_lines",
        round(size(filter(col("__lines"), l =>
          l.startsWith("- ") || l.startsWith("* ") || l.startsWith("• ")))
          .cast("double") / nL, 6))
      .withColumn("frac_ellipsis_lines",
        round(size(filter(col("__lines"), l =>
          l.endsWith("...") || l.endsWith("…")))
          .cast("double") / nL, 6))
      .withColumn("n_stop_hits",
        GopherStopwords.map(w =>
          when(array_contains(transform(col("__toks"), lower _), w), 1L)
            .otherwise(0L))
          .reduce(_ + _))
      .withColumn("keep",
        (col("n_words") >= minWords && col("n_words") <= maxWords &&
          col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
          col("frac_alpha_words") >= 0.8 &&
          col("symbol_ratio") <= 0.1 &&
          col("frac_bullet_lines") <= 0.9 &&
          col("frac_ellipsis_lines") <= 0.3 &&
          col("n_stop_hits") >= minStopHits).cast("int"))
      .drop("__t", "__toks", "__lines")
  }

  /** Word-blocklist screening — the C4 "bad words" rule (Raffel et
    * al. 2020 drop any page containing a listed word; modern
    * pipelines threshold on the HIT FRACTION instead, which this
    * reports so either policy is one filter away). Matching is
    * case-insensitive whole-token (no substring matches — "class"
    * must not hit an "ass" entry, the documented Scunthorpe failure of
    * substring blocklists). Appends `n_tokens`, `n_blocked`,
    * `blocked_frac` (6dp, reporting only) and `keep` (1 iff the
    * UNROUNDED hit ratio ≤ maxFrac — maxFrac = 0.0 is exactly C4's
    * any-hit drop, including on docs long enough that the rounded
    * fraction would be 0.000000).
    *
    * Scale shape: the blocklist is a bounded curated artifact (10²–10³
    * words), folded into the plan as an array literal probed per token
    * — a pure codegen'd projection, no join, no shuffle, scales as the
    * scan. A blocklist too large for a literal belongs in a broadcast
    * join against exploded tokens instead; at that size use
    * [[BloomPrune]]. */
  def blocklistStats(df: DataFrame, idCol: String, textCol: String,
      blocklist: Seq[String], maxFrac: Double = 0.0): DataFrame = {
    // Locale.ROOT: Spark's lower() is locale-independent, so the
    // driver-side fold must be too (a tr-TR JVM would otherwise map
    // I -> dotless ı and silently never match)
    val bl = typedLit(blocklist.map(_.toLowerCase(java.util.Locale.ROOT)))
    df.select(col(idCol), coalesce(col(textCol), lit("")).as("__t"))
      .withColumn("__toks", tokens(col("__t")))
      .withColumn("n_tokens", size(col("__toks")).cast("long"))
      .withColumn("n_blocked",
        size(filter(col("__toks"), t => array_contains(bl, lower(t))))
          .cast("long"))
      .withColumn("__frac",
        col("n_blocked").cast("double") / greatest(col("n_tokens"), lit(1L)))
      // keep derives from the UNROUNDED ratio: with maxFrac = 0.0 a
      // multi-million-token doc with one hit must still drop (the
      // 6dp-rounded frac would be 0.000000 and wrongly pass); the
      // rounded column is for reporting only
      .withColumn("blocked_frac", round(col("__frac"), 6))
      .withColumn("keep", (col("__frac") <= maxFrac).cast("int"))
      .drop("__t", "__toks", "__frac")
  }

  /** Text canonicalization battery — the step every exact-dedup
    * fingerprint / shingle / URL key needs FIRST on a multilingual
    * crawl: Unicode NFC composition (native codegen'd
    * [[graft.functions.NfcNormalize]] — composed `é` and decomposed
    * `e`+U+0301 must hash identically), Unicode-aware lowercasing,
    * whitespace runs collapsed to single spaces, edges trimmed.
    * Appends `text_norm`. Pure projection — no shuffle, no UDF, scales
    * as the scan. */
  def normalizeText(df: DataFrame, textCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.withColumn("text_norm",
      trim(regexp_replace(
        lower(call_function("nfc_normalize", col(textCol))), "\\s+", " ")))
  }

  /** URL canonicalization + registered-domain extraction — the
    * crawl-side curation primitives (per-domain caps, blocklist joins,
    * and URL-level dedup all key on these). Appends three columns:
    *  - `url_norm`: scheme and host lowercased, userinfo and port and
    *    fragment stripped, leading `www.` dropped, trailing path
    *    slashes trimmed (bare root normalizes to `/`), tracking
    *    parameters (`utm_*`, `fbclid*`, `gclid*`) removed and the
    *    surviving query parameters sorted — so syntactic variants of
    *    the same resource collapse to one key;
    *  - `host`: the normalized host alone;
    *  - `registered_domain`: last two host labels, or last three when
    *    the TLD is 2 chars and the second-level label is a known
    *    registry affix (`co|com|net|org|gov|ac|edu` — the heuristic
    *    core of the public-suffix list; a full PSL would ship as a
    *    broadcast lookup table, same plan shape).
    *
    * Pure codegen'd string expressions — no UDF, no shuffle, scales as
    * a projection over the scan. Every regexp is Java/RE2/DuckDB
    * portable (the [[maskPii]] pattern-subset discipline). */
  def normalizeUrls(df: DataFrame, urlCol: String): DataFrame = {
    val u = col(urlCol)
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    val auth = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    val hostPort = element_at(split(auth, "@"), -1)
    val host = regexp_replace(
      lower(regexp_replace(hostPort, ":[0-9]*$", "")), "^www\\.", "")
    val path0 = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val pathTrim = regexp_replace(path0, "/+$", "")
    val path = when(pathTrim === "", lit("/")).otherwise(pathTrim)
    val query0 = regexp_extract(u, "\\?([^#]*)", 1)
    val params = filter(split(query0, "&"),
      p => p =!= "" && !p.rlike("^(utm_|fbclid|gclid)"))
    val qnorm = array_join(array_sort(params), "&")
    val parts = split(host, "\\.")
    val n = size(parts)
    // branches guard their element_at/slice bounds (ANSI-safe: CaseWhen
    // only evaluates the matched branch)
    val dom = when(n >= 3 && length(element_at(parts, -1)) === 2 &&
        element_at(parts, -2).isin("co", "com", "net", "org", "gov", "ac", "edu"),
        concat_ws(".", slice(parts, -3, 3)))
      .when(n >= 2, concat_ws(".", slice(parts, -2, 2)))
      .otherwise(host)
    df.withColumn("url_norm",
        concat(scheme, lit("://"), host, path,
          when(qnorm === "", lit("")).otherwise(concat(lit("?"), qnorm))))
      .withColumn("host", host)
      .withColumn("registered_domain", dom)
  }

  /** Gopher repetition-signal battery — the WITHIN-DOCUMENT repetition
    * filters of the published Gopher rules that the cross-corpus dedup
    * family deliberately does not cover (a doc that endlessly repeats
    * its own boilerplate is low-quality even if globally unique):
    *
    *  - `frac_dup_lines` / `frac_dup_line_chars` — fraction of lines
    *    (and of line characters) occurring more than once in the doc;
    *  - `top2_char_frac` / `top3_char_frac` — fraction of token
    *    characters covered by the single MOST FREQUENT word 2-/3-gram
    *    (occurrences × the gram's TOKEN chars — joiner spaces excluded
    *    so numerator and denominator count the same alphabet — over
    *    total token chars; ties break to the longer then
    *    lexicographically-smaller gram);
    *  - `dup5_token_frac` — fraction of token POSITIONS covered by any
    *    5-gram occurring ≥ 2 times within the doc (positional union —
    *    the [[graft.operators.Dedup.removeDuplicateSpans]] coverage
    *    semantics, per-doc).
    *
    * All fractions round to 6dp (oracle hash parity); empty docs emit
    * zeros. Published thresholds for reference: Gopher drops docs with
    * dup-line frac > 0.30, top-2-gram frac > 0.20, dup-5-gram char
    * frac > 0.15 — thresholding is left to the caller (the
    * [[gopherQualityFilter]] keep-column pattern).
    *
    * Scale shape: every aggregation is keyed by (id) or (id, gram) /
    * (id, line) / (id, pos) — within-doc analysis never pairs
    * documents, so there is no cross-doc shuffle growth at all: cost
    * is linear in corpus size with map-side combine on every count.
    * No window, no broadcast of anything data-sized. */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val base = df.select(col(idCol).as("id"),
      coalesce(col(textCol), lit("")).as("__t"))
    // ---- line duplication (within doc) ----
    val lines = base
      .select(col("id"), explode(filter(split(col("__t"), "\n"),
        l => l =!= "")).as("line"))
    val lineStats = lines
      .groupBy(col("id"), col("line"))
      .agg(count(lit(1)).as("__c"), length(col("line")).as("__len"))
      .groupBy(col("id"))
      .agg(sum(col("__c")).as("__n_lines"),
        sum(when(col("__c") > 1, col("__c")).otherwise(0L)).as("__dup_lines"),
        sum(col("__c") * col("__len")).as("__line_chars"),
        sum(when(col("__c") > 1, col("__c") * col("__len")).otherwise(0L))
          .as("__dup_line_chars"))
    // ---- top n-gram char coverage ----
    val toked = base.select(col("id"), tokens(col("__t")).as("__toks"))
    def topGram(n: Int): DataFrame = toked
      .select(col("id"), explode(ngramsFromTokens(col("__toks"), n)).as("gram"))
      .groupBy(col("id"), col("gram"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col("id"))
      // deterministic argmax: count, then gram char length, then the
      // lexicographically SMALLEST gram (struct max on inverted text is
      // awkward — invert via min over (−count, −len, gram))
      .agg(min(struct((-col("__c")).as("nc"),
          (-length(col("gram"))).as("nl"), col("gram").as("g")))
        .as("__top"))
      .select(col("id"),
        (-col("__top.nc") * (length(col("__top.g")) - (n - 1)))
          .as(s"__top${n}_chars"))
    // ---- duplicated 5-gram positional coverage ----
    val grams5 = toked
      .select(col("id"), posexplode(ngramsFromTokens(col("__toks"), 5)))
      .select(col("id"), (col("pos") + 1).as("gpos"), col("col").as("gram"))
    val dup5 = grams5
      .groupBy(col("id"), col("gram")).agg(count(lit(1)).as("__c"),
        collect_list(col("gpos")).as("__ps"))
      .filter(col("__c") > 1)
      .select(col("id"), explode(col("__ps")).as("gpos"))
      .select(col("id"), explode(sequence(col("gpos"), col("gpos") + 4)).as("pos"))
      .distinct()
      .groupBy(col("id")).agg(count(lit(1)).as("__dup5_toks"))
    // ---- assemble ----
    val tokStats = toked.select(col("id"),
      size(col("__toks")).cast("long").as("__n_toks"),
      aggregate(col("__toks"), lit(0L), (a, x) => a + length(x))
        .as("__tok_chars"))
    tokStats
      .join(lineStats, Seq("id"), "left")
      .join(topGram(2), Seq("id"), "left")
      .join(topGram(3), Seq("id"), "left")
      .join(dup5, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("__n_lines"), lit(0L)).as("n_lines"),
        round(coalesce(col("__dup_lines"), lit(0L)).cast("double") /
          greatest(coalesce(col("__n_lines"), lit(0L)), lit(1L)), 6)
          .as("frac_dup_lines"),
        round(coalesce(col("__dup_line_chars"), lit(0L)).cast("double") /
          greatest(coalesce(col("__line_chars"), lit(0L)), lit(1L)), 6)
          .as("frac_dup_line_chars"),
        round(coalesce(col("__top2_chars"), lit(0L)).cast("double") /
          greatest(col("__tok_chars"), lit(1L)), 6).as("top2_char_frac"),
        round(coalesce(col("__top3_chars"), lit(0L)).cast("double") /
          greatest(col("__tok_chars"), lit(1L)), 6).as("top3_char_frac"),
        round(coalesce(col("__dup5_toks"), lit(0L)).cast("double") /
          greatest(col("__n_toks"), lit(1L)), 6).as("dup5_token_frac"))
  }

  /** Encoding-damage (mojibake) screen — the ftfy/CCNet-style filter
    * for text that survived a wrong decode: per doc, counts of
    * U+FFFD replacement characters (a decoder already gave up), C1
    * control codepoints U+0080–U+009F (legal nowhere in clean text —
    * the classic cp1252/latin-1 confusion residue), and
    * UTF-8-as-latin-1 double-decode pairs (Â/Ã followed by a
    * codepoint in U+0080–U+00BF — exactly the two lead bytes of a
    * 2-byte UTF-8 sequence misread as latin-1, e.g. "é" → "Ã©"),
    * plus the combined damage rate per 1000 characters. Pure
    * codegen'd projection — three regexp counts per row, no shuffle;
    * the regexes are plain character classes so Java and RE2 (the
    * DuckDB oracle) scan them identically. The three counts CAN
    * overlap: a mojibake pair whose trailing char falls in
    * U+0080–U+009F contributes to both n_mojibake_pairs and
    * n_c1_controls, so that character is counted twice in
    * damage_per_kchar — deliberate (damage is damage, the screen is a
    * rate, not a partition of characters). n_chars counts UTF-16
    * units (Spark length()) while the oracle counts codepoints —
    * identical on BMP text, which is the parity assumption for any
    * corpus containing astral-plane codepoints. */
  def encodingDamageStats(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(col(idCol).as("doc_id"),
        length(t).cast("long").as("n_chars"),
        regexp_count(t, lit("\uFFFD")).cast("long").as("n_replacement"),
        regexp_count(t, lit("[\u0080-\u009F]")).cast("long")
          .as("n_c1_controls"),
        regexp_count(t, lit("[\u00C2\u00C3][\u0080-\u00BF]")).cast("long")
          .as("n_mojibake_pairs"))
      .withColumn("damage_per_kchar",
        // floor(x·1e6 + 0.5)/1e6, not round(x, 6): engine-portable on
        // 6dp half boundaries (the rerankFused idiom — integer·1000/n
        // quotients can land exactly on one)
        when(col("n_chars") === 0L, lit(0.0))
          .otherwise(floor((col("n_replacement") + col("n_c1_controls") +
            col("n_mojibake_pairs")).cast("double") * 1000.0 /
            col("n_chars") * 1e6 + lit(0.5)) / 1e6))
  }
}
