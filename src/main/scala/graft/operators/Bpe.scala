package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) tokenizer training — the
  * "train a subword vocab on the corpus" step of an LLM data pipeline,
  * done engine-side instead of sampling the corpus into a single-node
  * tokenizer library.
  *
  * Representation: a word's symbol sequence is one STRING,
  * `"  s1  s2  ...  sn  "` — every symbol wrapped by double-space
  * separators. One BPE merge step is then one leftmost-non-overlapping
  * `replace(enc, " w1  w2 ", " w1w2 ")`: the match consumes one space
  * from each flanking pair, so adjacent disjoint occurrences (e.g. a
  * run `a a a a`) still all merge in a single pass, exactly like the
  * canonical simultaneous left-to-right BPE merge. `replace` has
  * identical leftmost-non-overlapping semantics in Spark and DuckDB,
  * which is what makes the whole training trajectory replayable by the
  * oracle (unrolled CTEs — the Lloyd's/GD-trajectory precedent).
  *
  * Scale shape: training runs on the DISTINCT-WORD frequency table
  * (vocabulary-bounded, not corpus-bounded — the 100 TB corpus
  * collapses to ~10⁷ rows after the first aggregation), cached once.
  * Each merge step is one map-side-combinable pair-count aggregation
  * over that table plus a driver-side top-1 collect: driver state is
  * O(nMerges) strings — the k-means-centroid pattern
  * ([[Clustering.trainCentroids]]). Merges are embedded back as string
  * LITERALS, so encoding is a codegen'd projection chain with no join.
  *
  * Determinism: pair counts are integral; the arg-max tie-break is
  * lexicographic on (w1, w2); no floats anywhere.
  *
  * The reference has no tokenizer training (SURVEY.md §2 — word-level
  * split only, `example.py:21-27`); this extends the text stack the
  * north star asks for (token counting "BPE-ish regex" → actual
  * learned merges).
  */
object Bpe {

  /** One learned merge: at `step`, the adjacent pair (w1, w2) with the
    * highest weighted count `cnt` became the new symbol w1+w2. */
  final case class Merge(step: Int, w1: String, w2: String, cnt: Long)

  /** Distinct-word frequency table of a corpus — the training working
    * set. One shuffle; at 100 TB this is the vocabulary, not the
    * corpus. */
  def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    // no read-side fan-out: the tokenize explode is cheap per row and
    // the round-16 driver bench measured the fanned form 0.71x
    // (q_bpe_train 1.8s -> 2.5s) — exchange overhead, no CPU payoff
    docs.select(col(textCol).as("__raw"))
      .select(explode(TextAnalysis.tokens(col("__raw"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Initial encoding: each character its own symbol —
    * `"abc"` → `"  a  b  c  "`. */
  def initialEnc(word: Column): Column =
    concat(lit("  "), regexp_replace(word, "(.)", "$1  "))

  /** The encoding column after replaying `merges` in order — a pure
    * literal `replace` chain (codegen'd, no join, no shuffle). */
  def encodeExpr(merges: Seq[Merge]): Column =
    merges.foldLeft(initialEnc(col("word"))) { (e, m) =>
      call_function("replace", e,
        lit(" " + m.w1 + "  " + m.w2 + " "),
        lit(" " + m.w1 + m.w2 + " "))
    }

  /** Adjacent symbol pairs of an encoding column as
    * `array<struct<w1,w2>>` (empty for single-symbol words —
    * `sequence(a, b)` descends when b < a, hence the guard). */
  private def pairsExpr(enc: Column): Column = {
    val s = filter(split(enc, "  "), x => x =!= "")
    when(size(s) >= 2,
      transform(sequence(lit(1), size(s) - 1),
        g => struct(element_at(s, g).as("w1"), element_at(s, g + 1).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
  }

  /** Train `nMerges` BPE merges on the corpus. Stops early if no
    * adjacent pair remains (fully merged vocabulary). */
  def train(docs: DataFrame, textCol: String, nMerges: Int): Seq[Merge] = {
    require(nMerges >= 1, "nMerges must be >= 1")
    val wf = wordFreqs(docs, textCol).cache() // scanned nMerges times
    try {
      val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
      var done = false
      for (step <- 1 to nMerges if !done) {
        val top = wf
          .select(col("freq"), explode(pairsExpr(encodeExpr(merges.toSeq))).as("p"))
          .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
          .agg(sum(col("freq")).as("cnt"))
          // in-plan deterministic top-1: min over (-cnt, w1, w2)
          .agg(min(struct((-col("cnt")).as("nc"), col("w1"), col("w2"))).as("t"))
          .select(col("t.w1"), col("t.w2"), (-col("t.nc")).as("cnt"))
          .collect()
        if (top.isEmpty || top(0).isNullAt(0)) done = true
        else merges += Merge(step, top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
      }
      merges.toSeq
    } finally wf.unpersist()
  }

  /** The learned merge table as a DataFrame (q_bpe_train's output). */
  def mergesDF(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF()
  }

  /** Persist a trained merge list as a model table — train once on the
    * corpus, reuse across runs/streams (the
    * [[Similarity.savePqCodebooks]] lifecycle; Sinks handles the
    * orphaned-location replace semantics). */
  def saveMerges(spark: SparkSession, merges: Seq[Merge], table: String): Unit =
    graft.sources.Sinks.writeBucketed(mergesDF(spark, merges), table,
      bucketCols = Seq("step"), numBuckets = 1)

  /** Read a merge list back; ORDER (step) is the model — merges must
    * replay in training order. The collect is the model, O(nMerges). */
  def loadMerges(spark: SparkSession, table: String): Seq[Merge] =
    spark.table(table)
      .collect()
      .map(r => Merge(r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_.step).toSeq

  /** Weighted subword-piece frequencies of the corpus under the learned
    * merges — the "what does the token distribution look like under
    * this vocab" audit. Top `topN` by count, ties lexicographic. */
  def subwordCounts(docs: DataFrame, textCol: String, merges: Seq[Merge],
      topN: Int): DataFrame =
    wordFreqs(docs, textCol)
      .select(col("freq"),
        explode(filter(split(encodeExpr(merges), "  "), x => x =!= "")).as("piece"))
      .groupBy("piece").agg(sum(col("freq")).as("n"))
      .orderBy(desc("n"), asc("piece")).limit(topN)
}
