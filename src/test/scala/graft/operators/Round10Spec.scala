package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-10 wave: softmax language ID wired to the query surface
  * (learning quality + determinism), and the trained-reranker /
  * composition additions' behavioral pins. */
class Round10Spec extends SparkSpec {
  import spark.implicits._

  // ---- softmax language ID: learning quality ----

  private val aWords = Seq("mera", "tilo", "sana", "vire", "lumo")
  private val bWords = Seq("grukz", "bortz", "knapf", "zwirg", "pfunk")
  private val cWords = Seq("chyx", "qwyx", "xylch", "chqy", "yxqch")
  private def doc(ws: Seq[String], seed: Int): String =
    (0 until 30).map(i => ws((i * (seed + 3) + seed) % ws.size)).mkString(" ")
  private def triDocs: DataFrame =
    ((1 to 30).map(i => (i.toLong, doc(aWords, i), "aa")) ++
      (31 to 60).map(i => (i.toLong, doc(bWords, i), "bb")) ++
      (61 to 90).map(i => (i.toLong, doc(cWords, i), "cc")))
      .toDF("doc_id", "text", "lang")

  test("langIdSoftmax: three separable languages are learned — acc 1.0, " +
      "every class predicted, posteriors sum to 1 per row") {
    val docs = triDocs
    val out = TextAnalysis.langIdSoftmax(docs, "doc_id", "text", "lang",
      Seq("aa", "bb", "cc"), steps = 4, lr = 10.0, n = 2, dim = 32)
    val joined = out.join(docs.select(col("doc_id").as("id"), col("lang")),
      Seq("id"))
    assert(joined.select("lang_pred").distinct().count() === 3L)
    val acc = joined.agg(avg((col("lang_pred") === col("lang"))
      .cast("double"))).head().getDouble(0)
    assert(acc === 1.0)
    // softmax posteriors are calibrated across classes: each row's
    // p_aa + p_bb + p_cc == 1 up to the 6dp output rounding
    val sums = out.select(
      (col("p_aa") + col("p_bb") + col("p_cc")).as("s"))
      .agg(min("s"), max("s")).head()
    assert(math.abs(sums.getDouble(0) - 1.0) < 3e-6)
    assert(math.abs(sums.getDouble(1) - 1.0) < 3e-6)
  }

  test("trainSoftmax: weights invariant to input partitioning at " +
      "2/8/32 partitions (9dp gradient anchor)") {
    val docs = triDocs
    def weightsAt(p: Int): Seq[Seq[Double]] = {
      val feats = TextAnalysis.charNgramHashFeatures(
        docs.repartition(p), "doc_id", "text", 2, 32, carry = Seq("lang"))
      Classification.trainSoftmax(feats, "id", "features", col("lang"),
        Seq("aa", "bb", "cc"), steps = 3, lr = 10.0)
    }
    val runs = Seq(2, 8, 32).map(weightsAt)
    assert(runs.distinct.size === 1,
      "softmax trajectories differ across partitionings")
  }

  test("trainSoftmax: one job per STEP — the per-step gradient plan " +
      "aggregates all K classes in one (dim+1)-key map-side-combined agg") {
    // mirror one step's gradient frame (3 classes) without collecting:
    // the groupBy(i) must carry all residual sums in ONE aggregate
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val xa = concat(array(lit(1.0)), col("embedding").cast("array<double>"))
    val step = emb.select(xa.as("__xa"), lit(0.1).as("d_a"),
        lit(0.2).as("d_b"), lit(0.3).as("d_c"))
      .select(posexplode(col("__xa")).as(Seq("i", "v")),
        col("d_a"), col("d_b"), col("d_c"))
      .groupBy(col("i"))
      .agg(sum(col("d_a") * col("v")).as("g_a"),
        sum(col("d_b") * col("v")).as("g_b"),
        sum(col("d_c") * col("v")).as("g_c"),
        count(lit(1)).as("n"))
    val plan = step.queryExecution.executedPlan.toString
    assert(plan.contains("partial"), plan) // map-side combine present
  }

  test("trainSoftmax + scoreSoftmax on ragged vectors: model dim = " +
      "max over the input (row-order invariant), per-index n, and " +
      "short rows score over their prefix") {
    // two indices exist only on the long rows; with a head-row-derived
    // dim the model SHAPE depended on row order, and with a shared n
    // the long-only indices would divide by the wrong count
    val rows = Seq(
      (1L, Seq(1.0, 2.0, 3.0), "x"), (2L, Seq(0.5, 1.0, 2.0), "x"),
      (3L, Seq(-1.0, -2.0), "y"), (4L, Seq(-0.5, -1.5), "y"))
    val ragged = rows.toDF("id", "vec", "lbl")
    // a SHORT row first: dim must still be max(size)+1 = 4
    val shortFirst = Seq(rows(2), rows(0), rows(3), rows(1))
      .toDF("id", "vec", "lbl").coalesce(1)
    val ws = Classification.trainSoftmax(ragged, "id", "vec", col("lbl"),
      Seq("x", "y"), steps = 1, lr = 1.0)
    assert(ws.size === 2 && ws.forall(_.size === 4)) // dim = max, not head
    assert(ws === Classification.trainSoftmax(shortFirst, "id", "vec",
      col("lbl"), Seq("x", "y"), steps = 1, lr = 1.0),
      "weights must not depend on which row is read first")
    // index 3 (the long-rows-only feature) averaged over 2 rows, not 4:
    // replay index 3's step-1 gradient by hand — at w0=0 both softmax
    // posteriors are 0.5, so d_x = 0.5 - 1[lbl=x]; only rows 1,2
    // (class x, v = 3.0 and 2.0) carry index 3:
    // g = ((3.0 + 2.0) * -0.5) / 2 = -1.25 → w = -(1.0 * -1.25)
    assert(ws.head(3) === 1.25)
    // with the old head-row shared count (n=4) it would be 0.625
    // scoring path: short rows dot over their prefix (VectorDot mins
    // lengths), posteriors still sum to 1 and every row classifies
    val scored = Classification.scoreSoftmax(ragged, "id", "vec",
      Seq("x", "y"), ws)
    assert(scored.count() === 4L)
    val sums = scored.select((col("p_x") + col("p_y")).as("s"))
      .agg(min("s"), max("s")).head()
    assert(math.abs(sums.getDouble(0) - 1.0) < 2e-6 &&
      math.abs(sums.getDouble(1) - 1.0) < 2e-6)
    val preds = scored.orderBy("id").select("pred")
      .as[String].collect().toSeq
    assert(preds === Seq("x", "x", "y", "y"))
  }

  // ---- trained reranker: learned blend beats the hand blend ----

  private def recallAt5(got: DataFrame, truth: DataFrame): Double = {
    val hits = truth.join(got.select("query_id", "neighbor_id"),
      Seq("query_id", "neighbor_id")).groupBy("query_id")
      .agg(count(lit(1)).as("m"))
    truth.groupBy("query_id").agg(count(lit(1)).as("kq"))
      .join(hits, Seq("query_id"), "left")
      .agg(avg(coalesce(col("m"), lit(0L)).cast("double") / col("kq")))
      .head().getDouble(0)
  }

  test("hybridRerankTrainedTopK: trained blend weights beat the hand " +
      "0.5/0.4/0.1 blend on recall@5 against the exact top-5") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val truth = Similarity.bruteForceTopK(emb, 5)
      .select("query_id", "neighbor_id")
    val hand = recallAt5(Retrieval.hybridRerankTopK(docs, emb, k = 5,
      maxTermDfFrac = 0.5), truth)
    val trained = recallAt5(Retrieval.hybridRerankTrainedTopK(docs, emb,
      k = 5, maxTermDfFrac = 0.5), truth)
    // measured: hand 0.62, trained 0.68 — the model learns to upweight
    // sem_cos (the feature correlated with the semantic truth set)
    // over the hand blend's lexical-heavy 0.5/0.4/0.1; deterministic
    // (anchored GD, no randomness), so strict inequality is stable
    assert(trained > hand,
      s"trained recall@5 $trained must beat hand blend $hand")
  }

  // ---- README: the advertised query count is generated, not guessed ----

  test("README's oracle_check line states SparkEntry.queries.size") {
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    val want = s"# ${graft.SparkEntry.queries.size} queries"
    assert(readme.contains(want),
      s"README.md must contain '$want' (stale count?)")
  }

  // ---- chunk_ids: the native fold matches the HOF form it replaced ----

  test("ChunkIdsExpr: bit-identical to the aggregate-HOF greedy fold " +
      "on random count arrays, empty arrays, and oversized sentences") {
    graft.functions.GraftFunctions.register(spark)
    val rows = (0 until 200).map { i =>
      // deterministic pseudo-random token counts incl. zeros and values
      // far above the cap (oversized sentences open their own chunk)
      val len = i % 13
      (i.toLong, (0 until len).map(j => ((i * 31 + j * 17) % 29).toLong))
    }
    val df = rows.toDF("id", "counts")
    val cap = 10L
    val both = df.selectExpr("id", s"chunk_ids(counts, ${cap}L) as native",
      s"""aggregate(
        counts,
        named_struct('ids', cast(array() as array<int>),
          'cur', cast(0 as bigint)),
        (acc, x) -> if(size(acc.ids) = 0 or acc.cur + x > ${cap}L,
          named_struct(
            'ids', concat(acc.ids,
              array(coalesce(try_element_at(acc.ids, -1), -1) + 1)),
            'cur', x),
          named_struct(
            'ids', concat(acc.ids, array(try_element_at(acc.ids, -1))),
            'cur', acc.cur + x)),
        acc -> acc.ids) as hof""")
    assert(both.filter(not(col("native") <=> col("hof"))).count() === 0L)
    // null array propagates null (nullSafeEval contract)
    val nulled = spark.sql(s"select chunk_ids(cast(null as array<bigint>), ${cap}L) as v")
    assert(nulled.head().isNullAt(0))
  }

  // ---- curation_v2: exchange budget of the composed plan ----

  test("curation_v2: post-boundary plan stays within the mix+shard " +
      "exchange budget — the curated corpus is scanned, never rebuilt") {
    val p = graft.SparkEntry.queries("q_curation_v2")(spark, sf0001)
      .queryExecution.executedPlan.toString
    // component budget after the curated-corpus checkpoint boundary:
    // temperature mix 1 (stratum-totals agg; rate join is broadcast),
    // sharder 3 (bucket-meta agg + the bucketed prefix-sum window's
    // partition exchange + assignment join), final shard agg 1, plus
    // the two checkpoint-scan repartitions — 7 total measured; any
    // growth means a stage started rebuilding the corpus inline
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 7, s"expected <= 7 exchanges, got $exchanges:\n$p")
    // exactly one window, and it is bucket-partitioned (the sharder's
    // prefix sum — no global window anywhere in the composition)
    assert(p.linesIterator.count(_.contains("Window")) === 1, p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
