package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-8 wave: advisor-fix regressions — unrounded blocklist keep,
  * matching-tag HTML block stripping, diversitySelectAgainst
  * store/corpus sync contract. */
class Round8Spec extends SparkSpec {
  import spark.implicits._

  // ---- blocklistStats: keep from the UNROUNDED ratio ----

  test("blocklistStats: keep derives from the unrounded hit ratio — a " +
      "ratio that 6dp-rounds to exactly maxFrac must still drop") {
    // 2 hits in 3998 tokens = 0.00050025..., rounds to 0.000500 ==
    // maxFrac; the unrounded ratio is ABOVE maxFrac so keep must be 0
    val text = (Seq.fill(3996)("ok") ++ Seq("dup", "dup")).mkString(" ")
    val out = TextAnalysis.blocklistStats(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text",
      Seq("dup"), maxFrac = 0.0005)
      .select("n_tokens", "n_blocked", "blocked_frac", "keep")
      .as[(Long, Long, Double, Int)].head()
    assert(out._1 === 3998L && out._2 === 2L)
    assert(out._3 === 0.0005) // reporting column still rounds
    assert(out._4 === 0)      // but the decision does not
  }

  test("blocklistStats: maxFrac=0 drops on any hit even when the " +
      "rounded fraction would be 0.000000") {
    // 1 hit among enough tokens that the 6dp round is 0.000000
    val text = (Seq.fill(4000000)("ok") ++ Seq("dup")).mkString(" ")
    val out = TextAnalysis.blocklistStats(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text",
      Seq("dup"), maxFrac = 0.0)
      .select("blocked_frac", "keep").as[(Double, Int)].head()
    assert(out._1 === 0.0) // rounds to zero...
    assert(out._2 === 0)   // ...yet the any-hit drop still fires
  }

  // ---- stripHtml: close tag must match the open tag ----

  test("stripHtml: a stray </style> inside a script block does not " +
      "terminate it — no script code leaks, no prose is swallowed") {
    val html = "before <script>alert(1)</style> middle </script> after"
    val got = Seq(html).toDF("html")
      .select(TextAnalysis.stripHtml(col("html")).as("t"))
      .as[String].head()
    assert(got === "before after")
  }

  test("stripHtml: matched script and style blocks still strip, prose " +
      "between them survives") {
    val html = "A <style>p { color: red }</style> B " +
      "<script type=\"text/javascript\">var s = '</style>';</script> C"
    val got = Seq(html).toDF("html")
      .select(TextAnalysis.stripHtml(col("html")).as("t"))
      .as[String].head()
    assert(got === "A B C")
  }

  // ---- diversitySelectAgainst: store/corpus sync contract ----

  test("diversitySelectAgainst: a stored selection missing from " +
      "corpusEmb fails fast instead of silently weakening the seed") {
    val emb = graft.sources.Sources.table(spark, sf0001, "embeddings")
    val corpus = emb.filter(col("vec_id") < 250)
    val batch = emb.filter(col("vec_id") >= 250)
    val cents = Clustering.trainCentroids(corpus, 8, 2)
    val stored = Curation.diversitySelectWithCentroids(corpus, cents, 0.4)
    // drop one stored selection's vector from the corpus table
    val dropId = stored.select(min(col("vec_id"))).as[Long].head()
    val holed = corpus.filter(col("vec_id") =!= dropId)
    val err = intercept[IllegalArgumentException] {
      Curation.diversitySelectAgainst(batch, stored, holed, cents, 0.4)
        .count()
    }
    assert(err.getMessage.contains("out of sync"))
  }
}
