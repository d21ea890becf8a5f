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
}
