package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("train: hand-computed trajectory (counts + lexicographic tie-breaks)") {
    // words: low x3, lower x2, newest x1
    val docs = Seq("low low low", "lower lower", "newest").toDF("text")
    val m = Bpe.train(docs, "text", 8)
    assert(m.map(x => (x.w1, x.w2, x.cnt)) === Seq(
      ("l", "o", 5L),    // ties (l,o)/(o,w) at 5 -> lexicographic
      ("lo", "w", 5L),
      ("e", "r", 2L),    // ties (e,r)/(low,e) at 2 -> "e" < "low"
      ("low", "er", 2L),
      ("e", "s", 1L),    // all-1 tail: (e,s) < (e,w) < (es,t)...
      ("e", "w", 1L),
      ("es", "t", 1L),
      ("ew", "est", 1L)))
    assert(m.map(_.step) === (1 to 8))
  }

  test("merge step handles symbol runs like canonical simultaneous BPE") {
    // a a a a -> one pass of (a,a) must yield aa aa, not aa a a
    val docs = Seq("aaaa").toDF("text")
    val m1 = Bpe.train(docs, "text", 1)
    assert(m1.map(x => (x.w1, x.w2, x.cnt)) === Seq(("a", "a", 3L)))
    val enc = Seq("aaaa").toDF("word")
      .select(Bpe.encodeExpr(m1).as("e")).head.getString(0)
    assert(enc === "  aa  aa  ")
    // second merge collapses the two aa's
    val m2 = Bpe.train(docs, "text", 2)
    assert(m2.last.w1 === "aa" && m2.last.w2 === "aa" && m2.last.cnt === 1L)
  }

  test("train stops early when fully merged") {
    val docs = Seq("ab ab").toDF("text")
    val m = Bpe.train(docs, "text", 5)
    assert(m.map(x => (x.w1, x.w2)) === Seq(("a", "b"))) // then no pairs left
  }

  test("training is partitioning-invariant and deterministic") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val a = Bpe.train(docs, "text", 4)
    val b = Bpe.train(docs.repartition(7), "text", 4)
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("merge model round-trips through the model table in training order") {
    val docs = Seq("low low low", "lower lower", "newest").toDF("text")
    val trained = Bpe.train(docs, "text", 6)
    Bpe.saveMerges(spark, trained, "graft_bpe_merges_spec")
    val loaded = Bpe.loadMerges(spark, "graft_bpe_merges_spec")
    assert(loaded === trained)
    // encoding under the loaded model is identical
    val w = Seq("lowest").toDF("word")
    val a = w.select(Bpe.encodeExpr(trained)).head.getString(0)
    val b = w.select(Bpe.encodeExpr(loaded)).head.getString(0)
    assert(a === b)
  }

  test("subwordCounts conserves total weighted symbol mass <= char count") {
    val docs = Seq("low lower low").toDF("text")
    val merges = Bpe.train(docs, "text", 2)
    val pieces = Bpe.subwordCounts(docs, "text", merges, 100)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // after (l,o) and (lo,w): low -> [low], lower -> [low, e, r]
    assert(pieces === Map("low" -> 3L, "e" -> 1L, "r" -> 1L))
  }
}
