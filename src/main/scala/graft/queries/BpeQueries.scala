package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Bpe
import graft.sources.Sources.table

/** BPE tokenizer-training queries over `documents`. Fully DuckDB-oracled:
  * pair counts are integral, the top-pair tie-break is lexicographic, and
  * a merge step is a leftmost-non-overlapping `replace` with identical
  * semantics in both engines — so the oracle replays the whole training
  * trajectory with unrolled CTEs (see [[graft.operators.Bpe]]).
  */
object BpeQueries {

  private val N_MERGES = 8

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // the learned merge table (step, pair, weighted count)
    "q_bpe_train" -> { (s, dir) =>
      Bpe.mergesDF(s, Bpe.train(table(s, dir, "documents"), "text", N_MERGES))
    },
    // corpus token distribution under the learned vocab: top-50 pieces
    "q_bpe_encode" -> { (s, dir) =>
      val docs = table(s, dir, "documents")
      Bpe.subwordCounts(docs, "text", Bpe.train(docs, "text", N_MERGES), 50)
    },
    // model lifecycle: train on the non-test split, persist the merge
    // table, load it back, encode the HELD-OUT docs with the stored
    // model (unseen words still encode — merges apply to any word, not
    // just corpus vocabulary). The *_incremental_persisted pattern.
    "q_bpe_incremental_persisted" -> { (s, dir) =>
      val docs = graft.operators.Sampling.split(
        table(s, dir, "documents"),
        org.apache.spark.sql.functions.col("doc_id"), 12, 2)
      val corpus = docs.filter(
        org.apache.spark.sql.functions.col("split") =!= "test")
      val test = docs.filter(
        org.apache.spark.sql.functions.col("split") === "test")
      Bpe.saveMerges(s, Bpe.train(corpus, "text", N_MERGES),
        "graft_bpe_merges")
      Bpe.subwordCounts(test, "text",
        Bpe.loadMerges(s, "graft_bpe_merges"), 50)
    },
  )

  /** The md5 hash-split bucket (mirrors Sampling.hashBucket16 /
    * the q_hash_split oracle). */
  private val bucketExpr =
    "CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) AS INTEGER)"

  /** Shared CTE prefix replaying `n` training steps: w0 (word freqs),
    * e0 (char-split encodings), then p_i / t_i / e_i per step — pair
    * counts, deterministic top-1, merge applied via `replace`.
    * `corpusWhere` restricts the TRAINING corpus (e.g. to a split). */
  private def bpeCtes(n: Int, corpusWhere: String = ""): String = {
    val sb = new StringBuilder(
      s"""WITH w0 AS (
        |  SELECT word, count(*)::BIGINT AS freq
        |  FROM (SELECT unnest(string_split_regex(text, '\\s+')) AS word
        |        FROM documents $corpusWhere) t
        |  WHERE word <> '' GROUP BY word),
        |e0 AS (
        |  SELECT word, freq,
        |    '  ' || regexp_replace(word, '(.)', '\\1  ', 'g') AS enc
        |  FROM w0)""".stripMargin)
    for (i <- 1 to n) {
      sb.append(s""",
        |p$i AS (
        |  SELECT s[g] AS w1, s[g + 1] AS w2, sum(freq)::BIGINT AS cnt
        |  FROM (SELECT freq, s,
        |          unnest(generate_series(1, len(s) - 1)) AS g
        |        FROM (SELECT freq,
        |                list_filter(string_split(enc, '  '), x -> x <> '') AS s
        |              FROM e${i - 1}))
        |  GROUP BY 1, 2),
        |t$i AS (SELECT w1, w2, cnt FROM p$i ORDER BY cnt DESC, w1, w2 LIMIT 1),
        |e$i AS (
        |  SELECT word, freq,
        |    replace(enc, ' ' || w1 || '  ' || w2 || ' ',
        |                 ' ' || w1 || w2 || ' ') AS enc
        |  FROM e${i - 1} CROSS JOIN t$i)""".stripMargin)
    }
    sb.toString
  }

  val oracles: Map[String, String] = Map(
    "q_bpe_train" -> (bpeCtes(N_MERGES) + "\n" +
      (1 to N_MERGES)
        .map(i => s"SELECT $i AS step, w1, w2, cnt FROM t$i")
        .mkString("\nUNION ALL\n")),
    "q_bpe_encode" -> (bpeCtes(N_MERGES) +
      s"""
        |SELECT piece, sum(freq)::BIGINT AS n
        |FROM (SELECT freq,
        |        unnest(list_filter(string_split(enc, '  '), x -> x <> '')) AS piece
        |      FROM e$N_MERGES)
        |GROUP BY piece
        |ORDER BY n DESC, piece LIMIT 50""".stripMargin),
    "q_bpe_incremental_persisted" -> {
      // trained on bucket < 14 (train+valid), applied to bucket >= 14:
      // the stored-model replay is a replace CHAIN over the t_i pairs,
      // valid for words the training vocabulary never saw
      val chain = (1 to N_MERGES).foldLeft(
        "'  ' || regexp_replace(word, '(.)', '\\1  ', 'g')") { (inner, i) =>
        s"replace($inner, ' ' || t$i.w1 || '  ' || t$i.w2 || ' ', " +
          s"' ' || t$i.w1 || t$i.w2 || ' ')"
      }
      bpeCtes(N_MERGES, s"WHERE $bucketExpr < 14") +
        s""",
        |wt AS (
        |  SELECT word, count(*)::BIGINT AS freq
        |  FROM (SELECT unnest(string_split_regex(text, '\\s+')) AS word
        |        FROM documents WHERE $bucketExpr >= 14) t
        |  WHERE word <> '' GROUP BY word),
        |enc_t AS (
        |  SELECT freq, $chain AS enc
        |  FROM wt ${(1 to N_MERGES).map(i => s"CROSS JOIN t$i").mkString(" ")})
        |SELECT piece, sum(freq)::BIGINT AS n
        |FROM (SELECT freq,
        |        unnest(list_filter(string_split(enc, '  '), x -> x <> '')) AS piece
        |      FROM enc_t)
        |GROUP BY piece
        |ORDER BY n DESC, piece LIMIT 50""".stripMargin
    },
  )
}
