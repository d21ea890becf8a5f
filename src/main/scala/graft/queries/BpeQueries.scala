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
  )

  /** Shared CTE prefix replaying `n` training steps: w0 (word freqs),
    * e0 (char-split encodings), then p_i / t_i / e_i per step — pair
    * counts, deterministic top-1, merge applied via `replace`. */
  private def bpeCtes(n: Int): String = {
    val sb = new StringBuilder(
      """WITH w0 AS (
        |  SELECT word, count(*)::BIGINT AS freq
        |  FROM (SELECT unnest(string_split_regex(text, '\s+')) AS word
        |        FROM documents) t
        |  WHERE word <> '' GROUP BY word),
        |e0 AS (
        |  SELECT word, freq,
        |    '  ' || regexp_replace(word, '(.)', '\1  ', 'g') AS enc
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
  )
}
