package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the LLM-pipeline
  * extensions) is exposed as a named query over the synthetic tables in a
  * scale-factor directory, with a DuckDB-equivalent oracle in [[oracleSql]]
  * where the semantics are SQL-expressible.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    mapReduceQueries ++ graft.queries.Relational.queries ++
      graft.queries.Relational2.queries ++
      graft.queries.TextQueries.queries ++ graft.queries.DedupQueries.queries ++
      graft.queries.SimilarityQueries.queries ++ graft.queries.EventQueries.queries ++
      graft.queries.MultimodalQueries.queries ++ graft.queries.Extras.queries ++
      graft.queries.TpchQueries.queries ++ graft.queries.StatsQueries.queries ++
      graft.queries.BpeQueries.queries ++ graft.queries.DriftQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    mapReduceOracles ++ graft.queries.Relational.oracles ++
      graft.queries.Relational2.oracles ++
      graft.queries.TextQueries.oracles ++ graft.queries.DedupQueries.oracles ++
      graft.queries.SimilarityQueries.oracles ++ graft.queries.EventQueries.oracles ++
      graft.queries.MultimodalQueries.oracles ++ graft.queries.Extras.oracles ++
      graft.queries.TpchQueries.oracles ++ graft.queries.StatsQueries.oracles ++
      graft.queries.BpeQueries.oracles ++ graft.queries.DriftQueries.oracles

  // ---- MapReduce parity core (SURVEY §2 rows 1-7, 13) ----
  private def mapReduceQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mr_wordcount" -> { (s, dir) =>
      import s.implicits._
      val lines = sources.Sources.table(s, dir, "documents")
        .select($"doc_id", $"text").as[(Long, String)]
      core.WordCount.counts(lines).toDF("word", "cnt")
    },
    "mr_top_words" -> { (s, dir) =>
      import s.implicits._
      val lines = sources.Sources.table(s, dir, "documents")
        .select($"doc_id", $"text").as[(Long, String)]
      core.WordCount.counts(lines).toDF("word", "cnt")
        .orderBy(desc("cnt"), asc("word")).limit(25)
    },
    "mr_sessionize" -> (mrSessionize _),
  )

  /** Sessionization through the typed MapReduce core — the reference's
    * general per-key fold (`reducefn` sees the whole group) applied to a
    * real non-associative computation. Produces exactly the rows of the
    * declarative q_sessionize (same oracle SQL). */
  private def mrSessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = sources.Sources.events(s, dir)
      .select($"user_id", unix_micros($"ts").as("ts_us"), $"value")
      .as[(Long, Long, Double)]
      .map(e => (e._1, (e._2, e._3)))
    val gapUs = 30L * 60L * 1000000L
    val sessions = core.MapReduce.run[
        Long, (Long, Double), Long, (Long, Double), Seq[(Long, Long, Long, Double)]](
      ev,
      (u, tv) => Seq((u, tv)),
      (_, it) => {
        val sorted = it.toArray.sortBy(_._1)
        val out = Seq.newBuilder[(Long, Long, Long, Double)]
        var start, last, n = 0L
        var sum = 0.0
        var open = false
        sorted.foreach { case (t, v) =>
          if (!open) { start = t; last = t; n = 1L; sum = v; open = true }
          else if (t - last <= gapUs) { last = t; n += 1L; sum += v }
          else { out += ((start, last, n, sum)); start = t; last = t; n = 1L; sum = v }
        }
        if (open) out += ((start, last, n, sum))
        out.result()
      })
    sessions
      .flatMap { case (u, ss) => ss.map(x => (u, x._1, x._2, x._3, x._4)) }
      .toDF("user_id", "session_start_us", "session_end_us", "n_events", "sum_raw")
      .select(col("user_id"), col("session_start_us"), col("session_end_us"),
        col("n_events"), round(col("sum_raw"), 4).as("sum_value"))
  }

  private def mapReduceOracles: Map[String, String] = Map(
    "mr_wordcount" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(string_split_regex(text, '\s+')) AS word FROM documents) t
        |WHERE word <> '' GROUP BY word""".stripMargin,
    "mr_top_words" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(string_split_regex(text, '\s+')) AS word FROM documents) t
        |WHERE word <> '' GROUP BY word
        |ORDER BY cnt DESC, word LIMIT 25""".stripMargin,
    // identical to q_sessionize's oracle — the MapReduce core must
    // reproduce the declarative operator's rows exactly
    "mr_sessionize" -> graft.queries.EventQueries.oracles("q_sessionize"),
  )
}
