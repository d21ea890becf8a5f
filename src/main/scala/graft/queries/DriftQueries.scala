package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Drift, Sampling}
import graft.sources.Sources

/** Drift-monitoring queries: the ingest-batch health checks a
  * training-data pipeline runs between every crawl snapshot. Both
  * queries split `events` at its exact median event time (the
  * [[Sampling.temporalSplit]] in-plan cutoff — "last week" as the
  * reference, "this week" as the current batch) and ask whether the
  * numeric value distribution / the event-type mix moved.
  *
  * Oracles replay the whole computation in DuckDB: the floored
  * epoch-second cutoff, the floored equi-depth cutpoints
  * (`quantile_cont` == Spark `percentile`), strictly-below binning,
  * add-½ Laplace smoothing, and the PSI/KS/JS/χ²/TVD arithmetic —
  * full rows+schema+hash compares, no contract gating.
  */
object DriftQueries {

  private def splitHalves(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val ev = Sources.events(s, dir)
    val tagged = Sampling.temporalSplit(ev, col("ts"), 0.5)
    (tagged.filter(col("split") === "train").drop("split"),
      tagged.filter(col("split") === "test").drop("split"))
  }

  /** The shared early/late CTE prefix of both oracles (the
    * `temporalSplit(0.5)` replay: cutoff floored to epoch seconds). */
  private val splitCte =
    """WITH cutoff AS (
      |  SELECT floor(quantile_cont(epoch_us(ts::TIMESTAMP), 0.5))::BIGINT // 1000000 AS cut_s
      |  FROM events
      |), ref_rows AS (
      |  SELECT * FROM events, cutoff
      |  WHERE epoch_us(ts::TIMESTAMP) // 1000000 <= cut_s
      |), cur_rows AS (
      |  SELECT * FROM events, cutoff
      |  WHERE epoch_us(ts::TIMESTAMP) // 1000000 > cut_s
      |)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // numeric drift of `value`, early half vs late half, 16 equi-depth
    // bins defined by the early half
    "q_drift_numeric" -> { (s, dir) =>
      val (ref, cur) = splitHalves(s, dir)
      Drift.psiKs(ref, cur, "value", 16)
    },
    // per-bin contingency table behind the summary — the drilldown a
    // dashboard renders when q_drift_numeric alerts
    "q_drift_bins" -> { (s, dir) =>
      val (ref, cur) = splitHalves(s, dir)
      Drift.binnedCounts(ref, cur, "value", 8)
        .select(col("bin"), col("ref_n"), col("cur_n"),
          round(col("ref_frac"), 6).as("ref_frac"),
          round(col("cur_frac"), 6).as("cur_frac"))
    },
    // categorical mix drift of `event_type`, early vs late
    "q_drift_categorical" -> { (s, dir) =>
      val (ref, cur) = splitHalves(s, dir)
      Drift.categoricalDrift(ref, cur, "event_type")
    },
    // per-day drift dashboard: every event day scored against the
    // GLOBAL value distribution — one row per day, the trend line a
    // monitoring UI plots (groups × nBins intermediate rows only)
    "q_drift_daily" -> { (s, dir) =>
      val ev = Sources.events(s, dir)
      // FLOOR division for the day key (pmod-based, exact in long
      // arithmetic): the oracle uses DuckDB `//` which floors, while
      // Spark `div` truncates toward zero — identical post-epoch but
      // divergent for any pre-1970 timestamp. Matching floor semantics
      // here removes the latent cross-engine split instead of relying
      // on the test data staying post-epoch.
      val byDay = ev.withColumn("day",
        expr("(unix_micros(ts) - pmod(unix_micros(ts), 86400000000)) div 86400000000"))
      Drift.psiKsPerGroup(ev, byDay, "day", "value", 16)
    },
    // embedding-space drift: train k-means cells on the REFERENCE half
    // (vec_id parity split — "yesterday's corpus"), assign BOTH halves
    // to the trained centroids (stateless literal projection), and
    // measure the cell-occupancy mix shift — the "did the embedding
    // distribution move" monitor that catches semantic drift plain
    // per-dimension stats can't see
    "q_drift_embedding" -> { (s, dir) =>
      val emb = Sources.table(s, dir, "embeddings")
      val ref = emb.filter(col("vec_id") % 2 === 0)
      val cur = emb.filter(col("vec_id") % 2 === 1)
      val cents = graft.operators.Clustering.trainCentroids(ref, k = 8, iters = 2)
      def cells(df: DataFrame) =
        graft.operators.Clustering.assign(df, cents).select(col("cluster"))
      Drift.categoricalDrift(cells(ref), cells(cur), "cluster")
    },
    // persisted-model lifecycle: the reference half is profiled ONCE
    // into a ≤16-row integer model table (the BPE-merges/PQ-codebook
    // pattern), the current half scores against the STORED rows —
    // reference data never re-read. Bit-exact vs q_drift_numeric by
    // construction (all-integer profile), so it shares that oracle.
    "q_drift_profile_persisted" -> { (s, dir) =>
      val (ref, cur) = splitHalves(s, dir)
      graft.sources.Sinks.writeBucketed(
        Drift.referenceProfile(ref, "value", 16),
        "graft_drift_profile", bucketCols = Seq("bin"), numBuckets = 1)
      Drift.psiKsFromProfile(s.table("graft_drift_profile"), cur, "value")
    },
    // scale-safe profile mode, contract-oracled (the q_approx_distinct
    // pattern): the approx-cutpoint profile (GK sketch, rank error
    // ≤ 0.01%, O(accuracy) state per partition regardless of value
    // cardinality — the 100 TB build path) must land within ONE BIN
    // MASS of the exact profile's reference count in every bin. The
    // Spark side computes the actual |approx − exact| check; the
    // oracle replays the exact counts and emits literal TRUE, so any
    // contract violation hash-mismatches and fails the gate.
    "q_drift_profile_approx" -> { (s, dir) =>
      val (ref, _) = splitHalves(s, dir)
      val exact = Drift.referenceProfile(ref, "value", 16)
      val approx = Drift.referenceProfile(ref, "value", 16,
        approxCutpoints = true)
      exact.select(col("bin"), col("ref_n").as("ref_n_exact"))
        .join(approx.select(col("bin"), col("ref_n").as("__ra")), Seq("bin"))
        .crossJoin(broadcast(exact.agg(sum(col("ref_n")).as("__rt"))))
        .select(col("bin"), col("ref_n_exact"),
          (abs(col("__ra") - col("ref_n_exact")) <=
            col("__rt").cast("double") / 16.0).as("approx_within_bin_mass"))
    },
  )

  val oracles: Map[String, String] = Map(
    // the stored profile is all-integer, so the persisted path replays
    // as the direct computation
    "q_drift_profile_persisted" -> numericOracle,
    "q_drift_numeric" -> numericOracle,
    // contract form: exact per-bin reference counts replayed, the
    // within-bin-mass bound emitted as literal TRUE
    "q_drift_profile_approx" -> (splitCte +
      """, cuts AS (
        |  SELECT list_transform(
        |    quantile_cont(value, [0.0625,0.125,0.1875,0.25,0.3125,0.375,0.4375,0.5,
        |                          0.5625,0.625,0.6875,0.75,0.8125,0.875,0.9375]),
        |    c -> floor(c)) AS cuts
        |  FROM ref_rows WHERE value IS NOT NULL
        |), rb AS (
        |  SELECT len(list_filter(cuts.cuts, c -> c < value)) AS bin, count(*) AS ref_n
        |  FROM ref_rows, cuts WHERE value IS NOT NULL GROUP BY 1
        |), spine AS (SELECT unnest(range(0, 16)) AS bin)
        |SELECT spine.bin, coalesce(ref_n, 0)::BIGINT AS ref_n_exact,
        |  TRUE AS approx_within_bin_mass
        |FROM spine LEFT JOIN rb ON spine.bin = rb.bin""".stripMargin),
  ) ++ restOracles

  private lazy val numericOracle: String = (splitCte +
      """, cuts AS (
        |  SELECT list_transform(
        |    quantile_cont(value, [0.0625,0.125,0.1875,0.25,0.3125,0.375,0.4375,0.5,
        |                          0.5625,0.625,0.6875,0.75,0.8125,0.875,0.9375]),
        |    c -> floor(c)) AS cuts
        |  FROM ref_rows WHERE value IS NOT NULL
        |), rb AS (
        |  SELECT len(list_filter(cuts.cuts, c -> c < value)) AS bin, count(*) AS ref_n
        |  FROM ref_rows, cuts WHERE value IS NOT NULL GROUP BY 1
        |), cb AS (
        |  SELECT len(list_filter(cuts.cuts, c -> c < value)) AS bin, count(*) AS cur_n
        |  FROM cur_rows, cuts WHERE value IS NOT NULL GROUP BY 1
        |), spine AS (SELECT unnest(range(0, 16)) AS bin
        |), tab AS (
        |  SELECT spine.bin, coalesce(ref_n, 0) AS ref_n, coalesce(cur_n, 0) AS cur_n
        |  FROM spine LEFT JOIN rb ON spine.bin = rb.bin LEFT JOIN cb ON spine.bin = cb.bin
        |), tot AS (SELECT sum(ref_n)::BIGINT AS rt, sum(cur_n)::BIGINT AS ct FROM tab
        |), fr AS (
        |  SELECT bin, ref_n, cur_n,
        |    (ref_n + 0.5) / (rt + 8.0) AS ref_frac,
        |    (cur_n + 0.5) / (ct + 8.0) AS cur_frac,
        |    rt, ct
        |  FROM tab, tot
        |), cum AS (
        |  SELECT *,
        |    sum(ref_frac) OVER (ORDER BY bin) AS cum_ref,
        |    sum(cur_frac) OVER (ORDER BY bin) AS cum_cur
        |  FROM fr
        |)
        |SELECT
        |  round(sum((cur_frac - ref_frac) * ln(cur_frac / ref_frac)), 6) AS psi,
        |  round(max(abs(cum_ref - cum_cur)), 6) AS ks_stat,
        |  max(rt) AS n_ref, max(ct) AS n_cur
        |FROM cum""".stripMargin)

  private lazy val restOracles: Map[String, String] = Map(
    "q_drift_daily" ->
      """WITH ev AS (
        |  SELECT epoch_us(ts::TIMESTAMP) // 86400000000 AS day, value
        |  FROM events WHERE value IS NOT NULL),
        |cuts AS (
        |  SELECT list_transform(
        |    quantile_cont(value, [0.0625,0.125,0.1875,0.25,0.3125,0.375,0.4375,0.5,
        |                          0.5625,0.625,0.6875,0.75,0.8125,0.875,0.9375]),
        |    c -> floor(c)) AS cuts
        |  FROM ev),
        |rb AS (
        |  SELECT len(list_filter(cuts.cuts, c -> c < value)) AS bin,
        |    count(*) AS ref_n
        |  FROM ev, cuts GROUP BY 1),
        |rbf AS (
        |  SELECT spine.bin, coalesce(ref_n, 0) AS ref_n
        |  FROM (SELECT unnest(range(0, 16)) AS bin) spine
        |  LEFT JOIN rb ON spine.bin = rb.bin),
        |rt AS (SELECT sum(ref_n)::BIGINT AS rt FROM rbf),
        |cb AS (
        |  SELECT day, len(list_filter(cuts.cuts, c -> c < value)) AS bin,
        |    count(*) AS cur_n
        |  FROM ev, cuts GROUP BY 1, 2),
        |days AS (SELECT DISTINCT day FROM cb),
        |spine2 AS (
        |  SELECT day, bin
        |  FROM days, (SELECT unnest(range(0, 16)) AS bin) b),
        |tab AS (
        |  SELECT spine2.day, spine2.bin, rbf.ref_n,
        |    coalesce(cb.cur_n, 0) AS cur_n
        |  FROM spine2 JOIN rbf ON spine2.bin = rbf.bin
        |  LEFT JOIN cb ON spine2.day = cb.day AND spine2.bin = cb.bin),
        |ct AS (SELECT day, sum(cur_n)::BIGINT AS ct FROM tab GROUP BY 1),
        |fr AS (
        |  SELECT tab.day, bin, ref_n, cur_n, rt, ct,
        |    (ref_n + 0.5) / (rt + 8.0) AS ref_frac,
        |    (cur_n + 0.5) / (ct + 8.0) AS cur_frac
        |  FROM tab CROSS JOIN rt JOIN ct ON tab.day = ct.day),
        |cum AS (
        |  SELECT *,
        |    sum(ref_frac) OVER (PARTITION BY day ORDER BY bin) AS cum_ref,
        |    sum(cur_frac) OVER (PARTITION BY day ORDER BY bin) AS cum_cur
        |  FROM fr)
        |SELECT day,
        |  round(sum((cur_frac - ref_frac) * ln(cur_frac / ref_frac)), 6) AS psi,
        |  round(max(abs(cum_ref - cum_cur)), 6) AS ks_stat,
        |  max(rt) AS n_ref, max(ct) AS n_cur
        |FROM cum GROUP BY day""".stripMargin,
    "q_drift_bins" -> (splitCte +
      """, cuts AS (
        |  SELECT list_transform(
        |    quantile_cont(value, [0.125,0.25,0.375,0.5,0.625,0.75,0.875]),
        |    c -> floor(c)) AS cuts
        |  FROM ref_rows WHERE value IS NOT NULL
        |), rb AS (
        |  SELECT len(list_filter(cuts.cuts, c -> c < value)) AS bin, count(*) AS ref_n
        |  FROM ref_rows, cuts WHERE value IS NOT NULL GROUP BY 1
        |), cb AS (
        |  SELECT len(list_filter(cuts.cuts, c -> c < value)) AS bin, count(*) AS cur_n
        |  FROM cur_rows, cuts WHERE value IS NOT NULL GROUP BY 1
        |), spine AS (SELECT unnest(range(0, 8)) AS bin
        |), tab AS (
        |  SELECT spine.bin, coalesce(ref_n, 0) AS ref_n, coalesce(cur_n, 0) AS cur_n
        |  FROM spine LEFT JOIN rb ON spine.bin = rb.bin LEFT JOIN cb ON spine.bin = cb.bin
        |), tot AS (SELECT sum(ref_n)::BIGINT AS rt, sum(cur_n)::BIGINT AS ct FROM tab)
        |SELECT bin, ref_n, cur_n,
        |  round((ref_n + 0.5) / (rt + 4.0), 6) AS ref_frac,
        |  round((cur_n + 0.5) / (ct + 4.0), 6) AS cur_frac
        |FROM tab, tot""".stripMargin),
    "q_drift_categorical" -> (splitCte +
      """, r AS (SELECT event_type AS k, count(*) AS ref_n FROM ref_rows GROUP BY 1
        |), c AS (SELECT event_type AS k, count(*) AS cur_n FROM cur_rows GROUP BY 1
        |)""".stripMargin + catTail),
    // cell-mix drift over REFERENCE-trained k-means cells: the exact
    // Lloyd trajectory replays via SimilarityQueries' shared CTE
    // builders, assignment of both halves to the trained centroids,
    // then the same categorical-drift arithmetic over cell ids
    "q_drift_embedding" ->
      (s"""WITH emb0 AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |refe AS (
        |  SELECT vec_id, e, list_sum(list_transform(e, x -> x * x)) AS xx
        |  FROM emb0 WHERE vec_id % 2 = 0),
        |alle AS (
        |  SELECT vec_id, e, list_sum(list_transform(e, x -> x * x)) AS xx
        |  FROM emb0),
        |${SimilarityQueries.lloyd2Ctes("refe", 8)},
        |dots AS (
        |  SELECT m.vec_id, m.vec_id % 2 AS par, c.cid,
        |    ${SimilarityQueries.d2Sql("m", "c")} AS d
        |  FROM alle m CROSS JOIN c1cc c),
        |asg AS (
        |  SELECT vec_id, par, cid FROM (
        |    SELECT vec_id, par, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        |    FROM dots) WHERE rn = 1),
        |r AS (SELECT cid AS k, count(*) AS ref_n FROM asg WHERE par = 0 GROUP BY 1),
        |c AS (SELECT cid AS k, count(*) AS cur_n FROM asg WHERE par = 1 GROUP BY 1)"""
        .stripMargin + catTail),
  )

  /** Shared categorical-drift arithmetic over CTEs `r(k, ref_n)` and
    * `c(k, cur_n)` — full-outer union of supports, add-½ smoothing,
    * JS / χ² / TVD. */
  private lazy val catTail: String =
    """, j AS (
      |  SELECT coalesce(r.k, c.k) AS k,
      |    coalesce(ref_n, 0) AS ref_n, coalesce(cur_n, 0) AS cur_n
      |  FROM r FULL OUTER JOIN c ON r.k = c.k
      |), tot AS (
      |  SELECT sum(ref_n)::BIGINT AS rt, sum(cur_n)::BIGINT AS ct,
      |    count(*) AS kn FROM j
      |), sm AS (
      |  SELECT ref_n, cur_n, rt, ct, kn,
      |    (ref_n + 0.5) / (rt + kn * 0.5) AS p,
      |    (cur_n + 0.5) / (ct + kn * 0.5) AS q
      |  FROM j, tot
      |)
      |SELECT
      |  round(sum(p * ln(p / ((p + q) / 2)) * 0.5
      |          + q * ln(q / ((p + q) / 2)) * 0.5), 6) AS js_divergence,
      |  round(sum(power(cur_n - p * ct, 2) / (p * ct)), 6) AS chi_square,
      |  round(sum(abs(p - q)) / 2, 6) AS tvd,
      |  max(kn) AS n_categories, max(rt) AS n_ref, max(ct) AS n_cur
      |FROM sm""".stripMargin
}
