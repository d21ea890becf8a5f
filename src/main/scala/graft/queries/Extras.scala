package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Partitioning
import graft.operators.Sampling
import graft.sources.Sources
import graft.sources.Sources.table

/** Coverage extras: skew-safe salted aggregation, deterministic
  * hash splits, pivot, exact percentiles, the fuller ranking-function
  * set, and approximate distinct (rows-only — sketch internals aren't
  * portable to DuckDB). */
object Extras {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Z-order layout audit: Morton codes over (l_partkey, l_suppkey),
    // top-4-bit code buckets == prospective files; narrow per-bucket
    // min/max spans on BOTH keys are exactly what parquet file skipping
    // prunes on (operators.Layout scaladoc; LayoutSpec measures the
    // area collapse vs a linear sort). Bounds are a one-row broadcast.
    "q_zorder_layout" -> { (s, dir) =>
      graft.operators.Layout
        .withZCode(table(s, dir, "lineitem"),
          col("l_partkey"), col("l_suppkey"), bits = 16)
        .groupBy(shiftright(col("z"), 28).as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("l_partkey")).as("min_part"), max(col("l_partkey")).as("max_part"),
          min(col("l_suppkey")).as("min_supp"), max(col("l_suppkey")).as("max_supp"))
    },
    // CSV round trip: documents written as CSV (quoted text column),
    // read back through the schema-explicit reader, aggregated. The
    // oracle aggregates the ORIGINAL parquet — equality proves the
    // format conversion lossless including the free-text column.
    "q_csv_roundtrip" -> { (s, dir) =>
      import org.apache.spark.sql.types._
      val path = System.getProperty("java.io.tmpdir") + "/graft_csv_roundtrip"
      table(s, dir, "documents")
        .write.mode("overwrite").option("header", "true").csv(path)
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType),
        StructField("n_chars", LongType)))
      graft.sources.Sources.csv(s, path, schema)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"),
          sum(length(col("text"))).as("sum_text_len"))
    },
    // the SQL surface end-to-end: tables registered as views
    // (GraftSql), the statement text is ALL there is — including a
    // graft native function (nfc_normalize) resolving through the
    // session's function registry, exactly what an ad-hoc SQL user or
    // BI tool would execute
    "q_sql_surface" -> { (s, dir) =>
      graft.sources.GraftSql.sql(s, dir,
        """SELECT lang,
          |  count(*) AS n_docs,
          |  round(avg(length(nfc_normalize(text))), 2) AS avg_norm_len,
          |  sum(CASE WHEN n_chars > 200 THEN 1 ELSE 0 END) AS n_long
          |FROM documents GROUP BY lang""".stripMargin)
    },
    // contrastive negative sampling: a bounded global pool (64
    // lowest-md5 docs via TakeOrdered — no window, no full sort), each
    // anchor broadcast-joins the pool, keeps its 3 deterministic
    // lowest-pair-hash negatives from OTHER sources — the in-batch
    // negatives builder for contrastive/embedding training, md5-stable
    // across reruns and engines
    "q_negative_pool" -> { (s, dir) =>
      val docs = table(s, dir, "documents").select(col("doc_id"), col("source"))
      val pool = docs
        .orderBy(md5(col("doc_id").cast("string").cast("binary")).asc,
          col("doc_id").asc)
        .limit(64)
        .select(col("doc_id").as("neg_id"), col("source").as("neg_source"))
      docs.join(broadcast(pool),
          col("doc_id") =!= col("neg_id") && col("source") =!= col("neg_source"))
        .withColumn("__r",
          md5(concat_ws("-", col("doc_id"), col("neg_id")).cast("binary")))
        .groupBy(col("doc_id"))
        .agg(slice(sort_array(collect_list(struct(col("__r"), col("neg_id")))),
          1, 3).as("__top"))
        .select(col("doc_id"), posexplode(col("__top")).as(Seq("__i", "__x")))
        .select(col("doc_id"), col("__x.neg_id").as("neg_id"),
          (col("__i") + 1).cast("int").as("neg_rank"))
    },
    // next-event-prediction examples: per user, the event-type sequence
    // (ordered by ts, event_id) unrolled into (last-3-context, label)
    // pairs — the behavioral-LM dataset builder; one user-keyed shuffle,
    // per-user bounded fold
    "q_session_sequences" -> { (s, dir) =>
      Sources.events(s, dir)
        .groupBy(col("user_id"))
        .agg(expr(
          "transform(sort_array(collect_list(struct(ts, event_id, event_type)))," +
            " x -> x.event_type)").as("__types"))
        .filter(size(col("__types")) >= 2)
        .select(col("user_id"), col("__types"),
          explode(sequence(lit(1), size(col("__types")) - 1)).as("pos"))
        .select(col("user_id"), col("pos").cast("int").as("pos"),
          array_join(expr(
            "slice(__types, greatest(1, pos - 2), pos - greatest(1, pos - 2) + 1)"),
            " ").as("context"),
          expr("element_at(__types, pos + 1)").as("label"))
    },
    // ORC round trip: the other columnar format Spark ships natively
    // (predicate pushdown + column pruning apply the same as parquet);
    // lineitem written as ORC, read back, aggregated against the
    // parquet-side oracle — lossless including decimals-as-doubles.
    "q_orc_roundtrip" -> { (s, dir) =>
      val path = System.getProperty("java.io.tmpdir") + "/graft_orc_roundtrip"
      table(s, dir, "lineitem")
        .write.mode("overwrite").orc(path)
      s.read.orc(path)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice")), 4).as("sum_price"),
          sum(col("l_quantity").cast("long")).as("sum_qty"))
    },
    // JSON-lines round trip: events (ts as epoch-µs long — JSON has no
    // timestamp type) written and re-read schema-explicitly, then
    // aggregated against the parquet-side oracle.
    "q_jsonl_roundtrip" -> { (s, dir) =>
      import org.apache.spark.sql.types._
      val path = System.getProperty("java.io.tmpdir") + "/graft_jsonl_roundtrip"
      Sources.events(s, dir)
        .withColumn("ts_us", unix_micros(col("ts"))).drop("ts")
        .write.mode("overwrite").json(path)
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("user_id", LongType),
        StructField("event_type", StringType), StructField("value", DoubleType),
        StructField("props", StringType), StructField("ts_us", LongType)))
      graft.sources.Sources.jsonLines(s, path, schema)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"),
          min(col("ts_us")).as("min_ts_us"), max(col("ts_us")).as("max_ts_us"))
    },
    // Deequ-style validation battery: six constraints, ONE aggregation
    // pass (plus the distinct for uniqueness); see operators.Validation.
    // The uniqueness check runs against the true composite line key
    "q_validate_lineitem" -> { (s, dir) =>
      import graft.operators.Validation._
      val li = table(s, dir, "lineitem")
        .withColumn("line_key",
          concat_ws("-", col("l_orderkey"), col("l_linenumber")))
      validate(li, Seq(
        nonEmpty(),
        notNull("l_orderkey"),
        inRange("l_quantity", 1.0, 50.0),
        inRange("l_discount", 0.0, 0.1),
        accepted("l_returnflag", Seq("A", "N", "R")),
        unique("line_key")))
    },

    // salted two-stage agg == direct groupBy (oracle proves it)
    "q_salted_agg" -> { (s, dir) =>
      val li = table(s, dir, "lineitem")
      Partitioning.saltedSumCount(li, col("l_returnflag"), col("l_quantity"),
        saltCol = concat_ws("#", col("l_orderkey"), col("l_linenumber")),
        saltBuckets = 16)
        .select(col("k").as("l_returnflag"),
          round(col("sum_v"), 4).as("sum_qty"), col("n"))
    },

    // PageRank over the nation trade graph (supplier nation -> customer
    // nation per lineitem). Oracled by an unrolled 10-round CTE replay
    // (pageRankNationsOracle); GraphSpec additionally checks exact
    // values against a driver-side reference implementation.
    "q_pagerank_nations" -> { (s, dir) =>
      val n1 = table(s, dir, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("src"))
      val n2 = table(s, dir, "nation")
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("dst"))
      val edges = table(s, dir, "lineitem")
        .join(table(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(table(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(table(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter(col("src") =!= col("dst"))
        .select("src", "dst")
      graft.operators.Graph.pageRank(edges, damping = 0.85, iters = 10)
        .select(col("id").as("nation"), round(col("rank"), 6).as("rank"))
    },

    // synchronous label-propagation communities over the same nation
    // trade graph, 4 deterministic rounds (most-frequent neighbor
    // label, ties to the lowest) — oracled by an unrolled round replay
    "q_label_propagation" -> { (s, dir) =>
      val n1 = table(s, dir, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("src"))
      val n2 = table(s, dir, "nation")
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("dst"))
      val edges = table(s, dir, "lineitem")
        .join(table(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(table(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(table(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter(col("src") =!= col("dst"))
        .select("src", "dst")
      graft.operators.Graph.labelPropagation(edges, rounds = 4)
        .select(col("id").as("nation"), col("label").as("community"))
    },

    // exact triangle census on the nation trade graph, thresholded to
    // above-average edge weight so it isn't near-complete; the operator
    // uses degree orientation (out-degree bounded O(sqrt m)) — see
    // Graph.triangleStats. 1-row broadcasts: avg threshold + stat rows
    // one-pass column profiler over mixed numeric/string columns, in
    // the SCALE-SAFE default mode: distinct counts via HLL++ (rsd 1%),
    // one map-side-combinable scan, no Expand. The oracle can't replay
    // a sketch, so the emitted n_distinct is the exact count (four
    // cheap single-column distinct aggs — each shuffles only that
    // column's distinct values, no row multiplication) and the sketch
    // is gated by the distinct_within_5pct contract column (rsd 1% →
    // 5% is 5σ; oracle emits literal TRUE)
    "q_profile_lineitem" -> { (s, dir) =>
      val t = table(s, dir, "lineitem")
      val profCols = Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")
      val prof = graft.operators.Validation.profile(t, profCols)
      val exact = profCols.map { c =>
        t.agg(countDistinct(col(c)).as("n_distinct_exact"))
          .select(lit(c).as("column"), col("n_distinct_exact"))
      }.reduce(_ unionByName _)
      prof.join(broadcast(exact), Seq("column"))
        .select(col("column"), col("n_rows"), col("n_null"),
          col("n_distinct_exact").as("n_distinct"),
          col("min_num"), col("max_num"), col("min_str"), col("max_str"),
          (abs(col("n_distinct") - col("n_distinct_exact")) <=
            lit(0.05) * col("n_distinct_exact")).as("distinct_within_5pct"))
    },
    // incremental rollup maintenance: per-customer order stats kept as
    // a mergeable state table; the pre-cutoff state absorbs the
    // post-cutoff delta WITHOUT re-touching pre-cutoff raw rows, and
    // the merge equals a from-scratch aggregation over everything —
    // which is exactly what the oracle computes (Upsert.mergeAggStates)
    "q_agg_state_merge" -> { (s, dir) =>
      import graft.operators.Upsert
      val orders = table(s, dir, "orders")
      val state = Upsert.aggState(
        orders.filter(col("o_orderdate") < lit("1997-01-01")),
        Seq("o_custkey"), "o_totalprice")
      val delta = Upsert.aggState(
        orders.filter(col("o_orderdate") >= lit("1997-01-01")),
        Seq("o_custkey"), "o_totalprice")
      Upsert.mergeAggStates(state, delta, Seq("o_custkey"))
        .select(col("o_custkey"), col("cnt"),
          round(col("sum_v"), 4).as("sum_v"), col("min_v"), col("max_v"),
          round(col("sum_v") / col("cnt"), 6).as("avg_v"))
    },
    // snapshot diff: orders-as-of-mid-1997 vs a year later with
    // deterministic synthetic removals (key % 13 == 5) and price
    // changes (key % 7 == 0) — classify every key added/removed/changed
    // via one full-outer row-hash join, summarize per class with a key
    // checksum so membership (not just counts) is value-verified
    "q_snapshot_diff" -> { (s, dir) =>
      val orders = table(s, dir, "orders")
      val oldSnap = orders.filter(col("o_orderdate") < lit("1997-06-01"))
      val newSnap = orders
        .filter(col("o_orderdate") < lit("1998-01-01") &&
          col("o_orderkey") % 13 =!= 5)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 7 === 0, col("o_totalprice") * 2)
            .otherwise(col("o_totalprice")))
      graft.operators.Upsert.snapshotDiff(oldSnap, newSnap, "o_orderkey")
        .groupBy(col("change"))
        .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("key_sum"))
    },
    // 3-core of the thresholded nation trade graph: the dense-community
    // detector (Graph.kCore deterministic simultaneous peel, replayed
    // round-for-round by the unrolled oracle)
    "q_kcore" -> { (s, dir) =>
      graft.operators.Graph.kCore(tradeEdges(s, dir), k = 3)
    },
    // pre-flight join sizing: the EXACT lineitem-x-lineitem self-join
    // cardinality on l_partkey from the two per-key profiles — the
    // number that picks broadcast/salt/AQE BEFORE the join runs
    // (Stats.joinSizeEstimate; never materializes a joined row)
    "q_join_size_estimate" -> { (s, dir) =>
      graft.operators.Stats.joinSizeEstimate(
        table(s, dir, "lineitem"), "l_partkey",
        table(s, dir, "lineitem"), "l_partkey")
    },
    "q_triangle_count" -> { (s, dir) =>
      graft.operators.Graph.triangleStats(tradeEdges(s, dir))
    },

    // salted fact-dim join == plain equi-join (oracle proves it)
    "q_salted_join" -> { (s, dir) =>
      Partitioning.saltedJoin(
        table(s, dir, "lineitem"), table(s, dir, "supplier"),
        "l_suppkey", "s_suppkey",
        saltFrom = Seq(col("l_orderkey"), col("l_linenumber")),
        saltBuckets = 8)
        .groupBy(col("s_name"))
        .agg(round(sum(col("l_extendedprice")), 4).as("total_price"),
          count(lit(1)).as("n_items"))
    },

    // per-stratum keep rates: downsample the dominant language,
    // keep the rare ones
    "q_stratified_sample" -> { (s, dir) =>
      Sampling.sampleByHashStratified(table(s, dir, "documents"),
        col("doc_id"), col("lang"),
        keep16ByStratum = Map("en" -> 4, "zh" -> 16), default16 = 8)
        .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    },

    // data-derived equal-token-share rebalance across languages
    "q_mix_rebalance" -> { (s, dir) =>
      val docs = table(s, dir, "documents")
        .withColumn("n_tokens",
          graft.operators.TextAnalysis.tokenCount(col("text")).cast("long"))
      Sampling.rebalanceByTokens(docs, col("doc_id"), col("lang"), col("n_tokens"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
    },

    // temperature-α=½ domain mixing: surviving token shares ∝ √(natural
    // share) — flattens the head language without equalizing outright;
    // id_sum pins WHICH rows survived (membership is md5-deterministic)
    "q_temperature_mix" -> { (s, dir) =>
      val docs = table(s, dir, "documents")
        .withColumn("n_tokens",
          graft.operators.TextAnalysis.tokenCount(col("text")).cast("long"))
      Sampling.temperatureMix(docs, col("doc_id"), col("lang"), col("n_tokens"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"),
          sum(col("doc_id")).as("id_sum"))
    },

    // DoReMi mixture optimization (round 14): per-language KN-LM
    // losses feed the exponentiated-gradient simplex walk; output is
    // the optimized per-domain weight + the downsample-only keep rate
    // derived against natural token shares — the data-mixture DECISION
    // a pretraining pipeline makes before sharding
    "q_doremi_weights" -> { (s, dir) =>
      val docs = table(s, dir, "documents")
        .withColumn("text", coalesce(col("text"), lit("")))
      val scored = graft.operators.NgramLm
        .bigramKnScores(docs, docs, "doc_id", "text")
        .select(col("id").as("doc_id"), (-col("avg_logp")).as("loss"))
      val joined = docs
        .withColumn("n_tokens",
          graft.operators.TextAnalysis.tokenCount(col("text")).cast("long"))
        .join(scored, Seq("doc_id"))
      Sampling.doremiWeights(joined, col("lang"), col("loss"),
        col("n_tokens"))
    },
    // ...and the mixture APPLIED: domain-rollup of the surviving rows
    // (id_sum pins WHICH rows survived — membership is
    // md5-deterministic, the temperatureMix discipline)
    "q_doremi_mix" -> { (s, dir) =>
      val docs = table(s, dir, "documents")
        .withColumn("text", coalesce(col("text"), lit("")))
      val scored = graft.operators.NgramLm
        .bigramKnScores(docs, docs, "doc_id", "text")
        .select(col("id").as("doc_id"), (-col("avg_logp")).as("loss"))
      val joined = docs
        .withColumn("n_tokens",
          graft.operators.TextAnalysis.tokenCount(col("text")).cast("long"))
        .join(scored, Seq("doc_id"))
      Sampling.doremiMix(joined, col("doc_id"), col("lang"), col("loss"),
          col("n_tokens"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"),
          sum(col("doc_id")).as("id_sum"))
    },
    // DoReMi composed with the DEPLOYED loss (round 15): the 5-gram
    // KN score — the order the CCNet filter actually runs — feeds the
    // same EG simplex walk; only the loss leg changes, the mixture
    // decision plan is identical (one domain rollup + driver-local EG
    // over the bounded domain table)
    "q_doremi_kn5" -> { (s, dir) =>
      val docs = table(s, dir, "documents")
        .withColumn("text", coalesce(col("text"), lit("")))
      val scored = graft.operators.NgramLm
        .knScores(docs, docs, "doc_id", "text", n = 5)
        .select(col("id").as("doc_id"), (-col("avg_logp")).as("loss"))
      val joined = docs
        .withColumn("n_tokens",
          graft.operators.TextAnalysis.tokenCount(col("text")).cast("long"))
        .join(scored, Seq("doc_id"))
      Sampling.doremiWeights(joined, col("lang"), col("loss"),
        col("n_tokens"))
    },
    // explicit target mixture 4:2:1 over en/zh/de at the max achievable
    // total (zh binds: 4143·7//2 < the others' scaled capacities);
    // fr/es excluded by the spec — the mix IS the filter
    "q_target_mix" -> { (s, dir) =>
      val docs = table(s, dir, "documents")
        .withColumn("n_tokens",
          graft.operators.TextAnalysis.tokenCount(col("text")).cast("long"))
      Sampling.targetMix(docs, col("doc_id"), col("lang"), col("n_tokens"),
          parts = Map("en" -> 4, "zh" -> 2, "de" -> 1))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"),
          sum(col("doc_id")).as("id_sum"))
    },

    // token-balanced training shards: deterministic md5 "epoch shuffle"
    // order, 8 contiguous shards of ~equal token mass via the
    // distributed weighted prefix sum (no global window anywhere);
    // id_sum pins the exact shard membership
    "q_token_shards" -> { (s, dir) =>
      val docs = table(s, dir, "documents")
        .withColumn("n_tokens",
          graft.operators.TextAnalysis.tokenCount(col("text")).cast("long"))
      graft.operators.Layout
        .tokenBalancedShards(docs, "doc_id", col("n_tokens"), nShards = 8)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"),
          sum(col("id")).as("id_sum"))
    },

    // reproducible seeded epoch shuffle: every row's shard AND its
    // position within the shard are pure functions of (seed, doc_id) —
    // identical on any partitioning/rerun, independent order per seed,
    // ranked by SHARD-partitioned windows (never a global sort). The
    // full per-row (shard, pos) mapping is the verified output.
    "q_epoch_shuffle" -> { (s, dir) =>
      graft.operators.Layout.seededShuffleShards(
        table(s, dir, "documents").select(col("doc_id")),
        "doc_id", seed = "epoch0", numShards = 8)
    },

    "q_hash_split" -> { (s, dir) =>
      Sampling.split(table(s, dir, "documents"), col("doc_id"),
        train16 = 12, valid16 = 2)
        .groupBy("split").agg(count(lit(1)).as("n"))
    },
    "q_hash_sample" -> { (s, dir) =>
      Sampling.sampleByHash(table(s, dir, "documents"), col("doc_id"), keep16 = 4)
        .select("doc_id", "lang", "source")
    },
    // fixed-size per-stratum QA sample: exactly 5 docs per language,
    // membership a pure function of doc_id
    "q_group_sample" -> { (s, dir) =>
      Sampling.bottomKPerGroup(table(s, dir, "documents"),
          col("lang"), col("doc_id"), 5)
        .select(col("lang"), col("sample_rank"), col("doc_id"), col("source"))
    },

    // class-parity downsample: every label kept at the rarest label's
    // cardinality; summarized as per-label count + id-sum (membership
    // is deterministic, so the sum pins WHICH rows survived)
    "q_label_balance" -> { (s, dir) =>
      Sampling.balanceLabels(table(s, dir, "embeddings"),
          col("label"), col("vec_id"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"), sum(col("vec_id")).as("sum_ids"))
    },

    // pivot: event counts per user across the 5 known event types
    "q_pivot" -> { (s, dir) =>
      graft.sources.Sources.events(s, dir)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
    },

    // exact interpolated percentiles (Spark `percentile` == DuckDB
    // quantile_cont)
    "q_percentiles" -> { (s, dir) =>
      table(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
          round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"))
    },

    // ranking-function battery over one deterministic ordering
    "q_window_misc" -> { (s, dir) =>
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(desc("c_acctbal"), asc("c_custkey"))
      table(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_custkey"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"))
    },

    // navigation window functions over a deterministic full frame
    "q_window_nav" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      table(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(w).as("first_order"),
          last(col("o_orderkey")).over(w).as("last_order"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_order"))
    },

    // conditional aggregation (FILTER / count_if)
    "q_conditional_agg" -> { (s, dir) =>
      table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count_if(col("l_discount") > 0.05).as("n_discounted"),
          round(sum(when(col("l_quantity") > 25.0, col("l_extendedprice"))
            .otherwise(0.0)), 4).as("bulk_revenue"),
          count(lit(1)).as("n"))
    },

    // string function battery
    "q_string_functions" -> { (s, dir) =>
      table(s, dir, "supplier")
        .select(col("s_suppkey"),
          lpad(col("s_name"), 25, "*").as("padded"),
          reverse(col("s_name")).as("reversed"),
          replace(col("s_name"), lit("#"), lit("-")).as("replaced"),
          repeat(lit("ab"), 3).as("repeated"),
          split_part(col("s_name"), lit("#"), lit(1)).as("name_prefix"),
          translate(col("s_name"), "#0123456789", "N").as("digits_stripped"))
    },

    // bitwise aggregates
    "q_bitwise_agg" -> { (s, dir) =>
      table(s, dir, "part")
        .groupBy(col("p_brand"))
        .agg(bit_and(col("p_size")).as("and_size"),
          bit_or(col("p_size")).as("or_size"),
          bit_xor(col("p_size")).as("xor_size"))
    },

    // date arithmetic
    "q_date_arithmetic" -> { (s, dir) =>
      val ord = table(s, dir, "orders")
      val li = table(s, dir, "lineitem")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"),
          datediff(col("l_shipdate"), col("o_orderdate")).as("ship_delay_days"),
          date_format(date_add(col("o_orderdate").cast("date"), 30), "yyyy-MM-dd")
            .as("due_date"))
    },

    // null-handling semantics through an outer join
    "q_null_handling" -> { (s, dir) =>
      val cust = table(s, dir, "customer")
      val big = table(s, dir, "orders").filter(col("o_totalprice") > 400000.0)
        .groupBy(col("o_custkey")).agg(round(sum(col("o_totalprice")), 4).as("big_spend"))
      cust.join(big, cust("c_custkey") === big("o_custkey"), "left_outer")
        .select(col("c_custkey"),
          coalesce(col("big_spend"), lit(0.0)).as("spend_or_zero"),
          col("big_spend").isNull.as("is_small_spender"),
          nullif(col("c_mktsegment"), lit("BUILDING")).as("segment_nb"),
          nvl2(col("big_spend"), lit("whale"), lit("regular")).as("tier"))
    },

    // array function battery over token arrays (scalar outputs only)
    "q_array_functions" -> { (s, dir) =>
      val toks = graft.operators.TextAnalysis.tokens(col("text"))
      table(s, dir, "documents")
        .withColumn("toks", toks)
        .select(col("doc_id"),
          size(col("toks")).as("n_tokens"),
          size(array_distinct(col("toks"))).as("n_distinct"),
          array_contains(col("toks"), "the").as("has_the"),
          coalesce(array_position(col("toks"), "spark"), lit(0L)).cast("long").as("pos_spark"),
          arrays_overlap(col("toks"),
            typedLit(Seq("spark", "hash", "join"))).as("has_engine_word"),
          size(array_intersect(array_distinct(col("toks")),
            typedLit(Seq("the", "a", "data", "key")))).as("n_common"),
          element_at(col("toks"), 1).as("first_token"),
          element_at(col("toks"), -1).as("last_token"))
    },

    // regex function battery (ASCII-safe patterns, identical in RE2/Java)
    "q_regex_functions" -> { (s, dir) =>
      table(s, dir, "supplier")
        .select(col("s_suppkey"),
          regexp_extract(col("s_name"), "([0-9]+)", 1).as("number_part"),
          col("s_name").rlike("[0-9]{2}").as("has_2digits"),
          regexp_replace(col("s_name"), "[0-9]", "x").as("digits_masked"),
          size(regexp_extract_all(col("s_name"), lit("[0-9]"), lit(0))).as("n_digits"))
    },

    // HLL sketch distinct, contract form: the sketch value itself is
    // engine-internal, but its ERROR BOUND is checkable — the query
    // emits |approx - exact| <= 10%·exact as a column, the oracle emits
    // literal TRUE, and the driver's hash compare fails iff the sketch
    // ever violates the contract (HLL++ rsd=0.05 default → 10% is 2σ)
    "q_approx_distinct" -> { (s, dir) =>
      table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("__approx"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("__approx") - col("exact_parts")) <=
            lit(0.1) * col("exact_parts")).as("approx_within_10pct"))
    },

    // global equi-depth deciles (tie-broken to a total order for
    // cross-engine determinism) — via the DISTRIBUTED exact-ntile
    // operator: range-bucket + per-bucket rank + offset, never a
    // single-partition global sort (same rows as the oracle's ntile)
    "q_decile_stats" -> { (s, dir) =>
      graft.operators.Stats.distributedNtile(
          table(s, dir, "orders").select("o_orderkey", "o_totalprice"),
          "o_totalprice", "o_orderkey", nTiles = 10)
        .groupBy(col("tile").as("decile"))
        .agg(count(lit(1)).as("n"),
          round(min(col("o_totalprice")), 4).as("min_price"),
          round(max(col("o_totalprice")), 4).as("max_price"),
          round(avg(col("o_totalprice")), 6).as("avg_price"))
    },

    // association mining: event-type co-occurrence lift per user
    "q_cooccurrence_lift" -> { (s, dir) =>
      // ut feeds four consumers (both self-join sides, totals, nUsers)
      // UNPERSISTED: each consumer subtree ends in the same distinct()
      // exchange, so ReuseExchange materializes the events scan once
      // (and plan building stays job-free — a lazy localCheckpoint of
      // a shuffle-containing subtree runs its stages at build under
      // AQE; the post-exchange distinct-agg replays per consumer, but
      // it folds already-distinct rows: cheap next to the shuffle)
      val ut = graft.sources.Sources.events(s, dir)
        .select(col("user_id"), col("event_type")).distinct()
      val totals = ut.groupBy(col("event_type")).agg(count(lit(1)).as("c"))
      val nUsers = ut.select(col("user_id")).distinct()
        .agg(count(lit(1)).cast("double").as("nu"))
      ut.select(col("user_id"), col("event_type").as("ta"))
        .join(ut.select(col("user_id"), col("event_type").as("tb")), Seq("user_id"))
        .filter(col("ta") < col("tb"))
        .groupBy(col("ta"), col("tb")).agg(count(lit(1)).as("co"))
        .join(broadcast(totals.select(col("event_type").as("ta"), col("c").as("ca"))), Seq("ta"))
        .join(broadcast(totals.select(col("event_type").as("tb"), col("c").as("cb"))), Seq("tb"))
        .crossJoin(broadcast(nUsers))
        .select(col("ta"), col("tb"), col("co"),
          round(col("co") * col("nu") / (col("ca") * col("cb")), 6).as("lift"))
    },

    // sketch percentiles, contract form: approx_percentile guarantees
    // rank error <= 1/accuracy (1e-4 here); the query asserts the
    // sketch value lands between the exact quantiles at q ± 0.01 (100x
    // the sketch's epsilon — slack for interpolation at the rank edge),
    // the oracle emits literal TRUE, so the driver's hash compare
    // checks the CONTRACT even though the sketch isn't portable
    "q_approx_percentile" -> { (s, dir) =>
      table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          // ONE sketch for both quantiles, projected to scalar columns
          // below: per-quantile approx_percentile calls would build the
          // QuantileSummaries buffer twice (measured 4x slower), and an
          // array output column breaks the driver's pandas-side
          // sort/hash of the result frame
          approx_percentile(col("l_extendedprice"), array(lit(0.5), lit(0.95)), lit(10000))
            .as("__ap"),
          expr("percentile(l_extendedprice, array(0.49, 0.5, 0.51, 0.94, 0.95, 0.96))")
            .as("__ep"))
        .select(col("l_returnflag"),
          round(element_at(col("__ep"), 2), 4).as("exact_p50"),
          round(element_at(col("__ep"), 5), 4).as("exact_p95"),
          element_at(col("__ap"), 1)
            .between(element_at(col("__ep"), 1), element_at(col("__ep"), 3))
            .as("p50_within_rank_eps"),
          element_at(col("__ap"), 2)
            .between(element_at(col("__ep"), 4), element_at(col("__ep"), 6))
            .as("p95_within_rank_eps"))
    },
  )

  /** DuckDB replay of [[graft.operators.Graph.pageRank]]'s fixed-round
    * power iteration, unrolled (one CTE per round — single SQL, no
    * recursive-CTE single-reference contortions). Same trajectory:
    * weighted distinct edges, ranks start at 1.0, dangling mass leaks
    * via the inner join to out-degrees. */
  /** The thresholded nation trade graph shared by q_triangle_count and
    * q_kcore: supplier-nation → customer-nation shipment edges, kept
    * when their weight exceeds the mean edge weight (the one-row
    * broadcast threshold makes the graph sparse but non-trivial). */
  private def tradeEdges(s: SparkSession, dir: String): DataFrame = {
    val n1 = table(s, dir, "nation")
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("src"))
    val n2 = table(s, dir, "nation")
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("dst"))
    val wEdges = table(s, dir, "lineitem")
      .join(table(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(table(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(table(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
    wEdges
      .crossJoin(broadcast(wEdges.agg(avg(col("w")).as("aw"))))
      .filter(col("w") > col("aw"))
      .select("src", "dst")
  }

  /** Unrolled simultaneous-peel replay of Graph.kCore on the trade
    * graph: each round recomputes degrees and keeps only edges whose
    * BOTH endpoints have degree >= k. Peeling is idempotent at the
    * fixpoint, so any `rounds` at or beyond convergence yields the
    * same rows; Round6Spec pins that the engine converges well inside
    * this unroll depth at test scale. */
  private def kCoreOracle(k: Int, rounds: Int): String = {
    // MATERIALIZED: each e{i+1} references e{i} three times — inlined
    // CTEs would re-expand the whole prefix per reference (3^rounds
    // parquet scans; observed as an fd-exhaustion error in DuckDB)
    val peel = (0 until rounds).map { i =>
      s"""d$i AS MATERIALIZED (SELECT v, count(*)::BIGINT AS deg FROM (
         |  SELECT a AS v FROM e$i UNION ALL SELECT b FROM e$i) GROUP BY v),
         |e${i + 1} AS MATERIALIZED (
         |  SELECT a, b FROM e$i
         |  WHERE a IN (SELECT v FROM d$i WHERE deg >= $k)
         |    AND b IN (SELECT v FROM d$i WHERE deg >= $k))""".stripMargin
    }.mkString(",\n")
    s"""WITH tr AS (
       |  SELECT n1.n_name AS src, n2.n_name AS dst, count(1)::BIGINT AS w
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |  WHERE n1.n_name <> n2.n_name
       |  GROUP BY 1, 2),
       |aw AS (SELECT avg(w) AS aw FROM tr),
       |ed AS (SELECT src, dst FROM tr CROSS JOIN aw WHERE w > aw),
       |e0 AS MATERIALIZED (
       |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM ed),
       |$peel
       |SELECT v, count(*)::BIGINT AS core_deg FROM (
       |  SELECT a AS v FROM e$rounds UNION ALL SELECT b FROM e$rounds)
       |GROUP BY v""".stripMargin
  }

  private def pageRankNationsOracle(iters: Int): String = {
    val base =
      """WITH e AS (
        |  SELECT n1.n_name AS src, n2.n_name AS dst, count(1)::DOUBLE AS w
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE n1.n_name <> n2.n_name
        |  GROUP BY 1, 2),
        |nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        |od AS (SELECT src AS id, sum(w) AS odeg FROM e GROUP BY 1),
        |r0 AS (SELECT id, 1.0::DOUBLE AS pr FROM nodes)""".stripMargin
    val steps = (1 to iters).map { i =>
      s""",
         |r$i AS (
         |  SELECT n.id, 0.15 + 0.85 * coalesce(c.in_sum, 0.0) AS pr
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS id, sum(e.w * p.pr / od.odeg) AS in_sum
         |    FROM r${i - 1} p JOIN od ON p.id = od.id JOIN e ON e.src = p.id
         |    GROUP BY e.dst) c ON n.id = c.id)""".stripMargin
    }.mkString
    base + steps + s"\nSELECT id AS nation, round(pr, 6) AS rank FROM r$iters"
  }

  /** DuckDB replay of [[graft.operators.Graph.labelPropagation]] over
    * the nation trade graph: canonicalize + symmetrize the edge set,
    * then `rounds` unrolled CTEs, each the deterministic
    * (count desc, label asc) argmax over neighbor labels. */
  private def labelPropNationsOracle(rounds: Int): String = {
    val base =
      """WITH e0 AS (
        |  SELECT n1.n_name AS src, n2.n_name AS dst
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE n1.n_name <> n2.n_name),
        |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |        FROM e0 WHERE least(src, dst) <> greatest(src, dst)),
        |sym AS (SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und),
        |nodes AS (SELECT DISTINCT a AS id FROM sym),
        |l0 AS (SELECT id, id AS label FROM nodes)""".stripMargin
    val steps = (1 to rounds).map { i =>
      s""",
         |l$i AS (
         |  SELECT n.id, coalesce(bst.l, n.id) AS label
         |  FROM nodes n LEFT JOIN (
         |    SELECT id, l FROM (
         |      SELECT id, l,
         |        row_number() OVER (PARTITION BY id ORDER BY c DESC, l) AS rn
         |      FROM (SELECT s.a AS id, p.label AS l, count(1) AS c
         |            FROM sym s JOIN l${i - 1} p ON s.b = p.id
         |            GROUP BY 1, 2) t) rt WHERE rn = 1) bst ON n.id = bst.id)""".stripMargin
    }.mkString
    base + steps +
      s"\nSELECT id AS nation, label AS community FROM l$rounds"
  }

  /** The proven bigram-KN per-doc loss replay (`dsc`: doc_id, loss =
    * −avg_logp) — the default [[doremiCtes]] loss leg. */
  private val bigramLossCtes: String =
    s"""tk AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(coalesce(text, ''), '\\s+'),
       |      x -> x <> '') AS toks
       |  FROM documents),
       |bg AS (
       |  SELECT doc_id, toks[CAST(i AS INTEGER)] AS w1,
       |    toks[CAST(i + 1 AS INTEGER)] AS w2
       |  FROM (SELECT doc_id, toks,
       |          unnest(range(1, greatest(len(toks), 1))) AS i
       |        FROM tk)),
       |big AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
       |ctx AS (SELECT w1, sum(c12)::BIGINT AS c1, count(*) AS nf
       |        FROM big GROUP BY 1),
       |cont AS (SELECT w2, count(*) AS nb FROM big GROUP BY 1),
       |tt AS (SELECT count(*)::DOUBLE AS t FROM big),
       |sc AS (
       |  SELECT b.doc_id,
       |    floor(log10(greatest(
       |      CASE WHEN ctx.c1 IS NOT NULL THEN
       |        greatest(coalesce(bigm.c12, 0) - 0.75, 0.0) / ctx.c1
       |          + 0.75 * ctx.nf / ctx.c1 * (coalesce(cont.nb, 0) / tt.t)
       |      ELSE coalesce(cont.nb, 0) / tt.t END,
       |      1e-12)) * 1e6 + 0.5) / 1e6 AS logp
       |  FROM bg b
       |  LEFT JOIN big bigm ON b.w1 = bigm.w1 AND b.w2 = bigm.w2
       |  LEFT JOIN ctx ON b.w1 = ctx.w1
       |  LEFT JOIN cont ON b.w2 = cont.w2
       |  CROSS JOIN tt),
       |dsc AS (
       |  SELECT doc_id,
       |    -(floor(CAST(sum(CAST(round(logp * 1e6) AS BIGINT)) AS DOUBLE)
       |      / 1e6 / count(*) * 1e6 + 0.5) / 1e6) AS loss
       |  FROM sc GROUP BY 1)""".stripMargin

  /** The DEPLOYED loss leg (round 15): the order-5 KN ladder
    * self-scored at the fixed 0.75 discount (the q_fivegram_kn_score
    * replay verbatim), negated into `dsc(doc_id, loss)` — docs without
    * a full 5-token window score no losses and drop from the mixture
    * rollup on BOTH engines (the bigram leg's < 2-token convention at
    * order 5). */
  private val kn5LossCtes: String =
    s"""tk AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(coalesce(text, ''), '\\s+'),
       |      x -> x <> '') AS toks
       |  FROM documents),
       |fg AS (
       |  SELECT doc_id, toks[CAST(i AS INTEGER)] AS w1,
       |    toks[CAST(i + 1 AS INTEGER)] AS w2,
       |    toks[CAST(i + 2 AS INTEGER)] AS w3,
       |    toks[CAST(i + 3 AS INTEGER)] AS w4,
       |    toks[CAST(i + 4 AS INTEGER)] AS w5
       |  FROM (SELECT doc_id, toks,
       |          unnest(range(1, greatest(len(toks) - 3, 1))) AS i
       |        FROM tk)),
       |c5 AS (SELECT w1, w2, w3, w4, w5, count(*) AS c
       |       FROM fg GROUP BY 1, 2, 3, 4, 5),
       |x5 AS (SELECT w1, w2, w3, w4, sum(c)::BIGINT AS tot, count(*) AS nf
       |       FROM c5 GROUP BY 1, 2, 3, 4),
       |c4 AS (SELECT w2 AS w1, w3 AS w2, w4 AS w3, w5 AS w4, count(*) AS c
       |       FROM c5 GROUP BY 1, 2, 3, 4),
       |x4 AS (SELECT w1, w2, w3, sum(c)::BIGINT AS tot, count(*) AS nf
       |       FROM c4 GROUP BY 1, 2, 3),
       |c3 AS (SELECT w2 AS w1, w3 AS w2, w4 AS w3, count(*) AS c
       |       FROM c4 GROUP BY 1, 2, 3),
       |x3 AS (SELECT w1, w2, sum(c)::BIGINT AS tot, count(*) AS nf
       |       FROM c3 GROUP BY 1, 2),
       |c2 AS (SELECT w2 AS w1, w3 AS w2, count(*) AS c FROM c3 GROUP BY 1, 2),
       |x2 AS (SELECT w1, sum(c)::BIGINT AS tot, count(*) AS nf
       |       FROM c2 GROUP BY 1),
       |c1 AS (SELECT w2 AS w1, count(*) AS c FROM c2 GROUP BY 1),
       |tt AS (SELECT count(*)::DOUBLE AS t FROM c2),
       |j5 AS (
       |  SELECT g.doc_id,
       |    m5.c AS c5c, x5.tot AS tot5, x5.nf AS nf5,
       |    m4.c AS c4c, x4.tot AS tot4, x4.nf AS nf4,
       |    m3.c AS c3c, x3.tot AS tot3, x3.nf AS nf3,
       |    m2.c AS c2c, x2.tot AS tot2, x2.nf AS nf2,
       |    coalesce(u.c, 0) / tt.t AS p1
       |  FROM fg g
       |  LEFT JOIN c5 m5 ON g.w1 = m5.w1 AND g.w2 = m5.w2 AND g.w3 = m5.w3
       |    AND g.w4 = m5.w4 AND g.w5 = m5.w5
       |  LEFT JOIN x5 ON g.w1 = x5.w1 AND g.w2 = x5.w2 AND g.w3 = x5.w3
       |    AND g.w4 = x5.w4
       |  LEFT JOIN c4 m4 ON g.w2 = m4.w1 AND g.w3 = m4.w2 AND g.w4 = m4.w3
       |    AND g.w5 = m4.w4
       |  LEFT JOIN x4 ON g.w2 = x4.w1 AND g.w3 = x4.w2 AND g.w4 = x4.w3
       |  LEFT JOIN c3 m3 ON g.w3 = m3.w1 AND g.w4 = m3.w2 AND g.w5 = m3.w3
       |  LEFT JOIN x3 ON g.w3 = x3.w1 AND g.w4 = x3.w2
       |  LEFT JOIN c2 m2 ON g.w4 = m2.w1 AND g.w5 = m2.w2
       |  LEFT JOIN x2 ON g.w4 = x2.w1
       |  LEFT JOIN c1 u ON g.w5 = u.w1
       |  CROSS JOIN tt),
       |p2s AS (
       |  SELECT doc_id, c5c, tot5, nf5, c4c, tot4, nf4, c3c, tot3, nf3,
       |    CASE WHEN tot2 IS NOT NULL THEN
       |      greatest(coalesce(c2c, 0) - 0.75, 0.0) / tot2
       |        + 0.75 * nf2 / tot2 * p1
       |    ELSE p1 END AS p2
       |  FROM j5),
       |p3s AS (
       |  SELECT doc_id, c5c, tot5, nf5, c4c, tot4, nf4,
       |    CASE WHEN tot3 IS NOT NULL THEN
       |      greatest(coalesce(c3c, 0) - 0.75, 0.0) / tot3
       |        + 0.75 * nf3 / tot3 * p2
       |    ELSE p2 END AS p3
       |  FROM p2s),
       |p4s AS (
       |  SELECT doc_id, c5c, tot5, nf5,
       |    CASE WHEN tot4 IS NOT NULL THEN
       |      greatest(coalesce(c4c, 0) - 0.75, 0.0) / tot4
       |        + 0.75 * nf4 / tot4 * p3
       |    ELSE p3 END AS p4
       |  FROM p3s),
       |sc AS (
       |  SELECT doc_id, floor(log10(greatest(
       |    CASE WHEN tot5 IS NOT NULL THEN
       |      greatest(coalesce(c5c, 0) - 0.75, 0.0) / tot5
       |        + 0.75 * nf5 / tot5 * p4
       |    ELSE p4 END, 1e-12)) * 1e6 + 0.5) / 1e6 AS logp
       |  FROM p4s),
       |dsc AS (
       |  SELECT doc_id,
       |    -(floor(CAST(sum(CAST(round(logp * 1e6) AS BIGINT)) AS DOUBLE)
       |      / 1e6 / count(*) * 1e6 + 0.5) / 1e6) AS loss
       |  FROM sc GROUP BY 1)""".stripMargin

  /** Shared replay of the DoReMi chain up to the per-domain plan
    * (`fin`: domain, n_docs, sum_tokens, mean_loss, weight, keep256):
    * a pluggable per-doc loss leg (`lossCtes` must end in
    * `dsc(doc_id, loss)` — bigram-KN by default, the 5-gram ladder for
    * the deployed shape), ONE domain rollup with the loss summed as
    * exact integer micro-units, then `steps` unrolled
    * exponentiated-gradient CTEs — every α/u 6dp-anchored exactly as
    * the driver loop anchors them, each normalizer an exact long sum
    * of micro-units, so the one libm call (exp, ±1 ulp) is absorbed by
    * the anchor. */
  private def doremiCtes(eta: Double, steps: Int,
      lossCtes: String = bigramLossCtes): String = {
    val stepCtes = (1 to steps).map { t =>
      val prev = if (t == 1) "s0" else s"s${t - 1}"
      s"""u$t AS (
         |  SELECT lang, mean_loss,
         |    floor(a * exp($eta * mean_loss) * 1e6 + 0.5) / 1e6 AS u
         |  FROM $prev),
         |z$t AS (SELECT sum(CAST(round(u * 1e6) AS BIGINT)) AS z FROM u$t),
         |s$t AS (
         |  SELECT lang, mean_loss,
         |    floor(u / (CAST(z AS DOUBLE) / 1e6) * 1e6 + 0.5) / 1e6 AS a
         |  FROM u$t CROSS JOIN z$t)""".stripMargin
    }.mkString(",\n")
    val microSum = (1 to steps)
      .map(t => s"CAST(round(s$t.a * 1e6) AS BIGINT)").mkString("\n    + ")
    val stepJoins = (2 to steps)
      .map(t => s"JOIN s$t ON s1.lang = s$t.lang").mkString(" ")
    s"""$lossCtes,
       |dd AS (
       |  SELECT doc_id, lang,
       |    len(list_filter(string_split_regex(coalesce(text, ''), '\\s+'),
       |      x -> x <> ''))::BIGINT AS n_tokens
       |  FROM documents WHERE lang IS NOT NULL),
       |j AS (SELECT dd.doc_id, dd.lang, dd.n_tokens, dsc.loss
       |      FROM dsc JOIN dd USING (doc_id)),
       |dom AS (
       |  SELECT lang, count(*) AS n_docs,
       |    CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       |    sum(CAST(round(loss * 1e6) AS BIGINT)) AS lm
       |  FROM j GROUP BY 1),
       |nd AS (SELECT count(*)::INTEGER AS nd FROM dom),
       |ll AS (
       |  SELECT lang, n_docs, sum_tokens,
       |    floor(CAST(lm AS DOUBLE) / 1e6 / n_docs * 1e6 + 0.5) / 1e6
       |      AS mean_loss
       |  FROM dom),
       |s0 AS (SELECT lang, mean_loss, floor(1.0 / nd * 1e6 + 0.5) / 1e6 AS a
       |       FROM ll CROSS JOIN nd),
       |$stepCtes,
       |w AS (
       |  SELECT s1.lang,
       |    floor(CAST($microSum AS DOUBLE)
       |      / 1e6 / $steps * 1e6 + 0.5) / 1e6 AS weight
       |  FROM s1 $stepJoins),
       |tot AS (SELECT CAST(sum(sum_tokens) AS BIGINT) AS tot FROM dom),
       |rr AS (
       |  SELECT w.lang, ll.n_docs, ll.sum_tokens, ll.mean_loss, w.weight,
       |    w.weight / (CAST(ll.sum_tokens AS DOUBLE) / CAST(tot.tot AS DOUBLE))
       |      AS rate
       |  FROM w JOIN ll ON w.lang = ll.lang CROSS JOIN tot),
       |rm AS (SELECT max(rate) AS rmax FROM rr),
       |fin AS (
       |  SELECT lang, CAST(n_docs AS BIGINT) AS n_docs, sum_tokens,
       |    mean_loss, weight,
       |    CAST(greatest(floor(256.0 * (rate / rmax)), 1) AS INTEGER)
       |      AS keep256
       |  FROM rr CROSS JOIN rm)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // the optimized mixture plan itself — one row per domain
    "q_doremi_weights" ->
      s"""WITH ${doremiCtes(eta = 0.5, steps = 4)}
         |SELECT lang AS domain, n_docs, sum_tokens, mean_loss, weight,
         |  keep256
         |FROM fin""".stripMargin,
    // the 5-gram-loss composition: the kn5 ladder replaces the bigram
    // leg, the EG tail is byte-identical
    "q_doremi_kn5" ->
      s"""WITH ${doremiCtes(eta = 0.5, steps = 4, lossCtes = kn5LossCtes)}
         |SELECT lang AS domain, n_docs, sum_tokens, mean_loss, weight,
         |  keep256
         |FROM fin""".stripMargin,
    // ...and the applied mixture: md5-bucket membership under the
    // optimized rates, rolled up per domain (id_sum pins WHICH rows)
    "q_doremi_mix" ->
      s"""WITH ${doremiCtes(eta = 0.5, steps = 4)},
         |kept AS (
         |  SELECT j.* FROM j JOIN fin ON j.lang = fin.lang
         |  WHERE CAST(('0x' || substring(md5(CAST(j.doc_id AS VARCHAR)), 1, 2))
         |          AS INTEGER) < fin.keep256)
         |SELECT lang, count(1) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         |  CAST(sum(doc_id) AS BIGINT) AS id_sum
         |FROM kept GROUP BY lang""".stripMargin,
    "q_label_propagation" -> labelPropNationsOracle(4),
    "q_validate_lineitem" ->
      """WITH m AS (SELECT
        |  count(1)::BIGINT AS m_nonempty,
        |  coalesce(sum(CASE WHEN l_orderkey IS NOT NULL THEN 0 ELSE 1 END), 0)::BIGINT AS m_notnull,
        |  coalesce(sum(CASE WHEN l_quantity IS NOT NULL
        |    AND l_quantity >= 1.0 AND l_quantity <= 50.0 THEN 0 ELSE 1 END), 0)::BIGINT AS m_qty,
        |  coalesce(sum(CASE WHEN l_discount IS NOT NULL
        |    AND l_discount >= 0.0 AND l_discount <= 0.1 THEN 0 ELSE 1 END), 0)::BIGINT AS m_disc,
        |  coalesce(sum(CASE WHEN l_returnflag IN ('A', 'N', 'R')
        |    THEN 0 ELSE 1 END), 0)::BIGINT AS m_rf,
        |  (count(1) - count(DISTINCT l_orderkey || '-' || l_linenumber))::BIGINT AS m_uniq
        |FROM lineitem)
        |SELECT 'non_empty' AS constraint, m_nonempty AS metric,
        |  CASE WHEN m_nonempty > 0 THEN 1 ELSE 0 END AS passed FROM m
        |UNION ALL SELECT 'not_null(l_orderkey)', m_notnull,
        |  CASE WHEN m_notnull = 0 THEN 1 ELSE 0 END FROM m
        |UNION ALL SELECT 'in_range(l_quantity)', m_qty,
        |  CASE WHEN m_qty = 0 THEN 1 ELSE 0 END FROM m
        |UNION ALL SELECT 'in_range(l_discount)', m_disc,
        |  CASE WHEN m_disc = 0 THEN 1 ELSE 0 END FROM m
        |UNION ALL SELECT 'accepted(l_returnflag)', m_rf,
        |  CASE WHEN m_rf = 0 THEN 1 ELSE 0 END FROM m
        |UNION ALL SELECT 'unique(line_key)', m_uniq,
        |  CASE WHEN m_uniq = 0 THEN 1 ELSE 0 END FROM m""".stripMargin,
    "q_csv_roundtrip" ->
      """SELECT lang, count(*)::BIGINT AS n,
        |  sum(n_chars)::BIGINT AS sum_chars,
        |  sum(length(text))::BIGINT AS sum_text_len
        |FROM documents GROUP BY lang""".stripMargin,
    "q_sql_surface" ->
      """SELECT lang,
        |  count(*)::BIGINT AS n_docs,
        |  round(avg(length(nfc_normalize(text))), 2) AS avg_norm_len,
        |  sum(CASE WHEN n_chars > 200 THEN 1 ELSE 0 END)::BIGINT AS n_long
        |FROM documents GROUP BY lang""".stripMargin,
    "q_negative_pool" ->
      """WITH pool AS (
        |  SELECT doc_id AS neg_id, source AS neg_source FROM documents
        |  ORDER BY md5(doc_id::VARCHAR), doc_id LIMIT 64),
        |cand AS (
        |  SELECT d.doc_id, p.neg_id,
        |    md5(d.doc_id::VARCHAR || '-' || p.neg_id::VARCHAR) AS r
        |  FROM documents d, pool p
        |  WHERE d.doc_id <> p.neg_id AND d.source <> p.neg_source),
        |rk AS (
        |  SELECT doc_id, neg_id,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY r, neg_id) AS neg_rank
        |  FROM cand)
        |SELECT doc_id, neg_id, neg_rank::INTEGER AS neg_rank
        |FROM rk WHERE neg_rank <= 3""".stripMargin,
    "q_session_sequences" ->
      """WITH u AS (
        |  SELECT user_id,
        |    list(event_type ORDER BY ts::TIMESTAMP, event_id) AS types
        |  FROM events GROUP BY user_id),
        |x AS (
        |  SELECT user_id, types, unnest(range(1, len(types))) AS i
        |  FROM u WHERE len(types) >= 2)
        |SELECT user_id, i::INTEGER AS pos,
        |  array_to_string(types[greatest(1, i - 2):i], ' ') AS context,
        |  types[i + 1] AS label
        |FROM x""".stripMargin,
    "q_orc_roundtrip" ->
      """SELECT l_returnflag, count(*)::BIGINT AS n,
        |  round(sum(l_extendedprice), 4) AS sum_price,
        |  sum(l_quantity::BIGINT)::BIGINT AS sum_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_jsonl_roundtrip" ->
      """SELECT event_type, count(*)::BIGINT AS n,
        |  round(sum(value), 4) AS sum_value,
        |  min(epoch_us(ts::TIMESTAMP)) AS min_ts_us,
        |  max(epoch_us(ts::TIMESTAMP)) AS max_ts_us
        |FROM events GROUP BY event_type""".stripMargin,
    "q_profile_lineitem" -> {
      def num(c: String) =
        s"""SELECT '$c' AS column, count(*)::BIGINT AS n_rows,
           |  coalesce(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END), 0)::BIGINT
           |    AS n_null,
           |  count(DISTINCT $c)::BIGINT AS n_distinct,
           |  min($c)::DOUBLE AS min_num, max($c)::DOUBLE AS max_num,
           |  NULL::VARCHAR AS min_str, NULL::VARCHAR AS max_str,
           |  TRUE AS distinct_within_5pct
           |FROM lineitem""".stripMargin
      def str(c: String) =
        s"""SELECT '$c' AS column, count(*)::BIGINT AS n_rows,
           |  coalesce(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END), 0)::BIGINT
           |    AS n_null,
           |  count(DISTINCT $c)::BIGINT AS n_distinct,
           |  NULL::DOUBLE AS min_num, NULL::DOUBLE AS max_num,
           |  min($c)::VARCHAR AS min_str, max($c)::VARCHAR AS max_str,
           |  TRUE AS distinct_within_5pct
           |FROM lineitem""".stripMargin
      Seq(num("l_orderkey"), num("l_quantity"),
        str("l_returnflag"), str("l_shipdate"))
        .mkString("\nUNION ALL\n")
    },
    "q_agg_state_merge" ->
      """SELECT o_custkey, count(*)::BIGINT AS cnt,
        |  round(sum(o_totalprice), 4) AS sum_v,
        |  min(o_totalprice) AS min_v, max(o_totalprice) AS max_v,
        |  round(sum(o_totalprice) / count(*), 6) AS avg_v
        |FROM orders GROUP BY o_custkey""".stripMargin,
    "q_snapshot_diff" ->
      """WITH o_old AS (
        |  SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '1997-06-01'),
        |o_new AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM orders
        |  WHERE o_orderdate < TIMESTAMP '1998-01-01' AND o_orderkey % 13 <> 5),
        |d AS (
        |  SELECT coalesce(a.o_orderkey, b.o_orderkey) AS k,
        |    CASE WHEN a.o_orderkey IS NULL THEN 'added'
        |         WHEN b.o_orderkey IS NULL THEN 'removed'
        |         WHEN a.o_totalprice <> b.o_totalprice THEN 'changed'
        |         ELSE 'unchanged' END AS change
        |  FROM o_old a FULL OUTER JOIN o_new b ON a.o_orderkey = b.o_orderkey)
        |SELECT change, count(*)::BIGINT AS n, sum(k)::BIGINT AS key_sum
        |FROM d WHERE change <> 'unchanged' GROUP BY change""".stripMargin,
    "q_kcore" -> kCoreOracle(k = 3, rounds = 8),
    "q_join_size_estimate" ->
      """WITH lc AS (SELECT l_partkey AS k, count(*)::BIGINT AS cl
        |            FROM lineitem GROUP BY 1),
        |rc AS (SELECT l_partkey AS k, count(*)::BIGINT AS cr
        |       FROM lineitem GROUP BY 1),
        |j AS (SELECT cl * cr AS rows_k FROM lc JOIN rc USING (k))
        |SELECT count(*)::BIGINT AS n_matched_keys,
        |  coalesce(sum(rows_k), 0)::BIGINT AS join_rows,
        |  coalesce(max(rows_k), 0)::BIGINT AS max_key_rows,
        |  round(CASE WHEN sum(rows_k) > 0
        |    THEN max(rows_k)::DOUBLE / sum(rows_k) ELSE 0.0 END, 6)
        |    AS top_key_share
        |FROM j""".stripMargin,
    "q_triangle_count" ->
      """WITH tr AS (
        |  SELECT n1.n_name AS src, n2.n_name AS dst, count(1)::BIGINT AS w
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE n1.n_name <> n2.n_name
        |  GROUP BY 1, 2),
        |aw AS (SELECT avg(w) AS aw FROM tr),
        |ed AS (SELECT src, dst FROM tr CROSS JOIN aw WHERE w > aw),
        |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |        FROM ed),
        |deg AS (SELECT v, count(*)::BIGINT AS deg FROM (
        |          SELECT a AS v FROM und UNION ALL SELECT b FROM und)
        |        GROUP BY v),
        |o AS (
        |  SELECT
        |    CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND a < b)
        |         THEN a ELSE b END AS src,
        |    CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND a < b)
        |         THEN b ELSE a END AS dst,
        |    CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND a < b)
        |         THEN d2.deg ELSE d1.deg END AS dd
        |  FROM und JOIN deg d1 ON d1.v = und.a JOIN deg d2 ON d2.v = und.b),
        |tri AS (SELECT count(*)::BIGINT AS n_triangles
        |        FROM o x
        |        JOIN o y ON x.src = y.src
        |          AND (x.dd < y.dd OR (x.dd = y.dd AND x.dst < y.dst))
        |        JOIN o z ON z.src = x.dst AND z.dst = y.dst),
        |wg AS (SELECT (sum(deg * (deg - 1)) / 2)::BIGINT AS n_wedges FROM deg),
        |nn AS (SELECT count(*)::BIGINT AS n_nodes FROM deg),
        |ne AS (SELECT count(*)::BIGINT AS n_edges FROM und)
        |SELECT n_nodes, n_edges, n_triangles,
        |  round(CASE WHEN n_wedges > 0
        |    THEN 3.0 * n_triangles / n_wedges ELSE 0.0 END, 6) AS clustering
        |FROM nn CROSS JOIN ne CROSS JOIN tri CROSS JOIN wg""".stripMargin,
    "q_zorder_layout" -> {
      val terms = (0 until 16).flatMap(i => Seq(
        s"(((ra >> $i) & 1) << ${2 * i})",
        s"(((rb >> $i) & 1) << ${2 * i + 1})")).mkString(" | ")
      s"""WITH b AS (
        |  SELECT min(l_partkey)::BIGINT AS mina, max(l_partkey)::BIGINT AS maxa,
        |         min(l_suppkey)::BIGINT AS minb, max(l_suppkey)::BIGINT AS maxb
        |  FROM lineitem),
        |r AS (
        |  SELECT l_partkey, l_suppkey,
        |    ((l_partkey - mina) * 65535) // greatest(1, maxa - mina) AS ra,
        |    ((l_suppkey - minb) * 65535) // greatest(1, maxb - minb) AS rb
        |  FROM lineitem CROSS JOIN b),
        |z AS (SELECT l_partkey, l_suppkey, ($terms) AS z FROM r)
        |SELECT (z >> 28)::BIGINT AS bucket, count(*)::BIGINT AS n,
        |  min(l_partkey) AS min_part, max(l_partkey) AS max_part,
        |  min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
        |FROM z GROUP BY 1""".stripMargin
    },
    // contract-form sketch oracles: the exact columns are recomputed,
    // the bound columns are literal TRUE — the Spark side computes the
    // actual |approx - exact| check, so a contract violation hashes
    // differently and fails the gate
    "q_approx_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
        |  TRUE AS approx_within_10pct
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q_approx_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS exact_p50,
        |  round(quantile_cont(l_extendedprice, 0.95), 4) AS exact_p95,
        |  TRUE AS p50_within_rank_eps,
        |  TRUE AS p95_within_rank_eps
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q_pagerank_nations" -> pageRankNationsOracle(10),
    "q_salted_agg" ->
      """SELECT l_returnflag, round(sum(l_quantity), 4) AS sum_qty,
        |  count(1) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_salted_join" ->
      """SELECT s_name, round(sum(l_extendedprice), 4) AS total_price,
        |  count(1) AS n_items
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name""".stripMargin,
    "q_decile_stats" ->
      """WITH d AS (
        |  SELECT o_totalprice,
        |    ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
        |  FROM orders)
        |SELECT decile, count(1) AS n,
        |  round(min(o_totalprice), 4) AS min_price,
        |  round(max(o_totalprice), 4) AS max_price,
        |  round(avg(o_totalprice), 6) AS avg_price
        |FROM d GROUP BY decile""".stripMargin,
    "q_cooccurrence_lift" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |tot AS (SELECT event_type, count(1) AS c FROM ut GROUP BY 1),
        |n AS (SELECT count(DISTINCT user_id)::DOUBLE AS nu FROM ut),
        |p AS (SELECT a.event_type AS ta, b.event_type AS tb, count(1) AS co
        |      FROM ut a JOIN ut b
        |        ON a.user_id = b.user_id AND a.event_type < b.event_type
        |      GROUP BY 1, 2)
        |SELECT ta, tb, co, round(co * nu / (ca.c * cb.c), 6) AS lift
        |FROM p
        |JOIN tot ca ON ta = ca.event_type
        |JOIN tot cb ON tb = cb.event_type
        |CROSS JOIN n""".stripMargin,
    "q_stratified_sample" ->
      """SELECT lang, count(1) AS n_docs
        |FROM documents
        |WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) AS INTEGER)
        |      < CASE WHEN lang = 'en' THEN 4
        |             WHEN lang = 'zh' THEN 16
        |             ELSE 8 END
        |GROUP BY lang""".stripMargin,
    "q_mix_rebalance" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))::BIGINT
        |      AS n_tokens
        |  FROM documents WHERE lang IS NOT NULL),
        |t AS (SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS tot FROM d GROUP BY 1),
        |m AS (SELECT min(tot) AS tmin FROM t),
        |r AS (SELECT lang,
        |        CAST(greatest((256 * tmin) // tot, 1) AS INTEGER) AS keep256
        |      FROM t CROSS JOIN m),
        |s AS (
        |  SELECT d.* FROM d JOIN r USING (lang)
        |  WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INTEGER)
        |        < keep256)
        |SELECT lang, count(1) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
        |FROM s GROUP BY lang""".stripMargin,
    // √-temperature keep rate: floor(256·√(tmin/tot)) — sqrt and / are
    // IEEE-correctly-rounded in both engines, so the floor cannot
    // straddle an integer across engines (pow would carry libm slack)
    "q_temperature_mix" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))::BIGINT
        |      AS n_tokens
        |  FROM documents WHERE lang IS NOT NULL),
        |t AS (SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS tot FROM d GROUP BY 1),
        |m AS (SELECT min(tot) AS tmin FROM t),
        |r AS (SELECT lang,
        |        CAST(greatest(floor(256 * sqrt(CAST(tmin AS DOUBLE) /
        |               CAST(tot AS DOUBLE))), 1) AS INTEGER) AS keep256
        |      FROM t CROSS JOIN m),
        |s AS (
        |  SELECT d.* FROM d JOIN r USING (lang)
        |  WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INTEGER)
        |        < keep256)
        |SELECT lang, count(1) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM s GROUP BY lang""".stripMargin,
    // integer replay of the factored target-mix rates: scaled capacity
    // S = (t·P) // p per stratum, T* = min S, keep256 = (256·T*) // S
    "q_target_mix" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))::BIGINT
        |      AS n_tokens,
        |    CASE lang WHEN 'en' THEN 4 WHEN 'zh' THEN 2 WHEN 'de' THEN 1 END
        |      AS p
        |  FROM documents),
        |dd AS (SELECT * FROM d WHERE p IS NOT NULL),
        |t AS (SELECT lang, p, CAST(sum(n_tokens) AS BIGINT) AS tot
        |      FROM dd GROUP BY 1, 2),
        |c AS (SELECT lang, (tot * 7) // p AS s FROM t),
        |m AS (SELECT min(s) AS tstar FROM c),
        |r AS (SELECT lang,
        |        CAST(greatest((256 * tstar) // s, 1) AS INTEGER) AS keep256
        |      FROM c CROSS JOIN m),
        |kept AS (
        |  SELECT dd.* FROM dd JOIN r USING (lang)
        |  WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INTEGER)
        |        < keep256)
        |SELECT lang, count(1) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM kept GROUP BY lang""".stripMargin,
    // the oracle's global running sum IS the semantics; the engine
    // computes it without a global window (md5-byte range buckets +
    // bounded offset folds) — same rows, scale-safe plan
    "q_token_shards" ->
      """WITH d AS (
        |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
        |    len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))::BIGINT
        |      AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    sum(n_tokens) OVER (ORDER BY h, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum,
        |    sum(n_tokens) OVER () AS tot
        |  FROM d),
        |s AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(((cum - n_tokens) * 8) // greatest(1, tot) AS INTEGER) AS shard
        |  FROM c)
        |SELECT shard, count(1) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM s GROUP BY shard""".stripMargin,
    "q_epoch_shuffle" ->
      """WITH s AS (
        |  SELECT doc_id, md5('epoch0:' || CAST(doc_id AS VARCHAR)) AS k
        |  FROM documents)
        |SELECT doc_id,
        |  (CAST(('0x' || substring(k, 1, 4)) AS BIGINT) % 8)::INT AS shard,
        |  row_number() OVER (
        |    PARTITION BY CAST(('0x' || substring(k, 1, 4)) AS BIGINT) % 8
        |    ORDER BY k, doc_id)::INT AS pos
        |FROM s""".stripMargin,
    "q_hash_split" ->
      """WITH b AS (
        |  SELECT CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) AS INTEGER) AS bucket
        |  FROM documents)
        |SELECT CASE WHEN bucket < 12 THEN 'train'
        |            WHEN bucket < 14 THEN 'valid'
        |            ELSE 'test' END AS split, count(1) AS n
        |FROM b GROUP BY 1""".stripMargin,
    "q_hash_sample" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) AS INTEGER) < 4""".stripMargin,
    "q_group_sample" ->
      """WITH r AS (
        |  SELECT lang, doc_id, source,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS sample_rank
        |  FROM documents)
        |SELECT lang, CAST(sample_rank AS INTEGER) AS sample_rank, doc_id, source
        |FROM r WHERE sample_rank <= 5""".stripMargin,
    "q_label_balance" ->
      """WITH c AS (SELECT label, count(1) AS n FROM embeddings GROUP BY 1),
        |m AS (SELECT min(n) AS mn FROM c),
        |r AS (
        |  SELECT label, vec_id,
        |    row_number() OVER (PARTITION BY label
        |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        |  FROM embeddings)
        |SELECT label, count(1)::BIGINT AS n, sum(vec_id)::BIGINT AS sum_ids
        |FROM r CROSS JOIN m WHERE rn <= mn GROUP BY label""".stripMargin,
    "q_pivot" ->
      """SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
        |FROM events GROUP BY user_id""".stripMargin,
    "q_percentiles" ->
      """SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        |  round(quantile_cont(o_totalprice, 0.99), 4) AS p99
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q_date_arithmetic" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(date_diff('day', o_orderdate, l_shipdate) AS INTEGER) AS ship_delay_days,
        |  strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin,
    "q_null_handling" ->
      """WITH big AS (
        |  SELECT o_custkey, round(sum(o_totalprice), 4) AS big_spend
        |  FROM orders WHERE o_totalprice > 400000.0 GROUP BY o_custkey)
        |SELECT c_custkey,
        |  coalesce(big_spend, 0.0) AS spend_or_zero,
        |  big_spend IS NULL AS is_small_spender,
        |  nullif(c_mktsegment, 'BUILDING') AS segment_nb,
        |  CASE WHEN big_spend IS NOT NULL THEN 'whale' ELSE 'regular' END AS tier
        |FROM customer LEFT JOIN big ON c_custkey = o_custkey""".stripMargin,
    "q_array_functions" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  len(toks)::INTEGER AS n_tokens,
        |  len(list_distinct(toks))::INTEGER AS n_distinct,
        |  list_contains(toks, 'the') AS has_the,
        |  coalesce(list_position(toks, 'spark'), 0)::BIGINT AS pos_spark,
        |  list_has_any(toks, ['spark', 'hash', 'join']) AS has_engine_word,
        |  len(list_intersect(list_distinct(toks), ['the', 'a', 'data', 'key']))::INTEGER AS n_common,
        |  toks[1] AS first_token,
        |  toks[-1] AS last_token
        |FROM t""".stripMargin,
    "q_regex_functions" ->
      """SELECT s_suppkey,
        |  regexp_extract(s_name, '([0-9]+)', 1) AS number_part,
        |  regexp_matches(s_name, '[0-9]{2}') AS has_2digits,
        |  regexp_replace(s_name, '[0-9]', 'x', 'g') AS digits_masked,
        |  len(regexp_extract_all(s_name, '[0-9]'))::INTEGER AS n_digits
        |FROM supplier""".stripMargin,
    "q_window_nav" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_order,
        |  last_value(o_orderkey) OVER w AS last_order,
        |  nth_value(o_orderkey, 2) OVER w AS second_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin,
    "q_conditional_agg" ->
      """SELECT l_returnflag,
        |  count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
        |  round(sum(CASE WHEN l_quantity > 25.0 THEN l_extendedprice ELSE 0.0 END), 4) AS bulk_revenue,
        |  count(1) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_string_functions" ->
      """SELECT s_suppkey,
        |  lpad(s_name, 25, '*') AS padded,
        |  reverse(s_name) AS reversed,
        |  replace(s_name, '#', '-') AS replaced,
        |  repeat('ab', 3) AS repeated,
        |  split_part(s_name, '#', 1) AS name_prefix,
        |  translate(s_name, '#0123456789', 'N') AS digits_stripped
        |FROM supplier""".stripMargin,
    "q_bitwise_agg" ->
      """SELECT p_brand,
        |  CAST(bit_and(p_size) AS INTEGER) AS and_size,
        |  CAST(bit_or(p_size) AS INTEGER) AS or_size,
        |  CAST(bit_xor(p_size) AS INTEGER) AS xor_size
        |FROM part GROUP BY p_brand""".stripMargin,
    "q_window_misc" ->
      """SELECT c_mktsegment, c_custkey,
        |  rank() OVER w AS rnk,
        |  dense_rank() OVER w AS drnk,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)""".stripMargin,
  )
}
