package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge DataFrames — the second consumer
  * (after [[Dedup.connectedComponents]]) of the checkpoint-per-round
  * iteration pattern: `localCheckpoint(eager=true)` between rounds so
  * the logical plan stays flat instead of re-analyzing an ever-deeper
  * tree (see SCALE.md, "Iterative loops").
  *
  * In a training-data pipeline this is the importance-propagation step:
  * rank pages over a hyperlink graph to weight a web corpus, or score
  * documents over a citation/near-dup graph.
  */
object Graph {

  /** Weighted PageRank over a directed multigraph given as (src, dst)
    * edge rows (parallel edges add weight). Fixed `iters` rounds of
    *   rank(v) = (1 - d) + d * Σ_{u→v} rank(u) / outdeg(u)
    * — the uniform-reset formulation (ranks sum to |V| when every node
    * has out-edges; dangling nodes leak mass, which is the standard
    * simplification and fine for relative ordering).
    *
    * The raw edge list is compressed ONCE to a weighted (src, dst, w)
    * multigraph before iterating — parallel edges collapse to a
    * weight, so every round joins the |distinct edges|-sized table,
    * not the raw event-scale edge list (measured 4x on the nation
    * trade graph, where 600k lineitems compress to <=600 node pairs).
    * Each round is then one join + one aggregation, both keyed — no
    * driver-side state.
    */
  def pageRank(edges: DataFrame, damping: Double = 0.85,
      iters: Int = 15): DataFrame = {
    require(iters > 0 && damping > 0.0 && damping < 1.0)
    val e = edges.select(col("src"), col("dst"))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).cast("double").as("w"))
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct().localCheckpoint(true)
    val outDeg = e.groupBy(col("src").as("id"))
      .agg(sum(col("w")).as("out_deg"))
      .localCheckpoint(true)
    var ranks = nodes.select(col("id"), lit(1.0).as("rank"))
      .localCheckpoint(true)
    // Checkpoint EVERY round: `ranks` is consumed by two operators in
    // the next round (the contribs join and the nodes join), so an
    // un-checkpointed round embeds its plan twice in the next one —
    // exponential plan growth within any multi-round checkpoint window,
    // and under AQE the duplicated subtrees don't reliably hit exchange
    // reuse (measured heavy-tailed reruns on the connected-components
    // loop with the same shape; see Dedup.connectedComponents).
    for (_ <- 1 to iters) {
      val contribs = e
        .join(ranks.join(outDeg, Seq("id"))
          .select(col("id").as("src"), (col("rank") / col("out_deg")).as("r")),
          Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("w") * col("r")).as("in_sum"))
      val next = nodes.join(contribs, Seq("id"), "left_outer")
        .select(col("id"),
          (lit(1.0 - damping) +
            lit(damping) * coalesce(col("in_sum"), lit(0.0))).as("rank"))
        .localCheckpoint(true)
      // the eager checkpoint fully materialized `next`, so round N-1's
      // blocks are dead — free them now (Checkpoints scaladoc)
      graft.core.Checkpoints.free(ranks)
      ranks = next
    }
    // the returned frame is the final round's flat checkpoint — the
    // loop-constant inputs no longer feed any live plan
    graft.core.Checkpoints.free(e, nodes, outDeg)
    ranks
  }

  /** Synchronous label-propagation communities (Raghavan et al. 2007)
    * over an undirected simple graph — the community detector between
    * [[connectedComponentsAlternating]] (pure connectivity) and
    * modularity methods: every node starts labeled with its own id;
    * each round EVERY node simultaneously adopts the most frequent
    * label among its neighbors, ties broken by the LOWEST label — a
    * unique total order, so each round is a deterministic function of
    * the last and an oracle can replay the trajectory. The node
    * universe is the ENDPOINTS of the canonicalized simple graph:
    * vertices with no surviving edge (never mentioned, or appearing
    * only in self-loops, which canonicalization drops) are absent from
    * the output — union them back labeled with their own id if the
    * caller needs the full vertex set, the
    * [[connectedComponentsAlternating]] `allIds` pattern. Runs a FIXED
    * `rounds` count: synchronous
    * LPA is not guaranteed to converge (two-coloring oscillation on
    * bipartite structure is the textbook case), so fixed-round
    * determinism IS the reproducible contract, same reasoning as
    * [[pageRank]]'s fixed iters.
    *
    * Scale shape per round: one equi-join of the symmetrized edge list
    * against the label table + two keyed aggregations (neighbor-label
    * counts, per-node argmax via one min(struct) — no window); rounds
    * are localCheckpoint-separated like every iterative loop here
    * (SCALE.md "Iterative loops"). Edges compress to distinct pairs
    * once, so a round costs |E| join rows regardless of raw
    * multiplicity. */
  def labelPropagation(rawEdges: DataFrame, rounds: Int): DataFrame = {
    require(rounds > 0)
    val und = rawEdges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val sym = und
      .union(und.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint(true)
    val nodes = sym.select(col("a").as("id")).distinct().localCheckpoint(true)
    var labels = nodes.select(col("id"), col("id").as("label"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val counts = sym
        .join(labels.select(col("id").as("b"), col("label")), Seq("b"))
        .groupBy(col("a").as("id"), col("label"))
        .agg(count(lit(1)).as("c"))
      // argmax (count desc, label asc) without a window: min over the
      // (-count, label) struct, the bounded-agg idiom
      val best = counts
        .groupBy(col("id"))
        .agg(min(struct((-col("c")).as("nc"), col("label").as("l"))).as("m"))
        .select(col("id"), col("m.l").as("best"))
      val next = nodes.join(best, Seq("id"), "left_outer")
        .select(col("id"), coalesce(col("best"), col("id")).as("label"))
        .localCheckpoint(true)
      graft.core.Checkpoints.free(labels) // superseded round (see Checkpoints)
      labels = next
    }
    graft.core.Checkpoints.free(sym, nodes) // loop-constant inputs, now dead
    labels
  }

  /** Exact triangle count + global clustering coefficient over an
    * undirected simple graph (raw (src, dst) rows are canonicalized and
    * de-duplicated first).
    *
    * Algorithm: degree orientation — every edge is directed from its
    * lower endpoint to its higher endpoint under the total order
    * `(degree, id)`, wedges enumerate ordered pairs of out-neighbors,
    * and a triangle is a wedge whose closing edge exists (one equi-join
    * on the pair). Each triangle is counted exactly once, and
    * out-degrees under this orientation are bounded by O(√m) — the
    * standard trick that keeps the wedge join from exploding on
    * power-law hubs (a celebrity node with 10⁷ undirected neighbors
    * contributes no wedges at all; its edges all point INTO it). No
    * windows, no driver state: three joins and four one-row aggregates.
    *
    * Output (one row): n_nodes, n_edges, n_triangles, and the global
    * clustering coefficient 3·T / #wedges (0 when wedge-free). */
  def triangleStats(rawEdges: DataFrame): DataFrame = {
    val und = rawEdges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = und.select(col("a").as("v"))
      .union(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    val aLower = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val o = und
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
      .select(
        when(aLower, col("a")).otherwise(col("b")).as("src"),
        when(aLower, col("b")).otherwise(col("a")).as("dst"),
        when(aLower, col("db")).otherwise(col("da")).as("dd"))
    val wedgeOrder = col("x.dd") < col("y.dd") ||
      (col("x.dd") === col("y.dd") && col("x.dst") < col("y.dst"))
    val tri = o.as("x")
      .join(o.as("y"), col("x.src") === col("y.src") && wedgeOrder)
      .select(col("x.dst").as("b"), col("y.dst").as("c"))
      .join(o.select(col("src").as("b"), col("dst").as("c")), Seq("b", "c"))
      .agg(count(lit(1)).as("n_triangles"))
    val wedges = deg.agg((sum(col("deg") * (col("deg") - 1)) / 2)
      .cast("long").as("n_wedges"))
    deg.agg(count(lit(1)).as("n_nodes"))
      .crossJoin(und.agg(count(lit(1)).as("n_edges")))
      .crossJoin(tri)
      .crossJoin(wedges)
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
        round(when(col("n_wedges") > 0,
          lit(3.0) * col("n_triangles") / col("n_wedges"))
          .otherwise(lit(0.0)), 6).as("clustering"))
  }

  /** k-core: the maximal subgraph in which every node has degree ≥ k —
    * the standard dense-community / spam-farm detector (a link farm is
    * a high-k core; a long chain of singleton references is not).
    * Deterministic peel: repeatedly delete every node of degree < k,
    * simultaneously, until none remains. The simultaneous-delete
    * fixpoint is order-independent, so the result is unique — and
    * replayable round-for-round by an unrolled SQL oracle.
    *
    * Each round is one degree aggregation + one semi-join back onto
    * the edge list, both keyed — per-round cost is O(|surviving
    * edges|), monotonically shrinking. `localCheckpoint` per round
    * keeps the plan flat (the [[pageRank]] / connectedComponents
    * iteration pattern); the per-round `count()` driver action reads
    * one aggregate row, not data. Worst-case round count is large on
    * pathological chains (a path graph peels 2 nodes/round), so the
    * loop throws at `maxRounds` rather than spin — real web/similarity
    * graphs converge in a handful of rounds because peeling cascades.
    *
    * Returns surviving nodes with their degree inside the core
    * (≥ k by construction). */
  def kCore(rawEdges: DataFrame, k: Int, maxRounds: Int = 30): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    var e = rawEdges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    var nEdges = e.count()
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      round += 1
      val deg = e.select(col("a").as("v"))
        .union(e.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select("v")
      val next = e.join(keep.withColumnRenamed("v", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("v", "b"), Seq("b"), "left_semi")
        .select("a", "b")
        .localCheckpoint(true)
      graft.core.Checkpoints.free(e) // superseded round (see Checkpoints)
      e = next
      val n = e.count()
      converged = n == nEdges
      nEdges = n
    }
    if (!converged)
      throw new IllegalStateException(
        s"kCore(k=$k) did not converge in $maxRounds rounds")
    e.select(col("a").as("v")).union(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("core_deg"))
  }

  /** Connected components by alternating large-star / small-star
    * rounds (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC 2014) — the O(log n)-round algorithm for topologies
    * where min-label propagation ([[Dedup.connectedComponents]]) needs
    * O(diameter) rounds: a CHAIN of progressively-edited near-dups
    * (d₁~d₂~…~dₙ, each adjacent pair similar but distant pairs not)
    * has diameter n, and propagation walks it one hop per round while
    * the star operations collapse it geometrically (Round7Spec pins a
    * 300-link chain: propagation refuses at maxIters=20, this
    * converges in ≤ 25 rounds).
    *
    * Per round: large-star hangs every neighbor LARGER than u onto
    * u's neighborhood minimum; small-star re-hangs the smaller
    * neighbors. Each is one edge-keyed aggregation plus a join —
    * distributed, no driver state; rounds are `localCheckpoint`ed and
    * convergence is detected by an order-independent edge-set
    * signature (count + bit_xor of pair hashes — one tiny action per
    * round, no except/join). Output contract matches
    * [[Dedup.connectedComponents]]: `(doc_id, cluster_rep)` with
    * cluster_rep = component minimum; isolated ids are their own rep. */
  def connectedComponentsAlternating(allIds: DataFrame, pairs: DataFrame,
      maxRounds: Int = 25): DataFrame = {
    def canonSig(df: DataFrame): (Long, Long) = {
      val r = df
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b")).distinct()
        .agg(count(lit(1)), bit_xor(xxhash64(col("a"), col("b"))))
        .collect().head
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    def largeStar(e: DataFrame): DataFrame = {
      val u = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      val m = u.groupBy("src").agg(min(col("dst")).as("__mn"))
        .select(col("src"), least(col("__mn"), col("src")).as("__m"))
      u.join(m, "src")
        .where(col("dst") > col("src"))
        .select(col("dst").as("src"), col("__m").as("dst"))
        .where(col("src") =!= col("dst"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      // orient large -> small, so every dst < src; m = min neighbor
      val d = e.select(greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst")).distinct()
      val m = d.groupBy("src").agg(min(col("dst")).as("__m"))
      d.join(m, "src")
        .select(explode(array(
          struct(col("dst").as("x"), col("__m").as("y")),
          struct(col("src").as("x"), col("__m").as("y")))).as("p"))
        .select(col("p.x").as("src"), col("p.y").as("dst"))
        .where(col("src") =!= col("dst"))
        .distinct()
    }
    var edges = pairs
      .select(col("a").cast("long").as("src"), col("b").cast("long").as("dst"))
      .where(col("src") =!= col("dst")).distinct()
      .localCheckpoint(true)
    def canonEdges(df: DataFrame): DataFrame = df
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b")).distinct()
    var prevSig = canonSig(edges)
    var round = 0
    var converged = edges.isEmpty
    while (round < maxRounds && !converged) {
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      val sig = canonSig(next)
      if (sig == prevSig) {
        // The (count, bit_xor(xxhash64)) signature is necessary but a
        // ~2^-64 collision between successive NON-equal edge sets would
        // otherwise terminate early with silently wrong labels. Confirm
        // with ONE set-equality action on the final pair only (not per
        // round): counts already match via the signature, so
        // one-directional except() emptiness implies equality on these
        // distinct canonical sets. A failed confirm just keeps looping.
        converged = canonEdges(next).except(canonEdges(edges)).isEmpty
      }
      prevSig = sig
      // freed only AFTER the confirm action above — it reads the old
      // round's blocks (see Checkpoints' contract)
      graft.core.Checkpoints.free(edges)
      edges = next
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsAlternating did not converge in $maxRounds " +
        "rounds — raise maxRounds (expected O(log n))")
    val labels = edges
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .groupBy(col("src").as("id")).agg(min(col("dst")).as("__mn"))
      .select(col("id"), least(col("__mn"), col("id")).as("label"))
    allIds.select(col("id"))
      .join(labels, Seq("id"), "left_outer")
      .select(col("id").as("doc_id"),
        coalesce(col("label"), col("id")).as("cluster_rep"))
  }
}
