package graft.core

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.expressions.Aggregator

/** Typed MapReduce core — the parity surface of the reference engine.
  *
  * The reference (sdiehl/kaylee) runs `reducefn . shuffle . mapfn . datafn`
  * with the formal semantics declared in its `README.md:36-45`:
  *
  * {{{
  * datafn  :: () -> [(k1, v1)]
  * map     :: (k1, v1) -> [(k2, v2)]      -- flatMap semantics
  * shuffle :: [(k2, v2)] -> [(k2, [v2])]  -- group values by key
  * reduce  :: (k2, [v2]) -> v3
  * }}}
  *
  * The reference shuffles through a driver-side `defaultdict(list)`
  * (`server.py:211-214`, `283-287`) — its self-declared main bottleneck
  * (`README.md:11-15`). Here the shuffle is Spark's distributed hash
  * shuffle: never driver-resident, spillable, and (on the [[runReduced]] /
  * [[runAggregated]] fast paths) combined map-side before any bytes move.
  * At 100 TB that map-side combine is the difference between shuffling
  * terabytes and shuffling the (tiny) key cardinality.
  *
  * Design notes vs. the reference, per SURVEY.md §2/§7:
  *  - task scheduling / heartbeats / code shipping / serialization
  *    (`server.py` rows 2, 8, 10-12) are Spark-owned — nothing to build;
  *  - the byte-extend shuffle quirk (`server.py:283-287`) is consciously
  *    NOT replicated — we implement the intended list semantics;
  *  - results stay a distributed `Dataset` (the reference collects to a
  *    driver dict, `server.py:174-178`); `.collect()` is the caller's
  *    explicit, bounded choice.
  */
object MapReduce {

  /** General form: `flatMap → groupByKey → mapGroups`.
    *
    * Matches the reference contract exactly: the reducer sees ALL values
    * for a key as one lazy iterator (mirroring `client.py:204-207`'s lazy
    * `imap` deserialization — an early-exiting reducer skips work). No
    * map-side combine is possible here because `reduceFn` is an arbitrary
    * per-group fold; prefer [[runReduced]]/[[runAggregated]] whenever the
    * reduction is associative+commutative — at scale this form shuffles
    * every mapped record.
    */
  def run[K1, V1, K2, V2, V3](
      data: Dataset[(K1, V1)],
      mapFn: (K1, V1) => IterableOnce[(K2, V2)],
      reduceFn: (K2, Iterator[V2]) => V3)(
      implicit e2: Encoder[(K2, V2)],
      ek: Encoder[K2],
      e3: Encoder[(K2, V3)]): Dataset[(K2, V3)] =
    data
      .flatMap { case (k, v) => mapFn(k, v) }
      .groupByKey(_._1)
      .mapGroups((k, it) => (k, reduceFn(k, it.map(_._2))))

  /** Fast path for associative+commutative reducers (the common case —
    * word count, sums, max/min). `reduceGroups` runs on a typed
    * `Aggregator` under the hood, so Spark performs partial (map-side)
    * aggregation before the shuffle — the single biggest perf delta vs.
    * the reference, which ships whole value lists to reducers
    * (`server.py:252-254`).
    */
  def runReduced[K1, V1, K2, V2](
      data: Dataset[(K1, V1)],
      mapFn: (K1, V1) => IterableOnce[(K2, V2)],
      combine: (V2, V2) => V2)(
      implicit e2: Encoder[(K2, V2)],
      ek: Encoder[K2]): Dataset[(K2, V2)] =
    data
      .flatMap { case (k, v) => mapFn(k, v) }
      .groupByKey(_._1)
      .reduceGroups((a, b) => (a._1, combine(a._2, b._2)))
      .map { case (k, (_, v)) => (k, v) }

  /** Full monoid form: distinct value/buffer/output types with map-side
    * combine via a typed `Aggregator` — the Spark-native shape of the
    * reference's `reducefn` when the fold has an identity and a merge.
    */
  def runAggregated[K1, V1, K2, V2, B, V3](
      data: Dataset[(K1, V1)],
      mapFn: (K1, V1) => IterableOnce[(K2, V2)],
      zeroB: B,
      seqOp: (B, V2) => B,
      combOp: (B, B) => B,
      finishB: B => V3)(
      implicit e2: Encoder[(K2, V2)],
      ek: Encoder[K2],
      eb: Encoder[B],
      ev3: Encoder[V3],
      e3: Encoder[(K2, V3)]): Dataset[(K2, V3)] = {
    val agg = new FoldAggregator[K2, V2, B, V3](zeroB, seqOp, combOp, finishB, eb, ev3)
    data
      .flatMap { case (k, v) => mapFn(k, v) }
      .groupByKey(_._1)
      .agg(agg.toColumn)
  }

  /** Top-k by value, descending: the reference example's driver-side
    * `sorted(...)[1:25]` (`example.py:45`) done distributed — each
    * partition keeps only k candidates; the driver merges k per partition,
    * never the full dataset. Note the reference slice `[1:25]` silently
    * drops rank 1; that is a bug we do not replicate — `topK(n)` returns
    * ranks 1..n.
    */
  def topK[K, V](ds: Dataset[(K, V)], k: Int)(
      implicit ord: Ordering[V]): Array[(K, V)] =
    ds.rdd.top(k)(Ordering.by[(K, V), V](_._2)(ord))

  /** Distributed top-k PER KEY with a bounded buffer: each map-side
    * partial keeps at most k values, so the shuffle moves k values per
    * key per partition — not the whole group. This is the scale
    * alternative to the `row_number() <= k` window (which must sort
    * every group in full); identical results when `ord` is a total
    * order (put a tiebreaker in `ord` — ties at rank k are broken by
    * it, deterministically). Values arrive sorted best-first. */
  def topKPerKey[K, V](ds: Dataset[(K, V)], k: Int)(
      implicit ord: Ordering[V],
      ekv: Encoder[(K, V)], ek: Encoder[K], eb: Encoder[Seq[V]],
      eo: Encoder[(K, Seq[V])]): Dataset[(K, Seq[V])] = {
    require(k > 0, "k must be positive")
    // buffers are kept sorted best-first; the common case (a row worse
    // than the current kth) is rejected in O(1) — no re-sort per row
    def insert(b: Seq[V], v: V): Seq[V] =
      if (b.size >= k && ord.gteq(v, b.last)) b
      else {
        val i = {
          val j = b.indexWhere(x => ord.lt(v, x))
          if (j < 0) b.size else j
        }
        val grown = (b.take(i) :+ v) ++ b.drop(i)
        if (grown.size > k) grown.take(k) else grown
      }
    def mergeSorted(a: Seq[V], b: Seq[V]): Seq[V] = {
      val av = a.toIndexedSeq
      val bv = b.toIndexedSeq
      val out = scala.collection.mutable.ArrayBuffer.empty[V]
      var i = 0
      var j = 0
      while (out.size < k && (i < av.size || j < bv.size)) {
        if (j >= bv.size || (i < av.size && ord.lteq(av(i), bv(j)))) {
          out += av(i); i += 1
        } else {
          out += bv(j); j += 1
        }
      }
      out.toSeq
    }
    runAggregated[K, V, K, V, Seq[V], Seq[V]](
      ds, (kk, v) => Seq((kk, v)),
      Seq.empty[V],
      insert,
      mergeSorted,
      identity)
  }
}

/** Aggregator backing [[MapReduce.runAggregated]]: a keyed monoid fold
  * with map-side partial aggregation. */
private[core] class FoldAggregator[K2, V2, B, V3](
    zeroB: B,
    seqOp: (B, V2) => B,
    combOp: (B, B) => B,
    finishB: B => V3,
    eb: Encoder[B],
    ev3: Encoder[V3])
  extends Aggregator[(K2, V2), B, V3] {
  override def zero: B = zeroB
  override def reduce(b: B, a: (K2, V2)): B = seqOp(b, a._2)
  override def merge(b1: B, b2: B): B = combOp(b1, b2)
  override def finish(b: B): V3 = finishB(b)
  override def bufferEncoder: Encoder[B] = eb
  override def outputEncoder: Encoder[V3] = ev3
}
