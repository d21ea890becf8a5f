package graft.core

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}

/** The reference's three-function job shape, typed.
  *
  * kaylee users assign `datafn`/`mapfn`/`reducefn` as attributes on a
  * `Server` and read `results()` (`example.py:32-45`, fields
  * `server.py:64-66`). This is the same contract as one value: construct
  * with the three functions, `run` returns the distributed result,
  * `results` is the explicit bounded collect (the reference collects
  * implicitly into a driver dict, `server.py:174-178` — here crossing
  * that boundary is the caller's visible choice).
  */
final case class MapReduceJob[K1, V1, K2, V2, V3](
    datafn: SparkSession => Dataset[(K1, V1)],
    mapfn: (K1, V1) => IterableOnce[(K2, V2)],
    reducefn: (K2, Iterator[V2]) => V3)(
    implicit e2: Encoder[(K2, V2)],
    ek: Encoder[K2],
    e3: Encoder[(K2, V3)]) {

  /** Distributed result — stays a Dataset. */
  def run(spark: SparkSession): Dataset[(K2, V3)] =
    MapReduce.run(datafn(spark), mapfn, reducefn)

  /** Reference-parity `results()`: collect to a driver map. Explicitly
    * bounded by the key cardinality — use `run` + write for large keys. */
  def results(spark: SparkSession): Map[K2, V3] =
    run(spark).collect().toMap
}
