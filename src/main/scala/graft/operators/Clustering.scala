package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column — the trainer
  * behind IVF cell assignment ([[Similarity.ivfTopK]]) and the standard
  * corpus-clustering step of a training-data pipeline (topic balancing,
  * cluster-based dedup/curation à la SemDeDup).
  *
  * Scale shape: centroids are the ONLY driver-resident state — O(k·dim)
  * doubles per iteration, independent of corpus size (the same contract
  * as Spark MLlib's KMeans). Each iteration is one scan: assignment is a
  * per-row argmin over k broadcast centroid literals (no row explosion,
  * no shuffle), and the centroid update is a posexplode + two-level
  * aggregation whose map-side combine reduces the shuffle to
  * k·dim rows per partition. Nothing else crosses the network.
  *
  * Determinism: init = the k lowest-id vectors; every centroid element
  * is rounded to 6 decimals between iterations (half-away-from-zero,
  * matching DuckDB `round`) so the oracle can replay the exact same
  * trajectory; argmin ties break toward the lower cluster id via struct
  * ordering. Reference for the operator's role (not implementation):
  * kaylee has no clustering — this is north-star extension work
  * (`/root/reference/README.md:4-8` scopes the reference to MapReduce).
  */
object Clustering {

  /** Half-away-from-zero rounding to 6 decimals — same boundary rule as
    * DuckDB's `round(x, 6)` (`std::round(x*1e6)/1e6`), used for the
    * inter-iteration centroid anchor in BOTH engines so tiny sum-order
    * differences can't compound across iterations. */
  private def round6(x: Double): Double =
    (if (x >= 0) math.floor(x * 1e6 + 0.5) else math.ceil(x * 1e6 - 0.5)) / 1e6

  /** Squared L2 distance to a constant centroid, as a sequential fold in
    * double precision (same order as the oracle's per-element sum). */
  private def sqDist(e: Column, c: Seq[Double]): Column =
    aggregate(zip_with(e, typedlit(c), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** The per-row argmin projection over a fixed centroid set — k
    * distances per row as broadcast literals, no row multiplication, no
    * shuffle; ties break toward the lower cid via struct ordering.
    * Stateless, so it applies unchanged to a STREAMING DataFrame
    * (see graft.streaming.StreamingOps.assignToCentroids). */
  def assign(df: DataFrame, centroids: Seq[(Int, Seq[Double])],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(centroids.nonEmpty, "assign needs at least one centroid")
    val scored = array(centroids.map { case (cid, c) =>
      struct(sqrt(sqDist(col(vecCol).cast("array<double>"), c)).as("d"),
        lit(cid).as("cid"))
    }: _*)
    df.select(col(idCol).as("vec_id"), array_min(scored).as("best"))
      .select(col("vec_id"), col("best.cid").as("cluster"),
        round(col("best.d"), 4).as("dist"))
  }

  /** Run the Lloyd loop and return the final centroid set — the model a
    * pipeline trains once in batch and then applies to batches or
    * streams via [[assign]]. `iters` rounds = iters-1 update passes
    * (the iters-th assignment is whatever the caller does with the
    * result). Returns an empty seq on an empty corpus. */
  def trainCentroids(emb: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): Seq[(Int, Seq[Double])] = {
    require(k > 0 && iters > 0, "k and iters must be positive")
    val df = emb.select(col(idCol).as("vec_id"),
      col(vecCol).cast("array<double>").as("e"))
      .cache() // scanned iters times; unpersisted below

    try {
      // deterministic seed: the k lowest-id vectors (TakeOrdered — only k
      // rows reach the driver). kmeans|| is the scale-up init; for a
      // fixed-trajectory oracle query the deterministic seed is the point.
      var centroids: Seq[(Int, Seq[Double])] =
        df.orderBy(col("vec_id")).limit(k).collect().toSeq.zipWithIndex.map {
          case (r, i) => (i, r.getSeq[Double](1).map(round6))
        }

      for (_ <- 1 until iters if centroids.nonEmpty) {
        // per-dimension mean per cluster: k·dim rows after map-side
        // combine; collected to the driver as the next centroid set.
        // A cluster that loses all members simply disappears (both
        // engines drop it identically).
        val scored = array(centroids.map { case (cid, c) =>
          struct(sqrt(sqDist(col("e"), c)).as("d"), lit(cid).as("cid"))
        }: _*)
        val upd = df.withColumn("best", array_min(scored))
          .select(col("best.cid").as("cid"), posexplode(col("e")).as(Seq("i", "v")))
          .groupBy(col("cid"), col("i"))
          .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
          .collect()
        centroids = upd.groupBy(_.getInt(0)).map { case (cid, rows) =>
          (cid, rows.sortBy(_.getInt(1))
            .map(r => round6(r.getDouble(2) / r.getLong(3))).toSeq)
        }.toSeq.sortBy(_._1)
      }
      centroids
    } finally {
      // every training pass ends inside this call, so the cache has no
      // consumers left; leaving it pinned would accumulate one cached
      // corpus per invocation (probe loops, repeated queries) until LRU
      df.unpersist()
    }
  }

  /** Assign every vector to its nearest of `k` centroids after `iters`
    * Lloyd rounds ([[trainCentroids]] + one [[assign]] pass). Returns
    * (vec_id, cluster, dist) with dist = euclidean distance to the
    * final centroid, rounded to 4 decimals.
    */
  def kMeansAssign(emb: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val centroids = trainCentroids(emb, k, iters, idCol, vecCol)
    if (centroids.isEmpty) // empty corpus: empty result, correct schema
      return emb.select(col(idCol).as("vec_id"), lit(0).as("cluster"),
        lit(0.0).as("dist"))
    assign(emb, centroids, idCol, vecCol)
  }
}
