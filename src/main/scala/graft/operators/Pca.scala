package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA via power iteration — the embedding-whitening /
  * dimensionality-audit step of a training-data pipeline (ABBA-style
  * mean-centering + top principal direction, e.g. for embedding
  * de-biasing or variance-explained quality checks).
  *
  * Shape: everything data-sized is distributed; everything model-sized
  * is driver state (the [[Clustering.trainCentroids]] contract).
  * - mean: one per-dimension aggregation (posexplode + map-side
  *   combine, `dim` result rows).
  * - each power step `w = Σ (x−μ)·((x−μ)·v)`: the dot `(x−μ)·v` is a
  *   codegen'd literal expression per row (μ, v embedded as literals),
  *   the per-dimension sum is one combine-enabled aggregation of
  *   `n·dim` exploded terms into `dim` rows; only those reach the
  *   driver. O(iters) jobs, O(dim) driver state.
  * - every driver-side vector is 6-decimal-anchored (the centroid
  *   anchor precedent, [[Clustering]]) with half-away-from-zero
  *   rounding identical to DuckDB `round(x, 6)`, and every in-plan dot
  *   folds dimensions left-to-right — so the whole trajectory replays
  *   bit-stably in the oracle's unrolled CTEs.
  *
  * Deterministic init: the uniform unit vector `1/√dim` (rounded),
  * fine for data whose top component isn't orthogonal to it — a
  * documented assumption, not a hidden one; a second seed column would
  * be the escape hatch at adversarial data.
  */
object Pca {

  private def round6(x: Double): Double =
    (if (x >= 0) math.floor(x * 1e6 + 0.5) else math.ceil(x * 1e6 - 0.5)) / 1e6

  final case class TopComponent(mean: Seq[Double], component: Seq[Double],
      eigenvalue: Double, n: Long)

  /** Centered dot `(x−μ)·v` as a literal left-to-right fold. */
  private def centeredDot(e: Column, mu: Seq[Double], v: Seq[Double]): Column =
    mu.indices.map { i =>
      (element_at(e, i + 1) - lit(mu(i))) * lit(v(i))
    }.reduceLeft(_ + _)

  /** Train the top principal component with `iters` power steps. */
  def trainTopComponent(emb: DataFrame, idCol: String, vecCol: String,
      iters: Int): TopComponent = {
    require(iters >= 1, "iters must be >= 1")
    val df = emb.select(col(vecCol).cast("array<double>").as("e"))
      .cache() // scanned iters+1 times; unpersisted below
    try {
      val meanRows = df
        .select(posexplode(col("e")).as(Seq("d", "x")))
        .groupBy("d").agg(avg(col("x")).as("m"))
        .collect()
      val dim = meanRows.length
      require(dim > 0, "trainTopComponent needs a non-empty corpus")
      val mu = meanRows.sortBy(_.getInt(0)).map(r => round6(r.getDouble(1))).toSeq
      val n = df.count()

      var v: Seq[Double] = Seq.fill(dim)(round6(1.0 / math.sqrt(dim.toDouble)))
      var lastNorm = 0.0
      for (_ <- 1 to iters) {
        val wRows = df
          .withColumn("dotc", centeredDot(col("e"), mu, v))
          .select(col("dotc"), posexplode(col("e")).as(Seq("d", "x")))
          .groupBy("d")
          .agg(sum((col("x") - element_at(lit(mu.toArray), col("d") + 1)) *
            col("dotc")).as("s"))
          .collect()
        val w = wRows.sortBy(_.getInt(0)).map(r => round6(r.getDouble(1))).toSeq
        // norm from the ROUNDED w, left-to-right — replayable exactly
        lastNorm = math.sqrt(w.foldLeft(0.0)((acc, x) => acc + x * x))
        v = w.map(x => round6(x / lastNorm))
      }
      TopComponent(mu, v, round6(lastNorm / n.toDouble), n)
    } finally df.unpersist()
  }

  /** Per-vector projection onto the trained component — a codegen'd
    * literal dot, no join, no shuffle. */
  def project(emb: DataFrame, idCol: String, vecCol: String,
      tc: TopComponent): DataFrame =
    emb.select(col(idCol),
      round(centeredDot(col(vecCol).cast("array<double>"), tc.mean, tc.component), 6)
        .as("pc1"))
}
