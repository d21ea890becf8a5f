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

  final case class PcaModel(mean: Seq[Double], components: Seq[Seq[Double]],
      eigenvalues: Seq[Double], n: Long)

  /** Top-k principal components via power iteration WITH DEFLATION
    * (Hotelling; public algorithm): component j power-iterates on the
    * covariance with components 1..j−1 projected out. Nothing is
    * re-materialized — the deflated residual never exists as data.
    * Per step, each row computes its centered dots against every
    * PREVIOUS component and the current iterate (all literal codegen'd
    * folds), the residual dot
    * `rdot = (x−μ)·v − Σ_i (v_i·v)·((x−μ)·v_i)` uses plan-time
    * constants `v_i·v` (NOT assumed zero: the 6dp-anchored components
    * are only approximately orthonormal, and the oracle replays the
    * exact same correction), and the step reduces to TWO bounded
    * aggregations per iteration — the per-dimension sums
    * `A_d = Σ (x_d−μ_d)·rdot` (dim rows) and the per-previous-component
    * scalars `S_i = Σ ((x−μ)·v_i)·rdot` (j−1 values); the driver
    * combines `w_d = A_d − Σ_i v_i,d·S_i` left-to-right, 6dp-anchors,
    * and normalizes from the ROUNDED w (the [[trainTopComponent]]
    * conventions, so the whole k-component trajectory replays in
    * unrolled CTEs). Driver state: O(k·dim). Jobs: O(k·iters). */
  def trainComponents(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): PcaModel = {
    require(k >= 1 && iters >= 1, "k and iters must be >= 1")
    val df = emb.select(col(vecCol).cast("array<double>").as("e"))
      .cache() // scanned k*iters+1 times; unpersisted below
    try {
      val meanRows = df
        .select(posexplode(col("e")).as(Seq("d", "x")))
        .groupBy("d").agg(avg(col("x")).as("m"))
        .collect()
      val dim = meanRows.length
      require(dim > 0, "trainComponents needs a non-empty corpus")
      require(k <= dim, s"k=$k exceeds dim=$dim")
      val mu = meanRows.sortBy(_.getInt(0)).map(r => round6(r.getDouble(1))).toSeq
      val n = df.count()

      val comps = scala.collection.mutable.ArrayBuffer.empty[Seq[Double]]
      val eigs = scala.collection.mutable.ArrayBuffer.empty[Double]
      for (j <- 1 to k) {
        var v: Seq[Double] = Seq.fill(dim)(round6(1.0 / math.sqrt(dim.toDouble)))
        var lastNorm = 0.0
        for (_ <- 1 to iters) {
          // plan-time constants: current iterate against each previous
          // component, folded left-to-right like every in-plan dot
          val cs = comps.map(vi =>
            vi.indices.foldLeft(0.0)((acc, i) => acc + vi(i) * v(i))).toSeq
          val dotcPrev = comps.map(vi => centeredDot(col("e"), mu, vi)).toSeq
          val rdot = dotcPrev.zip(cs).foldLeft(centeredDot(col("e"), mu, v)) {
            case (acc, (dc, c)) => acc - lit(c) * dc
          }
          val withR = df.withColumn("rdot", rdot)
          val aRows = withR
            .select(col("rdot"), posexplode(col("e")).as(Seq("d", "x")))
            .groupBy("d")
            .agg(sum((col("x") - element_at(lit(mu.toArray), col("d") + 1)) *
              col("rdot")).as("s"))
            .collect()
          val a = aRows.sortBy(_.getInt(0)).map(_.getDouble(1)).toSeq
          val s: Seq[Double] =
            if (comps.isEmpty) Seq.empty
            else {
              val aggCols = dotcPrev.zipWithIndex.map { case (dc, i) =>
                sum(dc * col("rdot")).as(s"s$i")
              }
              val row = withR.agg(aggCols.head, aggCols.tail: _*).head()
              comps.indices.map(row.getDouble)
            }
          val w = a.indices.map { d =>
            round6(comps.indices.foldLeft(a(d))((acc, i) =>
              acc - comps(i)(d) * s(i)))
          }
          lastNorm = math.sqrt(w.foldLeft(0.0)((acc, x) => acc + x * x))
          // rank-deficient guard: when k exceeds the corpus's effective
          // rank (or the corpus is constant), the deflated iterate
          // rounds to all zeros and dividing would silently poison
          // every remaining component with NaN — fail loudly instead
          require(lastNorm > 0,
            s"trainComponents: component $j deflated to the zero vector " +
              s"(k=$k exceeds the corpus's effective rank)")
          v = w.map(x => round6(x / lastNorm))
        }
        comps += v
        eigs += round6(lastNorm / n.toDouble)
      }
      PcaModel(mu, comps.toSeq, eigs.toSeq, n)
    } finally df.unpersist()
  }

  /** Per-vector projection onto every trained component —
    * `(id, pc1 … pck)`, one codegen'd literal dot per component, no
    * join, no shuffle; stateless, so it applies unchanged to a
    * streaming frame. */
  def projectK(emb: DataFrame, idCol: String, vecCol: String,
      model: PcaModel): DataFrame = {
    val e = col(vecCol).cast("array<double>")
    emb.select(col(idCol) +: model.components.zipWithIndex.map {
      case (v, j) =>
        round(centeredDot(e, model.mean, v), 6).as(s"pc${j + 1}")
    }: _*)
  }
}
