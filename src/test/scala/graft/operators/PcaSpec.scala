package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("hand case: top component of collinear 2-D points is the line direction") {
    // points along y = x: component converges to (1,1)/sqrt(2)
    val emb = Seq(
      (1L, Seq(1.0f, 1.0f)), (2L, Seq(2.0f, 2.0f)),
      (3L, Seq(3.0f, 3.0f)), (4L, Seq(4.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    val tc = Pca.trainTopComponent(emb, "vec_id", "embedding", iters = 5)
    assert(tc.mean === Seq(2.5, 2.5))
    val s = 1.0 / math.sqrt(2.0)
    assert(tc.component.zip(Seq(s, s)).forall { case (a, b) => math.abs(a - b) < 1e-5 })
    // variance along the line: positions -1.5,-0.5,0.5,1.5 scaled sqrt(2)
    // -> eigenvalue = mean of squared projections = 2*var(x) = 2*1.25
    assert(math.abs(tc.eigenvalue - 2.5) < 1e-4)
    val proj = Pca.project(emb, "vec_id", "embedding", tc)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(math.abs(proj(1L) + 1.5 * math.sqrt(2.0)) < 1e-4)
    assert(math.abs(proj(4L) - 1.5 * math.sqrt(2.0)) < 1e-4)
  }

  test("training is partitioning-invariant (anchored trajectory)") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val a = Pca.trainTopComponent(emb, "vec_id", "embedding", iters = 3)
    val b = Pca.trainTopComponent(emb.repartition(7), "vec_id", "embedding", iters = 3)
    assert(a === b)
    assert(a.component.size === 64)
    // unit norm within rounding
    val norm = math.sqrt(a.component.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-4)
  }

  test("projection is a shuffle-free codegen'd plan (no join, no exchange)") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val tc = Pca.trainTopComponent(emb, "vec_id", "embedding", iters = 2)
    val p = Pca.project(emb, "vec_id", "embedding", tc)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Join"), p)
  }

  test("trainComponents: deflation recovers both axes of an anisotropic " +
      "2-D cloud, components near-orthonormal, k=1 == trainTopComponent") {
    import spark.implicits._
    // variance 100x along x, 1x along y: v1 ≈ ±x̂, v2 ≈ ±ŷ (deflation
    // must find the SECOND direction, which plain power iteration
    // re-converging to v1 would miss)
    val rows = (0L until 200L).map { i =>
      val t = (i.toDouble - 99.5) / 10.0
      val s = if (i % 2 == 0) 0.1 else -0.1
      (i, Seq(10.0 * t, s + 0.01 * t))
    }
    val df = rows.toDF("vec_id", "embedding")
    val m = Pca.trainComponents(df, "vec_id", "embedding", k = 2, iters = 8)
    val v1 = m.components(0)
    val v2 = m.components(1)
    assert(math.abs(v1(0)) > 0.99, s"v1 must align with x: $v1")
    assert(math.abs(v2(1)) > 0.99, s"v2 must align with y: $v2")
    val dot = v1.zip(v2).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 1e-2, s"components must be near-orthogonal: $dot")
    assert(m.eigenvalues(0) > m.eigenvalues(1),
      "eigenvalues must come out in decreasing order")
    // k=1 degenerates to the single-component trainer exactly
    val one = Pca.trainComponents(df, "vec_id", "embedding", k = 1, iters = 3)
    val tc = Pca.trainTopComponent(df, "vec_id", "embedding", iters = 3)
    assert(one.components.head === tc.component)
    assert(one.mean === tc.mean)
  }

  test("trainComponents is partitioning-invariant; projectK is " +
      "shuffle-free") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val a = Pca.trainComponents(emb, "vec_id", "embedding", k = 2, iters = 2)
    val b = Pca.trainComponents(emb.repartition(7), "vec_id", "embedding",
      k = 2, iters = 2)
    assert(a === b)
    val p = Pca.projectK(emb, "vec_id", "embedding", a)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Join"), p)
  }
}
