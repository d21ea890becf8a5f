package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClassificationSpec extends SparkSpec {
  import spark.implicits._

  private def round6(x: Double): Double =
    (if (x >= 0) math.floor(x * 1e6 + 0.5) else math.ceil(x * 1e6 - 0.5)) / 1e6

  private def round9(x: Double): Double =
    (if (x >= 0) math.floor(x * 1e9 + 0.5) else math.ceil(x * 1e9 - 0.5)) / 1e9

  /** Driver-side replay of the documented trajectory: zero init,
    * σ(w·[1.0 ++ x]) with a left-to-right fold, full-batch avg
    * gradient 9dp-anchored, 6-decimal weight anchor per step. */
  private def referenceLogReg(rows: Seq[(Seq[Double], Double)], steps: Int,
      lr: Double): Seq[Double] = {
    val xs = rows.map { case (x, y) => (1.0 +: x, y) }
    var w = Seq.fill(xs.head._1.size)(0.0)
    for (_ <- 1 to steps) {
      val grads = Array.fill(w.size)(0.0)
      xs.foreach { case (xa, y) =>
        val m = xa.zip(w).foldLeft(0.0)((a, p) => a + p._1 * p._2)
        val d = 1.0 / (1.0 + math.exp(-m)) - y
        xa.zipWithIndex.foreach { case (v, i) => grads(i) += d * v }
      }
      w = w.zipWithIndex.map { case (wi, i) =>
        round6(wi - lr * round9(grads(i) / xs.size))
      }
    }
    w
  }

  private def emb(rows: (Long, Seq[Double], Int)*) =
    rows.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"), col("label"))

  private def tinyDf = emb(
    (0L, Seq(2.0, 0.5), 1), (1L, Seq(1.5, 1.0), 1),
    (2L, Seq(-1.0, -0.5), 0), (3L, Seq(-2.0, 0.5), 0),
    (4L, Seq(1.0, -1.0), 1), (5L, Seq(-0.5, -2.0), 0))

  private def tinyRows = Seq(
    (Seq(2.0, 0.5), 1.0), (Seq(1.5, 1.0), 1.0), (Seq(-1.0, -0.5), 0.0),
    (Seq(-2.0, 0.5), 0.0), (Seq(1.0, -1.0), 1.0), (Seq(-0.5, -2.0), 0.0))

  test("trainLogReg matches the driver-side trajectory replay exactly") {
    val got = Classification.trainLogReg(tinyDf, "vec_id", "embedding",
      col("label") === 1, steps = 3, lr = 1.0)
    val want = referenceLogReg(tinyRows, steps = 3, lr = 1.0)
    assert(got === want)
  }

  test("trained scores separate a separable dataset") {
    val scored = Classification.logRegScores(tinyDf, "vec_id", "embedding",
        col("label") === 1, steps = 5, lr = 1.0)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val pos = scored.filter(_._2 == 1.0).map(_._3)
    val neg = scored.filter(_._2 == 0.0).map(_._3)
    assert(pos.min > neg.max,
      s"positives ${pos.toSeq} must outscore negatives ${neg.toSeq}")
  }

  test("weights invariant to input partitioning at 2/8/32 partitions, " +
      "including the aggressive-lr regime (9dp gradient anchor)") {
    val base = spark.read.parquet(s"$sf0001/embeddings.parquet")
    // lr=1 (the oracled regime) and lr=50 (far past convergence — the
    // regime where un-anchored sum-order noise amplifies straight past
    // the 6dp weight anchor; determinism must hold even where GD
    // itself diverges)
    for (lr <- Seq(1.0, 50.0)) {
      val runs = Seq(2, 8, 32).map { p =>
        Classification.trainLogReg(base.repartition(p), "vec_id",
          "embedding", col("label") === 1, steps = 3, lr = lr)
      }
      assert(runs.distinct.size === 1,
        s"lr=$lr trajectories differ across partitionings: $runs")
    }
  }

  test("empty input: Nil weights, empty scored frame with correct schema") {
    val empty = tinyDf.where(lit(false))
    assert(Classification.trainLogReg(empty, "vec_id", "embedding",
      col("label") === 1, steps = 2, lr = 1.0) === Nil)
    val scored = Classification.logRegScores(empty, "vec_id", "embedding",
      col("label") === 1)
    assert(scored.columns.toSeq === Seq("id", "y", "lr_score"))
    assert(scored.count() === 0L)
  }

  test("scoreLogReg is a shuffle-free codegen'd projection") {
    val base = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val plan = Classification.scoreLogReg(base, "vec_id", "embedding",
      Seq(0.1, 0.2, 0.3) ++ Seq.fill(62)(0.0))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("*(1) Project"), plan) // *-prefix = codegen'd stage
  }

  test("gradient step stays a dim+1-row aggregate (map-side combined)") {
    // the per-step plan must aggregate on the exploded index alone —
    // partial_ aggregation before the exchange bounds the shuffle to
    // (dim+1) rows per task at any corpus size
    val base = spark.read.parquet(s"$sf0001/embeddings.parquet")
    // mirror one training step's frame without collecting
    val step = base.select(
        concat(array(lit(1.0)), col("embedding").cast("array<double>")).as("__xa"),
        lit(0.5).as("__d"))
      .select(posexplode(col("__xa")).as(Seq("i", "v")), col("__d"))
      .groupBy(col("i"))
      .agg(sum(col("__d") * col("v")).as("g"), count(lit(1)).as("n"))
    val plan = step.queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum") || plan.contains("partial"), plan)
  }
}
