package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Double])*) =
    rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))

  test("kMeansAssign: separable clusters recovered after one update") {
    // two tight blobs; seeds (ids 0 and 1) land one in each blob
    val df = emb(
      0L -> Seq(0.0, 0.1), 1L -> Seq(10.0, 9.9),
      2L -> Seq(0.1, 0.0), 3L -> Seq(10.1, 10.0),
      4L -> Seq(0.2, 0.1), 5L -> Seq(9.9, 10.1))
    val got = Clustering.kMeansAssign(df, k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got(0L) === got(2L) && got(2L) === got(4L))
    assert(got(1L) === got(3L) && got(3L) === got(5L))
    assert(got(0L) !== got(1L))
  }

  test("kMeansAssign: iters=1 assigns to the seed vectors themselves") {
    val df = emb(0L -> Seq(0.0, 0.0), 1L -> Seq(4.0, 0.0), 2L -> Seq(0.9, 0.0))
    val got = Clustering.kMeansAssign(df, k = 2, iters = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toList
      .sortBy(_._1)
    // seeds are ids 0 (cid 0) and 1 (cid 1); id 2 is nearer seed 0
    assert(got.map(t => t._1 -> t._2) === List(0L -> 0, 1L -> 1, 2L -> 0))
    assert(got(0)._3 === 0.0 && got(1)._3 === 0.0 && got(2)._3 === 0.9)
  }

  test("kMeansAssign: invariant to input partitioning") {
    val base = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val a = Clustering.kMeansAssign(base, k = 4, iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    val b = Clustering.kMeansAssign(base.repartition(13), k = 4, iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(a === b)
  }

  test("kMeansAssign: assignment plan is shuffle-free (argmin over broadcast literals)") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val plan = Clustering.kMeansAssign(emb, k = 4, iters = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"assignment must not shuffle:\n$plan")
  }

  test("kMeansAssign: argmin tie breaks toward the lower cluster id") {
    // point 2 exactly equidistant from both seeds
    val df = emb(0L -> Seq(0.0, 0.0), 1L -> Seq(2.0, 0.0), 2L -> Seq(1.0, 0.0))
    val got = Clustering.kMeansAssign(df, k = 2, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got(2L) === 0)
  }
}
