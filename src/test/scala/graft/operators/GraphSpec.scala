package graft.operators

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference: same uniform-reset weighted PageRank. */
  private def reference(edges: Seq[(String, String)], d: Double,
      iters: Int): Map[String, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val outDeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toDouble }
    var ranks = nodes.map(_ -> 1.0).toMap
    for (_ <- 1 to iters) {
      val contribs = edges
        .groupBy(_._2)
        .map { case (dst, es) =>
          dst -> es.map { case (src, _) => ranks(src) / outDeg(src) }.sum
        }
      ranks = nodes.map(n => n -> ((1 - d) + d * contribs.getOrElse(n, 0.0))).toMap
    }
    ranks
  }

  test("pageRank matches the driver-side reference; partition-invariant") {
    val edges = Seq(
      ("a", "b"), ("a", "b"), ("a", "c"), // parallel edge weights a->b
      ("b", "c"), ("c", "a"), ("d", "c")) // d is a source, no in-edges
    val expected = reference(edges, 0.85, 15)
    for (p <- Seq(1, 5)) {
      val got = Graph.pageRank(edges.toDF("src", "dst").repartition(p),
          0.85, 15)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got.keySet === expected.keySet, s"partitions=$p")
      got.foreach { case (n, r) =>
        assert(math.abs(r - expected(n)) < 1e-9, s"node $n: $r vs ${expected(n)}")
      }
    }
    // structural sanity: the sink-fed hub outranks the pure source
    assert(expected("c") > expected("d"))
  }

  test("pageRank on an empty-join graph: every node gets the reset mass") {
    val edges = Seq(("x", "y")).toDF("src", "dst")
    val got = Graph.pageRank(edges, 0.85, 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // x has no in-edges: rank = 1 - d
    assert(math.abs(got("x") - 0.15) < 1e-12)
    assert(got("y") > got("x"))
  }
}
