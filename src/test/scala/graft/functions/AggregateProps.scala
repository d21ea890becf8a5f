package graft.functions

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck laws for the custom aggregation buffers: Spark may split
  * input across partials arbitrarily and merge in any order, so the
  * buffer algebra must be a commutative monoid for results to be
  * partitioning-independent. These exercise the buffer logic directly
  * (no SparkSession needed — the distributed paths are covered by
  * MinHashAggSpec / MapReduceSpec). */
object AggregateProps extends Properties("AggregateBuffers") {

  private val agg = MinHashAgg(
    org.apache.spark.sql.catalyst.expressions.Literal("x"), 16)

  private def bufOf(hashes: Seq[Long]): Array[Long] = {
    val b = agg.createAggregationBuffer()
    // replicate update()'s derivation for arbitrary base hashes
    hashes.foreach { h =>
      var i = 0
      while (i < 16) {
        val x = MinHashAgg.derive(h, i)
        if (x < b(i)) b(i) = x
        i += 1
      }
    }
    b
  }

  private val hashesGen = Gen.listOf(Gen.long)

  property("merge is commutative") =
    Prop.forAll(hashesGen, hashesGen) { (xs, ys) =>
      val ab = agg.merge(bufOf(xs), bufOf(ys)).toSeq
      val ba = agg.merge(bufOf(ys), bufOf(xs)).toSeq
      ab == ba
    }

  property("merge of split == buffer of whole (any split point)") =
    Prop.forAll(hashesGen, Gen.choose(0, 100)) { (xs, cut) =>
      val k = if (xs.isEmpty) 0 else cut % (xs.size + 1)
      val (l, r) = xs.splitAt(k)
      agg.merge(bufOf(l), bufOf(r)).toSeq == bufOf(xs).toSeq
    }

  property("serialize round-trips") =
    Prop.forAll(hashesGen) { xs =>
      val b = bufOf(xs)
      agg.deserialize(agg.serialize(b)).toSeq == b.toSeq
    }

  property("empty buffer is the merge identity") =
    Prop.forAll(hashesGen) { xs =>
      agg.merge(bufOf(xs), agg.createAggregationBuffer()).toSeq == bufOf(xs).toSeq
    }
}
