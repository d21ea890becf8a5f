package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

class MinHashAggSpec extends SparkSpec {
  import spark.implicits._

  private def reference(values: Seq[String], k: Int): Seq[Long] = {
    val buf = Array.fill(k)(Long.MaxValue)
    values.foreach { s =>
      val h = XxHash64Function.hash(UTF8String.fromString(s), StringType, 42L)
      var i = 0
      while (i < k) {
        val x = MinHashAgg.A(i) * h + MinHashAgg.B(i)
        if (x < buf(i)) buf(i) = x
        i += 1
      }
    }
    buf.toSeq
  }

  test("signatures match the driver-side reference, any partitioning") {
    val values = (1 to 500).map(i => s"shingle $i")
    val expected = reference(values, 16)
    for (p <- Seq(1, 7, 32)) {
      val df = values.map(v => (1L, v)).toDF("id", "shingle").repartition(p)
      val got = graft.operators.Dedup.minHashSignatures(df, 16)
        .collect().map(r =>
          (r.getLong(0), r.getSeq[Long](1))).toMap
      assert(got(1L) === expected, s"partitions=$p")
    }
  }

  test("independent groups get independent signatures") {
    val df = Seq((1L, "aaa"), (1L, "bbb"), (2L, "aaa")).toDF("id", "shingle")
    val got = graft.operators.Dedup.minHashSignatures(df, 8)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    assert(got(1L) === reference(Seq("aaa", "bbb"), 8))
    assert(got(2L) === reference(Seq("aaa"), 8))
    assert(got(1L) !== got(2L))
  }

  test("identical shingle sets give identical signatures (the MinHash property)") {
    val a = Seq("x y z", "y z w", "z w v")
    val df = (a.map(s => (10L, s)) ++ a.reverse.map(s => (20L, s)))
      .toDF("id", "shingle")
    val got = graft.operators.Dedup.minHashSignatures(df, 32)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    assert(got(10L) === got(20L))
  }
}
