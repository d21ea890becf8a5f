package graft.functions

import java.security.MessageDigest

import graft.SparkSpec
import org.apache.spark.unsafe.types.UTF8String

class MinHashAggSpec extends SparkSpec {
  import spark.implicits._

  /** Independent md5 base-hash reference: first 15 hex chars of the
    * digest, parsed from the hex STRING (the aggregate derives the same
    * value arithmetically from the digest bytes). */
  private def base(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(15), 16) % MinHashAgg.P
  }

  private def reference(values: Seq[String], k: Int): Seq[Long] = {
    val buf = Array.fill(k)(Long.MaxValue)
    values.foreach { s =>
      val h = base(s)
      var i = 0
      while (i < k) {
        val x = MinHashAgg.derive(h, i)
        if (x < buf(i)) buf(i) = x
        i += 1
      }
    }
    buf.toSeq
  }

  test("baseMod matches the hex-string parse of md5 (the SQL-oracle form)") {
    for (s <- Seq("", "a", "shingle 1", "x y z", "ünïcode £"))
      assert(MinHashAgg.baseMod(UTF8String.fromString(s)) === base(s), s)
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
