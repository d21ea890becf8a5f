package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("withExtensions registers graft functions for SQL use") {
    // getOrCreate returns any ACTIVE session (ignoring extensions), so
    // clear the session slots first; this builds a NEW SparkSession —
    // with our extensions — over the JVM's existing SparkContext.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val h = spark.sql("SELECT rolling_hash('abc') AS h").collect().head.getLong(0)
    val expected = "abc".foldLeft(0L)((acc, c) => (acc * 31 + c) % 1000000007L)
    assert(h === expected)
    val d = spark.sql(
      "SELECT vector_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect().head.getDouble(0)
    assert(d === 11.0)
    val sig = spark.sql(
      "SELECT minhash_agg(v, 4) AS sig FROM VALUES ('a'), ('b') t(v)")
      .collect().head.getSeq[Long](0)
    assert(sig.length === 4)
    assert(sig.forall(_ != Long.MaxValue), "both values hashed into the minima")
    val ent = spark.sql("SELECT char_entropy('ab') AS e")
      .collect().head.getDouble(0)
    assert(ent === 1.0)
    // count_in: duplicates counted, in-loop lowercasing
    val ci = spark.sql(
      "SELECT count_in(array('The', 'the', 'fox', 'and'), 'the,and', true) AS c")
      .collect().head.getInt(0)
    assert(ci === 3)
    // bloom pair round-trips through SQL: a sketch of {1, 2} must pass
    // both members (no false negatives, ever)
    import org.apache.spark.sql.functions._
    // CAST to BIGINT: xxhash64 is type-sensitive and the probe side
    // below hashes longs
    val bf = spark.sql(
      "SELECT bloom_agg(xxhash64(CAST(v AS BIGINT)), 10L, 1024L) AS bf " +
      "FROM VALUES (1), (2) t(v)")
      .collect().head.getAs[Array[Byte]](0)
    val got = spark.range(1, 3).toDF("id")
      .filter(call_function("bloom_contains", lit(bf), xxhash64(col("id"))))
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L))
    // round-7 additions: the full native surface resolves through the
    // extension route too (the defensive per-session register is not
    // required for sessions built with the extensions)
    val nfc = spark.sql("SELECT nfc_normalize('e\u0301') AS s")
      .collect().head.getString(0)
    assert(nfc === "\u00e9", "NFC composes e + combining acute")
    val fps = spark.sql("SELECT winnow_fps('abcabcabc', 3, 2) AS f")
      .collect().head.getSeq[Long](0)
    assert(fps.nonEmpty && fps == fps.sorted && fps.distinct == fps)
    val khs = spark.sql("SELECT kgram_hashes('abcd', 3) AS h")
      .collect().head.getSeq[Long](0)
    assert(khs.length === 2, "two 3-grams in a 4-char string")
    // hashes replay the documented dual polynomial family
    def poly(s: String): Long = {
      val h1 = s.foldLeft(0L)((a, c) => (a * 31 + c) % 2147483647L)
      val h2 = s.foldLeft(0L)((a, c) => (a * 37 + c) % 1000000007L)
      h1 * 1000000007L + h2
    }
    assert(khs === Seq(poly("abc"), poly("bcd")))
    // deliberately NOT stopping: the SparkContext is shared with the
    // other suites in this JVM
  }
}
