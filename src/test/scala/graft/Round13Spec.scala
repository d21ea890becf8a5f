package graft

import org.apache.spark.sql.functions._

/** Round-13 invariants.
  *
  * ASCII-CORPUS INVARIANT: the CDC and dHash oracle replays index
  * CHARACTERS (`unicode(text[i])` over `range(octet_length)`) while the
  * engine hashes UTF-8 BYTES — equivalent iff every document is pure
  * ASCII. One multi-byte character would misalign every subsequent
  * position and silently diverge all four query families at once, so
  * the invariant is ASSERTED here per scale factor rather than merely
  * assumed (see the `cdcCtes` scaladoc in DedupQueries). A non-ASCII
  * corpus would need those oracles to index `encode(text)` blob bytes.
  */
class Round13Spec extends SparkSpec {

  test("documents corpus is pure ASCII at every scale factor — the " +
      "byte-vs-character equivalence the CDC/dHash oracles stand on") {
    for (dir <- Seq(sf0001, sf001, "/root/testdata/sf0.1")) {
      // UTF-8 encodes exactly the ASCII codepoints in one byte, so
      // char length == byte length ⟺ pure ASCII
      val nonAscii = spark.read.parquet(s"$dir/documents.parquet")
        .filter(length(col("text")) =!=
          octet_length(encode(col("text"), "UTF-8")))
        .count()
      assert(nonAscii === 0L,
        s"$dir holds $nonAscii non-ASCII documents — the CDC/dHash " +
          "oracles' unicode(text[i]) byte replay is no longer valid; " +
          "switch them to blob-byte indexing")
    }
  }
}
