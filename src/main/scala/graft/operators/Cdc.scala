package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) — the storage-layer dedup family.
  *
  * Where the text dedup operators ([[Dedup]]) ask "are these DOCUMENTS
  * near-identical", CDC asks "which BYTE RANGES recur across the
  * corpus": payloads split at positions where a rolling hash of the
  * trailing bytes hits a mask, so identical content produces identical
  * chunks REGARDLESS of its byte offset — an insertion near the front
  * of a file shifts every fixed-size block but CDC boundaries
  * re-synchronize within one hash window (the LBFS anchor idea;
  * gear hash per FastCDC — both published algorithms). This is the
  * dedup you run on raw blob/media corpora before any decoding at all.
  *
  * The rolling hash is the gear recurrence `h ← (2h + G[byte]) mod
  * 2^32` over a deterministic 256-entry table. Multiples of 2^32
  * vanish, so `h_i` depends on exactly the trailing 32 bytes — the
  * DuckDB oracle replays it SET-BASED (each position joins a 32-row
  * offset/power table; no per-row recursion), the same shape as the
  * winnowing oracles. A position ends a chunk when the TOP `maskBits`
  * bits of `h` are zero (high bits mix the whole window; low bits
  * would only see the trailing `maskBits` bytes) — expected chunk
  * length 2^maskBits bytes.
  *
  * [[chunks]]' boundaries are pure functions of content with NO
  * min/max clamping: clamping makes each cut depend on the previous
  * one (sequential state, replayable only by recursion) and weakens
  * the offset-independence that makes CDC dedup work. [[chunksClamped]]
  * is the production backstop variant: the SAME continuous gear hash
  * (so the mask-hit candidate set is identical to the unclamped one),
  * with a cut accepted only at chunk length ≥ `minLen` and FORCED at
  * `maxLen` — under adversarial low-entropy payloads (megabytes with
  * no mask hit) chunk rows stay bounded at `maxLen`, and wherever the
  * unclamped cut spacing already lies within [minLen, maxLen] the two
  * variants cut identically. The clamp is a guard, not a semantic —
  * the unclamped form stays the oracled reference.
  *
  * Scale shape: chunking is one `mapPartitions` pass per payload — no
  * shuffle, no state; the dedup stage groups by chunk content — one
  * shuffle keyed on bounded-size chunk bytes (expected 2^maskBits),
  * i.e. the exact-dedup groupBy shape applied to sub-document ranges. */
object Cdc {

  /** Deterministic gear table: entry b is the high 32 bits of
    * `(b+1) · 0x9E3779B97F4A7C15` (golden-ratio multiply — embedded
    * verbatim in the oracle SQL so both engines hash identically). */
  private[graft] val gear: Array[Int] =
    Array.tabulate(256)(b => (((b + 1).toLong * 0x9E3779B97F4A7C15L) >>> 32).toInt)

  /** Positions (0-based, inclusive) that END a chunk: the top
    * `maskBits` bits of the gear hash at that byte are zero. */
  private[graft] def cutEnds(payload: Array[Byte], maskBits: Int): Array[Int] = {
    require(maskBits >= 1 && maskBits <= 31)
    val mask = (((1L << maskBits) - 1) << (32 - maskBits)).toInt
    val buf = scala.collection.mutable.ArrayBuffer.empty[Int]
    var h = 0
    var i = 0
    while (i < payload.length) {
      h = h * 2 + gear(payload(i) & 0xff)
      if ((h & mask) == 0) buf += i
      i += 1
    }
    buf.toArray
  }

  /** [[cutEnds]] with the production clamp: the SAME continuous gear
    * hash (the candidate set is exactly the unclamped one), but a
    * mask hit only cuts at chunk length ≥ `minLen`, and a cut is
    * FORCED at length `maxLen` whether or not the hash hits. Chunk
    * sizes are therefore ≤ maxLen by construction (the adversarial
    * constant-byte backstop), and identical to the unclamped cuts
    * wherever those already space within [minLen, maxLen]. Forced
    * cuts are offset-dependent (they chain from the previous cut),
    * but the next in-bounds mask hit re-anchors the sequence to
    * content — the re-synchronization property survives the clamp. */
  private[graft] def clampedCutEnds(payload: Array[Byte], maskBits: Int,
      minLen: Int, maxLen: Int): Array[Int] = {
    require(maskBits >= 1 && maskBits <= 31)
    require(minLen >= 1 && maxLen >= minLen,
      s"need 1 <= minLen <= maxLen, got [$minLen, $maxLen]")
    val mask = (((1L << maskBits) - 1) << (32 - maskBits)).toInt
    val buf = scala.collection.mutable.ArrayBuffer.empty[Int]
    var h = 0
    var i = 0
    var start = 0
    while (i < payload.length) {
      h = h * 2 + gear(payload(i) & 0xff)
      val len = i - start + 1
      if (((h & mask) == 0 && len >= minLen) || len >= maxLen) {
        buf += i
        start = i + 1
      }
      i += 1
    }
    buf.toArray
  }

  /** One row per chunk given the cut-end positions: the final chunk
    * always ends at the last byte; empty payloads emit no rows. */
  private def sliceRows(id: Long, p: Array[Byte],
      ends: Array[Int]): Iterator[(Long, Int, Int, Int, Array[Byte])] = {
    val allEnds =
      if (p.isEmpty) Array.empty[Int]
      else if (ends.nonEmpty && ends.last == p.length - 1) ends
      else ends :+ (p.length - 1)
    var start = 0
    allEnds.iterator.zipWithIndex.map { case (end, idx) =>
      val slice = java.util.Arrays.copyOfRange(p, start, end + 1)
      val r = (id, idx, start, end - start + 1, slice)
      start = end + 1
      r
    }
  }

  /** Split each payload into content-defined chunks. Output one row
    * per chunk: `(id, chunk_idx, offset, length, chunk)` — `chunk` is
    * the raw byte slice, the groupBy key for cross-corpus dedup. The
    * final chunk always ends at the last byte. Empty payloads emit no
    * rows. */
  def chunks(df: DataFrame, idCol: String, payloadCol: String,
      maskBits: Int = 6): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val src: Dataset[(Long, Array[Byte])] = df
      .select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
    src.mapPartitions { it =>
      it.flatMap { case (id, payload) =>
        val p = if (payload == null) Array.empty[Byte] else payload
        sliceRows(id, p, cutEnds(p, maskBits))
      }
    }.toDF("id", "chunk_idx", "offset", "length", "chunk")
  }

  /** [[chunks]] with the [[clampedCutEnds]] production backstop: same
    * output shape, chunk length ≤ `maxLen` GUARANTEED (so an
    * adversarial low-entropy payload — megabytes with no mask hit —
    * cannot produce an unbounded chunk row), mask hits under `minLen`
    * skipped. `maxLen = 0` (the default) means `4 · 2^maskBits` —
    * four times the expected chunk size, the classic FastCDC-style
    * bound. Still one mapPartitions pass, no shuffle, no state. */
  def chunksClamped(df: DataFrame, idCol: String, payloadCol: String,
      maskBits: Int = 6, minLen: Int = 1, maxLen: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val mx = if (maxLen > 0) maxLen else 4 << maskBits
    val src: Dataset[(Long, Array[Byte])] = df
      .select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
    src.mapPartitions { it =>
      it.flatMap { case (id, payload) =>
        val p = if (payload == null) Array.empty[Byte] else payload
        sliceRows(id, p, clampedCutEnds(p, maskBits, minLen, mx))
      }
    }.toDF("id", "chunk_idx", "offset", "length", "chunk")
  }

  /** Corpus-level CDC dedup audit over a chunked frame ([[chunks]]):
    * total vs distinct chunk counts and bytes, and the byte-level
    * dedup ratio a chunk store would achieve. One groupBy on chunk
    * content, one global rollup. */
  def dedupStats(chunked: DataFrame): DataFrame = {
    chunked
      .groupBy(col("chunk"))
      // all rows of one content share its length — max is just the
      // deterministic pick
      .agg(count(lit(1)).as("n"), max(col("length")).as("len"))
      .agg(
        sum(col("n")).as("total_chunks"),
        count(lit(1)).as("distinct_chunks"),
        sum(col("n") * col("len")).as("total_bytes"),
        sum(col("len")).as("distinct_bytes"))
      .select(col("total_chunks"), col("distinct_chunks"),
        col("total_bytes"), col("distinct_bytes"),
        // engine-portable 6dp rounding (floor(x·1e6 + 0.5)/1e6): the
        // ratio is an exact rational that CAN land on a decimal half
        // boundary, where Spark round and DuckDB round diverge
        (floor((lit(1.0) - col("distinct_bytes") / col("total_bytes"))
          * 1e6 + 0.5) / 1e6).as("dedup_ratio"))
  }

  /** The gear table as DuckDB SQL rows `(b, g)` — embedded in oracle
    * queries so the replay uses bit-identical constants. */
  private[graft] def gearSqlValues: String =
    gear.zipWithIndex
      .map { case (g, b) => s"($b, ${g.toLong & 0xffffffffL})" }
      .grouped(8).map(_.mkString(", ")).mkString(",\n    ")
}
