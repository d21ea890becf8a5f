package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.graft.GraftExpectsInputTypes
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints (Schleimer et al., SIGMOD '03) as ONE native
  * linear scan: per-position Karp-Rabin hashes of every codepoint
  * `k`-gram (rolling update, O(1) per position), sliding-window minima
  * of `window` consecutive hashes, then sorted-distinct selection.
  *
  * Why native: the md5-based form
  * ([[graft.operators.TextAnalysis.winnowFingerprints]]) pays one md5
  * per character position — measured as the single most expensive scan
  * in the engine (8–14s for 5k docs at sf0.1; at 100 TB it would
  * dominate every fingerprinting job). The rolling polynomial update is
  * a handful of integer ops per position — same selection guarantees
  * (any shared substring of ≥ k + window − 1 codepoints shares a
  * fingerprint), two orders of magnitude less arithmetic.
  *
  * Hash family (engine-portable, replayed in the DuckDB oracle):
  * per k-gram, two independent polynomial hashes over Unicode
  * codepoints —
  *   `h1 = Σ cp·B1^(k−1−j) mod M1` (B1 = 31, M1 = 2³¹ − 1)
  *   `h2 = Σ cp·B2^(k−1−j) mod M2` (B2 = 37, M2 = 10⁹ + 7)
  * combined as `h1·M2 + h2` (< 2⁶¹, fits a long; a single 31-bit hash
  * would birthday-collide at corpus gram counts, the pair restores
  * ~60-bit effective width — the md5 form's collision regime). All
  * intermediates stay below 2⁶³ in plain long arithmetic by
  * construction, so the oracle can replay the exact values with
  * 64-bit SQL integers, no 128-bit math needed.
  *
  * Returns array<long> of the selected fingerprints, sorted distinct;
  * inputs with fewer than k + window − 1 codepoints yield an empty
  * array (callers filter, as the md5 form does). */
case class WinnowFpsExpr(child: Expression, k: Int, window: Int)
    extends UnaryExpression with GraftExpectsInputTypes {

  require(k >= 1 && window >= 1, s"k and window must be >= 1: $k, $window")

  override def graftInputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override def nullSafeEval(input: Any): Any =
    WinnowFps.compute(input.asInstanceOf[UTF8String], k, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowFps.compute($c, $k, $window);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFpsExpr =
    copy(child = newChild)
}

object WinnowFps {
  val B1 = 31L
  val M1: Long = (1L << 31) - 1 // 2147483647, Mersenne prime
  val B2 = 37L
  val M2 = 1000000007L

  /** Per-position k-gram hashes of a string's codepoints — the shared
    * first phase of [[compute]] (winnow selection) and the standalone
    * [[KgramHashesExpr]] (`kgram_hashes`): `hs(i)` = the dual
    * polynomial hash of codepoints `[i, i+k)`, rolling O(1) per
    * position. Empty array when the string has fewer than k
    * codepoints. */
  def positionHashes(s: UTF8String, k: Int): Array[Long] = {
    // codepoint array once — rolling over codepoints (not UTF-16 units)
    // keeps parity with character-indexed SQL oracles on ALL inputs
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    if (n < k) return Array.empty[Long]
    val cps = new Array[Int](n)
    var ci = 0
    var off = 0
    while (off < str.length) {
      val cp = str.codePointAt(off)
      cps(ci) = cp; ci += 1
      off += Character.charCount(cp)
    }
    // highest-power coefficients for the rolling subtract
    var p1 = 1L; var p2 = 1L
    var t = 1
    while (t < k) { p1 = (p1 * B1) % M1; p2 = (p2 * B2) % M2; t += 1 }
    val nGrams = n - k + 1
    val hs = new Array[Long](nGrams)
    var h1 = 0L; var h2 = 0L
    var i = 0
    while (i < k) {
      h1 = (h1 * B1 + cps(i)) % M1
      h2 = (h2 * B2 + cps(i)) % M2
      i += 1
    }
    hs(0) = h1 * M2 + h2
    var g = 1
    while (g < nGrams) {
      val out = cps(g - 1)
      val in = cps(g + k - 1)
      // (h - cp_out·B^(k−1)) may go negative: renormalize before the
      // multiply so every intermediate stays in [0, 2^52)
      h1 = (((h1 - out * p1) % M1 + M1) % M1 * B1 + in) % M1
      h2 = (((h2 - out * p2) % M2 + M2) % M2 * B2 + in) % M2
      hs(g) = h1 * M2 + h2
      g += 1
    }
    hs
  }

  /** The whole winnow pipeline for one string; static so generated code
    * is one call regardless of k/window. */
  def compute(s: UTF8String, k: Int, window: Int): GenericArrayData = {
    val hs = positionHashes(s, k)
    val nGrams = hs.length
    if (nGrams < window) return new GenericArrayData(Array.empty[Long])
    // sliding-window minima (window is small — single-digit — so the
    // O(n·window) direct scan beats a deque's branchiness)
    val nWin = nGrams - window + 1
    val mins = new Array[Long](nWin)
    var w = 0
    while (w < nWin) {
      var m = hs(w)
      var j = 1
      while (j < window) { val v = hs(w + j); if (v < m) m = v; j += 1 }
      mins(w) = m
      w += 1
    }
    java.util.Arrays.sort(mins)
    var distinct = 1
    var r = 1
    while (r < nWin) { if (mins(r) != mins(r - 1)) distinct += 1; r += 1 }
    val out = new Array[Long](distinct)
    out(0) = mins(0)
    var o = 1
    r = 1
    while (r < nWin) {
      if (mins(r) != mins(r - 1)) { out(o) = mins(r); o += 1 }
      r += 1
    }
    new GenericArrayData(out)
  }

  /** Registry builder: `winnow_fps(str, k, window)` with foldable int
    * k/window. */
  def build(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3,
      s"winnow_fps(str, k, window) takes 3 arguments, got ${exprs.length}")
    WinnowFpsExpr(exprs.head, intLit(exprs(1), "winnow_fps", "k"),
      intLit(exprs(2), "winnow_fps", "window"))
  }

  /** Registry builder: `kgram_hashes(str, k)` with foldable int k. */
  def buildKgramHashes(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"kgram_hashes(str, k) takes 2 arguments, got ${exprs.length}")
    KgramHashesExpr(exprs.head, intLit(exprs(1), "kgram_hashes", "k"))
  }

  private def intLit(e: Expression, fn: String, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $name must be an integer literal, got $other")
  }
}

/** Per-position codepoint k-gram hashes — [[WinnowFps.positionHashes]]
  * exposed standalone: element i (0-based) is the dual polynomial hash
  * of codepoints `[i, i+k)`; strings shorter than k codepoints yield an
  * empty array. The positional fingerprint feed of
  * [[graft.operators.Dedup.duplicateCharSpans]]: hashes shuffle as
  * 8-byte longs where the raw k-char grams would shuffle k codepoints
  * each, and the SAME values replay in the DuckDB oracle
  * ([[graft.queries.TextQueries.winnowPolyCtes]]'s power-sum form), so
  * even a hash collision cannot diverge the two engines. */
case class KgramHashesExpr(child: Expression, k: Int)
    extends UnaryExpression with GraftExpectsInputTypes {

  require(k >= 1, s"k must be >= 1: $k")

  override def graftInputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kgram_hashes"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      WinnowFps.positionHashes(input.asInstanceOf[UTF8String], k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.WinnowFps.positionHashes($c, $k));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): KgramHashesExpr =
    copy(child = newChild)
}
