package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.graft.GraftExpectsInputTypes
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashed character-n-gram count features as ONE native linear scan —
  * the fastText-style featurizer of
  * [[graft.operators.TextAnalysis.charNgramHashFeatures]]: every char
  * n-gram (by CODE POINT) md5-hashes into one of `dim` buckets, bucket
  * counts normalize by the doc's n-gram total and round to 6 decimals.
  *
  * Why native: the SQL-composed form built a per-position bucket array
  * with one `transform` and then ran `dim` separate `filter` passes
  * over it — higher-order functions are CodegenFallback, so that is
  * O(chars · dim) INTERPRETED lambda evaluations per document
  * (measured 7.1s of the lang-ID queries' ~6s apiece at sf0.1; the
  * training steps themselves were < 2s). This expression is the same
  * math as one codegen'd histogram loop: one md5 per n-gram, one
  * array allocation — O(chars + dim) per row.
  *
  * Bit-parity with the replaced chain (and therefore with the DuckDB
  * oracles, which replay it): md5 over the UTF-8 bytes of the
  * code-point-indexed n-gram (UTF8String substring semantics), first
  * 15 hex chars = the top 60 bits read big-endian, `% dim`, and
  * Spark's own double `round` (BigDecimal.valueOf, HALF_UP) for the
  * 6dp normalization. Inputs shorter than n code points yield the
  * all-zero vector (total clamps to 1). */
case class CharNgramFeaturesExpr(child: Expression, n: Int, dim: Int)
    extends UnaryExpression with GraftExpectsInputTypes {

  require(n >= 1 && dim >= 1, s"need n >= 1 and dim >= 1: $n, $dim")

  override def graftInputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "char_ngram_features"

  override def nullSafeEval(input: Any): Any =
    CharNgramFeatures.compute(input.asInstanceOf[UTF8String], n, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharNgramFeatures.compute($c, $n, $dim);")

  override protected def withNewChildInternal(
      newChild: Expression): CharNgramFeaturesExpr =
    copy(child = newChild)
}

object CharNgramFeatures {

  // one digest per executor thread: getInstance per ROW would pay a
  // provider lookup + allocation that rivals the md5 itself on short
  // docs (digest() resets the instance, so reuse is safe)
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(s: UTF8String, n: Int, dim: Int): GenericArrayData = {
    val str = s.toString
    val nCp = str.codePointCount(0, str.length)
    val counts = new Array[Long](dim)
    var total = 0L
    if (nCp >= n) {
      // char offset of each code point, so each window substring is
      // code-point indexed (UTF8String / DuckDB substring parity)
      val offs = new Array[Int](nCp + 1)
      var ci = 0
      var off = 0
      while (off < str.length) {
        offs(ci) = off
        off += Character.charCount(str.codePointAt(off))
        ci += 1
      }
      offs(nCp) = str.length
      val md = md5.get()
      var i = 0
      while (i + n <= nCp) {
        val d = md.digest(str.substring(offs(i), offs(i + n))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // first 15 hex chars of the digest = top 60 bits, big-endian
        var v = 0L
        var k = 0
        while (k < 7) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
        v = (v << 4) | ((d(7) & 0xffL) >>> 4)
        counts((v % dim).toInt) += 1
        total += 1
        i += 1
      }
    }
    val denom = math.max(total, 1L).toDouble
    val out = new Array[Double](dim)
    var b = 0
    while (b < dim) {
      // Spark Round(double, 6) semantics exactly
      out(b) = java.math.BigDecimal.valueOf(counts(b) / denom)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Registry builder: `char_ngram_features(str, n, dim)` with foldable
    * int n/dim. */
  def build(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3,
      s"char_ngram_features(str, n, dim) takes 3 arguments, got ${exprs.length}")
    CharNgramFeaturesExpr(exprs.head,
      intLit(exprs(1), "n"), intLit(exprs(2), "dim"))
  }

  private def intLit(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"char_ngram_features: $name must be an integer literal, got $other")
  }
}
