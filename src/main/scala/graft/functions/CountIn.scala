package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.GraftExpectsInputTypes
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of array elements contained in a small STATIC vocabulary —
  * the stopword-hit primitive behind language ID and stopword-ratio
  * quality features.
  *
  * Why native: the composed form `size(filter(toks, isInCollection))`
  * goes through a higher-order function, and HOFs are CodegenFallback —
  * every token costs an interpreted lambda invocation plus a boxed
  * `In` evaluation, and the language-ID screen runs FOUR of those
  * passes per document (one per language's list). This expression is
  * one codegen'd loop per list over the unmodified `ArrayData` with a
  * hash-set probe per token (duplicates counted, exactly like the
  * filter form). `lowercase = true` folds the also-interpreted
  * `transform(toks, lower)` pre-pass into the same loop via
  * `UTF8String.toLowerCase` — the identical lowering Spark's `lower`
  * performs, so values are unchanged and DuckDB oracles replay
  * `lower(token)` as before.
  *
  * The reference has no text operators (SURVEY.md §2) — LLM-pipeline
  * extension surface, same family as [[CharEntropy]].
  */
case class CountInExpr(child: Expression, words: Seq[String],
    lowercase: Boolean)
    extends UnaryExpression with GraftExpectsInputTypes {

  require(words.nonEmpty, "count_in: empty vocabulary")

  override def graftInputTypes: Seq[DataType] =
    Seq(ArrayType(StringType, containsNull = true))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "count_in"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  /** Shared by eval and generated code (referenced via addReferenceObj). */
  def count(arr: ArrayData): Int = {
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        var t = arr.getUTF8String(i)
        if (lowercase) t = t.toLowerCase
        if (set.contains(t)) c += 1
      }
      i += 1
    }
    c
  }

  override def nullSafeEval(input: Any): Any =
    count(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("countIn", this,
      classOf[CountInExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.count($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): CountInExpr =
    copy(child = newChild)
}

object CountIn {
  /** Registry builder: `count_in(arr, 'w1,w2,…', lowercase)` — the
    * vocabulary travels as one comma-joined string literal (stopword
    * lists contain no commas), lowercase as a boolean literal. */
  def build(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3,
      s"count_in(arr, words, lowercase) takes 3 arguments, got ${exprs.length}")
    val words = exprs(1) match {
      case Literal(v: UTF8String, StringType) => v.toString.split(',').toSeq
      case other => throw new IllegalArgumentException(
        s"count_in: words must be a string literal, got $other")
    }
    val lower = exprs(2) match {
      case Literal(v: Boolean, _) => v
      case other => throw new IllegalArgumentException(
        s"count_in: lowercase must be a boolean literal, got $other")
    }
    CountInExpr(exprs.head, words, lower)
  }
}
