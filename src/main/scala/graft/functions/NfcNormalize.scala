package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.GraftExpectsInputTypes
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical composition) as a native
  * Catalyst expression — the text-canonicalization step a multilingual
  * corpus pipeline runs before hashing/dedup: the same visible string
  * can arrive as composed (`é` = U+00E9) or decomposed
  * (`e` + U+0301) codepoints, and every exact-dedup fingerprint,
  * shingle, and URL key treats those as different bytes unless
  * normalized first.
  *
  * Spark ships no normalization function, and a Scala UDF would break
  * whole-stage codegen; this stays codegen'd (the [[CharEntropy]]
  * pattern). Fast path: `Normalizer.isNormalized` is a cheap scan that
  * returns true for pure-ASCII and most already-composed text, in
  * which case the input UTF8String is returned as-is with zero
  * allocation — at web scale the overwhelmingly common case.
  * Map-only, no shuffle: scales as the scan.
  *
  * DuckDB has the matching `nfc_normalize`, so results oracle as full
  * value equality (both implement Unicode canonical composition).
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with GraftExpectsInputTypes {

  override def graftInputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** Static entry point shared by eval and generated code. */
  def compute(u: UTF8String): UTF8String = {
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
}
