package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.graft.GraftExpectsInputTypes
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe holding the sketch as a PLAN-EXTERNAL
  * object, not a plan literal.
  *
  * Spark's own `might_contain` requires its filter operand to be a
  * literal or scalar subquery; embedding a multi-megabyte sketch as a
  * binary `Literal` turns out to be catastrophically non-linear in the
  * literal's size (measured: the sf0.1 bloom semi-join went 2s → 50-80s
  * when the bitmap grew 256KB → 1MB — plan-processing and codegen costs
  * scale with the embedded bytes). This expression instead carries the
  * DESERIALIZED `BloomFilter` and registers it via
  * `ctx.addReferenceObj`, the standard mechanism for large objects in
  * generated code: the sketch is serialized once per task, deserialized
  * once per executor instance, and the per-row work is one bitset probe
  * inside whole-stage codegen. This is how a 100 TB run can afford a
  * properly-sized (hundreds of MB) filter.
  *
  * Input must be the XXH64 hash (LONG) of the key, matching what
  * [[graft.operators.BloomPrune]] feeds the sketch build.
  */
case class BloomProbe(child: Expression, filter: BloomFilter)
    extends UnaryExpression with Predicate with GraftExpectsInputTypes {

  override def graftInputTypes: Seq[DataType] = Seq(LongType)
  override def prettyName: String = "bloom_probe"

  override def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("graftBloomFilter", filter,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$bf.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbe =
    copy(child = newChild)
}

object BloomProbe {
  /** Deserialize sketch bytes (as produced by `bloom_agg` /
    * `BloomFilter.writeTo`) into the probe's runtime object. */
  def fromBytes(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
}
