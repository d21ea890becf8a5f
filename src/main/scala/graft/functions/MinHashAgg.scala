package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature aggregate: for each group, the elementwise
  * minima of `numHashes` derived hash functions over the input values,
  * in ONE buffer pass.
  *
  * The composed alternative — `agg(min(xxhash64(lit(0), x)), ...,
  * min(xxhash64(lit(k-1), x)))` — evaluates k independent full xxhash64
  * expressions per input row, and at k=128 the aggregate is too wide
  * for whole-stage codegen (the plan drops to interpreted eval:
  * 0 WholeStageCodegen spans, measured). This aggregate hashes each
  * value ONCE (xxhash64, seed 42) and derives the k values with a
  * multiply-add universal-hash family `h_i = a_i*h + b_i` (odd `a_i`,
  * fixed xorshift-generated constants, so signatures are deterministic
  * across JVMs/partitionings), keeping the k minima in a single
  * Array[Long] buffer. Executes via ObjectHashAggregate.
  *
  * This is the `TypedImperativeAggregate` escape hatch SURVEY.md §7
  * reserved for MinHash signature buffers.
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def prettyName: String = "minhash_agg"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = XxHash64Function.hash(v, child.dataType, 42L)
      val a = MinHashAgg.A
      val b = MinHashAgg.B
      var i = 0
      while (i < numHashes) {
        val x = a(i) * h + b(i)
        if (x < buf(i)) buf(i) = x
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (other(i) < buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}

object MinHashAgg {
  /** Max hash functions whose coefficients are pregenerated. */
  val MaxHashes = 1024

  // fixed xorshift64* stream; multipliers forced odd (bijective mod 2^64)
  private def gen(seed: Long, odd: Boolean): Array[Long] = {
    var s = seed
    Array.fill(MaxHashes) {
      s ^= s >>> 12; s ^= s << 25; s ^= s >>> 27
      val v = s * 0x2545F4914F6CDD1DL
      if (odd) v | 1L else v
    }
  }
  private[functions] val A: Array[Long] = gen(0x9E3779B97F4A7C15L, odd = true)
  private[functions] val B: Array[Long] = gen(0xC2B2AE3D27D4EB4FL, odd = false)
}
