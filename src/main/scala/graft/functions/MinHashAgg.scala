package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature aggregate: for each group, the elementwise
  * minima of `numHashes` derived hash functions over the input values,
  * in ONE buffer pass.
  *
  * The composed alternative — k independent `min(hash_i(x))` aggregate
  * columns — evaluates k full hash expressions per input row, and at
  * k=128 the aggregate is too wide for whole-stage codegen (the plan
  * drops to interpreted eval: 0 WholeStageCodegen spans, measured).
  * This aggregate hashes each value ONCE and derives the k values with
  * a multiply-add universal-hash family, keeping the k minima in a
  * single Array[Long] buffer. Executes via ObjectHashAggregate.
  *
  * Hash family (chosen for ENGINE PORTABILITY so a SQL oracle can
  * replay signatures bit-for-bit — the same md5 trick as
  * [[graft.operators.Sampling.hashUniform]]):
  *   base  = first 15 hex chars of md5(value) as a 60-bit long
  *           (SQL: `('0x' || substring(md5(s), 1, 15))::BIGINT`)
  *   h_i   = (A_i * (base mod P) + B_i) mod P,   P = 2^31 - 1
  * All intermediates stay < 2^62, so the arithmetic is exact in any
  * engine's signed 64-bit integers (a 64-bit wraparound family like
  * xxhash64's would overflow-error in SQL engines that check). A_i/B_i
  * are fixed xorshift-generated constants, so signatures are
  * deterministic across JVMs and partitionings.
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
      val hm = MinHashAgg.baseMod(v)
      var i = 0
      while (i < numHashes) {
        val x = MinHashAgg.derive(hm, i)
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

  /** Mersenne prime 2^31 - 1: the family modulus. Small enough that
    * `A_i * h + B_i` never exceeds 2^62 (exact in signed 64-bit
    * everywhere), large enough that k=128 minima over realistic shingle
    * sets collide with negligible probability. */
  val P = 2147483647L

  // fixed xorshift64* stream, reduced into the field: A in [1, P-1]
  // (nonzero so each h_i is a proper pairwise-independent map),
  // B in [0, P-1]
  private def gen(seed: Long, nonzero: Boolean): Array[Long] = {
    var s = seed
    Array.fill(MaxHashes) {
      s ^= s >>> 12; s ^= s << 25; s ^= s >>> 27
      val v = (s * 0x2545F4914F6CDD1DL) & Long.MaxValue
      if (nonzero) v % (P - 1) + 1 else v % P
    }
  }
  private[graft] val A: Array[Long] = gen(0x9E3779B97F4A7C15L, nonzero = true)
  private[graft] val B: Array[Long] = gen(0xC2B2AE3D27D4EB4FL, nonzero = false)

  /** SQL list literals of the first k coefficients — for DuckDB oracle
    * generation (the oracle replays the exact same family). */
  def coeffsSqlA(k: Int): String = A.take(k).mkString("[", ",", "]")
  def coeffsSqlB(k: Int): String = B.take(k).mkString("[", ",", "]")

  /** The i-th derived hash of a base-mod-P value; total on any long
    * input (floorMod) so property tests can feed arbitrary bases. */
  def derive(hm: Long, i: Int): Long =
    (A(i) * Math.floorMod(hm, P) + B(i)) % P

  /** 60-bit md5 base hash mod P: first 15 hex chars of md5 = the
    * big-endian first 8 digest bytes shifted right 4. */
  def baseMod(v: Any): Long = {
    val bytes = v match {
      case s: UTF8String => s.getBytes
      case b: Array[Byte] => b
      case other => other.toString.getBytes(StandardCharsets.UTF_8)
    }
    val d = digest.get().digest(bytes)
    val top = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    (top >>> 4) % P
  }

  // MessageDigest is stateful and not thread-safe; one per task thread
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
}
