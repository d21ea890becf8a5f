package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Space-filling-curve data layout: Z-order (Morton) clustering for
  * multi-dimensional file skipping — the OPTIMIZE ZORDER operation of
  * lakehouse table formats, as an engine operator.
  *
  * Why it matters at 100 TB: parquet scan pruning works off per-file /
  * per-row-group min-max stats. A table range-partitioned on ONE key
  * prunes predicates on that key only; Z-ordering on two keys
  * interleaves their bit ranks, so files cover small RECTANGLES of the
  * (a, b) space and predicates on either key (or both) skip most files
  * ([[LayoutSpec]] measures the rectangle-area collapse vs a linear
  * sort; the classic public treatment is Morton 1966 and the
  * Delta/Iceberg OPTIMIZE docs).
  *
  * Everything is in-plan: per-key bounds come from a one-row broadcast
  * aggregate (the q_histogram pattern), the bit interleave is a
  * shift/mask fold — pure codegen, no UDF; the write is
  * `repartitionByRange` on the code (range exchange = the one shuffle)
  * + `sortWithinPartitions`.
  */
object Layout {

  /** Interleave the low `bits` of `a` (even positions) and `b` (odd
    * positions) into a Morton code. */
  def interleave(a: Column, b: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)).cast("long"), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)).cast("long"), 2 * i + 1))
    }

  /** Add a `z` Morton-code column over two integer key columns, each
    * min-max rank-scaled to `bits` bits in-plan (one-row broadcast
    * bounds — no driver action, no extra shuffle on the data side). */
  def withZCode(df: DataFrame, a: Column, b: Column, bits: Int = 16): DataFrame = {
    val bounds = df.agg(
      min(a.cast("long")).as("mina"), max(a.cast("long")).as("maxa"),
      min(b.cast("long")).as("minb"), max(b.cast("long")).as("maxb"))
    val top = (1L << bits) - 1
    // `div` (exact integer division) — a float `/`+floor can be off by
    // one ulp exactly at multiples, and the oracle uses integer `//`
    df.crossJoin(broadcast(bounds))
      .withColumn("__za", a.cast("long"))
      .withColumn("__zb", b.cast("long"))
      .withColumn("__ra",
        expr(s"((__za - mina) * ${top}L) div greatest(1L, maxa - mina)"))
      .withColumn("__rb",
        expr(s"((__zb - minb) * ${top}L) div greatest(1L, maxb - minb)"))
      .withColumn("z", interleave(col("__ra"), col("__rb"), bits))
      .drop("mina", "maxa", "minb", "maxb", "__za", "__zb", "__ra", "__rb")
  }

  /** Write `df` Z-ordered on `(a, b)`: one range exchange on the code,
    * in-partition sort, `nFiles` output files whose min-max stats are
    * tight on BOTH keys. */
  def writeZOrdered(df: DataFrame, path: String, a: Column, b: Column,
      nFiles: Int, bits: Int = 16): Unit =
    withZCode(df, a, b, bits)
      .repartitionByRange(nFiles, col("z"))
      .sortWithinPartitions(col("z"))
      .drop("z")
      .write.mode("overwrite").parquet(path)
}
