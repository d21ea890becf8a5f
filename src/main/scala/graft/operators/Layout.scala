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

  /** Token-balanced training shards: assign every row a shard id in
    * [0, nShards) such that (1) shards are CONTIGUOUS in a
    * deterministic, data-defined order (md5(id) — the reproducible
    * "epoch shuffle" of a pretraining run: same corpus → same order on
    * any cluster, any partitioning), and (2) each shard carries ~equal
    * TOKEN mass, not row count — what keeps every trainer rank fed at
    * the same rate when document lengths are skewed.
    *
    * The scale problem is the exact global WEIGHTED prefix sum: the
    * classic `sum(n) over (order by h)` is a single-partition window —
    * the canonical 100 TB scale-killer. Shape here (the
    * [[Stats.distributedNtile]] idiom, made weighted, with one
    * improvement): rows are range-bucketed by the first md5 byte —
    * uniform BY CONSTRUCTION, so unlike value-bucketed ntile there is
    * no skew caveat at all — per-bucket token totals collapse into a
    * bounded 256-row array whose prefix sums are array folds (no
    * WindowExec), and the within-bucket cumulative sum is a keyed
    * window. Global cumulative = bucket offset + within-bucket sum;
    * a document straddling a boundary belongs to the shard where its
    * FIRST token lands (the [[TextAnalysis.packSequences]] rule), in
    * exact integer arithmetic (`(cum−n)·nShards div total` — bigint
    * headroom: 2^44 tokens × 2^10 shards < 2^63).
    *
    * Output: `id`, `n_tokens`, `shard`. Write with
    * `.repartition(col("shard")).write.partitionBy("shard")` (or
    * [[graft.sources.Sinks]]) to materialize one directory per rank. */
  def tokenBalancedShards(df: DataFrame, idCol: String,
      nTokensCol: Column, nShards: Int, epochSalt: String = ""): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nShards > 0, "need nShards > 0")
    // epoch e of a multi-epoch run passes a distinct salt (e.g. "e1"):
    // md5(salt‖id) is an independent deterministic permutation per
    // epoch — reshuffled data order without materializing anything
    val base = df
      .select(col(idCol).as("id"), nTokensCol.cast("long").as("n_tokens"))
      .withColumn("__h",
        md5(concat(lit(epochSalt), col("id").cast("string")).cast("binary")))
      .withColumn("__bkt",
        conv(substring(col("__h"), 1, 2), 16, 10).cast("int"))
    // bounded 256-row bucket table → offsets + grand total via array
    // folds (the distributedNtile meta idiom — no WindowExec)
    val meta = base.groupBy(col("__bkt")).agg(sum(col("n_tokens")).as("__bt"))
      .agg(sort_array(collect_list(struct(col("__bkt"), col("__bt")))).as("__arr"))
      .select(explode(expr(
        "transform(__arr, (x, i) -> named_struct(" +
          "'__bkt', x.__bkt, " +
          "'__off', aggregate(slice(__arr, 1, i), 0L, (a, y) -> a + y.__bt), " +
          "'__tot', aggregate(__arr, 0L, (a, y) -> a + y.__bt)))")).as("__m"))
      .select(col("__m.__bkt").as("__bkt"), col("__m.__off").as("__off"),
        col("__m.__tot").as("__tot"))
    val wB = Window.partitionBy(col("__bkt"))
      .orderBy(col("__h").asc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(broadcast(meta), Seq("__bkt"))
      .withColumn("__cum", sum(col("n_tokens")).over(wB) + col("__off"))
      .withColumn("shard",
        expr(s"((__cum - n_tokens) * ${nShards}L) div greatest(1L, __tot)")
          .cast("int"))
      .select(col("id"), col("n_tokens"), col("shard"))
  }

  /** Materialize [[tokenBalancedShards]]: the full rows land in one
    * directory per shard (`shard=K/`), each carrying ~equal token mass
    * — the trainer-rank data layout. One id-keyed join back onto the
    * source (the assignment frame carries only id + shard) and the
    * [[graft.sources.Sinks.writePartitioned]] small-files discipline
    * (repartition on the partition column before the write). */
  def writeTokenShards(df: DataFrame, path: String, idCol: String,
      nTokensCol: Column, nShards: Int, epochSalt: String = ""): Unit = {
    val shards = tokenBalancedShards(df, idCol, nTokensCol, nShards, epochSalt)
      .select(col("id").as(idCol), col("shard"))
    graft.sources.Sinks.writePartitioned(
      df.join(shards, Seq(idCol)), path, Seq("shard"))
  }

  /** Reproducible seeded corpus shuffle into `numShards` training
    * shards: each row's shard AND its position within the shard are
    * pure functions of (seed, id) — the epoch-reshuffle primitive
    * (epoch 3 = `seed="epoch3"`; same seed reproduces the exact order
    * on any cluster, any partitioning, any rerun; a new seed is a
    * statistically independent order, no re-materialization of the
    * corpus needed).
    *
    * Scale shape: NO global sort and no single-partition window — the
    * trap in the naive `row_number() over (order by rand())` (one
    * partition ranks all 100 TB, and rand() isn't reproducible across
    * retries). Shard = first 16 md5 bits mod numShards (uniform up to
    * a <= 1/65536 bias per shard, irrelevant next to content skew);
    * position = row_number over a SHARD-partitioned window ordered by
    * the full md5 hex (id tiebreak), so each window ranks ~n/numShards
    * rows in parallel. Consumers read shard k in pos order — a
    * partition-pruned scan when written `partitionBy("shard")`. */
  def seededShuffleShards(df: DataFrame, idCol: String, seed: String,
      numShards: Int): DataFrame = {
    require(numShards > 0, "need numShards > 0")
    // withColumn REPLACES same-named input columns — a frame already
    // carrying a `shard` (e.g. from tokenBalancedShards) would be
    // silently clobbered; make the clash an error the caller fixes
    val clash = Seq("shard", "pos", "__k").filter(df.columns.contains)
    require(clash.isEmpty,
      s"seededShuffleShards writes columns ${clash.mkString(", ")} that " +
        "already exist on the input — rename or drop them first")
    import org.apache.spark.sql.expressions.Window
    val k = md5(concat(lit(seed), lit(":"), col(idCol).cast("string"))
      .cast("binary"))
    df.withColumn("__k", k)
      .withColumn("shard",
        (conv(substring(col("__k"), 1, 4), 16, 10).cast("long")
          % numShards).cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("__k"), col(idCol))))
      .drop("__k")
  }
}
