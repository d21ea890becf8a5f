package graft.functions

import org.apache.spark.sql.SparkSession

/** Registry for graft's native Catalyst expressions. Idempotent; every
  * operator entry point calls this with the session it's handed, so SQL
  * and `call_function` references resolve in whichever session executes
  * the plan.
  *
  * Registration is performed AT MOST ONCE per session (weak-keyed, so a
  * stopped session doesn't pin memory): `createOrReplaceTempFunction`
  * logs a "function replaced" WARN on every repeat call, and with a
  * couple hundred queries each calling `register`, that spam buried real
  * warnings in the bench/verify tails. */
object GraftFunctions {

  /** Sessions already registered. Weak keys: sessions are owned by the
    * caller; this set must not keep a stopped session reachable. */
  private val registered: java.util.Set[SparkSession] =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  def register(spark: SparkSession): Unit = {
    // add() returns false when the session was already present — the
    // function set is fixed at compile time, so re-registering the same
    // builders is always a no-op apart from the WARN noise.
    if (!registered.add(spark)) return
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash",
      exprs => RollingHash(exprs.head, RollingHash.DefaultBase, RollingHash.DefaultMod),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_dot",
      exprs => VectorDot(exprs(0), exprs(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_agg", buildMinHashAgg, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_entropy", exprs => CharEntropy(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "count_in", CountIn.build, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", exprs => NfcNormalize(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_agg", buildBloomAgg, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_contains", buildBloomContains, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_probe", buildBloomProbe, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "chunk_ids", ChunkIds.build, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bfd_bin_ids", BfdBinIds.build, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_ngram_features", CharNgramFeatures.build, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_fps", WinnowFps.build, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kgram_hashes", WinnowFps.buildKgramHashes, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_encode", PqOps.buildEncode, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_adc_lut", PqOps.buildAdcLut, "scala_udf")
  }

  /** Spark's internal runtime-filter bloom aggregate
    * (`BloomFilterAggregate`), exposed as a callable function:
    * `bloom_agg(xxhash64(key), estimatedItems, numBits)` → binary
    * sketch. Spark only wires this expression up inside
    * `InjectRuntimeFilter`; registering it makes the same
    * partial+final distributed sketch build available to explicit
    * bloom-pruned joins ([[graft.operators.BloomPrune]]). */
  def buildBloomAgg(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    require(exprs.length == 3,
      s"bloom_agg(value, estimatedItems, numBits) takes 3 arguments, got ${exprs.length}")
    new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
      exprs(0), exprs(1), exprs(2)).toAggregateExpression()
  }

  /** `bloom_probe(xxhash64(key), bloomBytesLiteral)` — graft's
    * [[BloomProbe]]: the sketch bytes are extracted from the literal AT
    * RESOLUTION TIME and carried as a deserialized object outside the
    * plan tree (a multi-MB binary literal inside the plan is
    * catastrophically non-linear to process; see BloomProbe scaladoc).
    */
  def buildBloomProbe(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    require(exprs.length == 2,
      s"bloom_probe(hash, bloomBytes) takes 2 arguments, got ${exprs.length}")
    val bytes = exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(
        b: Array[Byte], org.apache.spark.sql.types.BinaryType) => b
      case other => throw new IllegalArgumentException(
        s"bloom_probe's second argument must be a binary literal, got $other")
    }
    BloomProbe(exprs.head, BloomProbe.fromBytes(bytes))
  }

  /** `bloom_contains(bloomBinary, xxhash64(key))` — Spark's internal
    * `BloomFilterMightContain` predicate (codegen'd; the binary operand
    * must be a literal or scalar subquery, per its own type check). */
  def buildBloomContains(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    require(exprs.length == 2,
      s"bloom_contains(bloom, value) takes 2 arguments, got ${exprs.length}")
    org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      exprs(0), exprs(1))
  }

  /** Shared minhash_agg builder — used by both the per-session registry
    * path above and [[graft.GraftExtensions]], so argument validation
    * cannot drift between the two registration routes. */
  def buildMinHashAgg(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    require(exprs.length == 2,
      s"minhash_agg(value, numHashes) takes 2 arguments, got ${exprs.length}")
    val k = exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
      case other => throw new IllegalArgumentException(
        s"minhash_agg numHashes must be an integer literal, got $other")
    }
    require(k > 0 && k <= MinHashAgg.MaxHashes,
      s"numHashes must be in (0, ${MinHashAgg.MaxHashes}]")
    MinHashAgg(exprs.head, k).toAggregateExpression()
  }
}
