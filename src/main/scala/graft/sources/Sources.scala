package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Sources — the engine's `datafn` equivalents.
  *
  * The reference's only source is a user generator yielding `(key, value)`
  * pairs, pulled one record per task message by the driver
  * (`server.py:209`, `220-224`); its example is an mmap'd text file
  * enumerated line-by-line (`example.py:8-20`). Here sources are Spark
  * readers: distributed, columnar where the format allows, with predicate
  * pushdown and column pruning handled by Catalyst.
  */
object Sources {

  /** Parquet table by name from a scale-factor directory
    * (`/root/testdata/sfN/name.parquet`). */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The `events` table with `ts` normalized to a session-TZ
    * `TimestampType` in microseconds, whatever the parquet writer chose:
    * TIMESTAMP(NANOS) (read as long under
    * `spark.sql.legacy.parquet.nanosAsLong`, then floor-divided to µs —
    * matching DuckDB's ns→µs cast), TIMESTAMP(MICROS) with
    * isAdjustedToUTC=false (read as TIMESTAMP_NTZ, cast exactly under the
    * UTC session TZ), or a plain TIMESTAMP (passed through). The testdata
    * generator has emitted both ns-as-int64 and µs variants across rounds,
    * so the reader adapts per file rather than assuming one. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Session-wide and sticky: only affects parquet columns that ARE
    // nanos-typed, i.e. only a nanos-encoded events.ts.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(spark.read.parquet(s"$dir/events.parquet"))
  }

  /** Normalize an events-shaped frame's `ts` column to `TimestampType`
    * micros regardless of on-disk encoding (see [[events]]). */
  private[graft] def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      // integer `div`, NOT `/`: epoch nanos exceed double precision
      // (2^53), so float division is off by up to ±1µs
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** Text file as `(lineIndex, line)` — the reference example's source
    * shape (`example.py:15-20`: mmap'd file, line-per-record with a
    * monotonically increasing key). `zipWithIndex` gives stable global
    * indices without collecting to the driver (one extra count job to size
    * the partition offsets — cheap relative to any real downstream work).
    */
  def textWithIndex(spark: SparkSession, path: String): Dataset[(Long, String)] = {
    import spark.implicits._
    spark.read.textFile(path).rdd.zipWithIndex().map(_.swap).toDS()
  }

  /** Schema-explicit CSV reader (header on). Schema inference is a
    * full extra pass over the data — never acceptable at 100 TB, so the
    * schema is a required argument. */
  def csv(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** Schema-explicit JSON-lines reader — same no-inference rule. */
  def jsonLines(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** kaylee-style `datafn` adapter: lift a driver-side generator into a
    * Dataset. ONLY for small, test-sized inputs — the reference's
    * "any generator" contract is inherently driver-resident, which is the
    * very pattern this engine exists to avoid; production paths should use
    * [[table]]/[[textWithIndex]]/`spark.read` instead.
    */
  def fromDatafn[K, V](spark: SparkSession, datafn: () => Iterator[(K, V)])(
      implicit e: org.apache.spark.sql.Encoder[(K, V)]): Dataset[(K, V)] =
    spark.createDataset(datafn().toSeq)
}
