package graft.sources

import org.apache.spark.sql.DataFrame

/** Sinks — the write side of the pipeline. The reference's only sink is
  * the driver-resident results dict (`server.py:174-178`); a 100 TB
  * pipeline needs layout-aware distributed writes instead.
  */
object Sinks {

  /** Backquote each part of a possibly db-qualified table name. */
  private def quoteTable(table: String): String =
    table.split('.').map(p => s"`$p`").mkString(".")

  /** Hive-style partitioned parquet: one directory per partition-column
    * value, so downstream readers get partition PRUNING (a `lang='en'`
    * scan touches only that subtree). `maxRecordsPerFile` bounds file
    * size; repartitioning by the partition columns first avoids the
    * classic small-files blowup (every task otherwise writes a file per
    * partition value). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      maxRecordsPerFile: Long = 5000000L): Unit =
    df.repartition(partitionCols.map(org.apache.spark.sql.functions.col): _*)
      .write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Sorted-within-partitions parquet: rows clustered by `sortCols` so
    * min/max page statistics make selective scans skip row groups. */
  def writeClustered(df: DataFrame, path: String, sortCols: Seq[String]): Unit =
    df.sortWithinPartitions(sortCols.map(org.apache.spark.sql.functions.col): _*)
      .write.mode("overwrite").parquet(path)

  /** Parquet with per-column BLOOM FILTERS on `bloomCols` — the point-
    * lookup complement to [[writeClustered]]'s min/max statistics:
    * min/max row-group pruning needs the data CLUSTERED on the lookup
    * key, but a 100 TB corpus is typically laid out for its scan keys
    * (date, split, lang) while id-keyed point lookups ("fetch these
    * 10k doc_ids for audit") hit every row group. A bloom filter per
    * column chunk answers "definitely absent" without decoding the
    * chunk, so a selective id probe skips row groups regardless of
    * layout. `expectedDistinct` sizes the filter (parquet's NDV knob,
    * per row group); false positives only cost wasted reads — never
    * correctness (SinksSpec pins footer presence + zero false
    * negatives on a real probe). */
  def writeWithBloom(df: DataFrame, path: String, bloomCols: Seq[String],
      expectedDistinct: Long = 1000000L): Unit = {
    require(bloomCols.nonEmpty, "need at least one bloom column")
    val w = df.write.mode("overwrite")
    val configured = bloomCols.foldLeft(w) { (wr, c) =>
      wr.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", expectedDistinct)
    }
    configured.parquet(path)
  }

  /** Bucketed managed table: rows hash-partitioned into `numBuckets`
    * files per partition by `bucketCols` (optionally sorted inside each
    * bucket). Two tables bucketed the same way join WITHOUT a shuffle —
    * the fact-fact co-location strategy at 100 TB, where re-shuffling
    * either side per query is the dominant cost (proven shuffle-free in
    * BucketingSpec). Bucketing metadata lives in the session catalog,
    * hence `saveAsTable` rather than a path write. */
  /** Append to an EXISTING bucketed table with the same bucketing spec
    * — the index-maintenance half of the incremental-dedup lifecycle:
    * after a batch is deduplicated against the stored corpus index, its
    * own rows join the index here, so the next batch sees the grown
    * corpus. Spark validates the spec against the catalog entry;
    * appended files are bucketed identically, so bucket-join
    * co-location is preserved as the table grows. */
  def appendBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "need at least one bucket column")
    val dfIn = graft.core.Parallelism.fanIn(df, numBuckets, bucketCols)
    val w = dfIn.write.mode("append").format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    val ws = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    ws.saveAsTable(table)
  }

  /** One [[writeBucketed]] call's arguments, for [[writeBucketedAll]]. */
  case class BucketedWrite(df: DataFrame, table: String,
      bucketCols: Seq[String], numBuckets: Int, sortCols: Seq[String] = Nil)

  /** Run several INDEPENDENT bucketed-table writes concurrently — the
    * optimization-guide §2.6 move ("overlap independent jobs"): a
    * multi-table model persist (the order-n KN lifecycle stores 3-10
    * tables) otherwise runs each small write job serially, and every
    * job's straggler tail leaves the cluster idle; with a few writes in
    * flight the next write's tasks back-fill the freed executors.
    * Catalog state and table contents are identical to running the
    * [[writeBucketed]] calls sequentially; callers must target DISTINCT
    * tables whose inputs don't read each other's output. The first
    * failure propagates (remaining writes still run to completion —
    * same as Spark's own concurrent-action semantics). */
  def writeBucketedAll(writes: Seq[BucketedWrite], maxInFlight: Int = 4): Unit = {
    require(writes.map(_.table).distinct.size == writes.size,
      "writeBucketedAll targets must be distinct tables")
    if (writes.isEmpty) return
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(maxInFlight, writes.size)))
    try {
      val futs = writes.map { w =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit =
            writeBucketed(w.df, w.table, w.bucketCols, w.numBuckets, w.sortCols)
        })
      }
      futs.foreach(_.get())
    } catch {
      case e: java.util.concurrent.ExecutionException => throw e.getCause
    } finally pool.shutdown()
  }

  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "need at least one bucket column")
    val spark = df.sparkSession
    // True replace semantics: overwrite mode alone fails with
    // LOCATION_ALREADY_EXISTS when a previous JVM crash-left the table
    // directory behind but this session's catalog has never seen the
    // table. Everything resolves through the CATALOG, never a
    // warehouse-path guess: with a non-default current database an
    // unqualified name means <currentDb>.<table>, so a path heuristic
    // would delete the DEFAULT database's same-named table data; and an
    // EXTERNAL table's custom location must never be touched at all.
    val catalog = spark.sessionState.catalog
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    // the default MANAGED location of the fully-resolved identifier
    // (current database applied) — the only path saveAsTable writes
    val defaultLoc =
      new org.apache.hadoop.fs.Path(catalog.defaultTablePath(ident))
    val fs = defaultLoc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val qualifiedDefault = fs.makeQualified(defaultLoc)
    // an EXTERNAL table catalogued AT the default path keeps its data
    // through DROP by definition; deleting it here would destroy
    // external data, so leave it for saveAsTable to surface loudly
    val externalAtDefault = catalog.tableExists(ident) && {
      val meta = catalog.getTableMetadata(ident)
      meta.tableType ==
        org.apache.spark.sql.catalyst.catalog.CatalogTableType.EXTERNAL &&
        fs.makeQualified(new org.apache.hadoop.fs.Path(meta.location)) ==
          qualifiedDefault
    }
    spark.sql(s"DROP TABLE IF EXISTS ${quoteTable(table)}")
    // after the drop, anything still at the default managed location is
    // a confirmed orphan (dropping a MANAGED table deletes its dir; a
    // crash-killed previous JVM doesn't) — delete only that
    if (!externalAtDefault && fs.exists(qualifiedDefault))
      fs.delete(qualifiedDefault, true)
    // fan a tiny input in to one task per bucket (one file per bucket
    // instead of tasks × buckets tiny files); no-op at production sizes
    val dfIn = graft.core.Parallelism.fanIn(df, numBuckets, bucketCols)
    val w = dfIn.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    val ws = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    ws.saveAsTable(table)
  }
}
