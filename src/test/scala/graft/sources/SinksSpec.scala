package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SinksSpec extends SparkSpec {

  test("writePartitioned: hive layout, partition pruning on read") {
    val tmp = Files.createTempDirectory("graft_sink").toFile
    tmp.deleteOnExit()
    val docs = Sources.table(spark, sf0001, "documents")
    Sinks.writePartitioned(docs, tmp.getAbsolutePath, Seq("lang"))
    // layout: lang=en/ lang=fr/ ...
    val dirs = tmp.listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.exists(_.startsWith("lang=")), dirs.toString)
    val back = spark.read.parquet(tmp.getAbsolutePath)
    assert(back.count() === docs.count())
    // pruned scan: only the lang=en partition directory is read
    val plan = back.filter(col("lang") === "en")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan)
  }

  test("csv and json-lines round-trip with explicit schemas") {
    val tmp = Files.createTempDirectory("graft_fmt").toFile
    tmp.deleteOnExit()
    val docs = Sources.table(spark, sf0001, "documents")
      .select("doc_id", "lang", "n_chars")
    docs.write.mode("overwrite").option("header", "true")
      .csv(s"${tmp.getAbsolutePath}/csv")
    docs.write.mode("overwrite").json(s"${tmp.getAbsolutePath}/json")
    val backCsv = Sources.csv(spark, s"${tmp.getAbsolutePath}/csv", docs.schema)
    val backJson = Sources.jsonLines(spark, s"${tmp.getAbsolutePath}/json", docs.schema)
    assert(backCsv.count() === docs.count())
    assert(backJson.count() === docs.count())
    assert(backCsv.schema === docs.schema)
    val sumRef = docs.agg(sum("n_chars")).collect().head.getLong(0)
    assert(backCsv.agg(sum("n_chars")).collect().head.getLong(0) === sumRef)
    assert(backJson.agg(sum("n_chars")).collect().head.getLong(0) === sumRef)
  }

  test("writeBucketed under a non-default current database never touches " +
      "the default database's same-named table") {
    // currentDatabase is SESSION state but suites run in parallel
    // against one shared session — switch it on an isolated
    // newSession() so concurrent unqualified table resolution in other
    // suites can't land in graft_db2
    val s2 = spark.newSession()
    val docs = Sources.table(s2, sf0001, "documents")
      .select("doc_id", "lang").limit(20)
    try {
      // a managed table named t_bkt in the DEFAULT database, with data
      Sinks.writeBucketed(docs, "t_bkt", Seq("doc_id"), 2)
      val defaultSum = s2.table("default.t_bkt")
        .agg(sum("doc_id")).collect().head.getLong(0)
      // switch current database and write an UNQUALIFIED same name:
      // must resolve to graft_db2.t_bkt, leaving default.t_bkt intact
      s2.sql("CREATE DATABASE IF NOT EXISTS graft_db2")
      s2.catalog.setCurrentDatabase("graft_db2")
      Sinks.writeBucketed(docs.limit(5), "t_bkt", Seq("doc_id"), 2)
      assert(s2.table("graft_db2.t_bkt").count() === 5)
      // the old heuristic deleted <warehouse>/t_bkt — the default db's
      // data — making this read fail or return nothing
      assert(s2.table("default.t_bkt")
        .agg(sum("doc_id")).collect().head.getLong(0) === defaultSum)
    } finally {
      s2.catalog.setCurrentDatabase("default")
      s2.sql("DROP TABLE IF EXISTS graft_db2.t_bkt")
      s2.sql("DROP DATABASE IF EXISTS graft_db2")
      s2.sql("DROP TABLE IF EXISTS default.t_bkt")
    }
  }

  test("writeBucketed replaces an EXTERNAL same-named table without deleting " +
      "its custom-location data") {
    val tmp = Files.createTempDirectory("graft_ext").toFile
    tmp.deleteOnExit()
    val docs = Sources.table(spark, sf0001, "documents")
      .select("doc_id", "lang").limit(10)
    docs.write.mode("overwrite").parquet(tmp.getAbsolutePath)
    try {
      // a datasource table with an explicit LOCATION is EXTERNAL in the
      // in-memory catalog (no Hive support needed)
      spark.sql("CREATE TABLE t_ext (doc_id BIGINT, lang STRING) " +
        s"USING parquet LOCATION '${tmp.getAbsolutePath}'")
      assert(spark.table("t_ext").count() === 10)
      // replacing the catalog entry must not delete the external files
      Sinks.writeBucketed(docs.limit(3), "t_ext", Seq("doc_id"), 2)
      assert(spark.table("t_ext").count() === 3)
      assert(spark.read.parquet(tmp.getAbsolutePath).count() === 10,
        "external data at the custom location must survive the replace")
    } finally {
      spark.sql("DROP TABLE IF EXISTS t_ext")
    }
  }

  test("writeClustered round-trips with stable contents") {
    val tmp = Files.createTempDirectory("graft_sink2").toFile
    tmp.deleteOnExit()
    val docs = Sources.table(spark, sf0001, "documents")
    Sinks.writeClustered(docs, tmp.getAbsolutePath, Seq("doc_id"))
    val back = spark.read.parquet(tmp.getAbsolutePath)
    assert(back.agg(sum("doc_id")).collect().head.getLong(0) ===
      docs.agg(sum("doc_id")).collect().head.getLong(0))
  }

  // r5 regression guard: the testdata generator has flip-flopped the
  // events.ts parquet encoding between rounds (TIMESTAMP(NANOS) read as
  // long under nanosAsLong, TIMESTAMP_NTZ micros, plain TIMESTAMP) and
  // a reader assuming one encoding silently broke 20 queries. Pin that
  // Sources.normalizeTs maps ALL THREE encodings of the same instants
  // to identical TimestampType micros, so the next generator change
  // fails HERE by name instead of in 20 oracle rows.
  test("normalizeTs: nanos-as-long, TIMESTAMP_NTZ, and TIMESTAMP " +
      "encodings of the same instants normalize identically") {
    import org.apache.spark.sql.types._
    import java.nio.file.Files
    val tmp = Files.createTempDirectory("graft_ts_enc").toFile
    tmp.deleteOnExit()
    // micros chosen to exercise sub-second precision and a pre-epoch
    // instant (floor semantics on the ns->us division)
    val micros = Seq(0L, 1L, 999999L, 1700000000123456L, -1L, -987654321L)
    val asNanoLong = spark.createDataFrame(
      java.util.List.of(micros.map(m => org.apache.spark.sql.Row(m * 1000L)): _*),
      StructType(Seq(StructField("ts", LongType))))
    // build NTZ/TZ frames from the micros via SQL arithmetic so the
    // writer, not this test, picks the parquet logical type
    def fromMicros(tpe: String) = spark
      .createDataFrame(
        java.util.List.of(micros.map(m => org.apache.spark.sql.Row(m)): _*),
        StructType(Seq(StructField("us", LongType))))
      .selectExpr(s"CAST(timestamp_micros(us) AS $tpe) AS ts")
    val paths = Map(
      "long"  -> s"${tmp.getAbsolutePath}/long",
      "ntz"   -> s"${tmp.getAbsolutePath}/ntz",
      "tz"    -> s"${tmp.getAbsolutePath}/tz")
    asNanoLong.write.mode("overwrite").parquet(paths("long"))
    fromMicros("TIMESTAMP_NTZ").write.mode("overwrite").parquet(paths("ntz"))
    fromMicros("TIMESTAMP").write.mode("overwrite").parquet(paths("tz"))
    val got = paths.map { case (k, path) =>
      val df = Sources.normalizeTs(spark.read.parquet(path))
      assert(df.schema("ts").dataType === TimestampType, k)
      k -> df.selectExpr("unix_micros(ts)").collect()
        .map(_.getLong(0)).sorted.toSeq
    }
    assert(got("long") === micros.sorted, "nanos-as-long path")
    assert(got("ntz") === micros.sorted, "TIMESTAMP_NTZ path")
    assert(got("tz") === micros.sorted, "TIMESTAMP path")
  }

  test("writeWithBloom: per-chunk bloom filters land in the footer, " +
      "no false negatives on present ids, discriminating on absent ones") {
    import scala.jdk.CollectionConverters._
    val tmp = Files.createTempDirectory("graft_bloom").toFile
    tmp.deleteOnExit()
    val docs = Sources.table(spark, sf0001, "documents")
      .select("doc_id", "lang", "text")
    Sinks.writeWithBloom(docs, tmp.getAbsolutePath, Seq("doc_id"),
      expectedDistinct = 10000L)
    val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
    val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(part.getAbsolutePath),
        spark.sparkContext.hadoopConfiguration))
    try {
      val block = rdr.getFooter.getBlocks.get(0)
      val byCol = block.getColumns.asScala
        .map(c => c.getPath.toDotString -> c).toMap
      // the configured column carries a bloom filter; others don't
      assert(byCol("doc_id").getBloomFilterOffset >= 0,
        "doc_id chunk has no bloom filter")
      assert(byCol("lang").getBloomFilterOffset < 0,
        "unconfigured column grew a bloom filter")
      val bloom = rdr.readBloomFilter(byCol("doc_id"))
      assert(bloom != null)
      // zero false negatives: every present id must probe positive
      val present = spark.read.parquet(part.getAbsolutePath)
        .select("doc_id").collect().map(_.getLong(0))
      assert(present.forall(id => bloom.findHash(bloom.hash(id))),
        "bloom filter false negative — correctness bug")
      // discriminating: absent ids are mostly rejected (false
      // positives allowed, but a filter that says yes to everything
      // skips nothing)
      val absentHits = (1 to 1000)
        .map(i => 10000000L + i)
        .count(id => bloom.findHash(bloom.hash(id)))
      assert(absentHits < 500, s"$absentHits/1000 absent ids probed " +
        "positive — the filter is not discriminating")
    } finally rdr.close()
  }
}
