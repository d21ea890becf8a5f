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

  test("writeClustered round-trips with stable contents") {
    val tmp = Files.createTempDirectory("graft_sink2").toFile
    tmp.deleteOnExit()
    val docs = Sources.table(spark, sf0001, "documents")
    Sinks.writeClustered(docs, tmp.getAbsolutePath, Seq("doc_id"))
    val back = spark.read.parquet(tmp.getAbsolutePath)
    assert(back.agg(sum("doc_id")).collect().head.getLong(0) ===
      docs.agg(sum("doc_id")).collect().head.getLong(0))
  }
}
