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
