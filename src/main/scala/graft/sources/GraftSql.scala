package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL entry point: register every synthetic table in a scale-factor
  * directory as a temp view (plus graft's native functions), so the
  * entire engine is drivable through `spark.sql` — the surface a BI
  * tool or an ad-hoc user actually touches. The views are lazy scans;
  * nothing is materialized by registration.
  *
  * The reference has no SQL surface at all (SURVEY.md: "no parser, no
  * joins, no optimizer"); on Spark the whole declarative engine comes
  * with the session, so exposing it costs one registration call.
  */
object GraftSql {

  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Register all tables from `dir` as temp views + graft functions. */
  def registerTables(spark: SparkSession, dir: String): Unit = {
    TableNames.foreach { name =>
      val df =
        if (name == "events") Sources.events(spark, dir)
        else Sources.table(spark, dir, name)
      df.createOrReplaceTempView(name)
    }
    graft.functions.GraftFunctions.register(spark)
  }

  /** One-shot: register `dir`'s tables and run `query`. */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    registerTables(spark, dir)
    spark.sql(query)
  }
}
