package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraftSqlSpec extends SparkSpec {

  test("spark.sql over registered views matches the DataFrame plan's results") {
    val viaSql = GraftSql.sql(spark, sf0001,
      """SELECT l_returnflag, round(sum(l_quantity), 4) AS sum_qty, count(1) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val viaDf = Sources.table(spark, sf0001, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_quantity")), 4).as("sum_qty"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(viaSql === viaDf)
  }

  test("graft native functions are usable from SQL over the views") {
    GraftSql.registerTables(spark, sf0001)
    val n = spark.sql(
      """SELECT doc_id, rolling_hash(text) AS fp, char_entropy(text) AS h
        |FROM documents WHERE char_entropy(text) > 0""".stripMargin).count()
    assert(n > 0)
  }

  test("SQL joins across views plan broadcasts for dimension tables") {
    GraftSql.registerTables(spark, sf0001)
    val df = spark.sql(
      """SELECT n_name, count(1) AS n FROM customer
        |JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name""".stripMargin)
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    assert(df.count() > 0)
  }
}
