package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Proves SCALE.md's bucketing claim: when both fact tables are
  * bucketed+sorted on the join key, the join plans with NO exchange —
  * the layout pre-pays the shuffle once at write time, and every
  * subsequent join on that key is shuffle-free. */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join elides both exchanges") {
    val db = "graft_bucket_test"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    try {
      Sinks.writeBucketed(Sources.table(spark, sf0001, "orders"),
        s"$db.orders_b", Seq("o_orderkey"), 8, Seq("o_orderkey"))
      Sinks.writeBucketed(Sources.table(spark, sf0001, "lineitem"),
        s"$db.lineitem_b", Seq("l_orderkey"), 8, Seq("l_orderkey"))
      val joined = spark.table(s"$db.lineitem_b")
        .join(spark.table(s"$db.orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(round(sum(col("l_quantity")), 4).as("qty"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // the only exchange allowed is the one feeding the final groupBy
      val joinPart = plan.split("SortMergeJoin|ShuffledHashJoin").drop(1).mkString
      assert(!joinPart.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffled:\n$plan")
      // sanity: same result as the unbucketed join
      val reference = Sources.table(spark, sf0001, "lineitem")
        .join(Sources.table(spark, sf0001, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(round(sum(col("l_quantity")), 4).as("qty"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got === reference)
    } finally {
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }
}
