package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the OTHER skew strategy (besides `Partitioning.salted*`): AQE's
  * runtime skew-join split. At 100 TB the choice is: salt proactively
  * when the hot keys are known, or let AQE detect and split them at
  * runtime — this spec proves the AQE path actually engages on this
  * build so SCALE.md's claim isn't aspirational. */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed sort-merge join at runtime") {
    withSQLConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // tiny thresholds so the test-sized hot partition counts as skewed
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "20KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "10KB",
      // forbid broadcast so the join stays shuffle-based and splittable
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // 99% of rows share one key -> one giant shuffle partition
      val fact = spark.range(0, 200000).select(
        when(col("id") % 100 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
        col("id").as("payload"))
      val dim = spark.range(0, 300000).select(col("id").as("k"),
        (col("id") * 2).as("dpayload"))
      val joined = fact.join(dim, "k")
      // collect() executes joined's OWN QueryExecution (count() would
      // build a fresh one and leave this plan isFinalPlan=false)
      assert(joined.collect().nonEmpty)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE skew split did not engage:\n$finalPlan")
    }
  }
}
