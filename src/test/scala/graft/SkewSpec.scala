package graft

import org.apache.spark.sql.functions._

/** Demonstrates AQE's runtime skew handling — Spark's answer to
  * kmr_shuffle_leveling_pair_count for the JOIN case: a shuffle join with
  * one dominant key gets its oversized partition split at runtime
  * (SortMergeJoin(skew=true)). Thresholds are lowered so test-sized data
  * exhibits what a 100 TB hot key would. */
class SkewSpec extends SparkSuite {

  test("AQE splits the skewed partition of a hot-key join") {
    import spark.implicits._
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // 90% of the fact rows share key 0; the dim is uniform.
      val fact = spark.range(200000L)
        .select(when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id") % 97).as("k"),
          col("id").as("payload"))
      val dim = spark.range(97L).select(col("id").as("k"), (col("id") * 2).as("attr"))
      val joined = fact.join(dim, "k")
      // collect() executes THIS queryExecution (count() would plan a new one)
      assert(joined.collect().length == 200000)
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("skew=true"), s"AQE did not mark the skew join:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
