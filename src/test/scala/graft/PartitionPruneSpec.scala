package graft

import org.apache.spark.sql.functions._

/** Storage-layout scale property: a table written partitioned by a
  * predicate column is pruned at PLANNING time — a filter on the
  * partition column reads only the matching directories (at 100 TB,
  * partition pruning is the difference between scanning one day and
  * scanning the archive). */
class PartitionPruneSpec extends SparkSuite {

  test("filter on the partition column prunes to one directory") {
    val out = "target/graft-tmp/events_by_type"
    Tables.load(spark, sfDir, "events")
      .write.mode("overwrite").partitionBy("event_type").parquet(out)
    val one = spark.read.parquet(out).filter(col("event_type") === "error")
    val scan = one.queryExecution.executedPlan.toString()
    assert(scan.contains("PartitionFilters: [isnotnull(event_type"),
      s"no partition filter in scan:\n$scan")
    // planned input = only the matching partition's files
    val allTypes = Tables.load(spark, sfDir, "events")
      .select("event_type").distinct().count()
    assert(allTypes > 1)
    val planned = one.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.partitionCount
      }
    assert(planned.contains(1), s"expected 1 selected partition, got $planned")
    // and the data round-trips
    assert(one.count() ==
      Tables.load(spark, sfDir, "events").filter(col("event_type") === "error").count())
  }
}
