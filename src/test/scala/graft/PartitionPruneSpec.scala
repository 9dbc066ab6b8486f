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

  test("dynamic partition pruning: a filtered dim prunes the fact scan at RUNTIME") {
    // The star-join version of the property above: the partition values
    // to keep are only known after filtering the DIM side, so planning-
    // time pruning can't help — DPP plants a runtime subquery filter on
    // the fact's partition column (reusing the join's broadcast), and
    // the fact scan opens only the surviving directories. At 100 TB
    // this is what keeps `fact JOIN dim WHERE dim.x = …` from scanning
    // the whole archive.
    import spark.implicits._
    val out = "target/graft-tmp/events_by_type_dpp"
    Tables.load(spark, sfDir, "events")
      .write.mode("overwrite").partitionBy("event_type").parquet(out)
    // the dim filter must be a LIKELY-SELECTIVE predicate (equality/IN/
    // LIKE — Spark's isLikelySelective gate); a bare boolean attribute
    // does not qualify and silently disables the rewrite. The dim must
    // also be FILE-backed: a local Seq gets its filter constant-folded
    // into the LocalRelation before the pruning rule ever sees it.
    val dimDir = "target/graft-tmp/dpp_dim"
    Seq(("error", "audit"), ("click", "noop"), ("purchase", "noop"),
      ("view", "noop"), ("refund", "noop")).toDF("event_type", "category")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    // the DPP REWRITE is size-independent; its cost/benefit HEURISTIC is
    // not (a KB-scale spec fixture never looks worth pruning) — pin the
    // mechanism by bypassing only the stats estimate, restore after
    val ratioKey = "spark.sql.optimizer.dynamicPartitionPruning.useStats"
    val before = spark.conf.get(ratioKey)
    val joined =
      try {
        spark.conf.set(ratioKey, "false")
        val j = spark.read.parquet(out)
          .join(dim.filter(col("category") === "audit"), "event_type")
          .agg(count(lit(1)).as("n"))
        j.collect()
        j
      } finally spark.conf.set(ratioKey, before)
    val n = joined.collect()(0).getLong(0)
    val scan = joined.queryExecution.executedPlan.toString()
    assert(scan.contains("dynamicpruning"),
      s"no dynamic-pruning subquery on the fact scan:\n$scan")
    assert(n == Tables.load(spark, sfDir, "events")
      .filter(col("event_type") === "error").count())
  }
}
