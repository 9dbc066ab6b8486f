package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSuite {

  test("approx_count_distinct is within the configured error of exact") {
    val exact = graft.Tables.load(spark, sfDir, "events")
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val approx = EventOps.defs.find(_.name == "approx_distinct").get
      .fn(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    exact.foreach { case (k, ex) =>
      val ap = approx(k).toDouble
      assert(math.abs(ap - ex) / ex <= 0.1, s"$k: approx $ap vs exact $ex")
    }
  }

  test("approx median is within 5% of the exact median per event type") {
    val exact = graft.queries.Analytics.defs.find(_.name == "quantiles").get
      .fn(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getDouble(2))).toMap // p50_cents
    val approx = graft.queries.Analytics.defs.find(_.name == "approx_quantiles").get
      .fn(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1).toDouble)).toMap
    exact.foreach { case (k, ex) =>
      assert(math.abs(approx(k) - ex) / ex <= 0.05,
        s"$k: approx ${approx(k)} vs exact $ex")
    }
  }
}
