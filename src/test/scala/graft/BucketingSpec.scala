package graft

/** Demonstrates shuffle co-location via bucketing: two fact tables
  * bucketed on the join key join with ZERO exchanges — the 100 TB answer
  * to repeated fact-fact joins (pay the shuffle once at write time,
  * reuse it every query). */
class BucketingSpec extends SparkSuite {

  test("bucketed fact-fact join plans with no Exchange") {
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // reset BOTH catalog entry and any stale warehouse dir: a killed
      // test JVM leaves the directory behind and a fresh session's
      // catalog can't see it (LOCATION_ALREADY_EXISTS otherwise)
      Tables.resetManagedTable(spark, "orders_bucketed")
      Tables.resetManagedTable(spark, "customer_bucketed")
      Tables.load(spark, sfDir, "orders")
        .write.mode("overwrite")
        .bucketBy(4, "o_custkey").sortBy("o_custkey")
        .saveAsTable("orders_bucketed")
      Tables.load(spark, sfDir, "customer")
        .write.mode("overwrite")
        .bucketBy(4, "c_custkey").sortBy("c_custkey")
        .saveAsTable("customer_bucketed")
      val joined = spark.table("orders_bucketed")
        .join(spark.table("customer_bucketed"),
          org.apache.spark.sql.functions.col("o_custkey") ===
            org.apache.spark.sql.functions.col("c_custkey"))
      val n = joined.count()
      assert(n == Tables.load(spark, sfDir, "orders").count())
      val plan = joined.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS customer_bucketed")
    }
  }
}
