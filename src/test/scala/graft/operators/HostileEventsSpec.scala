package graft.operators

import graft.SparkSuite

/** Robustness net for the events-table operators: NULL/malformed JSON
  * props, NULL values/types/users, NaN and infinite measures, negative
  * and zero timestamps — realistic stream contamination the driver's
  * clean testdata never exercises. (`ts` is written as a plain long — the
  * same shape those queries see reading TIMESTAMP(NANOS) parquet under
  * nanosAsLong.) */
class HostileEventsSpec extends SparkSuite {

  private val eventsOnlyQueries = Seq(
    "props_extract", "events_window", "approx_distinct", "distinct_exact",
    "salted_agg", "skew_level", "quantiles", "approx_quantiles",
    "window_analytics", "sessionize_batch", "pivot_events",
    "asof_join", "range_join", "funnel_steps", "cohort_retention",
    "grouping_sets", "stats_moments", "mode_per_group", "salted_join",
    "anomaly_zscore", "median_mad", "gap_fill", "zorder_layout", "unpivot_events",
    "corr_hourly", "equidepth_bins", "ewma_user", "scd2_build",
    "variant_extract")

  private lazy val hostileDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hostile_events").toString
    val h = 3600L * 1000000000L // one hour of nanos
    val rows = Seq(
      // (event_id, ts, user_id, event_type, value, props)
      (0L, h + 1L, 1L, "click", 10.0, """{"k": 1}"""),
      (1L, h + 2L, 1L, "purchase", 20.5, """{"k": 2}"""),
      (2L, h + 3L, 2L, "click", 0.0, null.asInstanceOf[String]), // null props
      (3L, h + 4L, 2L, "error", 1.0, "{not json"),               // malformed props
      (4L, h + 5L, 2L, "error", 2.0, """{"other": 9}"""),        // key absent
      (5L, 2 * h, 3L, "view", Double.NaN, """{"k": 3}"""),       // NaN measure
      (6L, 2 * h + 1L, 3L, "view", Double.PositiveInfinity, "{}"), // infinite measure
      (7L, 0L, 4L, "click", -5.25, "[1,2]"),                     // zero ts, non-object JSON
      (8L, -h, 4L, "purchase", 1e15, """{"k": -1}"""),           // negative ts, huge value
      (9L, 3 * h, 5L, null.asInstanceOf[String], 3.0, """{"k": 4}""")) // null type
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  eventsOnlyQueries.foreach { name =>
    test(s"$name survives the hostile event stream") {
      graft.SparkEntry.queries(name)(spark, hostileDir).collect()
    }
  }

  test("stats_moments: sumsq narrowing degrades to NULL past int64, stays exact inside it") {
    import spark.implicits._
    // (1) the hostile stream's 1e15 purchase value puts cents^2 at 1e34
    // — far past int64 — so sumsq_cents must be NULL for that group,
    // never a wrapped/garbage long, and other groups stay exact
    val out = graft.SparkEntry.queries("stats_moments")(spark, hostileDir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("purchase").isNullAt(5), "overflowed sumsq must degrade to NULL")
    assert(out("click").getLong(5) == 1000L * 1000L + 0L + 525L * 525L,
      "in-range groups must stay exact")
    // (2) just INSIDE the bound: 1000 rows of 9.6e7 cents (9.2e15 each)
    // sum to ~9.2e18 < Long.MaxValue — the narrowing must be exact
    val dir = java.nio.file.Files.createTempDirectory("headroom_events").toString
    val big = 960000.0 // dollars -> 9.6e7 cents
    (0 until 1000).map(i => (i.toLong, 3600000000000L + i, 1L, "big", big,
        """{"k":1}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val row = graft.SparkEntry.queries("stats_moments")(spark, dir).collect().head
    val expect = BigInt(96000000L) * BigInt(96000000L) * 1000
    assert(expect < BigInt(Long.MaxValue), "fixture must sit inside the bound")
    assert(BigInt(row.getLong(5)) == expect,
      s"near-bound sumsq must be exact: ${row.getLong(5)} vs $expect")
  }

  test("variant_extract counts malformed JSON instead of dying; arrays are not malformed") {
    val out = graft.SparkEntry.queries("variant_extract")(spark, hostileDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(4) /* n_with_k */, r.getLong(5) /* n_malformed */)).toMap
    // "{not json" (error) and NULL props (click) must land in the
    // malformed counter; "[1,2]" (click) is VALID json with no $.k —
    // extraction yields NULL, not a malformed count
    assert(out("error")._2 == 1, out.toString)
    assert(out("click")._2 == 1, out.toString)
    // clicks: {"k":1} has k; null props is malformed; [1,2] parses but
    // has no $.k — so exactly 1 of 3 clicks carries k
    assert(out("click")._1 == 1, out.toString)
    assert(out("purchase") == ((2L, 0L)), out.toString)
  }
}
