package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Operators over the `events` table: JSON property extraction, tumbling
  * time windows, and a skewed-key aggregation (the kmr_shuffle_leveling
  * scenario — src/kmrmoreops.c:1047-1122 — handled by partial
  * aggregation + AQE instead of a hand-rolled leveling shuffle).
  *
  * `ts` arrives as nanos-since-epoch (long) under nanosAsLong; window
  * bucketing is integer arithmetic on it, mirrored via epoch_ns() in the
  * oracle.
  */
object EventOps {

  val defs: Seq[QueryDef] = Seq(

    // ---- JSON property extraction (semi-structured payload column).
    QueryDef("props_extract", (s, d) => {
      Tables.load(s, d, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(sum("k").as("sum_k"), count(col("k")).as("n_with_k"))
        .orderBy("event_type")
    }, Some(
      "SELECT event_type, CAST(sum(CAST(json_extract(props,'$.k') AS BIGINT)) AS BIGINT) AS sum_k, " +
      "count(CAST(json_extract(props,'$.k') AS BIGINT)) AS n_with_k " +
      "FROM events GROUP BY event_type ORDER BY event_type")),

    // ---- Tumbling 1-hour window per event type — the batch shape of a
    // Structured Streaming windowed aggregation (value in exact cents).
    QueryDef("events_window", (s, d) => {
      Tables.load(s, d, "events")
        .select(col("event_type"),
          // Integer division, NOT floor(a/b): nanos-since-epoch exceeds
          // 2^53, so double division quantizes near bucket boundaries.
          expr("ts div 3600000000000").as("hour_bucket"),
          Tables.cents.as("cents"))
        .groupBy("event_type", "hour_bucket")
        .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
        .orderBy("event_type", "hour_bucket")
    }, Some(
      "SELECT event_type, CAST(epoch_ns(ts)//3600000000000 AS BIGINT) AS hour_bucket, " +
      "count(*) AS n, CAST(sum(" + graft.Tables.centsSql + ") AS BIGINT) AS sum_cents " +
      "FROM events GROUP BY 1, 2 ORDER BY event_type, hour_bucket")),

    // ---- Sketch surface: HyperLogLog++ approximate distincts — the
    // constant-memory path for cardinality at 100 TB (exact distinct
    // shuffles every key; the sketch shuffles one ~1.5KB buffer per
    // task). Approximate ⇒ no SQL oracle; SketchSpec bounds the error
    // against the exact count.
    QueryDef("approx_distinct", (s, d) => {
      Tables.load(s, d, "events")
        .groupBy("event_type")
        .agg(
          approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    }, None),

    // ---- Exact per-group distinct count — the expensive cousin the HLL
    // sketch above replaces at scale: Catalyst plans it as a two-phase
    // Expand + partial-distinct aggregation (each (group, user) pair
    // deduplicates map-side before the shuffle, no row-set ever
    // collects). Exact ⇒ fully oracle-able.
    QueryDef("distinct_exact", (s, d) => {
      Tables.load(s, d, "events")
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy("event_type")
    }, Some(
      "SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users, " +
      "count(*) AS n_events FROM events GROUP BY event_type ORDER BY event_type")),

    // ---- Salted two-phase aggregation: the manual skew-mitigation the
    // brief names. Phase 1 groups on (key, salt) — a hot key splits
    // across `salt` reducers; phase 2 merges the partials. The result is
    // identical to the plain groupBy (the oracle), demonstrated in-plan.
    // (For pure aggregation Spark's partial agg already does this; the
    // pattern matters when the combiner can't run map-side, e.g. exact
    // distinct counts per key.)
    QueryDef("salted_agg", (s, d) => {
      val salted = Tables.load(s, d, "events")
        .withColumn("salt", pmod(col("event_id"), lit(16)))
        .groupBy("user_id", "salt")
        .agg(count(lit(1)).as("pn"),
          sum(Tables.cents).as("pc"))
      salted.groupBy("user_id")
        .agg(sum("pn").as("n_events"), sum("pc").as("sum_cents"))
        .orderBy("user_id")
    }, Some(
      "SELECT user_id, count(*) AS n_events, " +
      "CAST(sum(" + graft.Tables.centsSql + ") AS BIGINT) AS sum_cents " +
      "FROM events GROUP BY user_id ORDER BY user_id")),

    // ---- Hot-key aggregation: groupBy on user_id. Map-side partial
    // aggregation collapses each hot key to one row per task before the
    // shuffle, so a skewed key costs O(tasks), not O(rows) — this plus
    // AQE skew-join is Spark's answer to kmr_shuffle_leveling.
    QueryDef("skew_level", (s, d) => {
      Tables.load(s, d, "events")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          sum(Tables.cents).as("sum_cents"))
        .orderBy(desc("n_events"), col("user_id"))
    }, Some(
      "SELECT user_id, count(*) AS n_events, " +
      "CAST(sum(" + graft.Tables.centsSql + ") AS BIGINT) AS sum_cents " +
      "FROM events GROUP BY user_id ORDER BY n_events DESC, user_id"))
  )
}
