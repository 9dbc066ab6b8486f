package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
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
      // json_valid guard: DuckDB's json_extract THROWS on malformed
      // JSON while Spark's get_json_object returns NULL — the guard
      // makes both engines degrade identically if corrupt payloads ever
      // reach a gated SF.
      "WITH k AS (SELECT event_type, CASE WHEN json_valid(props) " +
      "THEN CAST(json_extract(props,'$.k') AS BIGINT) END AS k FROM events) " +
      "SELECT event_type, CAST(sum(k) AS BIGINT) AS sum_k, " +
      "count(k) AS n_with_k " +
      "FROM k GROUP BY event_type ORDER BY event_type")),

    // ---- Semi-structured extraction through Spark 4's VARIANT type:
    // try_parse_json parses each payload ONCE into the binary variant
    // encoding (malformed → NULL instead of a job-killing throw), and
    // every field access is try_variant_get on the parsed value — at
    // 100 TB this is the parse-once/extract-many layout (and the form
    // shredded-variant storage accelerates), vs get_json_object
    // re-parsing the string per path (props_extract shows that form).
    // Malformed payloads are COUNTED per group, the DQ posture a crawl
    // pipeline needs; clean gate data pins n_malformed = 0 while the
    // hostile net proves broken JSON degrades to the counter.
    QueryDef("variant_extract", (s, d) => {
      Tables.load(s, d, "events")
        .select(col("event_type"), expr("try_parse_json(props)").as("v"))
        .select(col("event_type"),
          expr("try_variant_get(v, '$.k', 'bigint')").as("k"),
          col("v").isNull.as("bad"))
        .groupBy("event_type")
        .agg(sum("k").as("sum_k"), min("k").as("min_k"), max("k").as("max_k"),
          count(col("k")).as("n_with_k"),
          sum(when(col("bad"), 1L).otherwise(0L)).as("n_malformed"))
        .orderBy("event_type")
    }, Some(
      // json_valid guards every extraction: DuckDB's json_extract
      // THROWS on malformed JSON (the very condition this query
      // counts), so without the guard the oracle only survives because
      // gate data is clean — with it, both engines degrade to NULL +
      // the n_malformed counter identically.
      "WITH k AS (SELECT event_type, CASE WHEN json_valid(props) " +
      "THEN CAST(json_extract(props,'$.k') AS BIGINT) END AS k, " +
      "CASE WHEN props IS NULL OR NOT json_valid(props) THEN 1 ELSE 0 END AS bad " +
      "FROM events) " +
      "SELECT event_type, " +
      "CAST(sum(k) AS BIGINT) AS sum_k, " +
      "CAST(min(k) AS BIGINT) AS min_k, " +
      "CAST(max(k) AS BIGINT) AS max_k, " +
      "count(k) AS n_with_k, " +
      "CAST(sum(bad) AS BIGINT) AS n_malformed " +
      "FROM k GROUP BY event_type ORDER BY event_type")),

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

    // ---- Ordered conversion funnel view → click → purchase with a 24h
    // step window: step N must follow step N-1 for the SAME user within
    // a day (unbounded chains are degenerate on this corpus — every
    // user eventually does everything). Three grouped min-aggregates
    // chained by user-keyed joins — every shuffle is on user_id, so
    // after the first exchange the joins and aggs reuse the
    // partitioning; no window function, no per-user event collection (a
    // hot user costs only its own rows in each pass). Times in integer
    // µs (ts div 1000 ≡ epoch_us(ts): parquet nanos truncate
    // identically on both engines).
    QueryDef("funnel_steps", (s, d) => {
      val dayUs = 86400000000L
      val ev = Tables.load(s, d, "events")
        .select(col("user_id"), col("event_type"), Tables.tsUs.as("ts_us"))
      val s1 = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts_us").as("t1"))
      val s2 = ev.filter(col("event_type") === "click").join(s1, "user_id")
        .filter(col("ts_us") > col("t1") && col("ts_us") <= col("t1") + dayUs)
        .groupBy("user_id").agg(min("ts_us").as("t2"))
      val s3 = ev.filter(col("event_type") === "purchase").join(s2, "user_id")
        .filter(col("ts_us") > col("t2") && col("ts_us") <= col("t2") + dayUs)
        .groupBy("user_id").agg(min("ts_us").as("t3"))
      s1.join(s2, Seq("user_id"), "left_outer")
        .join(s3, Seq("user_id"), "left_outer")
        .agg(count(col("t1")).as("step_view"),
          count(col("t2")).as("step_click"),
          count(col("t3")).as("step_purchase"))
    }, Some(
      "WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events), " +
      "s1 AS (SELECT user_id, min(ts_us) AS t1 FROM ev WHERE event_type = 'view' GROUP BY 1), " +
      "s2 AS (SELECT ev.user_id, min(ts_us) AS t2 FROM ev JOIN s1 USING (user_id) " +
      "WHERE event_type = 'click' AND ts_us > t1 AND ts_us <= t1 + 86400000000 GROUP BY 1), " +
      "s3 AS (SELECT ev.user_id, min(ts_us) AS t3 FROM ev JOIN s2 USING (user_id) " +
      "WHERE event_type = 'purchase' AND ts_us > t2 AND ts_us <= t2 + 86400000000 GROUP BY 1) " +
      "SELECT count(t1) AS step_view, count(t2) AS step_click, " +
      "count(t3) AS step_purchase " +
      "FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)")),

    // ---- Daily cohort retention on the purchase stream: cohort = a
    // user's first purchase day, counted at each day offset they buy
    // again. Integer day indices (µs div µs-per-day — both engines
    // floor identically on non-negative values); distinct (user, day)
    // FIRST, so the per-(cohort, offset) count needs no count-distinct
    // shuffle of raw events.
    QueryDef("cohort_retention", (s, d) => {
      val ev = Tables.load(s, d, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), expr("(ts div 1000) div 86400000000").as("dy"))
        .distinct()
      val first = ev.groupBy("user_id").agg(min("dy").as("cohort_dy"))
      ev.join(first, "user_id")
        .groupBy(col("cohort_dy"), (col("dy") - col("cohort_dy")).as("day_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_dy", "day_offset")
    }, Some(
      "WITH ev AS (SELECT DISTINCT user_id, epoch_us(ts)//86400000000 AS dy " +
      "FROM events WHERE event_type = 'purchase'), " +
      "first AS (SELECT user_id, min(dy) AS cohort_dy FROM ev GROUP BY 1) " +
      "SELECT cohort_dy, dy - cohort_dy AS day_offset, count(*) AS n_users " +
      "FROM ev JOIN first USING (user_id) " +
      "GROUP BY 1, 2 ORDER BY cohort_dy, day_offset")),

    // ---- Sketch surface: HyperLogLog++ approximate distincts — the
    // constant-memory path for cardinality at 100 TB (exact distinct
    // shuffles every key; the sketch shuffles one ~1.5KB buffer per
    // task). The estimate is approximate, so the gate emits the
    // CERTIFICATE: exact_users and n are exact SQL, and err_ok pins the
    // estimate within 10% of exact (rsd 2% requested — 5x margin).
    QueryDef("approx_distinct", (s, d) => {
      Tables.load(s, d, "events")
        .groupBy("event_type")
        .agg(
          approx_count_distinct(col("user_id"), 0.02).as("au"),
          countDistinct(col("user_id")).as("exact_users"),
          count(lit(1)).as("n"))
        .select(col("event_type"), col("exact_users"), col("n"),
          when(abs(col("au").cast("double") - col("exact_users").cast("double"))
            <= col("exact_users").cast("double") * 0.1, 1L)
            .otherwise(0L).as("err_ok"))
        .orderBy("event_type")
    }, Some(
      "SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users, " +
      "count(*) AS n, CAST(1 AS BIGINT) AS err_ok " +
      "FROM events GROUP BY event_type ORDER BY event_type")),

    // ---- Mergeable HLL sketches (Datasketches hll_sketch_agg): the
    // INCREMENTAL distinct-count pattern — sketch each (event_type, day)
    // partition once when it lands, persist the binary sketch, and
    // answer any later rollup by hll_union_agg over the tiny sketch
    // table, never rescanning the raw events. That union is the whole
    // point: approx_count_distinct folds one query's worth of state,
    // while a stored sketch column composes across days/backfills/
    // engines (frozen Datasketches wire format). The estimate itself is
    // approximate, so the gate emits the CERTIFICATE instead: n_days is
    // exact (SQL-checked), union_lossless pins the 2-level-union ==
    // 1-level-sketch identity (HLL register merge is max(): loses
    // nothing at equal lgK), and err_ok pins the estimate within 5% of
    // the exact distinct count (lgK=14 -> rse ~0.8%). SketchSpec
    // additionally exercises the raw-estimate shape.
    //
    // The register identity must be certified at the REGISTER level,
    // not on raw estimates: a direct Datasketches sketch answers with
    // the HIP estimator, but any union result falls back to the
    // composite estimator (out-of-order merge destroys HIP state), so
    // estimate(union(per-day)) == estimate(direct) only while the
    // groups sit in the exact/sparse range — true at sf<=0.1, false at
    // sf1 (observed: direct 14914 vs union 14956 on 15000 exact). The
    // one-level side therefore passes through hll_union(sk, sk): a
    // self-union is register-idempotent (max with itself) but routes
    // the estimate through the SAME composite path, making the
    // certificate the scale-invariant truth "merging per-partition
    // registers loses nothing" rather than an estimator-mode artifact.
    QueryDef("hll_partitioned", (s, d) => {
      val e = Tables.load(s, d, "events")
        .select(col("event_type"), expr("ts div 86400000000000").as("day"),
          col("user_id"))
      val twoLevel = e
        .groupBy("event_type", "day")
        .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          expr("hll_sketch_estimate(hll_union_agg(sk))").as("est2"))
      val oneLevel = e
        .groupBy("event_type")
        .agg(expr(
          "hll_sketch_estimate(hll_union(hll_sketch_agg(user_id, 14), " +
            "hll_sketch_agg(user_id, 14)))").as("est1"),
          countDistinct(col("user_id")).as("exact"))
      twoLevel.join(oneLevel, "event_type")
        .select(col("event_type"), col("n_days"),
          when(col("est2") === col("est1"), 1L).otherwise(0L).as("union_lossless"),
          when(abs(col("est2").cast("double") - col("exact").cast("double"))
            <= col("exact").cast("double") * 0.05, 1L).otherwise(0L).as("err_ok"))
        .orderBy("event_type")
    }, Some(
      "SELECT event_type, " +
      "CAST(count(DISTINCT epoch_us(ts) // 86400000000) AS BIGINT) AS n_days, " +
      "CAST(1 AS BIGINT) AS union_lossless, CAST(1 AS BIGINT) AS err_ok " +
      "FROM events GROUP BY event_type ORDER BY event_type")),

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
      "FROM events GROUP BY user_id ORDER BY n_events DESC, user_id")),

    // ---- Z-order (Morton) layout: the multi-dimensional clustering
    // that makes file-level data skipping work on TWO query dimensions
    // at once (Delta/Iceberg OPTIMIZE ZORDER). Interleaving the bits of
    // (user bucket, hour bucket) and range-bucketing the curve value
    // gives files where BOTH dimensions are tightly bounded — each
    // 8-bits-of-z bucket pins the high 4 bits of each dimension, so
    // min/max pruning cuts ~15/16 of files for a point query on EITHER
    // column. The query emits per-bucket (count, umin..umax, hmin..hmax)
    // — the layout manifest a table format would persist as file stats;
    // ZorderSpec asserts the <=16-wide span bound that naive
    // single-column sorting cannot give the second dimension. Bit math
    // is identical integer arithmetic on both engines → hash-exact.
    QueryDef("zorder_layout", (s, d) => {
      val z = zInterleave("ub", "hb", 8, sparkDialect = true)
      Tables.load(s, d, "events")
        .selectExpr("user_id % 256 AS ub", "(ts div 3600000000000) % 256 AS hb")
        .selectExpr(s"($z) div 256 AS bucket", "ub", "hb")
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          min("ub").as("umin"), max("ub").as("umax"),
          min("hb").as("hmin"), max("hb").as("hmax"))
        .orderBy("bucket")
    }, Some(
      "WITH b AS (SELECT user_id % 256 AS ub, " +
      "(epoch_ns(ts) // 3600000000000) % 256 AS hb FROM events), " +
      "z AS (SELECT (" + zInterleave("ub", "hb", 8, sparkDialect = false) +
      ") // 256 AS bucket, ub, hb FROM b) " +
      "SELECT bucket, count(*) AS n, " +
      "min(ub) AS umin, max(ub) AS umax, min(hb) AS hmin, max(hb) AS hmax " +
      "FROM z GROUP BY bucket ORDER BY bucket")),

    // ---- Unpivot (melt): the inverse of pivot_events — wide back to
    // long via the stack() generator. Pivot-then-melt is the identity
    // on present (user, type) pairs, so the oracle is simply the direct
    // long-form aggregate: a strong end-to-end check that BOTH
    // reshaping directions preserve every cell. stack() is a generator
    // (one output row per branch, evaluated inline) — no shuffle beyond
    // the pivot's own aggregate, no explode of arrays built per-row.
    QueryDef("unpivot_events", (s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      Tables.load(s, d, "events")
        .groupBy("user_id").pivot("event_type", types)
        .agg(sum(Tables.cents))
        .select(col("user_id"), expr(
          s"stack(${types.length}, " +
          types.map(t => s"'$t', `$t`").mkString(", ") +
          ") AS (event_type, sum_cents)"))
        .filter(col("sum_cents").isNotNull)
        .orderBy("user_id", "event_type")
    }, Some(
      "SELECT user_id, event_type, CAST(sum(" + graft.Tables.centsSql +
      ") AS BIGINT) AS sum_cents FROM events " +
      "WHERE event_type IN ('click', 'error', 'purchase', 'signup', 'view') " +
      "GROUP BY user_id, event_type HAVING sum(" + graft.Tables.centsSql +
      ") IS NOT NULL ORDER BY user_id, event_type")),

    // ---- Per-user EWMA (α = 0.3) — the time-decayed baseline a
    // monitoring/feature pipeline keeps per entity. EWMA is inherently
    // a SEQUENTIAL fold (order-dependent, so no distributive aggregate
    // exists); the scalable shape is fold-within-group: each user's
    // events collect into one in-memory array (bounded by per-entity
    // activity, never corpus-sized) and fold in (ts, event_id) order
    // via aggregate()/list_reduce. Fixed-point integer arithmetic —
    // next = (7·acc + 3·x) div 10, seeded with the first observation
    // (list_reduce semantics, mirrored with slice + explicit init on
    // the Spark side) — keeps every step exact on both engines where
    // float EWMA would accumulate rounding skew. div/`//` agree on
    // non-negative operands (the measure here); signed measures would
    // need the pmod adjustment pagerank_exact documents.
    QueryDef("ewma_user", (s, d) => {
      Tables.load(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"), Tables.cents.as("c"))
        .filter(col("c").isNotNull)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          expr("sort_array(collect_list(struct(ts, event_id, c)))").as("arr"))
        .select(col("user_id"), col("n_events"),
          expr("aggregate(slice(transform(arr, x -> x.c), 2, size(arr) - 1), " +
            "arr[0].c, (acc, x) -> (7 * acc + 3 * x) div 10)").as("ewma_cents"))
        .orderBy("user_id")
    }, Some(
      "WITH e AS (SELECT user_id, ts, event_id, " + graft.Tables.centsSql +
      " AS c FROM events WHERE " + graft.Tables.centsSql + " IS NOT NULL) " +
      "SELECT user_id, CAST(count(*) AS BIGINT) AS n_events, " +
      "list_reduce(list(c ORDER BY ts, event_id), " +
      "(acc, x) -> (7 * acc + 3 * x) // 10) AS ewma_cents " +
      "FROM e GROUP BY user_id ORDER BY user_id")),

    // ---- SCD Type-2 dimension build: collapse each user's event stream
    // into versioned attribute history — one row per run of equal
    // consecutive event_type, with [valid_from, valid_to) bounds and the
    // open version carrying NULL valid_to. The warehouse-standard change
    // tracking shape (Kimball SCD2), built from two user-partitioned
    // windows: lag() finds change points, lead() over the SURVIVING
    // change rows closes each version. Both windows partition by
    // user_id — bounded by per-user event counts, never global — and the
    // (ts_us, event_id) order is total, so ties are deterministic.
    // Output capped to the first 10k (user, version) rows via
    // TakeOrderedAndProject, like window_analytics/scan_prefix.
    QueryDef("scd2_build", (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val ev = Tables.load(s, d, "events")
        .select(col("user_id"), graft.Tables.tsUs.as("ts_us"),
          col("event_id"), col("event_type"))
        .withColumn("prev_type", lag("event_type", 1).over(w))
        .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      ev.withColumn("version", row_number().over(w).cast("long"))
        .withColumn("valid_to_us", lead("ts_us", 1).over(w))
        .select(col("user_id"), col("version"), col("event_type"),
          col("ts_us").as("valid_from_us"), col("valid_to_us"))
        .orderBy("user_id", "version")
        .limit(10000)
    }, Some(
      "WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type FROM events), " +
      "c AS (SELECT *, lag(event_type) OVER " +
      "(PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_type FROM ev), " +
      "v AS (SELECT user_id, event_type, ts_us, event_id FROM c " +
      "WHERE prev_type IS NULL OR prev_type <> event_type) " +
      "SELECT user_id, " +
      "row_number() OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS version, " +
      "event_type, ts_us AS valid_from_us, " +
      "lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS valid_to_us " +
      "FROM v ORDER BY user_id, version LIMIT 10000"))
  )

  /** Morton interleave of two `bits`-bit non-negative ints as a SQL
    * expression string — generated once for both dialects so the bit
    * structure can never drift between engine and oracle (Spark spells
    * shifts shiftleft/shiftright; DuckDB uses << / >>). */
  private def zInterleave(u: String, h: String, bits: Int, sparkDialect: Boolean): String =
    (0 until bits).flatMap { i =>
      if (sparkDialect)
        Seq(s"shiftleft(shiftright($u, $i) & 1, ${2 * i + 1})",
          s"shiftleft(shiftright($h, $i) & 1, ${2 * i})")
      else
        Seq(s"((($u >> $i) & 1) << ${2 * i + 1})",
          s"((($h >> $i) & 1) << ${2 * i})")
    }.mkString(" + ")
}
