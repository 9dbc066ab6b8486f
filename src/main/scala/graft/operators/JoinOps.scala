package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark has no built-in verb for (the brief's
  * named examples), composed Spark-first and oracled against DuckDB's
  * NATIVE implementations of the same semantics (ASOF JOIN / IEJoin):
  *
  * - asof_join — each purchase matched to the user's most recent click
  *   at-or-before it. Realized as union + one ordered window per user:
  *   a single shuffle on user_id, last(click, ignoreNulls) over the
  *   time order. No join explosion, no inequality join — linear in
  *   events, the classic scalable as-of plan.
  * - range_join — per error event, how many same-user events fall in the
  *   trailing 1-hour window. Realized as a BAND-BUCKETED equality join:
  *   each candidate event is replicated into its own time bucket and the
  *   next one, so every (error, candidate) pair within the band meets on
  *   an exact (user, bucket) key — a hash join, never the
  *   BroadcastNestedLoop a raw inequality predicate would plan.
  *
  * All time arithmetic runs at microsecond resolution on both engines
  * (DuckDB TIMESTAMP truncates the parquet nanos).
  */
object JoinOps {

  private val HourUs = 3600L * 1000000L

  val defs: Seq[QueryDef] = Seq(

    QueryDef("asof_join", (s, d) => {
      val ev = Tables.load(s, d, "events")
        .select(col("user_id"), col("event_id"), graft.Tables.tsUs.as("ts_us"),
          col("event_type"))
      // one click per (user, ts): deterministic among exact-tie timestamps
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "ts_us")
        .agg(max("event_id").as("click_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us"), col("event_id"))
      val tagged = clicks
        .select(col("user_id"), col("ts_us"), col("click_id"), lit(null).cast("long").as("p_id"))
        .unionByName(purchases
          .select(col("user_id"), col("ts_us"), lit(null).cast("long").as("click_id"),
            col("event_id").as("p_id")))
      // clicks sort before purchases at equal ts (is_p = 0 first) so an
      // exact-tie click is visible to the purchase — ASOF `p.ts >= c.ts`
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts_us"), col("p_id").isNotNull.cast("int"), col("p_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("last_click", last("click_id", ignoreNulls = true).over(w))
        .filter(col("p_id").isNotNull)
        .select(col("p_id").as("event_id"), col("user_id"), col("last_click").as("click_id"))
        .orderBy("event_id")
    }, Some(
      "WITH p AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events WHERE event_type='purchase'), " +
      "c AS (SELECT user_id, epoch_us(ts) AS ts_us, max(event_id) AS click_id FROM events " +
      "WHERE event_type='click' GROUP BY user_id, epoch_us(ts)) " +
      "SELECT p.event_id, p.user_id, c.click_id " +
      "FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts_us >= c.ts_us " +
      "ORDER BY p.event_id")),

    QueryDef("range_join", (s, d) => {
      val ev = Tables.load(s, d, "events")
        .select(col("user_id"), col("event_id"), graft.Tables.tsUs.as("ts_us"),
          col("event_type"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id").as("err_id"), col("ts_us").as("err_us"),
          floor(col("ts_us") / HourUs).as("bucket"))
      // candidates appear in their own bucket and the next, so any pair
      // within a 1-hour band shares an exact (user, bucket) key
      val cands = ev
        .select(col("user_id"), col("event_id").as("o_id"), col("ts_us").as("o_us"),
          explode(array(floor(col("ts_us") / HourUs), floor(col("ts_us") / HourUs) + 1))
            .as("bucket"))
      errors.join(cands, Seq("user_id", "bucket"))
        .filter(col("o_us").between(col("err_us") - HourUs, col("err_us")) &&
          col("o_id") =!= col("err_id"))
        .groupBy(col("err_id").as("event_id"))
        .agg(count(lit(1)).as("n_trailing_1h"))
        .orderBy("event_id")
    }, Some(
      "SELECT e1.event_id, count(*) AS n_trailing_1h FROM events e1 JOIN events e2 " +
      "ON e1.user_id = e2.user_id " +
      "AND epoch_us(e2.ts) BETWEEN epoch_us(e1.ts) - 3600000000 AND epoch_us(e1.ts) " +
      "AND e1.event_id <> e2.event_id " +
      "WHERE e1.event_type = 'error' GROUP BY e1.event_id ORDER BY e1.event_id")),

    // ---- Bucketed fact-fact join: both sides bucketed on the join key
    // at write time — the 100 TB strategy for joins that repeat every
    // day (pay the shuffle once when the table lands). The "merge" hint
    // pins a SortMergeJoin so the bucketed layout is what actually runs
    // even at gate scales where the planner would otherwise broadcast
    // the small side and never touch the buckets; PlanSpec asserts both
    // scans read bucketed with no Exchange feeding the join.
    QueryDef("bucketed_join", (s, d) => {
      val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
      Tables.resetManagedTable(s, s"orders_bj$sfx")
      Tables.resetManagedTable(s, s"customer_bj$sfx")
      // project to the query's columns before the write — a bucketed
      // table is a materialization, and materializing unread columns
      // just multiplies the one-off write cost
      Tables.load(s, d, "orders")
        .select(col("o_custkey"), col("o_totalprice"))
        .write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable(s"orders_bj$sfx")
      Tables.load(s, d, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
        .write.mode("overwrite")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable(s"customer_bj$sfx")
      s.table(s"orders_bj$sfx").hint("merge")
        .join(s.table(s"customer_bj$sfx"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100, 0).cast("long")).as("sum_cents"))
        .orderBy("c_nationkey")
    }, Some(
      "SELECT c_nationkey, count(*) AS n_orders, " +
      "CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS sum_cents " +
      "FROM orders JOIN customer ON o_custkey = c_custkey " +
      "GROUP BY c_nationkey ORDER BY c_nationkey")),

    // ---- Salted (replicated-build) skew join, by hand: when ONE fact
    // key holds a disproportionate share of rows, a plain hash join
    // funnels that key's entire partition through one task. The manual
    // fix AQE generalizes: salt the fact side 8 ways and replicate
    // every build row once per salt value, so the hot key's rows spread
    // over 8 tasks while the join stays a pure (key, salt) hash
    // equality. The replication factor costs 8x the (small) build side,
    // not the fact side. The salt is pure bookkeeping — the result
    // equals the plain join, which is exactly what the oracle runs.
    // (AQE's skewJoin does this adaptively for sort-merge joins; the
    // manual form is the one that works inside any composition and on
    // any join type.)
    QueryDef("salted_join", (s, d) => {
      val SALT = 8
      val ev = Tables.load(s, d, "events")
        .select(col("user_id"), col("event_id"), col("event_type"))
      // derived user dimension: deterministic first event type per user
      val dim = ev
        .groupBy("user_id")
        .agg(min(struct(col("event_id"), col("event_type"))).as("f"))
        .select(col("user_id"), col("f.event_type").as("first_type"))
      val salted = ev.withColumn("salt", pmod(col("event_id"), lit(SALT.toLong)))
      val dimRep = dim.withColumn("salt",
        explode(expr(s"sequence(CAST(0 AS BIGINT), CAST(${SALT - 1} AS BIGINT))")))
      salted.join(dimRep, Seq("user_id", "salt"))
        .groupBy("first_type")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("first_type")
    }, Some(
      """WITH dim AS (
           SELECT user_id, arg_min(event_type, event_id) AS first_type
           FROM events GROUP BY user_id)
         SELECT d.first_type, count(*) AS n_events,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
         FROM events e JOIN dim d USING (user_id)
         GROUP BY d.first_type ORDER BY d.first_type""")),

    // ---- Bloom semi-join reduction: at 100 TB the dominant cost of a
    // selective fact⋈dim join is shuffling the fact side. Build a Bloom
    // filter over the dim keys (graft.functions.BloomAgg — one mergeable
    // 128 KiB bit array), broadcast the one-row result to the fact scan,
    // and drop ~(1 − FPR) of the non-matching fact rows BEFORE the
    // shuffle; the exact join that follows removes the false positives,
    // so the composed operator is exact and the oracle is the plain SQL
    // join. The membership test is pure built-ins
    // (xxhash64/pmod/element_at/shiftright) — whole-stage codegen, no
    // custom scalar. The one-row bloom broadcast is the same whitelisted
    // scalar-subquery shape as mix_weights/q22_global.
    QueryDef("bloom_join", (s, d) => {
      val NumBits = 1 << 20
      val K = 5
      val urgent = Tables.load(s, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val bloomRow = urgent
        .agg(graft.functions.BloomAgg.bloomAgg(col("o_orderkey"), NumBits, K).as("bf"))
      val pref = graft.functions.BloomAgg.prefilter(
        Tables.load(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_returnflag"), Tables.priceCents.as("price_cents"))
          .join(broadcast(bloomRow)),
        "bf", "l_orderkey", NumBits, K)
        .drop("bf")
      pref.join(urgent, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_items"), sum("price_cents").as("sum_cents"))
        .orderBy("l_returnflag")
    }, Some(
      "SELECT l_returnflag, count(*) AS n_items, " +
      s"CAST(sum(${Tables.priceCentsSql}) AS BIGINT) AS sum_cents " +
      "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
      "WHERE o_orderpriority = '1-URGENT' " +
      "GROUP BY l_returnflag ORDER BY l_returnflag"))
  )
}
