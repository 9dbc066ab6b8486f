package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** TPC-H-shaped relational queries over the driver testdata (reduced TPC-H
  * schema — no partsupp/comment columns, dates stored as timestamps).
  *
  * The shapes mirror the reference's hand-compiled plans (ex/tpch.c,
  * queries 7/9/10/13/21 — see SURVEY.md §2.5): scan with fused
  * filter+projection, broadcast of tiny dimensions (kmr_replicate,
  * ex/tpch.c:2188-2195), shuffle equi-joins (JOINP, ex/tpch.c:1736-1811),
  * left-outer join + count (q13_join_c_o, ex/tpch.c:3017-3053), semi/anti
  * self-join with an inequality (q21_join_lnos_l2/_l3,
  * ex/tpch.c:3417-3502), group-by aggregation, multi-key descending sort
  * and top-K (kmr_choose_first_part, src/kmrmoreops.c:1144-1163).
  *
  * Scale notes: dimension tables (region/nation/supplier) are broadcast;
  * fact-fact joins shuffle on their join keys and rely on AQE for skew;
  * all filters/projections are declarative so Catalyst pushes them into
  * the parquet scan.
  */
object Tpch {

  private def ts(s: String): Column = lit(s).cast("timestamp")
  /** revenue = l_extendedprice * (1 - l_discount), the reference's "volume"
    * (q7_select_by_date, ex/tpch.c:2051-2096). */
  private val rev: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  /** Order-independent money sum: each double term is cast to an exact
    * DECIMAL(18,6) before summing, so the aggregate no longer inherits
    * floating summation-order nondeterminism (the reference computes money
    * in double, ex/tpch.c:1103-1115, but its single-threaded reduce has a
    * fixed order — a distributed sum does not). Result rounded to cents
    * and returned as double. Mirrored exactly by [[dsumSql]]. */
  private def dsum(c: Column): Column =
    round(sum(c.try_cast(DecimalType(18, 6))), 2).cast("double")

  /** DuckDB-side mirror of [[dsum]]. */
  private def dsumSql(expr: String): String =
    s"CAST(round(sum(TRY_CAST($expr AS DECIMAL(18,6))),2) AS DOUBLE)"

  private val revSql = "l_extendedprice*(1-l_discount)"

  val defs: Seq[QueryDef] = Seq(

    // ---- Q1-shape: single-table scan + grouped aggregation (map-side
    // partial agg is Catalyst-automatic; reference always reduces
    // post-shuffle, SURVEY §4.1).
    QueryDef("q1_pricing", (s, d) => {
      Tables.load(s, d, "lineitem")
        .filter(col("l_shipdate") <= ts("1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(rev).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }, Some(
      s"SELECT l_returnflag, l_linestatus, ${dsumSql("l_quantity")} AS sum_qty, " +
      s"${dsumSql("l_extendedprice")} AS sum_base_price, " +
      s"${dsumSql(revSql)} AS sum_disc_price, " +
      "round(avg(l_quantity),4) AS avg_qty, count(*) AS count_order " +
      "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' " +
      "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus")),

    // ---- Q3-shape: 3-way join, group, top-K by revenue desc.
    QueryDef("q3_topk", (s, d) => {
      val c = Tables.load(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.load(s, d, "orders").filter(col("o_orderdate") < ts("1998-01-01 00:00:00"))
      val l = Tables.load(s, d, "lineitem").filter(col("l_shipdate") > ts("1998-01-01 00:00:00"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(dsum(rev).as("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate")
        .orderBy(desc("revenue"), col("o_orderkey"))
        .limit(10)
    }, Some(
      s"SELECT o_orderkey, ${dsumSql(revSql)} AS revenue, o_orderdate " +
      "FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey " +
      "WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00' " +
      "AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00' " +
      "GROUP BY o_orderkey, o_orderdate ORDER BY revenue DESC, o_orderkey LIMIT 10")),

    // ---- Q5-shape: 6-way star join with two broadcast dims and a
    // customer-nation = supplier-nation co-location predicate.
    QueryDef("q5_local", (s, d) => {
      val r = Tables.load(s, d, "region").filter(col("r_name") === "ASIA")
      val n = Tables.load(s, d, "nation")
      val su = Tables.load(s, d, "supplier")
      val c = Tables.load(s, d, "customer")
      val o = Tables.load(s, d, "orders")
        .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
                col("o_orderdate") < ts("1997-01-01 00:00:00"))
      val l = Tables.load(s, d, "lineitem")
      // supplier is SF-proportional: no forced broadcast — AQE/threshold
      // decides at runtime. Only the O(1) dims (nation, region) are hinted.
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(su,
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(rev).as("revenue"))
        .orderBy(desc("revenue"), col("n_name"))
    }, Some(
      s"SELECT n_name, ${dsumSql(revSql)} AS revenue " +
      "FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey " +
      "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey " +
      "JOIN nation ON s_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey " +
      "WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' " +
      "AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00' " +
      "GROUP BY n_name ORDER BY revenue DESC, n_name")),

    // ---- Q7-shape: supplier-nation x customer-nation volume by year
    // (reference plan ex/tpch.c:1815-1891; broadcast nation pair replaces
    // kmr_replicate).
    QueryDef("q7_volume", (s, d) => {
      val n1 = Tables.load(s, d, "nation").select(
        col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = Tables.load(s, d, "nation").select(
        col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
      val su = Tables.load(s, d, "supplier")
      val c = Tables.load(s, d, "customer")
      val o = Tables.load(s, d, "orders")
      val l = Tables.load(s, d, "lineitem")
        .filter(col("l_shipdate").between(ts("1996-01-01 00:00:00"), ts("1997-12-31 00:00:00")))
      // supplier is SF-proportional — joined, not force-broadcast.
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
        .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
        .filter(col("supp_nation") < col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(dsum(rev).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }, Some(
      "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, year(l_shipdate) AS l_year, " +
      s"${dsumSql(revSql)} AS revenue " +
      "FROM supplier JOIN lineitem ON s_suppkey = l_suppkey " +
      "JOIN orders ON o_orderkey = l_orderkey JOIN customer ON c_custkey = o_custkey " +
      "JOIN nation n1 ON s_nationkey = n1.n_nationkey JOIN nation n2 ON c_nationkey = n2.n_nationkey " +
      "WHERE n1.n_name < n2.n_name AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' " +
      "AND TIMESTAMP '1997-12-31 00:00:00' " +
      "GROUP BY supp_nation, cust_nation, l_year ORDER BY supp_nation, cust_nation, l_year")),

    // ---- Q9-shape: 5-table chain through part/supplier/orders
    // (reference ex/tpch.c:2307-2327; no partsupp in testdata, so profit
    // omits ps_supplycost).
    QueryDef("q9_profit", (s, d) => {
      val p = Tables.load(s, d, "part").filter(col("p_name").like("%gear%"))
      val su = Tables.load(s, d, "supplier")
      val n = Tables.load(s, d, "nation")
      val o = Tables.load(s, d, "orders")
      val l = Tables.load(s, d, "lineitem")
      // part/supplier are SF-proportional — shuffle joins; AQE may still
      // broadcast them at small SF, but the plan no longer forces it.
      l.join(p, col("l_partkey") === col("p_partkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(dsum(rev).as("sum_profit"))
        .orderBy(col("nation"), desc("o_year"))
    }, Some(
      // GROUP/ORDER BY the underlying exprs — the alias `nation` collides
      // with the joined table name in DuckDB's binder.
      "SELECT n_name AS nation, year(o_orderdate) AS o_year, " +
      s"${dsumSql(revSql)} AS sum_profit " +
      "FROM part JOIN lineitem ON p_partkey = l_partkey " +
      "JOIN supplier ON s_suppkey = l_suppkey JOIN orders ON o_orderkey = l_orderkey " +
      "JOIN nation ON s_nationkey = n_nationkey WHERE p_name LIKE '%gear%' " +
      "GROUP BY n_name, year(o_orderdate) ORDER BY 1, 2 DESC")),

    // ---- Q10-shape: returned-item revenue, top 20 customers
    // (reference ex/tpch.c:2736-2933: flag filter, date window, 4-way
    // join, sum, desc top-K).
    QueryDef("q10_returns", (s, d) => {
      val c = Tables.load(s, d, "customer")
      val n = Tables.load(s, d, "nation")
      val o = Tables.load(s, d, "orders")
        .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
                col("o_orderdate") < ts("1996-04-01 00:00:00"))
      val l = Tables.load(s, d, "lineitem").filter(col("l_returnflag") === "R")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(rev).as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("revenue"),
          round(col("c_acctbal"), 2).as("c_acctbal"), col("n_name"))
        .orderBy(desc("revenue"), col("c_custkey"))
        .limit(20)
    }, Some(
      s"SELECT c_custkey, c_name, ${dsumSql(revSql)} AS revenue, " +
      "round(c_acctbal,2) AS c_acctbal, n_name " +
      "FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey " +
      "JOIN nation ON c_nationkey = n_nationkey " +
      "WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' " +
      "AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00' AND l_returnflag = 'R' " +
      "GROUP BY c_custkey, c_name, c_acctbal, n_name ORDER BY revenue DESC, c_custkey LIMIT 20")),

    // ---- Q13-shape: left-outer join with an extra join-side predicate,
    // count-including-zero, then a count distribution (reference
    // q13_join_c_o / q13_join_co, ex/tpch.c:3017-3087 — empty groups
    // encode count=0).
    QueryDef("q13_custdist", (s, d) => {
      val c = Tables.load(s, d, "customer")
      val o = Tables.load(s, d, "orders")
        .filter(not(col("o_orderpriority").like("%URGENT%")))
      c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(desc("custdist"), desc("c_count"))
    }, Some(
      "SELECT c_count, count(*) AS custdist FROM (" +
      "SELECT c_custkey, count(o_orderkey) AS c_count FROM customer " +
      "LEFT OUTER JOIN orders ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '%URGENT%' " +
      "GROUP BY c_custkey) t GROUP BY c_count ORDER BY custdist DESC, c_count DESC")),

    // ---- Q14-shape: conditional aggregation (promo revenue share) —
    // CASE inside a sum, one pass, decimal-exact on both engines.
    QueryDef("q14_promo", (s, d) => {
      val l = Tables.load(s, d, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
                col("l_shipdate") < ts("1996-02-01 00:00:00"))
      val p = Tables.load(s, d, "part")
      // exact decimal sums, then ONE double division (engine decimal-
      // division scale rules differ; double division is deterministic)
      l.join(p, col("l_partkey") === col("p_partkey"))
        .agg(
          round(
            sum(when(col("p_name").like("%steel%"), rev).otherwise(lit(0.0))
              .try_cast(DecimalType(18, 6))).cast("double") * 100 /
              sum(rev.try_cast(DecimalType(18, 6))).cast("double"), 4)
            .as("promo_pct"),
          count(lit(1)).as("n"))
    }, Some(
      "SELECT round(CAST(sum(CASE WHEN p_name LIKE '%steel%' " +
      s"THEN TRY_CAST($revSql AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) * 100 / " +
      s"CAST(sum(TRY_CAST($revSql AS DECIMAL(18,6))) AS DOUBLE), 4) AS promo_pct, count(*) AS n " +
      "FROM lineitem JOIN part ON l_partkey = p_partkey " +
      "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' " +
      "AND l_shipdate < TIMESTAMP '1996-02-01 00:00:00'")),

    // ---- Q17-shape: correlated scalar subquery — parts whose lineitems
    // fall below 20% of that part's average quantity. Catalyst
    // decorrelates the subquery into an aggregate + join (the rewrite the
    // reference would hand-schedule).
    QueryDef("q17_avgqty", (s, d) => {
      val l = Tables.load(s, d, "lineitem")
      val avgQ = l.groupBy(col("l_partkey").as("a_partkey"))
        .agg(avg(graft.Tables.qtyCents).as("avg_qc"))
      l.join(avgQ, col("l_partkey") === col("a_partkey"))
        .filter(graft.Tables.qtyCents < lit(0.2) * col("avg_qc"))
        .agg(
          sum(graft.Tables.priceCents).as("total_cents"),
          count(lit(1)).as("n"))
    }, Some(
      "SELECT CAST(sum(" + graft.Tables.priceCentsSql + ") AS BIGINT) AS total_cents, " +
      "count(*) AS n FROM lineitem l1 " +
      "WHERE " + graft.Tables.qtyCentsSql + " < " +
      "(SELECT 0.2 * avg(" + graft.Tables.qtyCentsSql + ") " +
      "FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)")),

    // ---- Q18-shape: IN-subquery over a HAVING aggregate — orders whose
    // total quantity exceeds a threshold, then their customers.
    QueryDef("q18_topq", (s, d) => {
      val l = Tables.load(s, d, "lineitem")
      val big = l.groupBy("l_orderkey")
        .agg(sum(graft.Tables.qtyCents).as("sum_qc"))
        .filter(col("sum_qc") > 250 * 100)
      val o = Tables.load(s, d, "orders")
      val c = Tables.load(s, d, "customer")
      o.join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .join(c, col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
        .limit(100)
    }, Some(
      "SELECT c_custkey, c_name, o_orderkey, round(o_totalprice, 2) AS o_totalprice " +
      "FROM orders JOIN customer ON o_custkey = c_custkey " +
      "WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem GROUP BY l_orderkey " +
      "HAVING sum(" + graft.Tables.qtyCentsSql + ") > 25000) " +
      "ORDER BY o_totalprice DESC, o_orderkey LIMIT 100")),

    // ---- Q19-shape: disjunction of conjunctive predicates across the
    // join — Catalyst pushes the common l_partkey = p_partkey through
    // and evaluates the OR-of-ANDs post-join.
    QueryDef("q19_disjunct", (s, d) => {
      val l = Tables.load(s, d, "lineitem")
      val p = Tables.load(s, d, "part")
      l.join(p, col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_size").between(1, 15) && col("l_quantity").between(1, 20)) ||
          (col("p_size").between(16, 35) && col("l_quantity").between(21, 40)) ||
          (col("p_size").between(36, 50) && col("l_quantity") > 40))
        .agg(dsum(rev).as("revenue"), count(lit(1)).as("n"))
    }, Some(
      s"SELECT ${dsumSql(revSql)} AS revenue, count(*) AS n " +
      "FROM lineitem JOIN part ON l_partkey = p_partkey " +
      "WHERE (p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20) " +
      "OR (p_size BETWEEN 16 AND 35 AND l_quantity BETWEEN 21 AND 40) " +
      "OR (p_size BETWEEN 36 AND 50 AND l_quantity > 40)")),

    // ---- Q21-shape (exists): lineitems of 'F' orders whose order has
    // ANOTHER supplier — left-semi self-join with an inequality
    // (q21_join_lnos_l2, ex/tpch.c:3417-3457).
    QueryDef("q21_exists", (s, d) => q21(s, d, "left_semi"), Some(
      "SELECT s_name, count(*) AS numwait FROM supplier " +
      "JOIN lineitem l1 ON s_suppkey = l1.l_suppkey " +
      "JOIN orders ON o_orderkey = l1.l_orderkey " +
      "WHERE o_orderstatus = 'F' AND EXISTS (" +
      "SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey " +
      "AND l2.l_suppkey <> l1.l_suppkey) " +
      "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100")),

    // ---- Q21-shape (not exists): sole-supplier lineitems of 'F' orders —
    // left-anti self-join (q21_join_lnos_l3, ex/tpch.c:3459-3502).
    QueryDef("q21_sole", (s, d) => q21(s, d, "left_anti"), Some(
      "SELECT s_name, count(*) AS numwait FROM supplier " +
      "JOIN lineitem l1 ON s_suppkey = l1.l_suppkey " +
      "JOIN orders ON o_orderkey = l1.l_orderkey " +
      "WHERE o_orderstatus = 'F' AND NOT EXISTS (" +
      "SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey " +
      "AND l2.l_suppkey <> l1.l_suppkey) " +
      "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100")),

    // ---- Q6-shape: single-table filter + global aggregate, zero joins —
    // the forecast-revenue-change scan. Every predicate reaches the
    // parquet scan as a pushed filter; at 100 TB this reads only the four
    // referenced columns and row-groups surviving the shipdate range.
    QueryDef("q6_forecast", (s, d) => {
      Tables.load(s, d, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
                col("l_shipdate") < ts("1997-01-01 00:00:00") &&
                col("l_discount").between(0.05, 0.07) &&
                col("l_quantity") < 24)
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
             count(lit(1)).as("n"))
    }, Some(
      s"SELECT ${dsumSql("l_extendedprice*l_discount")} AS revenue, count(*) AS n " +
      "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' " +
      "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' " +
      "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24")),

    // ---- Q4-shape: EXISTS with a correlated inequality — orders with a
    // late-shipped line (no l_commitdate/l_receiptdate in the reduced
    // schema, so "late" = shipped >60 days after the order date), counted
    // by priority. Left-semi join carries the non-equi condition; both
    // sides shuffle on orderkey only.
    QueryDef("q4_priority", (s, d) => {
      val o = Tables.load(s, d, "orders")
        .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
                col("o_orderdate") < ts("1996-04-01 00:00:00"))
      val l = Tables.load(s, d, "lineitem").select("l_orderkey", "l_shipdate")
      o.join(l,
          col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }, Some(
      "SELECT o_orderpriority, count(*) AS order_count FROM orders o " +
      "WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' " +
      "AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00' " +
      "AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey " +
      "AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) " +
      "GROUP BY o_orderpriority ORDER BY o_orderpriority")),

    // ---- Q8-shape: national market share — a 7-table snowflake with a
    // conditional-share ratio per year. Decimal-exact numerator and
    // denominator, ONE double division (the q14 technique). Only O(1)
    // dims (nation, region) are broadcast-hinted; supplier/part join by
    // shuffle and AQE decides the rest.
    QueryDef("q8_share", (s, d) => {
      val n1 = Tables.load(s, d, "nation").select(
        col("n_nationkey").as("cn_key"), col("n_regionkey").as("cn_region"))
      val n2 = Tables.load(s, d, "nation").select(
        col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val r = Tables.load(s, d, "region").filter(col("r_name") === "ASIA")
      val p = Tables.load(s, d, "part").filter(col("p_type") === "PROMO")
      val su = Tables.load(s, d, "supplier")
      val c = Tables.load(s, d, "customer")
      val o = Tables.load(s, d, "orders")
      val l = Tables.load(s, d, "lineitem")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("c_nationkey") === col("cn_key"))
        .join(broadcast(r), col("cn_region") === col("r_regionkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n2), col("s_nationkey") === col("sn_key"))
        .join(p, col("l_partkey") === col("p_partkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          round(
            sum(when(col("supp_nation") === "NATION_2", rev).otherwise(lit(0.0))
              .try_cast(DecimalType(18, 6))).cast("double") * 100 /
              sum(rev.try_cast(DecimalType(18, 6))).cast("double"), 4)
            .as("mkt_share_pct"),
          count(lit(1)).as("n"))
        .orderBy("o_year")
    }, Some(
      "SELECT year(o_orderdate) AS o_year, " +
      "round(CAST(sum(CASE WHEN n2.n_name = 'NATION_2' " +
      s"THEN TRY_CAST($revSql AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) * 100 / " +
      s"CAST(sum(TRY_CAST($revSql AS DECIMAL(18,6))) AS DOUBLE), 4) AS mkt_share_pct, " +
      "count(*) AS n " +
      "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
      "JOIN customer ON o_custkey = c_custkey " +
      "JOIN nation n1 ON c_nationkey = n1.n_nationkey " +
      "JOIN region ON n1.n_regionkey = r_regionkey " +
      "JOIN supplier ON l_suppkey = s_suppkey " +
      "JOIN nation n2 ON s_nationkey = n2.n_nationkey " +
      "JOIN part ON l_partkey = p_partkey " +
      "WHERE r_name = 'ASIA' AND p_type = 'PROMO' " +
      "GROUP BY o_year ORDER BY o_year")),

    // ---- Q12-shape: join + conditional counts by line attribute (no
    // l_shipmode in the reduced schema; l_returnflag takes its place) —
    // high- vs low-priority line counts per flag, all-integer exact.
    QueryDef("q12_priority", (s, d) => {
      val l = Tables.load(s, d, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
                col("l_shipdate") < ts("1997-01-01 00:00:00"))
      val o = Tables.load(s, d, "orders")
      val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
          sum(when(isHigh, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(isHigh, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy("l_returnflag")
    }, Some(
      "SELECT l_returnflag, " +
      "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, " +
      "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count " +
      "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
      "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' " +
      "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' " +
      "GROUP BY l_returnflag ORDER BY l_returnflag")),

    // ---- Q15-shape: aggregate reused against its own global max (the
    // CREATE VIEW revenue pattern). Per-supplier revenue in exact integer
    // cents so the max-equality join is portable; the one-row max side is
    // an equality BROADCAST hash join, not a nested loop.
    QueryDef("q15_topsupp", (s, d) => {
      val revCents = expr(
        "try_cast(round(l_extendedprice * (1 - l_discount) * 100, 0) AS LONG)")
      val revs = Tables.load(s, d, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
                col("l_shipdate") < ts("1996-04-01 00:00:00"))
        .groupBy("l_suppkey")
        .agg(sum(revCents).as("total_rev_cents"))
      val maxRev = revs.agg(max(col("total_rev_cents")).as("max_rev"))
      val su = Tables.load(s, d, "supplier")
      revs.join(broadcast(maxRev), col("total_rev_cents") === col("max_rev"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_rev_cents"))
        .orderBy("s_suppkey")
    }, Some(
      "WITH rev AS (SELECT l_suppkey, " +
      "CAST(sum(TRY_CAST(round(l_extendedprice*(1-l_discount)*100,0) AS BIGINT)) AS BIGINT) AS total_rev_cents " +
      "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' " +
      "AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00' GROUP BY l_suppkey) " +
      "SELECT s_suppkey, s_name, total_rev_cents FROM supplier " +
      "JOIN rev ON s_suppkey = l_suppkey " +
      "WHERE total_rev_cents = (SELECT max(total_rev_cents) FROM rev) " +
      "ORDER BY s_suppkey")),

    // ---- Q22-shape: global-average threshold + anti join (no c_phone in
    // the reduced schema: c_nationkey is the country code; "no orders"
    // would be empty at this SF, so the anti side is URGENT orders). The
    // threshold compare is division-free — cents*count > sum — so both
    // engines evaluate it in exact BIGINT arithmetic; the one-row global
    // aggregate rides a broadcast (the scalar-subquery shape, whitelisted
    // like mix_weights).
    QueryDef("q22_global", (s, d) => {
      val c = Tables.load(s, d, "customer")
      val balCents = expr("try_cast(round(c_acctbal * 100, 0) AS LONG)")
      val stats = c.filter(col("c_acctbal") > 0)
        .agg(count(lit(1)).as("n_pos"), sum(balCents).as("sum_pos_cents"))
      val urgent = Tables.load(s, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      c.join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .crossJoin(broadcast(stats))
        .filter(balCents * col("n_pos") > col("sum_pos_cents"))
        .groupBy(col("c_nationkey").as("cntrycode"))
        .agg(count(lit(1)).as("numcust"), sum(balCents).as("totacctbal_cents"))
        .orderBy("cntrycode")
    }, Some(
      "SELECT c_nationkey AS cntrycode, count(*) AS numcust, " +
      "CAST(sum(TRY_CAST(round(c_acctbal*100,0) AS BIGINT)) AS BIGINT) AS totacctbal_cents " +
      "FROM customer c " +
      "WHERE TRY_CAST(round(c_acctbal*100,0) AS BIGINT) * " +
      "(SELECT count(*) FROM customer WHERE c_acctbal > 0) > " +
      "(SELECT CAST(sum(TRY_CAST(round(c_acctbal*100,0) AS BIGINT)) AS BIGINT) " +
      "FROM customer WHERE c_acctbal > 0) " +
      "AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey " +
      "AND o.o_orderpriority = '1-URGENT') " +
      "GROUP BY cntrycode ORDER BY cntrycode")),

    // ---- Q2-shape: correlated MIN subquery over a derived part-supplier
    // relation (no partsupp in the reduced schema — DISTINCT
    // (l_partkey, l_suppkey) stands in for it; s_acctbal stands in for
    // ps_supplycost). The per-part min is a PARTITIONED window over
    // l_partkey — one shuffle, one pass — instead of the aggregate +
    // self-join decorrelation, which would compute the eligible-supplier
    // subtree twice (two lineitem scans at 100 TB). Balances compare in
    // exact integer cents so min-equality is portable across engines.
    // Scale: the distinct shuffles once on the pair key; the window
    // repartitions on l_partkey (never unpartitioned); region/nation are
    // O(1) broadcasts.
    QueryDef("q2_mincost", (s, d) => {
      val balCents = expr("try_cast(round(s_acctbal*100,0) AS LONG)")
      val ps = Tables.load(s, d, "lineitem")
        .select("l_partkey", "l_suppkey").distinct()
      val su = Tables.load(s, d, "supplier")
        .withColumn("bal_cents", balCents)
      val n = Tables.load(s, d, "nation")
      val r = Tables.load(s, d, "region").filter(col("r_name") === "ASIA")
      val elig = ps
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .select("l_partkey", "s_name", "n_name", "bal_cents")
      val perPart = org.apache.spark.sql.expressions.Window.partitionBy("l_partkey")
      val p = Tables.load(s, d, "part").filter(col("p_size") === 25)
      elig
        .withColumn("min_cents", min(col("bal_cents")).over(perPart))
        .filter(col("bal_cents") === col("min_cents"))
        .join(p, col("l_partkey") === col("p_partkey"))
        .select(col("bal_cents").as("s_acctbal_cents"),
          col("s_name"), col("n_name"), col("p_partkey"))
        .orderBy(desc("s_acctbal_cents"), col("s_name"), col("p_partkey"))
        .limit(100)
    }, Some(
      "WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem), " +
      "elig AS (SELECT l_partkey, s_name, n_name, " +
      "TRY_CAST(round(s_acctbal*100,0) AS BIGINT) AS bal_cents " +
      "FROM ps JOIN supplier ON l_suppkey = s_suppkey " +
      "JOIN nation ON s_nationkey = n_nationkey " +
      "JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA') " +
      "SELECT e.bal_cents AS s_acctbal_cents, e.s_name, e.n_name, p_partkey " +
      "FROM elig e JOIN part ON e.l_partkey = p_partkey WHERE p_size = 25 " +
      "AND e.bal_cents = (SELECT min(e2.bal_cents) FROM elig e2 " +
      "WHERE e2.l_partkey = e.l_partkey) " +
      "ORDER BY s_acctbal_cents DESC, s_name, p_partkey LIMIT 100")),

    // ---- Q11-shape: grouped value vs a fraction of the GLOBAL total
    // (the HAVING-with-scalar-subquery pattern). Per-part shipped value
    // from suppliers in one region; parts above 2× the MEAN part value
    // survive — a scale-invariant threshold (reference Q11's fixed
    // fraction goes empty as the part count grows with SF). Division-free
    // compare (val·n_parts > 2·total) in exact BIGINT on both engines;
    // the one-row total/count aggregate rides the whitelisted scalar
    // broadcast (the q22_global club).
    QueryDef("q11_value", (s, d) => {
      val v = Tables.load(s, d, "lineitem")
        .join(Tables.load(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.load(s, d, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.load(s, d, "region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("l_partkey")
        .agg(sum(graft.Tables.priceCents).as("value_cents"))
      val tot = v.agg(sum(col("value_cents")).as("total_cents"),
        count(lit(1)).as("n_parts"))
      v.crossJoin(broadcast(tot))
        .filter(col("value_cents") * col("n_parts") > lit(2) * col("total_cents"))
        .select("l_partkey", "value_cents")
        .orderBy(desc("value_cents"), col("l_partkey"))
    }, Some(
      "WITH v AS (SELECT l_partkey, " +
      s"CAST(sum(${graft.Tables.priceCentsSql}) AS BIGINT) AS value_cents " +
      "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
      "JOIN nation ON s_nationkey = n_nationkey " +
      "JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA' " +
      "GROUP BY l_partkey) " +
      "SELECT l_partkey, value_cents FROM v " +
      "WHERE value_cents * (SELECT count(*) FROM v) > " +
      "2 * (SELECT CAST(sum(value_cents) AS BIGINT) FROM v) " +
      "ORDER BY value_cents DESC, l_partkey")),

    // ---- Q16-shape: DISTINCT supplier count per part attribute with a
    // NOT-IN exclusion subquery (reference Q16's complaint filter → a
    // low-balance supplier blacklist). The NOT IN compiles to a left-anti
    // join on s_suppkey (never a nested loop: the key is non-nullable);
    // count(DISTINCT) shuffles once on the group key with a partial
    // distinct map-side.
    QueryDef("q16_suppcnt", (s, d) => {
      val ps = Tables.load(s, d, "lineitem")
        .select("l_partkey", "l_suppkey").distinct()
      val excl = Tables.load(s, d, "supplier")
        .filter(col("s_acctbal") < 2000).select("s_suppkey")
      val p = Tables.load(s, d, "part")
        .filter(col("p_brand") =!= "Brand#3" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
      p.join(ps, col("p_partkey") === col("l_partkey"))
        .join(excl, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"), col("p_size"))
    }, Some(
      "SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt " +
      "FROM part JOIN (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps " +
      "ON p_partkey = l_partkey " +
      "WHERE p_brand <> 'Brand#3' AND p_type <> 'PROMO' " +
      "AND p_size IN (1,4,9,16,25,36,49) " +
      "AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000) " +
      "GROUP BY p_brand, p_type, p_size " +
      "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size")),

    // ---- Q20-shape: nested IN chain — suppliers with a CONCENTRATED
    // (supplier, part) shipping relationship on '%gear%' parts in 1996,
    // restricted to one region (reference Q20's excess-stock supplier
    // list; availqty → shipped quantity). "Concentrated" = the pair's
    // quantity exceeds 1.5× the mean pair quantity — scale-invariant, where
    // a fixed threshold goes empty as the pair key space outgrows the
    // line count. Both IN subqueries become left-semi equi-joins; the
    // per-pair HAVING aggregate shuffles once on the pair key; the
    // one-row mean rides the whitelisted scalar broadcast. Exact BIGINT
    // cents, division-free compare.
    QueryDef("q20_excess", (s, d) => {
      val gearParts = Tables.load(s, d, "part")
        .filter(col("p_name").like("%gear%")).select("p_partkey")
      val pairQty = Tables.load(s, d, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
                col("l_shipdate") < ts("1997-01-01 00:00:00"))
        .join(gearParts, col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(sum(graft.Tables.qtyCents).as("sum_qc"))
      val tot = pairQty.agg(sum(col("sum_qc")).as("total_qc"),
        count(lit(1)).as("n_pairs"))
      val bigShippers = pairQty.crossJoin(broadcast(tot))
        .filter(col("sum_qc") * 2 * col("n_pairs") > lit(3) * col("total_qc"))
        .select("l_suppkey").distinct()
      val n = Tables.load(s, d, "nation")
      val r = Tables.load(s, d, "region").filter(col("r_name") === "ASIA")
      Tables.load(s, d, "supplier")
        .join(bigShippers, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    }, Some(
      "WITH g AS (SELECT l_suppkey, l_partkey, " +
      s"CAST(sum(${graft.Tables.qtyCentsSql}) AS BIGINT) AS sum_qc " +
      "FROM lineitem " +
      "WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%gear%') " +
      "AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' " +
      "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' " +
      "GROUP BY l_suppkey, l_partkey) " +
      "SELECT s_name, n_name FROM supplier " +
      "JOIN nation ON s_nationkey = n_nationkey " +
      "JOIN region ON n_regionkey = r_regionkey " +
      "WHERE r_name = 'ASIA' AND s_suppkey IN (" +
      "SELECT l_suppkey FROM g WHERE sum_qc * 2 * (SELECT count(*) FROM g) > " +
      "3 * (SELECT CAST(sum(sum_qc) AS BIGINT) FROM g)) " +
      "ORDER BY s_name"))
  )

  /** Shared Q21 body: self semi/anti join on (same order, different
    * supplier), then restrict to finished orders, count per supplier.
    * The self-join shuffles both sides on l_orderkey; supplier is
    * broadcast. */
  private def q21(s: SparkSession, d: String, joinType: String): DataFrame = {
    val l1 = Tables.load(s, d, "lineitem").select("l_orderkey", "l_suppkey").as("l1")
    val l2 = Tables.load(s, d, "lineitem").select(
      col("l_orderkey").as("l2_orderkey"), col("l_suppkey").as("l2_suppkey"))
    val o = Tables.load(s, d, "orders").filter(col("o_orderstatus") === "F")
    val su = Tables.load(s, d, "supplier")
    l1.join(l2,
        col("l_orderkey") === col("l2_orderkey") && col("l_suppkey") =!= col("l2_suppkey"),
        joinType)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(desc("numwait"), col("s_name"))
      .limit(100)
  }
}
