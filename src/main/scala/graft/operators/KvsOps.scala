package graft.operators

import graft.{QueryDef, Tables}
import graft.core.KVS
import org.apache.spark.sql.functions._

/** Gate queries driven through the typed KVS API (graft.core.KVS) so the
  * library layer itself is exercised end-to-end against the DuckDB
  * oracle — covering the small derived operators:
  *
  * - kvs_reduce        — map + shuffle + reduce via reduceByKey
  *                       (kmr_reduce9, src/kmrbase.c:2606-2676)
  * - concat_union      — kmr_concatenate_kvs (src/kmrbase.c:2753-2815)
  * - reverse_kv        — kmr_reverse (src/kmrmoreops.c:141-162)
  * - pairing_roundtrip — kmr_pairing/kmr_unpairing (src/kmrmoreops.c:196-237)
  * - find_key          — kmr_find_key (src/kmrmoreops.c:42-91)
  * - take_one          — kmr_take_one (src/kmrbase.c:1426-1453)
  * - map_once          — kmr_map_once / kmr_map_on_rank_zero
  *                       (src/kmrbase.c:1459-1521)
  */
object KvsOps {

  val defs: Seq[QueryDef] = Seq(

    QueryDef("kvs_reduce", (s, d) => {
      import s.implicits._
      // quantities in exact integer cents so the typed reduce is
      // summation-order-independent, mirroring the oracle.
      KVS.fromColumns[String, Long](
          Tables.load(s, d, "lineitem"),
          col("l_returnflag"),
          graft.Tables.qtyCents)
        .reduceByKey(_ + _)
        .ds.toDF("l_returnflag", "qty_cents")
        .orderBy("l_returnflag")
    }, Some(
      "SELECT l_returnflag, CAST(sum(" + graft.Tables.qtyCentsSql + ") AS BIGINT) AS qty_cents " +
      "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")),

    QueryDef("concat_union", (s, d) => {
      import s.implicits._
      val o = Tables.load(s, d, "orders")
      def side(status: String) = KVS.fromColumns[String, Long](
        o.filter(col("o_orderstatus") === status), col("o_orderstatus"), col("o_orderkey"))
      side("F").concatenate(side("O"), side("P"))
        .countKeys()
        .ds.toDF("o_orderstatus", "cnt")
        .orderBy("o_orderstatus")
    }, Some(
      "SELECT o_orderstatus, count(*) AS cnt FROM (" +
      "SELECT o_orderstatus FROM orders WHERE o_orderstatus='F' " +
      "UNION ALL SELECT o_orderstatus FROM orders WHERE o_orderstatus='O' " +
      "UNION ALL SELECT o_orderstatus FROM orders WHERE o_orderstatus='P') t " +
      "GROUP BY o_orderstatus ORDER BY o_orderstatus")),

    QueryDef("reverse_kv", (s, d) => {
      import s.implicits._
      KVS.fromColumns[Long, String](
          Tables.load(s, d, "documents"), col("doc_id"), col("lang"))
        .reverse
        .ds.toDF("lang", "doc_id")
        .orderBy("lang", "doc_id")
    }, Some("SELECT lang, doc_id FROM documents ORDER BY lang, doc_id")),

    QueryDef("pairing_roundtrip", (s, d) => {
      import s.implicits._
      // (k,v) → (k,(k,v)) → unpair back: identity modulo the nesting.
      KVS.fromColumns[Long, String](
          Tables.load(s, d, "documents"), col("doc_id"), col("source"))
        .pairing
        .map { case (_, kv) => kv } // kmr_unpairing
        .ds.toDF("doc_id", "source")
        .orderBy("doc_id")
    }, Some("SELECT doc_id, source FROM documents ORDER BY doc_id")),

    QueryDef("find_key", (s, d) => {
      import s.implicits._
      val name = KVS.fromColumns[Long, String](
        Tables.load(s, d, "supplier"), col("s_suppkey"), col("s_name")).findKey(1L)
      Seq((1L, name)).toDF("s_suppkey", "s_name")
    }, Some("SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey = 1")),

    QueryDef("take_one", (s, d) => {
      import s.implicits._
      val (k, v) = KVS.fromColumns[Long, String](
        Tables.load(s, d, "region").filter(col("r_regionkey") === 0),
        col("r_regionkey"), col("r_name")).takeOne()
      Seq((k, v)).toDF("r_regionkey", "r_name")
    }, Some(
      "SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name FROM region WHERE r_regionkey = 0")),

    QueryDef("map_once", (s, d) => {
      import s.implicits._
      // driver-side generation, then a distributed fold — the value is
      // data-independent by design (generator parity, not table I/O).
      val gen = KVS.generate(s, (0L until 100L).map(i => ("gen", i)), 4)
      Seq(gen.totalOnValues(0L)(_ + _)).toDF("total")
    }, Some("SELECT CAST(4950 AS BIGINT) AS total")),

    // ---- Monte Carlo pi (ex/pi.c — the reference's kmr_map_once
    // sampling example), determinized: sample i's coordinates are Knuth
    // multiplicative hashes of i in [0, 2^20), the in-circle test is
    // exact integer arithmetic (xi² + yi² < 2^40 fits a long), and the
    // estimate is an integer milli-ratio — so unlike rand()-based pi the
    // whole computation is bit-identical on both engines AND at any
    // parallelism (spark.range is the distributed generator; no data
    // ever shuffles, the only exchange is the final 1-row aggregate).
    QueryDef("pi_estimate", (s, d) => {
      val n = 1000000L
      s.range(n).toDF("i")
        .select(
          (pmod(col("i") * 2654435761L, lit(1048576L))).as("xi"),
          (pmod(col("i") * 1500450271L, lit(1048576L))).as("yi"))
        .agg(
          sum(when(col("xi") * col("xi") + col("yi") * col("yi") <
            lit(1048576L * 1048576L), 1L).otherwise(0L)).as("n_inside"),
          count(lit(1)).as("n_total"))
        .select(col("n_inside"), col("n_total"),
          expr("(4000 * n_inside) div n_total").as("pi_milli"))
    }, Some(
      "WITH pts AS (SELECT (i * 2654435761) % 1048576 AS xi, " +
      "(i * 1500450271) % 1048576 AS yi FROM range(0, 1000000) t(i)), " +
      "agg AS (SELECT CAST(sum(CASE WHEN xi*xi + yi*yi < CAST(1099511627776 AS BIGINT) " +
      "THEN 1 ELSE 0 END) AS BIGINT) AS n_inside, count(*) AS n_total FROM pts) " +
      "SELECT n_inside, n_total, (4000 * n_inside) // n_total AS pi_milli FROM agg"))
  )
}
