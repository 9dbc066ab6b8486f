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
      "SELECT n_inside, n_total, (4000 * n_inside) // n_total AS pi_milli FROM agg")),

    // ---- R-MAT power-law graph generation (ex/mrmpi-crmat.c — the
    // reference's last example program; Chakrabarti et al.'s recursive
    // quadrant model with the canonical a,b,c,d = .57/.19/.19/.05),
    // determinized the pi_estimate way: each edge's 12 quadrant choices
    // are Knuth multiplicative hashes of (edge, level) in [0, 100), so
    // the edge list — and hence the exact out-degree histogram — is
    // bit-identical on both engines at any parallelism. The 12 levels
    // unroll into one closed-form codegen'd projection per endpoint (no
    // per-level explode: a 12x row blowup at generation time would be
    // pure shuffle-side waste); the only exchanges are the two tiny
    // degree aggregates. The generated histogram shows the power law
    // (GraphSpec pins hub-vs-median skew). Simplification vs crmat: raw
    // multi-edges are counted rather than re-drawn (crmat's dedup
    // iterations exist to satisfy exact-Nz-per-row; a degree profile
    // does not need them).
    QueryDef("rmat_graph", (s, d) => {
      s.range(RmatEdges).toDF("i")
        .selectExpr((0 until RmatScale).map(l =>
          s"${rmatHash(l, sparkDialect = true)} AS r$l"): _*)
        .selectExpr(s"${rmatEndpoint(srcSide = true)} AS src",
          s"${rmatEndpoint(srcSide = false)} AS dst")
        .groupBy("src").agg(count(lit(1)).as("deg"))
        .groupBy("deg").agg(count(lit(1)).as("n_vertices"))
        .orderBy("deg")
    }, Some(
      "WITH rv AS (SELECT " +
      (0 until RmatScale).map(l =>
        s"${rmatHash(l, sparkDialect = false)} AS r$l").mkString(", ") +
      s" FROM range(0, $RmatEdges) t(i)), " +
      s"e AS (SELECT ${rmatEndpoint(srcSide = true)} AS src, " +
      s"${rmatEndpoint(srcSide = false)} AS dst FROM rv), " +
      "d AS (SELECT src, count(*) AS deg FROM e GROUP BY src) " +
      "SELECT CAST(deg AS BIGINT) AS deg, count(*) AS n_vertices " +
      "FROM d GROUP BY deg ORDER BY deg"))
  )

  // defs, not vals: the `defs` query list above initializes first and
  // already calls the rmat generators — a val here would still be 0 then
  private def RmatScale = 12 // 4096 vertices
  private def RmatEdges = 200000L

  /** Level-l quadrant hash for edge i, in [0, 100): multiply-xor-shift-
    * multiply — a plain Knuth multiply mod 100 is LINEAR in (i, l), so
    * its residues cycle and the quadrant stream degenerates (observed: a
    * 3-bucket degree histogram); the xor-shift breaks the linearity.
    * One template emitted in both dialects (Spark: pmod/shiftright/^ is
    * xor; DuckDB: %/>>/xor() — its ^ is POWER, the trap the dialect
    * flag exists for). All intermediates stay under 2^62: j*K1 < 2^52,
    * h < 2^31, h2 < 2^31, h2*K2 < 2^62. */
  private def rmatHash(l: Int, sparkDialect: Boolean): String = {
    // every operand is non-negative, so plain % == pmod — spelled per
    // dialect (DuckDB has no pmod)
    val h = s"(((i * $RmatScale + $l) * 2654435761) % 2147483648)"
    val h2 =
      if (sparkDialect) s"($h ^ shiftright($h, 15))"
      else s"xor($h, $h >> 15)"
    val h3 = s"($h2 * 1500450271)"
    if (sparkDialect) s"((shiftright(($h3 % 2147483648), 7)) % 100)"
    else s"((($h3 % 2147483648) >> 7) % 100)"
  }

  /** rmat_graph's closed-form endpoint assembly over the per-level hash
    * columns r0..r11 (thresholds 57/76/95 ≈ the canonical a/b/c/d
    * split) — dialect-independent, so it is shared verbatim. Level l:
    * r < 57 → a (src 0, dst 0), < 76 → b (0,1), < 95 → c (1,0),
    * else d (1,1). */
  private def rmatEndpoint(srcSide: Boolean): String =
    (0 until RmatScale).map { l =>
      if (srcSide) s"(CASE WHEN r$l >= 76 THEN ${1L << l} ELSE 0 END)"
      else s"(CASE WHEN (r$l >= 57 AND r$l < 76) OR r$l >= 95 THEN ${1L << l} ELSE 0 END)"
    }.mkString("(", " + ", ")")
}
