package graft

import org.apache.spark.sql.types.{DataType, DecimalType, DoubleType, FloatType}

/** Gate-output discipline: no query may emit a raw floating-point or
  * DECIMAL output column unless it is on the explicit whitelist below.
  *
  * Why: the driver's correctness gate hash-compares cell values against a
  * DuckDB oracle, and un-rounded float/decimal columns drift in the last
  * bits between engines (summation order, decimal rendering) — round 5
  * shipped two such hash regressions (`rank_corr`, `stats_moments`) that
  * this rule would have caught at commit time. Integer-cents money math
  * (Tables.cents) is the house style; a float column is allowed only when
  * it is deterministically rounded (or otherwise bit-stable) AND already
  * hash-proven at sf0.001/0.01/0.1 — that proof is what a whitelist entry
  * records. Adding a new float column means either converting it to
  * integer units or extending the whitelist in the same commit that
  * proves it green at all three SFs.
  */
class GateOutputSpec extends SparkSuite {

  /** query -> float/decimal output columns proven hash-stable (every
    * entry was green in CORRECTNESS_r06/r07 at all driver SFs; most are
    * explicit round(x, k) expressions mirrored in the oracle SQL). */
  private val whitelist: Map[String, Set[String]] = Map(
    "ann_cosine_topk" -> Set("cos_sim"),
    "ann_ivf_topk" -> Set("cos_sim"),
    "ann_ivf_indexed" -> Set("cos_sim"),
    "ann_rerank" -> Set("cos_sim"),
    "bm25_topk" -> Set("score"),
    "corr_hourly" -> Set("r"),
    "dedup_embedding" -> Set("cos_sim"),
    "dedup_embedding_lsh" -> Set("cos_sim"),
    // bucketed-store twin: identical output shape, shared oracle (r12)
    "dedup_embedding_lsh_indexed" -> Set("cos_sim"),
    "dedup_jaccard" -> Set("jaccard"),
    // index-served twin: identical output shape, same three-SF hash proof
    "dedup_jaccard_indexed" -> Set("jaccard"),
    // prefix-filtered twin: identical output shape, PrefixJoinSpec-proven
    "dedup_jaccard_prefix" -> Set("jaccard"),
    // delta-ingest twin (r15): same round(x, 6) expression mirrored in
    // the oracle, hash-green at sf0.001/0.01/0.1 in the landing commit
    "dedup_jaccard_delta" -> Set("jaccard"),
    "embed_quantize" -> Set("scale_r"),
    "histogram_ranks" -> Set("avg_cnt"),
    "matmul_gram" -> Set("dot"),
    "minmax" -> Set("min_qty", "max_qty", "sum_qty"),
    "q10_returns" -> Set("revenue", "c_acctbal"),
    "q14_promo" -> Set("promo_pct"),
    "q18_topq" -> Set("o_totalprice"),
    "q19_disjunct" -> Set("revenue"),
    "q1_pricing" -> Set("sum_qty", "sum_base_price", "sum_disc_price", "avg_qty"),
    "q3_topk" -> Set("revenue"),
    "q5_local" -> Set("revenue"),
    "q6_forecast" -> Set("revenue"),
    "q7_volume" -> Set("revenue"),
    "q8_share" -> Set("mkt_share_pct"),
    "q9_profit" -> Set("sum_profit"),
    "quantiles" -> Set("p25_cents", "p50_cents", "p75_cents"),
    "rep_tokens" -> Set("dup_frac"),
    "sort_global" -> Set("o_totalprice"),
    "text_quality" -> Set("ttr", "avg_word_len", "quality"),
    "window_analytics" -> Set("mov3_cents"))

  private def isFloaty(dt: DataType): Boolean = dt match {
    case DoubleType | FloatType => true
    case _: DecimalType => true
    case _ => false
  }

  test("no query emits an unlisted float/decimal output column") {
    // Schema resolution is plan-time; queries whose builders run small
    // jobs (iterative centroids, sink write-backs) run them at sf0.001.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val floaty = fn(spark, sfDir).schema.fields
        .filter(f => isFloaty(f.dataType)).map(_.name).toSet
      val unlisted = floaty -- whitelist.getOrElse(name, Set.empty)
      if (unlisted.isEmpty) None
      else Some(s"$name: ${unlisted.toSeq.sorted.mkString(", ")}")
    }
    assert(offenders.isEmpty,
      "unlisted float/decimal gate-output columns (round to integer units " +
        "or whitelist with a three-SF hash proof):\n" + offenders.mkString("\n"))
  }

  test("whitelist carries no dead entries") {
    val dead = whitelist.keySet -- SparkEntry.queries.keySet
    assert(dead.isEmpty, s"whitelisted queries no longer exist: ${dead.mkString(", ")}")
  }
}
