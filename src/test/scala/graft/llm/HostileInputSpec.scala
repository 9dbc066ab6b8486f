package graft.llm

import graft.SparkSuite

/** Robustness net: every operator that consumes only the `documents`
  * table must execute cleanly on a hostile corpus — NULL text, empty
  * text, whitespace-only, single-token, unicode, and degenerate
  * repetition — none of which the driver's fixed testdata contains.
  * Catches the class of latent failure the curation review surfaced
  * (ANSI division by zero, split('') phantom tokens) for ALL current
  * and future document operators at once. */
class HostileInputSpec extends SparkSuite {

  /** Gate queries whose only input is documents.parquet. */
  private val docOnlyQueries = Seq(
    "dedup_exact", "dedup_jaccard", "dedup_minhash", "dedup_simhash",
    "dedup_clusters", "dedup_keep_best", "dedup_incremental",
    "pii_redact", "contamination", "chunk_docs", "mix_weights",
    "filter_funnel", "seq_pack", "split_assign", "rep_tokens",
    "text_stats", "text_quality", "token_count", "lang_id",
    "tfidf_lang", "doc_fingerprint", "fuzzy_pairs", "sample_stratified",
    "lm_bigram_score", "dedup_substring", "topk_per_group",
    "collect_topids", "ngram_topk", "merge_upsert", "rank_corr",
    "approx_topk", "reservoir_sample", "bm25_topk", "collocations",
    "dedup_containment", "source_diversity", "lexical_diversity",
    "oov_rate", "dedup_eval")

  private lazy val hostileDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hostile_docs").toString
    val rows = Seq(
      (0L, null.asInstanceOf[String], "en", "src0", 0L),
      (1L, "", "en", "src0", 0L),
      (2L, "   \t  ", "de", "src1", 6L),
      (3L, "one", "es", "src1", 3L),
      (4L, "a perfectly ordinary document with enough tokens to pass " +
        "every quality gate in the funnel and the shingle minimums " +
        "of the dedup family besides", "en", "src2", 140L),
      (5L, "héllo wörld ünïcode ＵＮＩＣＯＤＥ 中文 текст emoji 😀 mixed in", "fr", "src2", 60L),
      (6L, Seq.fill(40)("x").mkString(" "), "de", "src3", 79L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  docOnlyQueries.foreach { name =>
    test(s"$name survives the hostile corpus") {
      val out = graft.SparkEntry.queries(name)(spark, hostileDir).collect()
      // no exception is the main assertion; also: no row of an
      // all-aggregate result may carry a negative count-like value
      out.foreach { r =>
        (0 until r.length).foreach { i =>
          if (!r.isNullAt(i) && r.get(i).isInstanceOf[Long]) {
            val v = r.getLong(i)
            val col = r.schema.fields(i).name
            if (col.startsWith("n_") || col.startsWith("cnt") || col == "cluster_size")
              assert(v >= 0, s"$name.$col negative: $v in $r")
          }
        }
      }
    }
  }
}
