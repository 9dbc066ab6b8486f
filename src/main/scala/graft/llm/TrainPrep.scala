package graft.llm

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Training-data preparation operators (beyond-reference LLM-pipeline
  * surface, like llm/Dedup): sequence packing, deterministic dataset
  * splitting, and a repetition-based quality signal.
  *
  * Scale design: packing rides CoreOps.prefixSumLong (range-partition +
  * O(P) driver carry — no single-task window); splitting is a pure
  * per-row hash (no shuffle before the final count); repetition stats are
  * per-row array expressions (codegen'd, no explode).
  */
object TrainPrep {

  import TextNorm.{normText, normTextSql, normSql, toks}

  /** Whitespace token count with the pipe_tokens null/empty convention:
    * NULL or whitespace-only text counts 0 (split('') would count 1). */
  private val nToks =
    when(col("text").isNull || normText === "", 0L)
      .otherwise(size(toks).cast("long"))

  private val nToksSql =
    s"CASE WHEN text IS NULL OR $normTextSql = '' THEN 0 " +
    s"ELSE CAST(len($normSql) AS BIGINT) END"

  /** Tokens per training sequence for seq packing. */
  private val PackBudget = 1024L

  /** THE production split expression over a `doc_id` column (exposed so
    * specs exercise this exact definition — salt, hash, and thresholds —
    * rather than a copy that could drift). */
  val splitCol: org.apache.spark.sql.Column = {
    val bucket = Dedup.md5Long(concat(lit("split:"), col("doc_id").cast("string"))) % 100L
    when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- GPT-style sequence packing: concatenate the corpus in doc_id
    // order and chunk at a fixed token budget; each doc belongs to the
    // pack its first token lands in. The global running total is the
    // two-phase scalable prefix sum (same engine as scan_prefix), NOT an
    // unpartitioned window — no single-task stage at any size.
    QueryDef("seq_pack", (s, d) => {
      val t = Tables.load(s, d, "documents").select(col("doc_id"), nToks.as("n_toks"))
      graft.operators.CoreOps
        .prefixSumLong(s, t, "doc_id", "n_toks", "start_tok", keepVal = true)
        .select(expr(s"start_tok div $PackBudget").as("pack_id"), col("n_toks"))
        .groupBy("pack_id")
        .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"))
        .orderBy("pack_id")
    }, Some(
      s"""WITH t AS (SELECT doc_id, $nToksSql AS n_toks FROM documents),
         p AS (SELECT doc_id, n_toks,
           CAST(coalesce(sum(n_toks) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
           FROM t)
         SELECT start_tok//$PackBudget AS pack_id, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS n_tokens
         FROM p GROUP BY 1 ORDER BY pack_id""")),

    // ---- Deterministic train/val/test split: bucket = portable md5 hash
    // of the doc id (salted so the split is independent of any other
    // hash-derived signal), 80/10/10. Pure per-row projection — the only
    // shuffle is the final count. Reproducible across engines AND runs,
    // the property a training pipeline needs from its split.
    QueryDef("split_assign", (s, d) => {
      Tables.load(s, d, "documents")
        .select(col("lang"), splitCol.as("split"))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("split", "lang")
    }, Some(
      s"""WITH b AS (SELECT lang,
           ${Dedup.md5LongSql("'split:' || CAST(doc_id AS VARCHAR)")} % 100 AS bucket
           FROM documents)
         SELECT CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val'
           ELSE 'test' END AS split, lang, count(*) AS n_docs
         FROM b GROUP BY 1, 2 ORDER BY split, lang""")),

    // ---- Repetition quality signal (Gopher-style filter input): the
    // duplicated-token fraction 1 − |distinct tokens|/|tokens| per doc.
    // Per-row array expressions only — at 100 TB this is a map-only scan.
    QueryDef("rep_tokens", (s, d) => {
      Tables.load(s, d, "documents")
        .select(col("doc_id"), nToks.as("n_toks"),
          when(col("text").isNull || normText === "", 0L)
            .otherwise(size(array_distinct(toks)).cast("long")).as("n_uniq"))
        .filter(col("n_toks") > 0)
        .withColumn("dup_frac",
          round(lit(1.0) - col("n_uniq").cast("double") / col("n_toks"), 6))
        .orderBy("doc_id")
    }, Some(
      s"""WITH t AS (SELECT doc_id, $nToksSql AS n_toks,
           CASE WHEN text IS NULL OR $normTextSql = '' THEN 0
             ELSE CAST(len(list_distinct($normSql)) AS BIGINT) END AS n_uniq
           FROM documents)
         SELECT doc_id, n_toks, n_uniq,
           round(1.0 - CAST(n_uniq AS DOUBLE)/n_toks, 6) AS dup_frac
         FROM t WHERE n_toks > 0 ORDER BY doc_id"""))
  )
}
