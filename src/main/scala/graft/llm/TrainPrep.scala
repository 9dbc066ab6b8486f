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
    * NULL or whitespace-only text counts 0 (split('') would count 1).
    * Shared with Curate so every token-budget operator agrees. */
  private[llm] val nToks =
    when(col("text").isNull || normText === "", 0L)
      .otherwise(size(toks).cast("long"))

  private[llm] val nToksSql =
    s"CASE WHEN text IS NULL OR $normTextSql = '' THEN 0 " +
    s"ELSE CAST(len($normSql) AS BIGINT) END"

  /** Tokens per training sequence for seq packing. */
  private val PackBudget = 1024L

  /** 80/10/10 thresholds of [[splitCol]], shared with the oracles.
    * (Defined BEFORE splitCol: a forward val reference inside an object
    * would silently read 0 during initialization.) */
  val TrainBelow = 80
  val ValBelow = 90

  /** DuckDB mirror of [[splitCol]]'s bucket (before thresholding). */
  val splitBucketSql: String =
    Dedup.md5LongSql("'split:' || CAST(doc_id AS VARCHAR)") + " % 100"

  /** THE production split expression over a `doc_id` column (exposed so
    * specs exercise this exact definition — salt, hash, and thresholds —
    * rather than a copy that could drift). [[splitBucketSql]] is its
    * DuckDB twin; both oracles that involve the split (split_assign,
    * contamination) must build on it so a salt/threshold change can
    * never land on one side only. */
  val splitCol: org.apache.spark.sql.Column = {
    val bucket = Dedup.md5Long(concat(lit("split:"), col("doc_id").cast("string"))) % 100L
    when(bucket < TrainBelow, "train").when(bucket < ValBelow, "val").otherwise("test")
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
      s"""WITH b AS (SELECT lang, $splitBucketSql AS bucket FROM documents)
         SELECT CASE WHEN bucket < $TrainBelow THEN 'train'
           WHEN bucket < $ValBelow THEN 'val'
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
         FROM t WHERE n_toks > 0 ORDER BY doc_id""")),

    // ---- Sliding-window chunking (RAG/context-window prep): window 32
    // tokens, stride 24 (8-token overlap), per-doc — the complement of
    // seq_pack, which concatenates ACROSS docs with no overlap. Chunk
    // starts come from a per-row sequence(), so this is generate+project
    // with no shuffle at all; the md5 of each chunk's text lets the gate
    // check full chunk content without shipping it.
    QueryDef("chunk_docs", (s, d) => {
      Tables.load(s, d, "documents")
        // the nToks convention: NULL/whitespace-only docs have 0 tokens
        // and get no chunks (split('') would smuggle in a [""] token)
        .filter(col("text").isNotNull && normText =!= "")
        .select(col("doc_id"), toks.as("w"))
        .select(col("doc_id"), col("w"), size(col("w")).cast("long").as("n_toks"),
          explode(expr("sequence(0L, cast(size(w)-1 AS LONG), 24L)")).as("start"))
        .select(col("doc_id"), (col("start") / 24).cast("long").as("chunk_idx"),
          col("start"),
          least(lit(32L), col("n_toks") - col("start")).as("chunk_len"),
          md5(array_join(slice(col("w"), (col("start") + 1).cast("int"), lit(32)), " "))
            .as("chunk_md5"))
        .orderBy("doc_id", "chunk_idx")
    }, Some(
      s"""WITH t AS (SELECT doc_id, $normSql AS w FROM documents
           WHERE text IS NOT NULL AND $normTextSql <> ''),
         c AS (SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n_toks,
           unnest(range(0, len(w), 24)) AS start FROM t)
         SELECT doc_id, start//24 AS chunk_idx, start,
           least(32, n_toks - start) AS chunk_len,
           md5(array_to_string(w[start+1 : start+32], ' ')) AS chunk_md5
         FROM c ORDER BY doc_id, chunk_idx""")),

    // ---- Source-mixing allocation: per-language token totals and the
    // integer parts-per-million sampling weight that equalizes every
    // language to the smallest one's budget (the "up/down-weight domains
    // toward a target mix" step of corpus assembly). Integer arithmetic
    // end-to-end so both engines agree exactly; the single-row global min
    // rides a broadcast cross join, not a window. (At extreme corpus
    // sizes min_tokens*1e6 nears the int64 ceiling around 9e12 tokens —
    // swap to DECIMAL weights there; ppm precision is the portable choice
    // at gate scale.)
    QueryDef("mix_weights", (s, d) => {
      // a language whose docs are all empty aggregates to 0 tokens;
      // exclude it up front or the ANSI div below throws DIVIDE_BY_ZERO
      val lt = Tables.load(s, d, "documents")
        .groupBy("lang").agg(sum(nToks).as("n_tokens"))
        .filter(col("n_tokens") > 0)
      lt.crossJoin(broadcast(lt.agg(min("n_tokens").as("min_tokens"))))
        .withColumn("weight_ppm", expr("(min_tokens * 1000000) div n_tokens"))
        .select(col("lang"), col("n_tokens"), col("weight_ppm"),
          expr("(n_tokens * weight_ppm) div 1000000").as("sampled_tokens"))
        .orderBy("lang")
    }, Some(
      s"""WITH lt AS (SELECT lang, CAST(sum($nToksSql) AS BIGINT) AS n_tokens
           FROM documents GROUP BY lang HAVING sum($nToksSql) > 0),
         m AS (SELECT min(n_tokens) AS min_tokens FROM lt)
         SELECT lang, n_tokens, (min_tokens * 1000000)//n_tokens AS weight_ppm,
           (n_tokens * ((min_tokens * 1000000)//n_tokens))//1000000 AS sampled_tokens
         FROM lt, m ORDER BY lang"""))
  )
}
