package graft

import org.apache.spark.sql.functions._

/** Tables.cachedCount (ADVICE r13: memoize the corpus count behind the
  * adaptive-parameter choices) must MISS its cache when the corpus
  * changes on disk: the SRP bit width and the SimHash banding mode are
  * derived from n, and the DuckDB oracle re-derives them from its own
  * count(*) — a stale cached count would silently desync the engine's
  * banding from the oracle's and surface as an unexplainable hash
  * mismatch. The stamp is filesystem metadata (content length + mtimes
  * + a per-file name:length manifest — Spark/Arrow writers mint fresh
  * part-file UUIDs, so even a same-size same-second rewrite re-stamps);
  * the residual contract gap is a same-second single-file in-place
  * rewrite of identical length and name. */
class CachedCountSpec extends SparkSuite {

  import spark.implicits._

  test("cachedCount memoizes, and a corpus rewrite invalidates") {
    val dir = java.nio.file.Files.createTempDirectory("cached_count").toString
    (1L to 100L).toDF("vec_id").withColumn("embedding", array(lit(1.0f)))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    assert(Tables.cachedCount(spark, dir, "embeddings") == 100L)
    // repeat hit — same stamp, same value
    assert(Tables.cachedCount(spark, dir, "embeddings") == 100L)

    (1L to 250L).toDF("vec_id").withColumn("embedding", array(lit(1.0f)))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    assert(Tables.cachedCount(spark, dir, "embeddings") == 250L,
      "a rewritten corpus must miss the count cache (stale n would " +
        "desync the adaptive LSH bit width from the oracle)")
  }

  test("a rewrite evicts only the superseded stamp, not other tables' entries") {
    // ADVICE r14: the old >64 guard cleared the WHOLE map; the fix
    // evicts exactly the same-table stale stamp on re-stamp. Observable
    // contract: sibling tables' cached values survive a neighbor's
    // rewrite (and the rewritten table re-counts correctly).
    val dir = java.nio.file.Files.createTempDirectory("cc_evict").toString
    (1L to 11L).toDF("doc_id").withColumn("text", lit("x"))
      .write.parquet(s"$dir/documents.parquet")
    (1L to 5L).toDF("vec_id").withColumn("embedding", array(lit(1.0f)))
      .write.parquet(s"$dir/embeddings.parquet")
    assert(Tables.cachedCount(spark, dir, "documents") == 11L)
    assert(Tables.cachedCount(spark, dir, "embeddings") == 5L)
    (1L to 13L).toDF("doc_id").withColumn("text", lit("x"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(Tables.cachedCount(spark, dir, "documents") == 13L)
    assert(Tables.cachedCount(spark, dir, "embeddings") == 5L)
  }

  test("two dirs never share a count entry") {
    val d1 = java.nio.file.Files.createTempDirectory("cc_a").toString
    val d2 = java.nio.file.Files.createTempDirectory("cc_b").toString
    (1L to 7L).toDF("doc_id").withColumn("text", lit("x"))
      .write.parquet(s"$d1/documents.parquet")
    (1L to 9L).toDF("doc_id").withColumn("text", lit("x"))
      .write.parquet(s"$d2/documents.parquet")
    assert(Tables.cachedCount(spark, d1, "documents") == 7L)
    assert(Tables.cachedCount(spark, d2, "documents") == 9L)
  }
}
