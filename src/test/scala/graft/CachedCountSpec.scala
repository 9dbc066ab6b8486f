package graft

import org.apache.spark.sql.functions._

/** Tables.cachedCount (ADVICE r13: memoize the corpus count behind the
  * adaptive-parameter choices) must MISS its cache when the corpus
  * changes on disk: the SRP bit width and the SimHash banding mode are
  * derived from n, and the DuckDB oracle re-derives them from its own
  * count(*) — a stale cached count would silently desync the engine's
  * banding from the oracle's and surface as an unexplainable hash
  * mismatch. The stamp is filesystem metadata (content length +
  * mtimes), so a rewrite that changes size must invalidate; same-size
  * rewrites are covered by the mtime component (not pinned here — a
  * same-second, same-size in-place rewrite is indistinguishable by
  * metadata, which is the documented cache contract). */
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
