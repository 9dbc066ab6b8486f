package graft

import org.apache.spark.sql.functions._

/** Tables.load's analyzed-reader memo (r17 session-floor sweep): the
  * resolved parquet reader is served per (session, dir, table,
  * fs-stamp) like a catalog table — measured ~75-95 ms of DataSource
  * resolution + footer schema inference per spark.read.parquet call,
  * paid by every gate invocation before this. The memo must be
  * invisible semantically: identical frames while the corpus is
  * unchanged, and a MISS (fresh reader over the new files) the moment
  * the corpus is rewritten — a stale reader would silently serve
  * deleted part-files. */
class LoadMemoSpec extends SparkSuite {

  import spark.implicits._

  test("load memoizes the analyzed reader, and a corpus rewrite invalidates") {
    val dir = java.nio.file.Files.createTempDirectory("load_memo").toString
    (1L to 100L).toDF("doc_id").withColumn("text", lit("alpha"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val a = Tables.load(spark, dir, "documents")
    val b = Tables.load(spark, dir, "documents")
    assert(a eq b, "same session + same fs-stamp must serve the memoized frame")
    assert(a.count() == 100L)

    (1L to 40L).toDF("doc_id").withColumn("text", lit("beta"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val c = Tables.load(spark, dir, "documents")
    assert(!(c eq a), "a rewritten corpus must miss the reader memo")
    assert(c.count() == 40L,
      "the fresh reader must see the new files, not the deleted ones")
  }

  test("the memo still normalizes ts and keys per table") {
    val dir = java.nio.file.Files.createTempDirectory("load_memo2").toString
    (1L to 7L).toDF("doc_id").withColumn("text", lit("x"))
      .write.parquet(s"$dir/documents.parquet")
    (1L to 3L).toDF("vec_id").withColumn("embedding", array(lit(1.0f)))
      .write.parquet(s"$dir/embeddings.parquet")
    assert(Tables.load(spark, dir, "documents").count() == 7L)
    assert(Tables.load(spark, dir, "embeddings").count() == 3L)
    // the real corpus: ts must come out as nanos-since-epoch BIGINT
    // through the memo exactly as before
    val ev = Tables.load(spark, sfDir, "events")
    assert(ev.schema("ts").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(Tables.load(spark, sfDir, "events") eq ev)
  }
}
