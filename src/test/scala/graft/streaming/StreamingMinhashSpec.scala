package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Round-9 streaming depth: MinHash near-dup dedup as a streaming
  * operator (one stateful band-owner step over map-only per-row
  * signatures), plus a watermark-bounded stream-stream join driven by
  * the real events parquet. */
class StreamingMinhashSpec extends SparkSuite {

  test("per-row streaming band keys equal the batch signature pipeline") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val streamed = StreamOps.bandKeys(docs)
      .collect().map(r => (r.doc_id, r.bkey)).toSet
    val batch = graft.llm.Dedup.bandRows(graft.llm.Dedup.minhashSigs(spark, sfDir))
      .select("doc_id", "bkey")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming minhash dedup flags cross-batch and same-batch near-dups") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // transformWithState requires the RocksDB state store provider;
    // scope the conf to this query and restore the default after
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val textA = "the quick brown fox jumps over the lazy dog again and again today"
    val textB = "completely different content about distributed query engines at scale"
    val textC = "yet another unrelated document discussing parquet bucketing strategies"
    val docs = MemoryStream[(Long, String)]
    val q = StreamOps.streamingMinhashDedup(docs.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("mh_verdicts")
      .outputMode("update").start()
    try {
      docs.addData((10L, textA), (20L, textB))
      q.processAllAvailable()
      // batch 2: an exact near-dup of A (every band collides), a fresh
      // doc, a same-batch duplicate pair, and a <3-token doc (no
      // shingles — never enters the band state)
      docs.addData((30L, textA), (40L, textC), (50L, textB), (51L, textB), (60L, "too short"))
      q.processAllAvailable()
      val decisions = StreamOps.minhashKeepDecisions(spark.table("mh_verdicts"))
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getBoolean(2)))
        .sortBy(_._1).toSeq
      assert(decisions == Seq(
        (10L, None, true),       // first owner of A's bands
        (20L, None, true),       // first owner of B's bands
        (30L, Some(10L), false), // cross-batch near-dup of 10
        (40L, None, true),       // fresh content keeps
        (50L, Some(20L), false), // B re-arrives in batch 2 → dup of 20
        (51L, Some(20L), false)  // same-batch copy also attributes to 20
      ), s"got $decisions")
      // <3-token doc produces no band rows at all
      assert(spark.table("mh_verdicts").filter(col("doc_id") === 60L).count() == 0)
    } finally {
      q.stop()
      prev match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("watermark-bounded stream-stream join over the events parquet matches batch") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val src = Paths.get(graft.SparkTest.sfDir, "events.parquet")
    val dir = Paths.get("target/graft-tmp/ssj_events_src")
    Files.createDirectories(dir)
    Files.copy(src, dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val schema = spark.read.parquet(dir.toString).schema
    def prep(df0: org.apache.spark.sql.DataFrame, tpe: String, pre: String) =
      graft.Tables.normalizeTs(df0)
        .filter(col("event_type") === tpe)
        .select(col("user_id").as(s"${pre}_user"),
          col("event_id").as(s"${pre}_id"),
          timestamp_micros(graft.Tables.tsUs).as(s"${pre}_t"))
        // generous watermark: join semantics under test, not eviction
        .withWatermark(s"${pre}_t", "1000 days")
    def joinOf(c: org.apache.spark.sql.DataFrame, p: org.apache.spark.sql.DataFrame) =
      StreamOps.intervalJoin(c, p, "c_user", "c_t", "p_user", "p_t", "1 hour")
        .select("p_user", "p_id", "c_id")
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
    val q = joinOf(prep(stream, "click", "c"), prep(stream, "purchase", "p"))
      .writeStream.format("memory").queryName("ssj_events")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ssj_events").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      val b = spark.read.parquet(dir.toString)
      val batch = joinOf(prep(b, "click", "c"), prep(b, "purchase", "p"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      assert(streamed.nonEmpty, "no purchase-within-1h-of-click pairs at sf0.001")
      assert(streamed == batch)
    } finally q.stop()
  }

  test("stream-static probe against the persisted index matches the batch dedup_delta pairs") {
    import spark.implicits._
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val srcOf = docs.select("doc_id", "source")
    val idx = graft.llm.Dedup.minhashIndex(spark, sfDir)
    val corpusIdx = idx.join(srcOf.filter(col("source") === "src0"), "doc_id")

    // expected: the batch dedup_delta candidate pairs (pre-grouping)
    val deltaIdx = idx.join(srcOf.filter(col("source") =!= "src0"), "doc_id")
    val expected = corpusIdx.select(col("doc_id").as("corpus_id"),
        col("sig").as("csig"), col("bkey"))
      .join(deltaIdx.select(col("doc_id").as("delta_id"),
        col("sig").as("dsig"), col("bkey")), "bkey")
      .select(col("delta_id"), col("corpus_id"),
        expr("size(filter(zip_with(csig, dsig, (x, y) -> x = y), v -> v))")
          .cast("long").as("n_match"))
      .where(col("n_match") >= 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(expected.nonEmpty, "corpus should contain cross-source near-dups")

    // stream the delta documents in two micro-batches; dedupe multi-band
    // hits in the sink (foreachBatch), where batch semantics apply
    val delta = docs.filter(col("source") =!= "src0")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val (b1, b2) = delta.splitAt(delta.length / 2)
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Set[(Long, Long, Long)]()
    val q = StreamOps.indexProbe(
        in.toDF().toDF("doc_id", "text"), corpusIdx)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= batch.dropDuplicates("delta_id", "corpus_id")
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        }
        ()
      }
      .start()
    try {
      in.addData(b1.toIndexedSeq); q.processAllAvailable()
      in.addData(b2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    assert(got.toSet == expected,
      s"stream probe diverged: ${(got.toSet -- expected).take(3)} extra, " +
      s"${(expected -- got).take(3)} missing")
  }
}
