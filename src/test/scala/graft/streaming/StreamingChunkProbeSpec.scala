package graft.streaming

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** chunkProbe: streaming documents probe the PERSISTED paragraph-chunk
  * index for chunks the corpus already holds — the streaming sibling
  * of the dedup_paragraph_delta gate. The replay below recomputes
  * chunking + hashing INDEPENDENTLY on the driver (Java MessageDigest,
  * plain string ops — no Spark expressions), so a silent drift in the
  * engine-side normalization/chunking/hash would fail here even though
  * the operator and the batch gate share those expressions. */
class StreamingChunkProbeSpec extends SparkSuite {

  /** Driver twin of Dedup.md5Long: first 15 md5 hex chars as a long. */
  private def md5p64(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  /** Driver twin of Dedup.paragraphChunks: normalize (lowercase,
    * collapse whitespace, trim), whitespace-split, 20-word chunks. */
  private def chunksOf(text: String): Seq[(Int, Long)] = {
    val w = text.toLowerCase.replaceAll("\\s+", " ").trim.split(" ", -1).toSeq
    w.grouped(20).zipWithIndex
      .map { case (c, i) => (i, md5p64(c.mkString(" "))) }.toSeq
  }

  test("streamed docs emit exactly their chunks with corpus-membership " +
      "flags, across micro-batches, with no streaming state") {
    import spark.implicits._
    val idx = graft.llm.Dedup.chunkIndex(spark, sfDir)
    val corpusH = idx.select("h").distinct().as[Long].collect().toSet

    // arriving docs: one exact copy of a corpus doc (every chunk dup),
    // one novel doc (no dups), one half-copy (first 20 words copied,
    // then 20 novel words) — under fresh ids
    val sample = Tables.load(spark, sfDir, "documents")
      .orderBy("doc_id").limit(2)
      .select("text").as[String].collect()
    assert(sample.length == 2)
    val copied = sample(0)
    val halfSrc = sample(1).toLowerCase.replaceAll("\\s+", " ").trim
      .split(" ").take(20).mkString(" ")
    val novel = (1 to 25).map(i => s"zxq${i}novel").mkString(" ")
    val half = halfSrc + " " + (1 to 20).map(i => s"qkz${i}fresh").mkString(" ")
    val arriving = Seq(9000001L -> copied, 9000002L -> novel, 9000003L -> half)

    val expected = arriving.flatMap { case (id, text) =>
      chunksOf(text).map { case (i, h) =>
        (id, i, h, if (corpusH(h)) 1L else 0L) }
    }.toSet
    // fixture sanity: the copy must be all-dup, the novel doc all-new
    assert(expected.collect { case (9000001L, _, _, f) => f }.forall(_ == 1L),
      "exact copy's chunks must all be in the corpus index")
    assert(expected.collect { case (9000002L, _, _, f) => f }.forall(_ == 0L))

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Set[(Long, Int, Long, Long)]()
    val q = StreamOps.chunkProbe(in.toDF().toDF("doc_id", "text"), idx)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= batch.collect().map(r =>
            (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        }
        ()
      }
      .start()
    try {
      in.addData(arriving.take(1)); q.processAllAvailable()
      in.addData(arriving.drop(1)); q.processAllAvailable()
      val progress = q.lastProgress
      assert(progress == null || progress.stateOperators.isEmpty,
        s"chunkProbe must carry no streaming state: ${progress.stateOperators}")
    } finally q.stop()
    assert(got.toSet == expected,
      s"stream probe diverged: extra=${(got.toSet -- expected).take(3)} " +
        s"missing=${(expected -- got.toSet).take(3)}")

    // sink roll-up follows the dedup_paragraph_delta majority rule
    val keep = StreamOps.chunkKeepDecisions(
        got.toSeq.toDF("delta_id", "idx", "h", "in_corpus"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(keep(9000001L) == 0L, "an exact copy must be dropped")
    assert(keep(9000002L) == 1L, "a novel doc must be kept")
    assert(keep(9000003L) == 1L, "a half-dup (n_dup*2 <= n_chunks) is kept")
  }

  test("chunkProbeFor roll-up equals the dedup_paragraph_delta gate, " +
      "with no aggregate in the probe plan (r16 production wiring)") {
    val deltaDocs = Tables.load(spark, sfDir, "documents")
      .filter(col("source") =!= "src0").select("doc_id", "text")
    val probe = StreamOps.chunkProbeFor(deltaDocs, spark, sfDir)
    // the persisted base set is distinct by construction — the probe
    // plan must carry no Aggregate at all (streaming-safe by shape)
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    val aggs = probe.queryExecution.optimizedPlan.collect { case a: Aggregate => a }
    assert(aggs.isEmpty, s"chunkProbeFor plan must be aggregate-free:\n$aggs")
    val rolled = StreamOps.chunkKeepDecisions(probe)
      .withColumnRenamed("delta_id", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val gate = graft.SparkEntry.queries("dedup_paragraph_delta")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(rolled == gate,
      s"probe roll-up diverged from the batch gate: " +
        s"extra=${(rolled -- gate).take(3)} missing=${(gate -- rolled).take(3)}")
  }
}
