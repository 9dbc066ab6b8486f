package graft.streaming

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** fpProbe / gramProbe (r16): streaming documents fingerprint ONLY
  * their own text map-only and probe the PERSISTED base-split winnow /
  * shingle indexes with the persisted df stop-lists — the streaming
  * siblings of dedup_substring_delta / dedup_jaccard_delta, completing
  * the probe family's symmetry with the batch O(delta) family. Each is
  * pinned three ways: streamed rows == the batch invocation of the
  * same operator (exact twin), zero streaming state, and the sink-side
  * roll-up == the batch gate's output. */
class StreamingWinnowProbeSpec extends SparkSuite {

  private def deltaDocsDf = Tables.load(spark, sfDir, "documents")
    .filter(col("source") =!= "src0")
    .select("doc_id", "text")

  test("streamed winnow probe equals its batch twin across micro-batches, " +
      "with no streaming state") {
    import spark.implicits._
    val want = StreamOps.fpProbeFor(deltaDocsDf, spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(want.nonEmpty, "batch twin empty — dead fixture")

    val docs = deltaDocsDf.as[(Long, String)].collect()
    val (b1, b2) = docs.splitAt(docs.length / 2)
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Set[(Long, Long, Long)]()
    val q = StreamOps.fpProbeFor(in.toDF().toDF("doc_id", "text"), spark, sfDir)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= batch.collect().map(r =>
            (r.getLong(0), r.getLong(1), r.getLong(2)))
        }
        ()
      }
      .start()
    try {
      in.addData(b1.toIndexedSeq); q.processAllAvailable()
      in.addData(b2.toIndexedSeq); q.processAllAvailable()
      val progress = q.lastProgress
      assert(progress == null || progress.stateOperators.isEmpty,
        s"fpProbe must carry no streaming state: ${progress.stateOperators}")
    } finally q.stop()
    assert(got.toSet == want,
      s"stream probe diverged: extra=${(got.toSet -- want).take(3)} " +
        s"missing=${(want -- got.toSet).take(3)}")
  }

  test("sink-side roll-up of the winnow probe equals the " +
      "dedup_substring_delta gate") {
    val rolled = StreamOps.fpPairCounts(
        StreamOps.fpProbeFor(deltaDocsDf, spark, sfDir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val gate = graft.SparkEntry.queries("dedup_substring_delta")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rolled == gate,
      s"probe roll-up diverged from the batch gate: " +
        s"extra=${(rolled -- gate).take(3)} missing=${(gate -- rolled).take(3)}")
  }

  test("streamed shingle probe equals its batch twin across micro-batches, " +
      "with no streaming state") {
    import spark.implicits._
    val want = StreamOps.gramProbeFor(deltaDocsDf, spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(want.nonEmpty, "batch twin empty — dead fixture")

    val docs = deltaDocsDf.as[(Long, String)].collect()
    val (b1, b2) = docs.splitAt(docs.length / 2)
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Set[(Long, Long, Long, String)]()
    val q = StreamOps.gramProbeFor(in.toDF().toDF("doc_id", "text"), spark, sfDir)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= batch.collect().map(r =>
            (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        }
        ()
      }
      .start()
    try {
      in.addData(b1.toIndexedSeq); q.processAllAvailable()
      in.addData(b2.toIndexedSeq); q.processAllAvailable()
      val progress = q.lastProgress
      assert(progress == null || progress.stateOperators.isEmpty,
        s"gramProbe must carry no streaming state: ${progress.stateOperators}")
    } finally q.stop()
    assert(got.toSet == want,
      s"stream probe diverged: extra=${(got.toSet -- want).take(3)} " +
        s"missing=${(want -- got.toSet).take(3)}")
  }

  test("sink-side Jaccard roll-up of the shingle probe equals the " +
      "dedup_jaccard_delta gate") {
    val rolled = StreamOps.gramPairJaccard(
        StreamOps.gramProbeFor(deltaDocsDf, spark, sfDir),
        graft.llm.Dedup.shingleSizesBase(spark, sfDir), minJ = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val gate = graft.SparkEntry.queries("dedup_jaccard_delta")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rolled == gate,
      s"probe roll-up diverged from the batch gate: " +
        s"extra=${(rolled -- gate).take(3)} missing=${(gate -- rolled).take(3)}")
  }
}
