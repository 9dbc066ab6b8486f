package graft.streaming

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** lshProbe: streaming vectors compute their own SRP band keys (planes
  * as a literal), probe the PERSISTED band index stream-static, and
  * re-rank by exact cosine — the streaming sibling of the
  * dedup_embedding_lsh_delta gate. Pinned three ways: streamed rows ==
  * the batch invocation of the same operator (exact twin), zero
  * streaming state, and the sink-side per-delta roll-up == the batch
  * gate's aggregates. */
class StreamingLshProbeSpec extends SparkSuite {

  private def deltaVecsDf = Tables.load(spark, sfDir, "embeddings")
    .filter(col("vec_id") % 8 === 7)
    .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS e")

  test("streamed SRP probe equals its batch twin across micro-batches, " +
      "with no streaming state") {
    import spark.implicits._
    val want = StreamOps.lshProbeFor(deltaVecsDf, spark, sfDir, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(want.nonEmpty, "batch twin empty — dead fixture")

    val probeVecs = deltaVecsDf.as[(Long, Seq[Double])].collect()
    val (b1, b2) = probeVecs.splitAt(probeVecs.length / 2)
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Seq[Double])]
    val got = scala.collection.mutable.Set[(Long, Long, Long, Long)]()
    val q = StreamOps.lshProbeFor(in.toDF().toDF("vec_id", "e"), spark, sfDir, 0.4)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= batch.collect().map(r =>
            (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        }
        ()
      }
      .start()
    try {
      in.addData(b1.toIndexedSeq); q.processAllAvailable()
      in.addData(b2.toIndexedSeq); q.processAllAvailable()
      val progress = q.lastProgress
      assert(progress == null || progress.stateOperators.isEmpty,
        s"lshProbe must carry no streaming state: ${progress.stateOperators}")
    } finally q.stop()
    assert(got.toSet == want,
      s"stream probe diverged: extra=${(got.toSet -- want).take(3)} " +
        s"missing=${(want -- got.toSet).take(3)}")
  }

  test("sink-side roll-up of the probe equals the dedup_embedding_lsh_delta gate") {
    // the documented sink contract: DISTINCT pairs (a band collision
    // emits once per band with identical values), then the gate's
    // per-delta aggregate
    val pairs = StreamOps.lshProbeFor(deltaVecsDf, spark, sfDir, 0.4)
      .select("delta_id", "base_id", "cos_micro").distinct()
    val rolled = pairs.groupBy("delta_id")
      .agg(count(lit(1)).as("n_near"), max("cos_micro").as("max_cos_micro"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val gate = graft.SparkEntry.queries("dedup_embedding_lsh_delta")(spark, sfDir)
      .select("delta_id", "n_near", "max_cos_micro")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rolled == gate,
      s"probe roll-up diverged from the batch gate: extra=${(rolled -- gate).take(3)} " +
        s"missing=${(gate -- rolled).take(3)}")
  }
}
