package graft.streaming

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** vectorProbe: streaming vectors probe the PERSISTED IVF index for
  * near-dups against the existing corpus — the streaming sibling of
  * the semdedup_delta gate. The spec replays assignment + cosine on
  * the driver and asserts the emitted pair set is exactly right. */
class StreamingVectorProbeSpec extends SparkSuite {

  private val Eps = 0.4

  private def nrm(e: Array[Double]): Double =
    math.sqrt(e.foldLeft(0.0)((a, x) => a + x * x))

  private def cos(a: (Array[Double], Double), b: (Array[Double], Double)): Option[Double] = {
    val den = a._2 * b._2
    if (den == 0) None
    else Some(a._1.zip(b._1).map { case (x, y) => x * y }.sum / den)
  }

  test("streamed vectors emit exactly the near-dups of their assigned cell, " +
      "across micro-batches, with no streaming state") {
    import spark.implicits._
    val (assigned, centsDf) = graft.llm.AnnOps.ivfIndex(spark, sfDir)
    val cents = centsDf.collect().map(r => StreamOps.CentLit(
      r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))

    // "arriving" vectors: reuse real embeddings under shifted ids so
    // they are new to the corpus but have genuine near-dup structure
    val probeVecs = Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") % 37 === 0)
      .selectExpr("vec_id + 1000000 AS vec_id",
        "transform(embedding, x -> CAST(x AS DOUBLE)) AS e")
      .as[(Long, Seq[Double])].collect()
    assert(probeVecs.nonEmpty)

    // driver replay: assign each probe to argmax-cos (ties: lowest cid)
    // centroid, expect every corpus vector in that cell with cos >= Eps
    val centArr = cents.map(c => (c.cid, (c.ce.toArray, c.cnrm)))
    val corpus = assigned.select("cid", "vec_id", "e", "nrm").collect()
      .map(r => (r.getLong(0), r.getLong(1), (r.getSeq[Double](2).toArray, r.getDouble(3))))
    val expected = probeVecs.flatMap { case (id, eSeq) =>
      val v = (eSeq.toArray, nrm(eSeq.toArray))
      val best = centArr.map { case (cid, c) =>
        (cos(c, v).getOrElse(-2.0), cid) }
        .minBy { case (cs, cid) => (-cs, cid) }._2
      corpus.filter(_._1 == best).flatMap { case (_, cid2, b) =>
        cos(v, b).filter(_ >= Eps).map(c => (id, cid2,
          BigDecimal(c * 1000000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
      }
    }.toSet
    assert(expected.nonEmpty, "fixture yields no near-dups — widen the probe shard")

    val (b1, b2) = probeVecs.splitAt(probeVecs.length / 2)
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Seq[Double])]
    val got = scala.collection.mutable.Set[(Long, Long, Long)]()
    val q = StreamOps.vectorProbe(
        in.toDF().toDF("vec_id", "e"), assigned, cents.toIndexedSeq, Eps)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= batch.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        }
        ()
      }
      .start()
    try {
      in.addData(b1.toIndexedSeq); q.processAllAvailable()
      in.addData(b2.toIndexedSeq); q.processAllAvailable()
      // no state store: the probe is a stateless stream-static join
      val progress = q.lastProgress
      assert(progress == null || progress.stateOperators.isEmpty,
        s"vectorProbe must carry no streaming state: ${progress.stateOperators}")
    } finally q.stop()
    assert(got.toSet == expected,
      s"stream probe diverged: extra=${(got.toSet -- expected).take(3)} " +
      s"missing=${(expected -- got.toSet).take(3)}")
  }
}
