package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** cellProbe: streaming points classified against a TRAINED FlexDice —
  * the streaming sibling of the flexdice_outliers gate. The replay
  * below recomputes each probe point's terminal cell INDEPENDENTLY on
  * the driver (plain double midpoint bisection — no Spark
  * expressions), so a drift in the engine-side path projection or the
  * prefix-disjoint join would fail here even though the operator and
  * the batch gates share those expressions. Also asserts the probe
  * carries NO streaming state (pure stream-static append). */
class StreamingCellProbeSpec extends SparkSuite {

  /** Driver twin of FlexDice.pathsFor at one level step. */
  private def cellOf(terminal: Map[(Long, Long, Long), (String, Long)],
      bounds: (Double, Double, Double, Double), x: Double, y: Double)
      : Option[((Long, Long, Long), (String, Long))] = {
    var (lox, hix, loy, hiy) = bounds
    var cx = 0L; var cy = 0L
    for (l <- 0 until 7) {
      terminal.get((l.toLong, cx, cy)) match {
        case Some(v) => return Some(((l.toLong, cx, cy), v))
        case None =>
      }
      val cenx = lox + (hix - lox) / 2; val ceny = loy + (hiy - loy) / 2
      val bx = if (x > cenx) 1L else 0L; val by = if (y > ceny) 1L else 0L
      cx = cx * 2 + bx; cy = cy * 2 + by
      if (bx == 1) lox = cenx else hix = cenx
      if (by == 1) loy = ceny else hiy = ceny
    }
    None // fell off a chain the training corpus never populated
  }

  test("streamed points get exactly the batch dice's verdicts, stateless") {
    import spark.implicits._
    val (term, bounds) = graft.algos.FlexDice.trainedDice(spark, sfDir)
    val termMap = term.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        (r.getString(3), r.getLong(4))).toMap
    // probe points: the corpus's own first three (x, y) pairs land in
    // trained cells; one synthetic far-corner point exercises the
    // novel-region (no-verdict) path if its chain is unpopulated
    val corpusPts = graft.Tables.load(spark, sfDir, "events")
      .filter(col("value").isNotNull && col("user_id").isNotNull)
      .orderBy("event_id").limit(3)
      .select(col("value"), col("user_id").cast("double"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val probes = corpusPts.zipWithIndex.map { case ((x, y), i) =>
      (7000000L + i, x, y)
    }.toSeq :+ ((7000099L, bounds._2, bounds._4)) // max corner
    val expected = probes.flatMap { case (id, x, y) =>
      cellOf(termMap, bounds, x, y).map { case ((l, cx, cy), (den, n)) =>
        (id, l, cx, cy, den, n)
      }
    }.toSet
    assert(expected.nonEmpty, "fixture dead: no probe hit a trained cell")

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Double, Double)]
    val got = scala.collection.mutable.Set[(Long, Long, Long, Long, String, Long)]()
    val q = StreamOps.cellProbe(in.toDF().toDF("id", "x", "y"), term,
        bounds._1, bounds._2, bounds._3, bounds._4)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= batch.collect().map(r => (r.getLong(0), r.getLong(1),
            r.getLong(2), r.getLong(3), r.getString(4), r.getLong(5)))
        }
        ()
      }
      .start()
    try {
      in.addData(probes.take(2)); q.processAllAvailable()
      in.addData(probes.drop(2)); q.processAllAvailable()
      val progress = q.lastProgress
      assert(progress == null || progress.stateOperators.isEmpty,
        s"cellProbe must carry no streaming state: ${progress.stateOperators}")
    } finally q.stop()
    assert(got.toSet == expected,
      s"probe diverged: extra=${(got.toSet -- expected).take(3)} " +
        s"missing=${(expected -- got.toSet).take(3)}")
    // at most one verdict per point (terminal cells are prefix-disjoint)
    assert(got.groupBy(_._1).values.forall(_.size == 1))
  }
}
