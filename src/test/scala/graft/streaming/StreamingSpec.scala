package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Drives the streaming transforms with MemoryStream: windows finalize
  * under an advancing watermark; sessionization splits on gaps and keeps
  * the open tail in state. */
class StreamingSpec extends SparkSuite {

  private val HourUs = 3600L * 1000000L

  test("watermarked tumbling windows finalize and match the batch aggregate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Long)] // (ts_us, event_type, cents)
    val events = in.toDF().toDF("ts_us", "event_type", "cents")
      .withColumn("ts_t", timestamp_micros(col("ts_us")))
    val q = StreamOps.windowedCounts(events).writeStream
      .format("memory").queryName("win_test").outputMode("append").start()
    try {
      // hours 0..2, deterministic counts: hour h gets h+1 events of 100 cents
      val batch1 = for (h <- 0 to 2; i <- 0 to h)
        yield (h * HourUs + i * 1000L, "click", 100L)
      in.addData(batch1: _*)
      q.processAllAvailable()
      // advance the watermark far past hour 2 so all three windows close
      in.addData((100 * HourUs, "click", 1L))
      q.processAllAvailable()
      val rows = spark.table("win_test")
        .select(col("win_start").cast("long").as("start_s"), col("n"), col("sum_cents"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      assert(rows.toSeq == (0 to 2).map(h =>
        (h * 3600L, (h + 1).toLong, (h + 1) * 100L)))
    } finally q.stop()
  }

  test("file-source readStream over events parquet matches the batch aggregate") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val src = Paths.get(graft.SparkTest.sfDir, "events.parquet")
    val dir = Paths.get("target/graft-tmp/stream_src")
    Files.createDirectories(dir)
    Files.copy(src, dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val schema = spark.read.parquet(dir.toString).schema
    // raw readStream bypasses Tables.load, so apply the same ts
    // canonicalization (the parquet has shipped both nanos-long and
    // NTZ-micros shapes across driver regenerations)
    def prep(df0: org.apache.spark.sql.DataFrame) =
      graft.Tables.normalizeTs(df0).select(
        col("event_type"),
        timestamp_micros(graft.Tables.tsUs).as("ts_t"),
        round(col("value") * 100, 0).cast("long").as("cents"))
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
    val q = StreamOps.windowedCounts(prep(stream)).writeStream
      .format("memory").queryName("file_win").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("file_win")
        .select(col("win_start").cast("long"), col("event_type"), col("n"), col("sum_cents"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2))
      val batch = prep(spark.read.parquet(dir.toString))
        .groupBy(window(col("ts_t"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
        .select(col("window.start").cast("long"), col("event_type"), col("n"), col("sum_cents"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2))
      assert(streamed.nonEmpty)
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("windowed query restarts from its checkpoint without losing or duplicating windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // kmrckpt parity: stop mid-stream, restart from the same checkpoint
    // dir with a NEW source, totals stay exactly-once.
    val base = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("target/graft-tmp/stream_ckpt")).toString + "/run_" + System.nanoTime
    val (ckpt, outDir) = (s"$base/ckpt", s"$base/out")
    val in1 = MemoryStream[(Long, String, Long)]
    def agg(in: MemoryStream[(Long, String, Long)]) =
      StreamOps.windowedCounts(in.toDF().toDF("ts_us", "event_type", "cents")
        .withColumn("ts_t", timestamp_micros(col("ts_us"))))
    // the parquet sink is the fault-tolerant one (memory sink can't recover)
    val q1 = agg(in1).writeStream.format("parquet")
      .outputMode("append").option("path", outDir)
      .option("checkpointLocation", ckpt).start()
    try {
      in1.addData((0L, "a", 1L), (10L, "a", 2L))           // window hour-0
      q1.processAllAvailable()
    } finally q1.stop()
    // restart: a new source, same checkpoint; advance the watermark so
    // hour-0 finalizes exactly once. MemoryStream offsets count addData
    // CALLS; the checkpoint committed offset 1, so the replacement
    // source's first call is treated as the replayed batch and only the
    // second is live.
    val in2 = MemoryStream[(Long, String, Long)]
    in2.addData((0L, "a", 999L)) // stand-in for the already-committed batch
    in2.addData((50 * HourUs, "a", 5L))
    val q2 = agg(in2).writeStream.format("parquet")
      .outputMode("append").option("path", outDir)
      .option("checkpointLocation", ckpt).start()
    try {
      q2.processAllAvailable()
      val rows = spark.read.parquet(outDir)
        .select(col("win_start").cast("long"), col("n"), col("sum_cents"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(rows.toSeq == Seq((0L, 2L, 3L)),
        s"hour-0 window not recovered exactly-once: ${rows.toSeq}")
    } finally q2.stop()
  }

  test("stream-stream interval join pairs purchases with preceding clicks") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long)]   // (user_id, ts_us)
    val purchases = MemoryStream[(Long, Long)]
    // generous watermarks: this test pins JOIN semantics; eviction timing
    // depends on micro-batch boundaries and is not under test
    val c = clicks.toDF().toDF("c_user", "c_ts_us")
      .withColumn("c_t", timestamp_micros(col("c_ts_us"))).withWatermark("c_t", "10 hours")
    val p = purchases.toDF().toDF("p_user", "p_ts_us")
      .withColumn("p_t", timestamp_micros(col("p_ts_us"))).withWatermark("p_t", "10 hours")
    // purchase within 1 hour AFTER the click — both sides watermarked so
    // state for expired intervals is eventually dropped
    val joined = StreamOps.intervalJoin(c, p,
      "c_user", "c_t", "p_user", "p_t", "1 hour")
    val q = joined.writeStream.format("memory").queryName("ssj_test")
      .outputMode("append").start()
    try {
      // base at a modern epoch: a row at EXACTLY epoch 0 sits on the
      // initial watermark and is dropped from join state (observed on
      // 4.1 — batch emits it, streaming doesn't)
      val b = 1700000000000000L
      clicks.addData((1L, b), (1L, b + 10L * 60L * 1000000L), (2L, b))
      purchases.addData((1L, b + 30L * 60L * 1000000L), (2L, b + 2L * HourUs))
      q.processAllAvailable()
      val rows = spark.table("ssj_test")
        .select("p_user", "p_ts_us", "c_ts_us").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      // user1 purchase@30min joins both clicks (0, 10min); user2's
      // purchase is 2h after its click — outside the interval
      assert(rows.toSeq == Seq(
        (1L, b + 30L * 60L * 1000000L, b),
        (1L, b + 30L * 60L * 1000000L, b + 10L * 60L * 1000000L)))
    } finally q.stop()
  }

  test("streaming dedup drops cross-batch duplicates within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)] // (ts_us, content_hash)
    val docs = in.toDF().toDF("ts_us", "content_hash")
      .withColumn("ts_t", timestamp_micros(col("ts_us")))
    val q = StreamOps.streamingDedup(docs).writeStream
      .format("memory").queryName("dedup_stream").outputMode("append").start()
    try {
      in.addData((0L, "h1"), (10L, "h2"), (20L, "h1")) // h1 duplicated in-batch
      q.processAllAvailable()
      in.addData((30L, "h2"), (40L, "h3")) // h2 duplicated across batches
      q.processAllAvailable()
      val hashes = spark.table("dedup_stream")
        .select("content_hash").collect().map(_.getString(0)).sorted
      assert(hashes.toSeq == Seq("h1", "h2", "h3"))
    } finally q.stop()
  }

  test("stream-static broadcast enrichment through a foreachBatch parquet sink") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the production sink idiom: foreachBatch hands each micro-batch to
    // ordinary batch writers (parquet here); the static dim side joins
    // broadcast, so the stream is never shuffled
    val dim = graft.Tables.load(spark, graft.SparkTest.sfDir, "nation")
      .select(col("n_nationkey").cast("long").as("nation_key"), col("n_name"))
    val outDir = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("target/graft-tmp/enrich_out")).toString + "/run_" + System.nanoTime
    val in = MemoryStream[(Long, Long)] // (nation_key, cents)
    val stream = in.toDF().toDF("nation_key", "cents")
    val q = StreamOps.enrich(stream, dim, "nation_key").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.mode("append").parquet(outDir)
      }
      .outputMode("append").start()
    try {
      in.addData((0L, 10L), (1L, 20L))
      q.processAllAvailable()
      in.addData((0L, 30L), (9999L, 40L)) // second batch; 9999 has no dim row
      q.processAllAvailable()
      val rows = spark.read.parquet(outDir)
        .select("nation_key", "cents", "n_name").collect()
        .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).sortBy(t => (t._1, t._2))
      val names = dim.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rows.toSeq == Seq(
        (0L, 10L, names.get(0L)), (0L, 30L, names.get(0L)),
        (1L, 20L, names.get(1L)), (9999L, 40L, None)),
        s"enriched output mismatch: ${rows.toSeq}")
    } finally q.stop()
  }

  test("sessionization splits on gap, emits closed sessions, holds the tail") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamOps.Ev]
    val q = StreamOps.sessionize(in.toDS(), gapUs = 1000L).writeStream
      .format("memory").queryName("sess_test").outputMode("append").start()
    try {
      // user 1: two bursts separated by a big gap → first burst closes;
      // user 2: one burst → stays open, nothing emitted
      in.addData(
        StreamOps.Ev(1L, 0L), StreamOps.Ev(1L, 500L), StreamOps.Ev(1L, 900L),
        StreamOps.Ev(1L, 10000L), StreamOps.Ev(1L, 10500L),
        StreamOps.Ev(2L, 0L))
      q.processAllAvailable()
      val rows = spark.table("sess_test").as[StreamOps.SessionOut].collect()
      assert(rows.toSeq == Seq(StreamOps.SessionOut(1L, 0L, 900L, 3L)))
      // a later event for user 2 past the gap closes its first session
      in.addData(StreamOps.Ev(2L, 50000L))
      q.processAllAvailable()
      val rows2 = spark.table("sess_test").as[StreamOps.SessionOut].collect().sortBy(_.user_id)
      assert(rows2.toSeq == Seq(
        StreamOps.SessionOut(1L, 0L, 900L, 3L),
        StreamOps.SessionOut(2L, 0L, 0L, 1L)))
    } finally q.stop()
  }

  test("built-in session_window merges bursts, closes on watermark, agrees with custom state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long)] // (user_id, ts_us)
    val events = in.toDF().toDF("user_id", "ts_us")
      .withColumn("ts_t", timestamp_micros(col("ts_us")))
    val q = StreamOps.sessionWindows(events, gap = "1 second", lateness = "0 seconds")
      .writeStream.format("memory").queryName("sw_test").outputMode("append").start()
    try {
      // same fixture as the flatMapGroupsWithState test: user 1 has two
      // bursts split by >1s, user 2 one burst
      in.addData((1L, 0L), (1L, 500000L), (1L, 900000L),
        (1L, 10000000L), (1L, 10500000L), (2L, 0L))
      q.processAllAvailable()
      // advance the watermark far past every session end to close all
      in.addData((9L, 3600L * 1000000L))
      q.processAllAvailable()
      val rows = spark.table("sw_test")
        .select(col("user_id"), col("sess_start").cast("long").as("s"),
          col("sess_end").cast("long").as("e"), col("n_events"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2)).toSeq
      // session end = last event + gap (the built-in's half-open span)
      assert(rows == Seq(
        (1L, 0L, 1L, 3L),       // 0..900ms burst -> ends 0.9+1 = 1.9s, floor-cast 1
        (1L, 10L, 11L, 2L),     // 10..10.5s burst -> ends 11.5s, floor-cast 11
        (2L, 0L, 1L, 1L)),
        s"unexpected sessions: $rows")
      // cross-check the SPLITS (not the gap-padded ends) against the
      // custom-state sessionize on the same data: same session count and
      // same per-session event counts per user
      // user 9 (the watermark driver) stays OPEN — the watermark reaches
      // its session start, never past its end — so it must not appear
      val custom = Seq((1L, 0L), (1L, 500000L), (1L, 900000L),
        (1L, 10000000L), (1L, 10500000L), (2L, 0L))
      val expected = custom.groupBy(_._1).toSeq.flatMap { case (u, es) =>
        val ts = es.map(_._2).sorted
        ts.foldLeft(List.empty[List[Long]]) {
          case (acc, t) if acc.nonEmpty && t - acc.head.head <= 1000000L =>
            (t :: acc.head) :: acc.tail
          case (acc, t) => List(t) :: acc
        }.map(sess => (u, sess.size.toLong))
      }.sorted
      val got = spark.table("sw_test")
        .select(col("user_id"), col("n_events"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == expected, s"$got != $expected")
    } finally q.stop()
  }

  test("streaming top-k: windowed Misra-Gries finalizes with the exact heavy hitter") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)] // (ts_us, tok)
    val toks = in.toDF().toDF("ts_us", "tok")
      .withColumn("ts_t", timestamp_micros(col("ts_us")))
    val q = StreamOps.streamingTopK(toks, k = 4).writeStream
      .format("memory").queryName("topk_test").outputMode("append").start()
    try {
      // hour 0: 'hot' dominates over unique noise, split across two
      // micro-batches so sketch partials merge across batches... except
      // append-mode windows buffer until the watermark closes them, so
      // both batches land in the same window's state
      val batch1 = (0 until 30).map(i => (i * 1000L, if (i % 2 == 0) "hot" else s"n$i"))
      in.addData(batch1: _*)
      q.processAllAvailable()
      val batch2 = (30 until 60).map(i => (i * 1000L, if (i % 2 == 0) "hot" else s"n$i"))
      in.addData(batch2: _*)
      q.processAllAvailable()
      in.addData((100L * HourUs, "closer")) // advance watermark past hour 0
      q.processAllAvailable()
      val rows = spark.table("topk_test")
        .select("rk", "item", "min_count")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      assert(rows.nonEmpty, "window never closed")
      val head = rows.minBy(_._1)
      assert(head._2 == "hot", s"expected 'hot' first, got $head")
      // 30 true occurrences; MG lower bound within N/(k+1) = 60/5
      assert(head._3 <= 30L && head._3 >= 30L - 12L, s"count bound violated: $head")
    } finally q.stop()
  }

  test("transformWithState running totals accumulate across micro-batches (RocksDB state)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // transformWithState requires the RocksDB state store provider;
    // scope the conf to this query and restore the default after
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[StreamOps.Ev2]
    val q = StreamOps.runningTotals(in.toDS()).writeStream
      .format("memory").queryName("tot_test").outputMode("update").start()
    try {
      in.addData(StreamOps.Ev2(1L, 100L), StreamOps.Ev2(1L, 50L), StreamOps.Ev2(2L, 10L))
      q.processAllAvailable()
      // second batch must see batch-1 state from the store, not restart at 0
      in.addData(StreamOps.Ev2(1L, 25L), StreamOps.Ev2(3L, 7L))
      q.processAllAvailable()
      val latest = spark.table("tot_test").as[StreamOps.Tot].collect()
        .groupBy(_.user_id).map { case (u, ts) => u -> ts.maxBy(_.n_events) }
      assert(latest(1L) == StreamOps.Tot(1L, 3L, 175L), s"user 1: ${latest(1L)}")
      assert(latest(2L) == StreamOps.Tot(2L, 1L, 10L))
      assert(latest(3L) == StreamOps.Tot(3L, 1L, 7L))
    } finally {
      q.stop()
      prev match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }
}
