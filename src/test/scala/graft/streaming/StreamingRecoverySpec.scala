package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Failure recovery for the stateful streaming operators (round-9
  * verdict item 6 — the streaming sibling of CheckpointSpec's
  * kill-point invariance): kill a running query between micro-batches,
  * add MORE data while it is down, restart from the SAME checkpoint,
  * and assert the final output equals the uninterrupted run's — which
  * requires the RocksDB state (running totals / band ownership) to
  * survive the restart, not restart at zero. The sink is foreachBatch
  * keyed by batchId (idempotent replace), i.e. the exactly-once sink
  * contract a production deploy uses. */
class StreamingRecoverySpec extends SparkSuite {

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"

  private def withRocksDb[A](body: => A): A = {
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("running totals survive kill+restart: state resumes, output is " +
      "exactly-once equal to the uninterrupted run") { withRocksDb {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("recov_tot").toString
    val in = MemoryStream[StreamOps.Ev2]
    // idempotent sink: a replayed batchId overwrites its own slot, so
    // the union over slots is the exactly-once output
    val got = new java.util.concurrent.ConcurrentHashMap[Long, Array[StreamOps.Tot]]()
    def start() = StreamOps.runningTotals(in.toDS()).writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamOps.Tot], id: Long) =>
        got.put(id, df.collect()); ()
      }
      .start()

    val q1 = start()
    in.addData(StreamOps.Ev2(1L, 100L), StreamOps.Ev2(1L, 50L), StreamOps.Ev2(2L, 10L))
    q1.processAllAvailable()
    q1.stop() // the kill, after batch 1 committed

    // data arrives while the query is DOWN
    in.addData(StreamOps.Ev2(1L, 25L), StreamOps.Ev2(3L, 7L))

    val q2 = start()
    try {
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val all = got.values.asScala.flatten.toSeq
      // user 1's post-restart emission MUST continue from the restored
      // state (3 events, 175 cents) — a state loss would emit (1, 25)
      val latest = all.groupBy(_.user_id).map { case (u, ts) => u -> ts.maxBy(_.n_events) }
      assert(latest(1L) == StreamOps.Tot(1L, 3L, 175L),
        s"state did not survive the restart: ${latest(1L)}")
      assert(latest(2L) == StreamOps.Tot(2L, 1L, 10L))
      assert(latest(3L) == StreamOps.Tot(3L, 1L, 7L))
      // exactly-once: each user_id's event count appears monotonically,
      // no batch slot contains a duplicate emission for the same user
      got.values.asScala.foreach { batch =>
        val ids = batch.map(_.user_id)
        assert(ids.distinct.length == ids.length, "duplicate emission within a batch")
      }
    } finally q2.stop()
  } }

  test("minhash band-owner state survives kill+restart: post-restart " +
      "near-dups attribute to pre-kill owners") { withRocksDb {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val textA = "the quick brown fox jumps over the lazy dog again and again today"
    val textB = "completely different content about distributed query engines at scale"
    val ckpt = java.nio.file.Files.createTempDirectory("recov_mh").toString
    val docs = MemoryStream[(Long, String)]
    val got = new java.util.concurrent.ConcurrentHashMap[Long, Array[StreamOps.BandVerdict]]()
    def start() = StreamOps.streamingMinhashDedup(docs.toDF().toDF("doc_id", "text"))
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch {
        (ds: org.apache.spark.sql.Dataset[StreamOps.BandVerdict], id: Long) =>
          got.put(id, ds.collect()); ()
      }
      .start()

    val q1 = start()
    docs.addData((10L, textA), (20L, textB))
    q1.processAllAvailable()
    q1.stop() // kill after the owners are established

    docs.addData((30L, textA), (50L, textB)) // near-dups arrive while down

    val q2 = start()
    try {
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val verdicts = got.values.asScala.flatten.toSeq
      // per-doc keep decision (minhashKeepDecisions' semantics in plain
      // scala over the exactly-once union): dup_of = smallest foreign owner
      val decisions = verdicts.groupBy(_.doc_id).map { case (id, vs) =>
        val dupOf = vs.collect { case v if v.owner != id => v.owner } match {
          case ow if ow.isEmpty => None
          case ow => Some(ow.min)
        }
        (id, dupOf)
      }.toSeq.sortBy(_._1)
      // identical to the uninterrupted run: the post-restart docs MUST
      // attribute to the PRE-kill owners — a band-owner state loss would
      // let 30/50 claim their own bands and keep
      assert(decisions == Seq(
        (10L, None), (20L, None), (30L, Some(10L)), (50L, Some(20L))),
        s"got $decisions")
    } finally q2.stop()
  } }
}
