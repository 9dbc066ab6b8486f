package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Child-process main for the STREAMING half of [[ExecutorLossSpec]]:
  * run the stateful runningTotals stream in a real local-cluster,
  * kill -9 an executor JVM at the first task of a mid-stream
  * micro-batch, keep feeding data, and assert the final per-user
  * totals equal the arithmetic expectation. The RocksDB state that
  * lived on the dead executor must be reloaded from the checkpoint by
  * the retried task — the recovery path a production stream exercises
  * on every preemption (StreamingRecoverySpec covers driver
  * kill/restart; this covers executor loss WITHOUT a driver restart).
  *
  * prints `KILLED pid=<n>` + `STREAMLOSS_OK users=<n>`; exit 3 if the
  * kill never landed. */
object StreamLossChild {
  def main(args: Array[String]): Unit = {
    val spark = ExecutorLossChild.clusterSession("stream-loss")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ckpt = java.nio.file.Files.createTempDirectory("streamloss").toString
    val in = MemoryStream[StreamOps.Ev2]
    val got = new java.util.concurrent.ConcurrentHashMap[Long, Array[StreamOps.Tot]]()
    val q = StreamOps.runningTotals(in.toDS()).writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch {
        (df: org.apache.spark.sql.Dataset[StreamOps.Tot], id: Long) =>
          got.put(id, df.collect()); ()
      }
      .start()

    def evs(base: Long): Seq[StreamOps.Ev2] =
      (1L to 10L).flatMap(u => Seq(
        StreamOps.Ev2(u, base + u), StreamOps.Ev2(u, 2 * base + u)))

    in.addData(evs(100): _*)
    q.processAllAvailable() // batch 1 committed clean

    // arm: first task of the NEXT micro-batch loses an executor
    val killed = new java.util.concurrent.atomic.AtomicLong(-1)
    val armed = new java.util.concurrent.atomic.AtomicBoolean(true)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskStart(
            t: org.apache.spark.scheduler.SparkListenerTaskStart): Unit =
          if (armed.compareAndSet(true, false))
            killed.set(ExecutorLossChild.killOneExecutor())
      })

    in.addData(evs(500): _*)
    q.processAllAvailable() // survives the executor loss
    in.addData(evs(900): _*)
    q.processAllAvailable() // and keeps processing afterwards
    q.stop()

    if (killed.get() < 0) {
      println("VACUOUS no executor process found to kill")
      spark.stop(); sys.exit(3)
    }

    // final state per user: 6 events, cents = Σ over the three batches
    import scala.jdk.CollectionConverters._
    val latest = got.values.asScala.flatten.toSeq
      .groupBy(_.user_id).map { case (u, ts) => u -> ts.maxBy(_.n_events) }
    val bad = (1L to 10L).filter { u =>
      val want = StreamOps.Tot(u, 6L,
        Seq(100L, 500L, 900L).map(b => (b + u) + (2 * b + u)).sum)
      !latest.get(u).contains(want)
    }
    if (bad.nonEmpty) {
      println(s"MISMATCH users=$bad latest=$latest")
      spark.stop(); sys.exit(4)
    }
    println(s"STREAMLOSS_OK users=${latest.size}")
    spark.stop()
  }
}
