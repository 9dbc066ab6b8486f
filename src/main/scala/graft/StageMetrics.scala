package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import scala.collection.concurrent.TrieMap

/** Operator-level trace parity with the reference's kmrtrace
  * (src/kmrtrace.c; ex/tpch.c:626-736,1744-1810 prints per-phase map/
  * shuffle/reduce timings and byte counts): a SparkListener that
  * attributes every completed stage's shuffle/input/spill bytes and
  * task counts to the QUERY that ran it, via the job-group id Bench
  * sets around each query's metrics run. bench_detail.json then
  * carries the per-query cost breakdown — a regression in a specific
  * query's shuffle volume is attributable from the committed artifact
  * alone, without re-running (the round-10 suspect flags took a full
  * re-bench to adjudicate; shuffle-byte deltas would have named the
  * culprit — or exonerated the window — immediately).
  *
  * Attribution: onJobStart maps the job's stage ids to its job group;
  * onStageCompleted folds that stage's metrics into the group's
  * aggregate. Stages skipped via exchange reuse never complete, so
  * they are (correctly) not re-counted. The maps are concurrent —
  * listener events arrive on the listener-bus thread while queries
  * run on the main/pool threads. */
class StageMetricsListener extends SparkListener {

  final class Agg {
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var shuffleReadB = 0L
    @volatile var shuffleWriteB = 0L
    @volatile var inputB = 0L
    @volatile var spillB = 0L
  }

  private val stageToGroup = TrieMap.empty[Int, String]
  val byGroup = TrieMap.empty[String, Agg]

  override def onJobStart(e: SparkListenerJobStart): Unit = {
    val g = Option(e.properties)
      .flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
    g.foreach { gr =>
      e.stageIds.foreach(sid => stageToGroup.put(sid, gr))
    }
  }

  override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
    val si = e.stageInfo
    stageToGroup.remove(si.stageId).foreach { g =>
      val a = byGroup.getOrElseUpdate(g, new Agg)
      // single-writer per event type on the bus thread: plain updates
      val m = si.taskMetrics
      a.synchronized {
        a.stages += 1
        a.tasks += si.numTasks
        a.shuffleReadB += m.shuffleReadMetrics.totalBytesRead
        a.shuffleWriteB += m.shuffleWriteMetrics.bytesWritten
        a.inputB += m.inputMetrics.bytesRead
        a.spillB += m.memoryBytesSpilled + m.diskBytesSpilled
      }
    }
  }
}
