package graft.sources

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** kmr_map_ms_commands parity (src/kmrmapms.c:2421-2486; exercised by
  * src/test4.c): execute EACH key-value's VALUE as its own shell command
  * line — the ensemble / task-farming workload that is the reference's
  * signature use on K/Fugaku — with master-worker load balancing and
  * bounded per-worker subprocess concurrency.
  *
  * Semantic mapping, piece by piece:
  *  - master-worker dispatch (kmr_map_ms, src/kmrmapms.c:333-613): the
  *    Spark scheduler IS the master — each task requests work as it
  *    frees up; `repartition` ahead of the farm sets the task
  *    granularity exactly like the reference's per-KV RPC, with locality
  *    and straggler re-launch for free.
  *  - system(3C)-vs-fork-exec switch (kmr_exec_command,
  *    src/kmrmapms.c:2394-2419): the reference runs a command through
  *    the shell unless it contains NUL separators, in which case it
  *    fork-execs the NUL-split argv directly. Reproduced verbatim:
  *    values with '\u0000' are exec'd, others go through `sh -c`.
  *  - bounded concurrency: the reference runs one command per MPI
  *    worker core; here a fixed pool of `maxConcurrent` subprocesses
  *    per partition overlaps exec latency inside each task without
  *    oversubscribing the host. Results are emitted in INPUT ORDER, so
  *    output is deterministic regardless of completion order.
  *  - the reference's map-function hook receives the original KV after
  *    the command completes and does not capture output; this port
  *    instead returns (key, stdout) — stderr is discarded, a nonzero
  *    exit yields whatever stdout was produced (the reference likewise
  *    continues past failing commands) — which is what makes the
  *    operator composable with the rest of the engine.
  *
  * Scale shape: only (key, command-line) strings shuffle; each task
  * holds at most `maxConcurrent` subprocess buffers. At 100 TB the farm
  * is CPU/exec-bound by design — the engine's job is purely dispatch.
  */
object CmdFarm {

  /** Run each value as a shell command, yielding (key, stdout) with
    * trailing newlines stripped. Input order is preserved per partition. */
  def mapCommands(kvs: Dataset[(String, String)], maxConcurrent: Int = 4)
      : Dataset[(String, String)] = {
    import kvs.sparkSession.implicits._
    val conc = math.max(1, maxConcurrent)
    kvs.mapPartitions { it =>
      import java.util.concurrent.{Callable, Executors, Future}
      val pool = Executors.newFixedThreadPool(conc)
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => pool.shutdownNow()))
      def submit(cmd: String): Future[String] = pool.submit(new Callable[String] {
        override def call(): String = {
          val argv: Seq[String] =
            if (cmd.indexOf('\u0000') >= 0)
              cmd.split('\u0000').toSeq.filter(_.nonEmpty) // fork-exec path
            else Seq("sh", "-c", cmd)                      // system(3C) path
          val pb = new ProcessBuilder(argv: _*)
          pb.redirectError(ProcessBuilder.Redirect.DISCARD)
          val p = pb.start()
          p.getOutputStream.close()
          val out = new String(p.getInputStream.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8)
          p.waitFor()
          out.reverse.dropWhile(c => c == '\n' || c == '\r').reverse
        }
      })
      // Sliding window of at most `conc` in-flight commands, drained in
      // input order — deterministic output, bounded memory.
      val inFlight = scala.collection.mutable.Queue.empty[(String, Future[String])]
      new Iterator[(String, String)] {
        private def fill(): Unit =
          while (inFlight.size < conc && it.hasNext) {
            val (k, v) = it.next()
            inFlight.enqueue((k, submit(v)))
          }
        override def hasNext: Boolean = { fill(); inFlight.nonEmpty }
        override def next(): (String, String) = {
          fill()
          val (k, f) = inFlight.dequeue()
          val r = (k, f.get())
          if (inFlight.isEmpty && !it.hasNext) pool.shutdown()
          r
        }
      }
    }
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- Task farm over deterministic shell commands: one printf per
    // selected document, each computing a value the oracle re-derives
    // in SQL — so the gate proves the commands genuinely EXECUTED and
    // their stdout round-tripped. repartition(8) spreads the ~25
    // commands across tasks (the master-worker grain); 4 subprocesses
    // overlap per task.
    QueryDef("cmd_farm", (s, d) => {
      import s.implicits._
      val kvs = Tables.load(s, d, "documents")
        .filter(pmod(col("doc_id"), lit(20L)) === 0)
        .select(col("doc_id").cast("string").as("k"),
          format_string("printf '%%s:%%s' %s %d", col("lang"),
            col("doc_id") * 3 + 7).as("v"))
        .as[(String, String)]
        .repartition(8)
      mapCommands(kvs, maxConcurrent = 4)
        .toDF("k", "out")
        .select(col("k").cast("long").as("doc_id"), col("out"))
        .orderBy("doc_id")
    }, Some(
      "SELECT doc_id, concat(lang, ':', CAST(doc_id * 3 + 7 AS VARCHAR)) AS out " +
      "FROM documents WHERE doc_id % 20 = 0 ORDER BY doc_id"))
  )
}
