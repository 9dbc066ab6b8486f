package graft

import org.apache.spark.sql.SparkSession

/** Child-process main for [[ExecutorLossSpec]]: run a census query in
  * a REAL multi-JVM local-cluster, kill -9 one executor JVM the moment
  * the query's first task starts, and assert the recovered result is
  * row-identical to the clean run. This is the fault model a
  * 1000-executor deployment lives with (preemption, OOM-kills, node
  * loss): Spark must retry the dead executor's tasks, recompute its
  * lost shuffle blocks, and deliver the SAME answer — an axis neither
  * local[N] (no executor processes) nor the clean local-cluster census
  * run (round 10) exercises.
  *
  * args: queryName sfDir
  * prints `KILLED pid=<n>` when the chaos actually fired and
  * `EXLOSS_OK rows=<n>` on verified recovery; exits 3 if the kill
  * never landed (vacuous run must FAIL the spec). */
object ExecutorLossChild {

  private[graft] def addOpens: String =
    java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(_.toString)
      .filter(_.startsWith("--add-opens")).mkString(" ")

  /** Session against a freshly-forked 2-worker standalone cluster,
    * with the current (classes-dir) classpath shipped to the executor
    * JVMs — shared by the batch and streaming chaos children. */
  private[graft] def clusterSession(name: String): SparkSession = {
    val s = SparkSession.builder()
      .master("local-cluster[2,2,1536]")
      .appName(name)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.memory", "1g")
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.executor.extraJavaOptions", addOpens)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** kill -9 one executor JVM (a descendant running
    * CoarseGrainedExecutorBackend); returns its pid or -1 if none
    * found. ProcessHandle.info().commandLine() TRUNCATES long command
    * lines (the executor's -cp alone is ~16 KB, so the class name
    * never survives) — read /proc/<pid>/cmdline instead. */
  private[graft] def killOneExecutor(): Long = {
    import scala.jdk.CollectionConverters._
    def cmdOf(pid: Long): String = try {
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"/proc/$pid/cmdline"))).replace('\u0000', ' ')
    } catch { case _: Throwable => "" }
    ProcessHandle.current().descendants().iterator().asScala
      .find(h => cmdOf(h.pid()).contains("ExecutorBackend"))
      .map { v => v.destroyForcibly(); println(s"KILLED pid=${v.pid()}"); v.pid() }
      .getOrElse(-1L)
  }

  def main(args: Array[String]): Unit = {
    val Array(query, dir) = args
    val spark = clusterSession("executor-loss")

    def run(): Array[String] =
      SparkEntry.queries(query)(spark, dir)
        .collect().map(_.toString).sorted

    val clean = run()

    // arm the chaos: on the FIRST task start of the recovered run,
    // kill -9 one executor JVM
    val killed = new java.util.concurrent.atomic.AtomicLong(-1)
    val armed = new java.util.concurrent.atomic.AtomicBoolean(true)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskStart(
            t: org.apache.spark.scheduler.SparkListenerTaskStart): Unit =
          if (armed.compareAndSet(true, false))
            killed.set(killOneExecutor())
      })

    val recovered = run()

    if (killed.get() < 0) {
      println("VACUOUS no executor process found to kill")
      spark.stop(); sys.exit(3)
    }
    if (!java.util.Arrays.equals(
        clean.asInstanceOf[Array[AnyRef]],
        recovered.asInstanceOf[Array[AnyRef]])) {
      println(s"MISMATCH clean=${clean.length} recovered=${recovered.length}")
      spark.stop(); sys.exit(4)
    }
    println(s"EXLOSS_OK rows=${clean.length}")
    spark.stop()
  }
}
