package graft

/** Executor-loss chaos (the fault model of a 1000-executor cluster):
  * a census query must survive kill -9 of an executor JVM mid-stage —
  * task retry on the survivor, shuffle-block recompute, and a
  * row-identical answer. Runs in a child JVM because the suite's
  * shared session is single-JVM local[4]; the child boots a real
  * local-cluster[2,2] with forked executor processes, arms a
  * first-task-start listener, and kills one executor the moment the
  * recovered run begins. The child FAILS (exit 3) if the kill never
  * landed, so this can never silently become a clean-run test. */
class ExecutorLossSpec extends SparkSuite {

  private def child(query: String): Unit =
    spawn(s"graft.ExecutorLossChild $query /root/testdata/sf0.01",
      okMarker = "EXLOSS_OK rows=", tag = query)

  private def spawn(mainAndArgs: String, okMarker: String, tag: String): Unit = {
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getAbsolutePath
    val addOpens = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(_.toString)
      .filter(_.startsWith("--add-opens"))
    val cmd = Seq(javaBin) ++ addOpens ++ Seq("-Xmx1g",
      "-cp", sys.props("java.class.path")) ++ mainAndArgs.split(' ').toSeq
    val pb = new ProcessBuilder(cmd: _*)
    // the in-process standalone Worker needs this to build the
    // executor classpath (same requirement Sessions fail-fasts on)
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.redirectErrorStream(true)
    val log = java.io.File.createTempFile(s"exloss-$tag", ".log")
    pb.redirectOutput(log)
    val p = pb.start()
    val done = p.waitFor(420, java.util.concurrent.TimeUnit.SECONDS)
    def tail = try {
      val t = java.nio.file.Files.readString(log.toPath)
      t.substring(math.max(0, t.length - 3000))
    } catch { case _: Throwable => "<no log>" }
    if (!done) { p.destroyForcibly(); fail(s"$tag child timed out:\n$tail") }
    assert(p.exitValue() == 0, s"$tag child exited ${p.exitValue()}:\n$tail")
    val out = java.nio.file.Files.readString(log.toPath)
    assert(out.contains("KILLED pid="), s"$tag: chaos never fired:\n$tail")
    assert(out.contains(okMarker), s"$tag: no verified recovery:\n$tail")
  }

  test("q9_profit survives kill -9 of an executor mid-query (multi-join, " +
      "two shuffle stages recomputed)") {
    child("q9_profit")
  }

  test("dedup_minhash survives kill -9 of an executor mid-query (signature " +
      "aggregate + band self-join recomputed)") {
    child("dedup_minhash")
  }

  test("streaming runningTotals survives executor loss mid-batch: the " +
      "retried task reloads RocksDB state from the checkpoint and totals " +
      "stay exact") {
    spawn("graft.StreamLossChild", okMarker = "STREAMLOSS_OK users=",
      tag = "streamloss")
  }
}
