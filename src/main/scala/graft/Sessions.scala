package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession construction for the two runtime mains.
  *
  * Default master is `local[cpus, 2]` — one JVM, N threads, ONE task
  * retry (local mode defaults to maxFailures=1, where a single
  * transient task failure kills the whole query; a real cluster always
  * runs with retries, so zero-retry local runs are stricter than the
  * deployment they model; a DETERMINISTIC error still fails both
  * attempts and stays loud).
  *
  * `SPARK_GRAFT_MASTER=local-cluster[w,c,mem]` runs the SAME census in
  * multi-JVM standalone mode: real executor processes, real
  * serialization of every closure, executor-side classloading of the
  * custom Catalyst functions, real broadcast/shuffle transport — the
  * axes single-JVM local mode can never exercise (the reference's own
  * tests all run `mpirun -np 8`, src/Makefile:99-142; multi-process is
  * the reference's default and is ours to prove). In that mode the
  * compiled application classes must be SHIPPED to the executor JVMs:
  * we pass the `sbt package` jar via spark.jars (set SPARK_GRAFT_JAR to
  * override auto-detection) and mirror the JDK-17 --add-opens set into
  * the executor JVMs.
  */
object Sessions {

  private val jdk17AddOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")

  /** The packaged application jar for executor shipping. */
  private def appJar(): String =
    sys.env.get("SPARK_GRAFT_JAR").getOrElse {
      val dir = new java.io.File("target/scala-2.13")
      Option(dir.listFiles()).toSeq.flatten
        .filter(f => f.getName.startsWith("kmrspark") && f.getName.endsWith(".jar"))
        .sortBy(-_.lastModified())
        .headOption
        .map(_.getAbsolutePath)
        .getOrElse(sys.error(
          "local-cluster mode needs the application jar on the executors: " +
            "run `sbt package` first (or set SPARK_GRAFT_JAR)"))
    }

  def build(cpus: String): SparkSession = {
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus, 2]")
    val b = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // Shuffle files are reclaimed when their ShuffleDependency is
      // GC'd; with a large driver heap and a census of 170+ short
      // queries the default 30min periodic GC lets tens of GB of dead
      // blockmgr files pile up on local disk (observed: 43 GB mid-way
      // through an sf10 Verify). 5min keeps the footprint bounded by
      // the live window, not the session's history; no effect on
      // steady-state jobs beyond one cheap GC per interval.
      .config("spark.cleaner.periodicGC.interval", "5min")
    // The in-process standalone Worker builds the executor command via
    // WorkerCommandBuilder, which (outside Spark's own launch scripts)
    // resolves the Scala version from SPARK_SCALA_VERSION and otherwise
    // looks for a dev-build layout ("Cannot find any build
    // directories"). Fail fast with the fix rather than letting every
    // executor launch die with that opaque error.
    if (master.startsWith("local-cluster"))
      require(sys.env.contains("SPARK_SCALA_VERSION"),
        "local-cluster mode: export SPARK_SCALA_VERSION=2.13 (the " +
          "standalone Worker needs it to build the executor classpath)")
    val b2 =
      if (!master.startsWith("local-cluster")) b
      else b
        .config("spark.jars", appJar())
        // worker capacity is the master-string's third field (MB); the
        // executor request must fit inside it
        .config("spark.executor.memory",
          sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM", "2g"))
        // spark.* keys are forbidden inside executor java options;
        // nanosAsLong is a driver-side SQL conf (Tables.load sets it)
        .config("spark.executor.extraJavaOptions", jdk17AddOpens)
    b2.getOrCreate()
  }
}
