package graft.core

import org.apache.spark.sql.SparkSession

/** Child-process main for SpawnerKvsSpec's retry-chaos test: in a
  * session WITH task retries (local[4, 2] — the deployment shape;
  * the suite's shared session runs maxFailures=1 so it cannot host
  * this), one spawned worker process dies instantly on its first
  * attempt (exit 7 before speaking the protocol), and Spark's task
  * retry must re-spawn it and converge to the exact input — the
  * exactly-once-per-retry property a 1000-executor deployment relies
  * on when worker binaries get OOM-killed.
  *
  * Prints `CHAOS_FIRED` when the first-attempt kill actually armed and
  * `SPAWNRETRY_OK rows=<n>` on verified convergence; exits 3 if the
  * failure never fired (a vacuous clean run must fail the spec). */
object SpawnRetryChild {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4, 2]")
      .appName("spawn-retry-chaos")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val marker = java.nio.file.Files.createTempDirectory("spawn-chaos")
    // exactly one attempt across all partitions wins the mkdir and
    // dies pre-protocol; every other attempt (incl. the retry of the
    // dead task) execs cat
    val cmd = Seq("sh", "-c",
      s"if mkdir ${marker.toString}/first 2>/dev/null; then exit 7; else exec cat; fi")

    val in = (0 until 40).map(i => (s"k$i", s"v$i\twith\ttabs-$i"))
    val out = SpawnerKvs.mapViaSpawnKvs(
      in.toDS().repartition(2), cmd).collect().sorted

    val fired = java.nio.file.Files.exists(marker.resolve("first"))
    if (!fired) { System.err.println("chaos never fired"); sys.exit(3) }
    println("CHAOS_FIRED")
    require(out.toSeq == in.sorted.toSeq,
      s"retry produced ${out.length} rows, expected ${in.size} — not exactly-once")
    println(s"SPAWNRETRY_OK rows=${out.length}")
    spark.stop()
  }
}
