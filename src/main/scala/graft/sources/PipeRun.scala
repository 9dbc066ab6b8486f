package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** kmrrun parity (kmrrun/kmrrun.c:1-64; shell/kmrshell.c): a driver that
  * wires USER SHELL EXECUTABLES into a map-shuffle-reduce pipeline —
  * the reference's signature "UDF in an external process" workflow:
  *
  *   input lines → | mapper-cmd |  (emits "key value" lines)
  *     → shuffle/group by key → "key v1 v2 …" lines
  *     → | reducer-cmd |  (one line per key in, any lines out)
  *     → output text files (one per partition ≈ per-rank output)
  *
  * Spark's scheduler provides the dynamic master/worker balancing that
  * kmrrun implements by hand over MPI; each partition runs one mapper
  * and one reducer process, streaming through stdin/stdout.
  */
object PipeRun {

  /** `ckptDir` enables kmrrun's `--ckpt` semantics (kmrrun/kmrrun.c:24;
    * src/kmrckpt.c): each pipe stage's output is snapshot behind a
    * _SUCCESS gate, so a killed-and-rerun job restores completed stages
    * — skipping their external-process re-execution — and resumes to
    * the identical result. */
  def run(spark: SparkSession, inputPath: String,
      mapperCmd: Seq[String], reducerCmd: Seq[String],
      ckptDir: Option[String] = None): Dataset[String] = {
    import spark.implicits._
    def stage(name: String)(compute: => Dataset[String]): Dataset[String] =
      ckptDir match {
        case Some(dir) => graft.core.Checkpoint.stageDs(spark, dir, name)(compute)
        case None      => compute
      }
    val mapped = stage("mapped") {
      Ingest.pipeLines(spark.read.textFile(inputPath), mapperCmd)
    }
    // group values per key ("key v1 v2 …"), co-locating keys like
    // kmrrun's per-key temp files
    val grouped = mapped
      .map { l => val i = l.indexOf(' ')
        if (i < 0) (l, "") else (l.substring(0, i), l.substring(i + 1)) }
      .groupByKey(_._1)
      .mapGroups((k, vs) => (k +: vs.map(_._2).toSeq).mkString(" "))
    stage("reduced") { Ingest.pipeLines(grouped, reducerCmd) }
  }

  /** CLI: <input-path> <mapper-cmd> <reducer-cmd> <output-path> [--ckpt=<dir>]
    * (commands are shell-split on spaces, like kmrrun's -m/-r args). */
  def main(args: Array[String]): Unit = {
    val ckpt = args.collectFirst { case a if a.startsWith("--ckpt=") => a.drop(7) }
    val Array(input, mapper, reducer, output) = args.filterNot(_.startsWith("--ckpt="))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try run(spark, input,
      mapper.split(' ').toSeq, reducer.split(' ').toSeq, ckpt)
      .write.mode("overwrite").text(output)
    finally spark.stop()
  }
}
