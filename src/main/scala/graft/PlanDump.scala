package graft

import java.nio.file.{Files, Paths}

/** Optimization-round helper: write `.explain("formatted")` for named
  * SparkEntry queries to text files (plans/rNN/<query>_{before,after}.txt
  * — the judge checks plan claims against these). Usage:
  *
  *   sbt "runMain graft.PlanDump <sfDir> <outDir> <suffix> q1,q2,..."
  *
  * Iterative gates (pagerank, dedup_clusters, flexdice_clusters, bfs_hops,
  * kmeans_clusters) execute their supersteps eagerly while the DataFrame is
  * being CONSTRUCTED; for those the dumped plan is the final consumer plan
  * over the checkpointed loop output, and the per-round shape is attested
  * by the bench stage/task trace instead (bench_detail.json).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 4,
      "usage: PlanDump <sfDir> <outDir> <suffix> <name1,name2,...>")
    val Array(sfDir, outDir, suffix, namesCsv) = args
    val names = namesCsv.split(",").map(_.trim).filter(_.nonEmpty)
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    val spark = Sessions.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(s"$outDir/${n}_$suffix.txt"), txt)
      System.err.println(s"[plandump] wrote $n ($suffix)")
    }
    spark.stop()
  }
}
