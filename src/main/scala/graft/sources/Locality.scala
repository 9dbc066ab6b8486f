package graft.sources

import graft.{QueryDef, Tables}
import org.apache.spark.{Partition, SparkContext, TaskContext}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Locality-aware file assignment — kmr_assign_file parity
  * (src/kmriolb.c:247-447).
  *
  * Reference model: every file is keyed by the I/O GROUP that physically
  * stores it (on K: the (x,y) Tofu coordinate derived from the FEFS OST,
  * kmr_iolb_calc_xy_of_rank / the OBDIDX scan); ranks are keyed by their
  * own group; a shuffle brings each group's files and ranks together and
  * files are dealt to the group's ranks so per-rank counts stay level.
  * On machines without the topology API the operator degrades to a plain
  * kmr_shuffle.
  *
  * Spark-first split of the same capability:
  *
  *  1. [[fileBlockHosts]] — the "which group stores this file" probe:
  *     HDFS block locations from the Hadoop FileSystem (the portable
  *     equivalent of the FEFS OST scan).
  *  2. [[assignByHost]] — the assignment itself as a DECLARATIVE
  *     transform (window round-robin within each host's file group,
  *     largest files first), so it is oracle-checkable and scales as a
  *     shuffle-by-host: rank layout is block-cyclic (rank r lives on
  *     host r mod H — the reference's rank-to-group keying), each host's
  *     files are dealt to its own ranks round-robin by descending size,
  *     which levels both count AND bytes the way the reference levels
  *     counts. Files on a host with no rank (H > R) fall back to the
  *     global rank ring by file hash — the reference's "no rank in this
  *     group" shuffle fallback.
  *  3. [[AssignedFilesRDD]] — the scheduler hook Spark actually honors:
  *     one partition per rank holding that rank's files, with
  *     `getPreferredLocations` = the rank's host, so the task scheduler
  *     places each partition's task next to its data exactly as the
  *     reference places file reads on near ranks. (For ordinary scans
  *     Spark's FileScanRDD already does this internally; the explicit
  *     RDD is the operator form a user composes with [[Ingest]].)
  *
  * Scale shape: only (file, size, host) triples — O(files), not bytes —
  * flow through the assignment; the window is per-host (shuffle on the
  * host key); the RDD moves no data at plan time. At 100 TB with ~1e6
  * files this is a kilobyte-per-file metadata job.
  */
object Locality {

  /** One file with its placement metadata. `hosts` are the block hosts
    * of the FIRST block (the reference likewise keys a file by one OST
    * group; multi-'\0' values pick one near rank for the set). */
  final case class FileLoc(file: String, size: Long, hosts: Seq[String])

  /** Probe block locations for every regular file under `path`
    * (recursive). Local filesystems report "localhost". */
  def fileBlockHosts(spark: SparkSession, path: String): Seq[FileLoc] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(p: org.apache.hadoop.fs.Path): Seq[FileLoc] = {
      val st = fs.getFileStatus(p)
      if (st.isDirectory)
        fs.listStatus(p).toSeq.sortBy(_.getPath.getName).flatMap(s => walk(s.getPath))
      else {
        val locs = fs.getFileBlockLocations(st, 0, math.max(1, st.getLen))
        val hosts = if (locs.isEmpty) Seq.empty else locs.head.getHosts.toSeq
        Seq(FileLoc(p.toString, st.getLen, hosts))
      }
    }
    walk(root)
  }

  /** The assignment: `files` is (file STRING, size BIGINT, host_idx INT
    * in [0, nHosts)); ranks are block-cyclic over hosts (rank r on host
    * r mod nHosts). Within each host, files are dealt to the host's own
    * ranks round-robin by (size DESC, file) — locality plus leveling;
    * hosts beyond the rank ring (host_idx ≥ nRanks has no rank when
    * nHosts > nRanks) fall back to the global ring by a deterministic
    * file hash. Returns (file, host_idx, rank). */
  def assignByHost(files: DataFrame, nRanks: Int, nHosts: Int): DataFrame = {
    require(nRanks > 0 && nHosts > 0, "assignByHost: nRanks and nHosts must be positive")
    val h = lit(nHosts)
    // #{r < nRanks : r mod nHosts == host_idx}
    val ranksOnHost = expr(s"(($nRanks - 1 - host_idx) div $nHosts) + 1")
    val rn = row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy("host_idx").orderBy(col("size").desc, col("file")))
    files
      .withColumn("rn", rn)
      .withColumn("rank",
        when(col("host_idx") < nRanks,
          col("host_idx") + h * pmod(col("rn") - 1, ranksOnHost))
          .otherwise(pmod(abs(hash(col("file"))), lit(nRanks))))
      .select(col("file"), col("host_idx"), col("rank").cast("int").as("rank"))
  }

  /** One partition per rank; preferred location = the rank's host. */
  private final class RankPartition(val index: Int, val files: Seq[String],
      val host: String) extends Partition

  /** The scheduler hook: partition i holds rank i's assigned files and
    * PREFERS the rank's host — Spark's task placement then does what
    * kmr_assign_file's shuffle did. compute() streams the files' lines;
    * callers compose further transforms on the RDD/Dataset. */
  final class AssignedFilesRDD(sc: SparkContext,
      groups: IndexedSeq[(Seq[String], String)],
      hadoopConfBc: org.apache.spark.broadcast.Broadcast[Map[String, String]])
      extends RDD[String](sc, Nil) {

    override protected def getPartitions: Array[Partition] =
      groups.indices.map(i =>
        new RankPartition(i, groups(i)._1, groups(i)._2): Partition).toArray

    override protected def getPreferredLocations(split: Partition): Seq[String] = {
      val h = split.asInstanceOf[RankPartition].host
      if (h.isEmpty) Seq.empty else Seq(h)
    }

    override def compute(split: Partition, context: TaskContext): Iterator[String] = {
      val conf = new org.apache.hadoop.conf.Configuration(false)
      hadoopConfBc.value.foreach { case (k, v) => conf.set(k, v) }
      split.asInstanceOf[RankPartition].files.iterator.flatMap { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        val fs = p.getFileSystem(conf)
        val in = new java.io.BufferedReader(new java.io.InputStreamReader(
          fs.open(p), java.nio.charset.StandardCharsets.UTF_8))
        Option(context).foreach(_.addTaskCompletionListener[Unit](_ => in.close()))
        Iterator.continually(in.readLine()).takeWhile(_ != null)
      }
    }
  }

  /** Assign `path`'s files by real block hosts and read them with
    * locality-preferring tasks. Rank ring = distinct hosts observed,
    * block-cyclically widened to `nRanks`. */
  def readAssigned(spark: SparkSession, path: String, nRanks: Int): RDD[String] = {
    val locs = fileBlockHosts(spark, path)
    val hosts = locs.flatMap(_.hosts.headOption).distinct.sorted
    val hostOf = hosts.zipWithIndex.toMap
    import spark.implicits._
    val filesDf = spark.createDataset(locs.map(l =>
      (l.file, l.size, l.hosts.headOption.flatMap(hostOf.get).getOrElse(0))))
      .toDF("file", "size", "host_idx")
    val nHosts = math.max(1, hosts.size)
    val assigned = assignByHost(filesDf, nRanks, nHosts)
      .collect().map(r => (r.getString(0), r.getInt(2)))
    val byRank = (0 until nRanks).map { r =>
      val fs = assigned.filter(_._2 == r).map(_._1).sorted.toSeq
      val host = if (hosts.isEmpty) "" else hosts(r % nHosts)
      (fs, host)
    }
    val confMap = {
      import scala.jdk.CollectionConverters._
      spark.sparkContext.hadoopConfiguration.iterator().asScala
        .map(e => (e.getKey, e.getValue)).toMap
    }
    new AssignedFilesRDD(spark.sparkContext, byRank,
      spark.sparkContext.broadcast(confMap))
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- The assignment transform as a census gate over a synthetic
    // "file catalog" derived from supplier (file=s_name#s_suppkey —
    // suffixed because sf1+ replicas repeat s_name 10× and a non-total
    // (size, file) order would make row_number engine-dependent; size=
    // exact acctbal cents; host=nation): 64 ranks block-cyclic over 25
    // hosts. Every supplier nation holds a rank (25 < 64), so the
    // locality invariant rank≡host (mod 25) holds for every row — the
    // oracle replays the same windowed round-robin declaratively.
    QueryDef("locality_assign", (s, d) => {
      val files = Tables.load(s, d, "supplier")
        .select(concat(col("s_name"), lit("#"), col("s_suppkey")).as("file"),
          expr("try_cast(round(s_acctbal * 100, 0) AS LONG)").as("size"),
          col("s_nationkey").cast("int").as("host_idx"))
      assignByHost(files, nRanks = 64, nHosts = 25)
        .orderBy("file")
    }, Some(
      "WITH f AS (SELECT s_name || '#' || s_suppkey AS file, TRY_CAST(round(s_acctbal*100,0) AS BIGINT) AS size, " +
      "CAST(s_nationkey AS INT) AS host_idx FROM supplier), " +
      "w AS (SELECT file, host_idx, row_number() OVER " +
      "(PARTITION BY host_idx ORDER BY size DESC, file) AS rn FROM f) " +
      "SELECT file, host_idx, CAST(host_idx + 25 * ((rn - 1) % (((64 - 1 - host_idx) // 25) + 1)) AS INT) AS rank " +
      "FROM w ORDER BY file"))
  )
}
