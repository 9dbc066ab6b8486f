package graft.core

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Encoder, SparkSession}
import org.apache.spark.sql.functions._

/** Checkpoint/restart resume (src/kmrckpt.c:1-40; kmrrun --ckpt;
  * kill/restart tests ex/testckpt1-4.c): the reference journals each
  * operation's output KVS to per-rank files so a re-executed run SKIPS
  * completed operations, restores their saved output, and continues to a
  * bit-identical result.
  *
  * Spark-native design: lineage already recovers lost partitions within
  * a run; what checkpointing adds is CROSS-RUN durability. Each named
  * stage is a parquet snapshot ([[KVS.save]]) gated on its `_SUCCESS`
  * marker — parquet commit is atomic-via-rename, so a stage killed
  * mid-save is simply recomputed (the reference's incomplete-journal
  * rule, kmrckpt.c "progress of operations" model). A completed stage is
  * never recomputed: re-execution restores the snapshot and resumes.
  * Both the fresh and the resumed path return [[KVS.restore]] of the
  * snapshot, so downstream stages read byte-identical input either way.
  */
object Checkpoint {

  /** Run `compute` unless the stage's snapshot is already committed;
    * either way return the restored snapshot. */
  def stage[K, V](spark: SparkSession, ckptDir: String, name: String)(
      compute: => KVS[K, V])(implicit e: Encoder[(K, V)]): KVS[K, V] =
    stage(spark, ckptDir, name, writerToken = null)(compute)

  /** [[stage]] with a writer-epoch guard: pass the token from [[claim]]
    * and a stage write aborts — loudly, before and after the save —
    * when another run has re-claimed the directory in the meantime.
    * Two concurrent writers sharing a ckptDir previously raced benignly
    * but UNDETECTABLY (last save wins, both runs read whichever
    * snapshot committed last); with the guard the superseded writer
    * fails instead of silently publishing into the other run's stream. */
  def stage[K, V](spark: SparkSession, ckptDir: String, name: String,
      writerToken: String)(
      compute: => KVS[K, V])(implicit e: Encoder[(K, V)]): KVS[K, V] = {
    val path = s"$ckptDir/$name"
    if (!committed(spark, path)) {
      requireClaim(spark, ckptDir, writerToken, s"before writing stage '$name'")
      compute.save(path)
      requireClaim(spark, ckptDir, writerToken, s"after writing stage '$name'")
    }
    KVS.restore[K, V](spark, path)
  }

  /** Dataset-shaped stage for non-KVS pipelines (kmrrun --ckpt wires
    * its pipe stages through this). Same commit rule as [[stage]]. */
  def stageDs[T](spark: SparkSession, ckptDir: String, name: String,
      writerToken: String = null)(
      compute: => org.apache.spark.sql.Dataset[T])(
      implicit e: Encoder[T]): org.apache.spark.sql.Dataset[T] = {
    val path = s"$ckptDir/$name"
    if (!committed(spark, path)) {
      requireClaim(spark, ckptDir, writerToken, s"before writing stage '$name'")
      compute.write.mode("overwrite").parquet(path)
      requireClaim(spark, ckptDir, writerToken, s"after writing stage '$name'")
    }
    spark.read.parquet(path).as[T]
  }

  def committed(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  def clear(spark: SparkSession, ckptDir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(ckptDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Snapshot inspector — cmd/kmrckptdump.c parity (the reference ships
    * a decoder because its journals are a private binary format; these
    * snapshots are plain parquet, so this is the equivalent operational
    * listing): one row per staged snapshot under `ckptDir` with its
    * commit state, data-file census, and row count. A TORN snapshot
    * (no `_SUCCESS`) reports its on-disk file count/bytes but a null
    * row count — its data files are untrusted by the resume contract,
    * so the inspector must not try to decode them either. Listing is a
    * driver-side O(#snapshots) metadata walk; only the committed row
    * counts run (column-pruned, count-star) Spark jobs. */
  def describe(spark: SparkSession, ckptDir: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(ckptDir)
    val f = fs(spark, root)
    val rows: Seq[(String, Boolean, Long, Long, Option[Long])] =
      if (!f.exists(root)) Seq.empty
      else f.listStatus(root).toSeq.filter(_.isDirectory).map { st =>
        val name = st.getPath.getName
        val files = f.listStatus(st.getPath).toSeq.filter(_.isFile)
          .filterNot(_.getPath.getName.startsWith("_"))
        val ok = committed(spark, st.getPath.toString)
        val nRows =
          if (ok) Some(spark.read.parquet(st.getPath.toString).count()) else None
        (name, ok, files.size.toLong, files.map(_.getLen).sum, nRows)
      }.sortBy(_._1)
    rows.toDF("stage", "committed", "n_files", "bytes", "n_rows")
  }

  // ---- Writer-epoch manifest + snapshot GC (r6 verdict item 7).

  private val ManifestName = "_graft_writer"

  private def fs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Claim ckptDir for this run: record a fresh writer token in the
    * directory manifest (the reference's kmr_ckpt per-job ckpt
    * directory identity, src/kmrckpt.c "ckpt_<jobid>" naming, minus the
    * MPI job id Spark does not have). The returned token passes to the
    * guarded [[stage]]/[[stageDs]] overloads; a later claim by another
    * run supersedes this one and makes the guarded writes fail. */
  def claim(spark: SparkSession, ckptDir: String): String = {
    val dir = new org.apache.hadoop.fs.Path(ckptDir)
    val f = fs(spark, dir)
    f.mkdirs(dir)
    val token = java.util.UUID.randomUUID().toString
    // Write-then-rename: a concurrent currentWriter/requireClaim must
    // never observe an empty or torn manifest (create-truncate exposed
    // a zero-byte window that could spuriously abort a valid writer).
    val tmp = new org.apache.hadoop.fs.Path(dir, s"$ManifestName.tmp.$token")
    val out = f.create(tmp, true)
    try out.write(token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dst = new org.apache.hadoop.fs.Path(dir, ManifestName)
    // HDFS-style rename refuses to clobber, so a contended claim loops
    // delete-then-rename. A racing writer can re-create dst between our
    // delete and rename — under last-writer-supersedes that must NOT
    // abort this claim (a single retry threw here and turned a benign
    // race into a crash); keep contending a few rounds, then give up
    // loudly only if the rename never lands (a genuinely broken FS).
    var renamed = f.rename(tmp, dst)
    var attempts = 0
    while (!renamed && attempts < 5) {
      f.delete(dst, false)
      renamed = f.rename(tmp, dst)
      attempts += 1
    }
    require(renamed, s"claim: rename to $dst failed after $attempts retries")
    token
  }

  /** The token of the run currently holding the directory, if any. */
  def currentWriter(spark: SparkSession, ckptDir: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(ckptDir, ManifestName)
    val f = fs(spark, p)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
    }
  }

  private def requireClaim(spark: SparkSession, ckptDir: String,
      token: String, when: String): Unit =
    if (token != null) {
      val held = currentWriter(spark, ckptDir)
      if (!held.contains(token))
        throw new IllegalStateException(
          s"checkpoint dir '$ckptDir' was re-claimed by another run $when " +
          s"(held=${held.getOrElse("<none>")}, mine=$token); aborting instead " +
          "of racing two writers over the same snapshots")
    }

  /** GC: delete COMMITTED stage snapshots whose `_SUCCESS` is older
    * than `maxAgeMs`. In-flight (uncommitted) stage directories are
    * never touched — they belong to a running writer; torn leftovers
    * are reclaimed by the recompute path instead. Returns the deleted
    * stage names so callers can log them. */
  def clearStale(spark: SparkSession, ckptDir: String, maxAgeMs: Long): Seq[String] = {
    val dir = new org.apache.hadoop.fs.Path(ckptDir)
    val f = fs(spark, dir)
    if (!f.exists(dir)) return Seq.empty
    val cutoff = System.currentTimeMillis() - maxAgeMs
    f.listStatus(dir).toSeq
      .filter(_.isDirectory)
      .flatMap { st =>
        val marker = new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")
        val stale = f.exists(marker) && f.getFileStatus(marker).getModificationTime < cutoff
        if (stale && f.delete(st.getPath, true)) Some(st.getPath.getName) else None
      }
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- Two-stage pipeline executed TWICE through the checkpoint
    // layer: run 1 computes and snapshots both stages; run 2 (the
    // "restarted job") restores stage snapshots instead of recomputing
    // — CheckpointSpec proves the skip with a recompute counter — and
    // its RESUMED output is what the gate hashes against straight SQL,
    // so resume-equals-fresh is exactly what the oracle certifies.
    // Stage 1 is the expensive pass (events → per-(type, day) sums);
    // stage 2 derives per-type totals from the restored snapshot.
    QueryDef("ckpt_resume", (s, d) => {
      import s.implicits._
      val dir = {
        val sf = d.replaceAll("[^A-Za-z0-9.]", "_")
        s"target/graft-tmp/ckpt_$sf"
      }
      clear(s, dir) // deterministic gate: always exercise fresh + resume
      def pipeline(): KVS[String, Long] = {
        val daily = stage(s, dir, "daily") {
          KVS.fromColumns[String, Long](
            Tables.load(s, d, "events")
              .filter(Tables.cents.isNotNull)
              .groupBy(col("event_type"),
                expr("ts div 86400000000000").as("day_no")) // nanos → days
              .agg(sum(Tables.cents).as("c")),
            concat_ws("|", col("event_type"), col("day_no")), col("c"))
        }
        stage(s, dir, "totals") {
          KVS(daily.ds.map { case (k, c) => (k.split('|')(0), c) })
            .reduceByKey(_ + _)
        }
      }
      pipeline()                  // run 1: fresh compute + snapshots
      val resumed = pipeline()    // run 2: restored from snapshots only
      resumed.ds.toDF("event_type", "sum_cents")
        .select(col("event_type"), col("sum_cents"))
        .orderBy("event_type")
    }, Some(
      "SELECT event_type, CAST(sum(" + graft.Tables.centsSql + ") AS BIGINT) AS sum_cents " +
      "FROM events WHERE " + graft.Tables.centsSql + " IS NOT NULL " +
      "GROUP BY event_type ORDER BY event_type"))
  )
}
