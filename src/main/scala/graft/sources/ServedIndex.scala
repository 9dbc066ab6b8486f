package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Build-or-serve machinery for PERSISTED index tables (SURVEY §9's
  * "persisted as a bucketed table in production"; the materialized
  * counterpart of the reference's inverted-index join kernel kmr_match,
  * src/kmrmoreops.c:695-728).
  *
  * Contract: the index lives at a stable EXTERNAL location under
  * target/graft-index/, with a caller-supplied corpus fingerprint file
  * beside the data. Three paths:
  * - fingerprint missing/stale → (re)build: drop table, delete dir,
  *   write fresh (bucketed+sorted when buckets>0), commit fingerprint
  *   LAST so a torn build can never serve;
  * - fingerprint fresh, catalog knows the table → serve as-is (the hot
  *   path — zero I/O beyond the fingerprint read);
  * - fingerprint fresh, catalog cold (a NEW SparkSession — the
  *   in-memory catalog forgets tables) → re-register DDL against the
  *   existing files, no rewrite.
  *
  * At 100 TB the shape is identical with thousands of buckets: the
  * index write is the one full shuffle the corpus ever pays, and every
  * downstream query joins bucket-co-located. */
object ServedIndex {

  // Per-table build lock: several gate queries legitimately SHARE one
  // index (the cluster family + dedup_indexed all serve the minhash
  // band index; five graph gates share coPairs) and the driver's
  // Verify runs queries on a 4-thread pool — without the lock every
  // concurrent first call sees the missing fingerprint and races the
  // CREATE TABLE. The lock serializes build-or-serve per table within
  // this JVM; the loser of the build re-checks freshness and takes the
  // serve path. (Cross-PROCESS writers are governed by the fingerprint
  // + last-writer-wins, same as Checkpoint.claim.)
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Sanitized table-name suffix for a data directory — single-sourced
    * so a collision fix lands at every index site at once. */
  def suffix(d: String): String = d.replaceAll("[^A-Za-z0-9]", "_")

  // Build epoch per table, bumped on every rebuild: session-scoped serve
  // caches (below) hold LAZY table-read plans whose resolved file listing
  // a rebuild deletes — the epoch lets them invalidate instead of reading
  // deleted part files. In-JVM only; a rebuild by another process cannot
  // reach this JVM's cached plans (cross-process staleness is governed by
  // the fingerprint check on the next uncached serve, and ultimately the
  // shared oracle gate).
  private val epochs =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private def epoch(tbl: String): Long =
    Option(epochs.get(tbl)).map(_.longValue).getOrElse(0L)

  def apply(s: SparkSession, tbl: String, dirName: String, fp: String,
      schemaDdl: String, bucketCol: String, buckets: Int)(
      build: => DataFrame): DataFrame =
    locks.computeIfAbsent(tbl, _ => new Object).synchronized {
      serve(s, tbl, dirName, fp, schemaDdl, bucketCol, buckets)(build)
    }

  /** Session-scoped serve: skip the per-call freshness fingerprint (a
    * full corpus scan — it was costing every serve-path gate one corpus
    * read per invocation, twice for dedup_eval) after the first serve in
    * a session. `fp` is by-name and only evaluated on a cache miss. The
    * cached value is ONLY the build epoch the table was last verified
    * fresh under in this session — NOT the DataFrame: a Dataset strongly
    * references its SparkSession, and a DataFrame value would pin the
    * WeakHashMap's weak session key forever (session leak). A hit
    * re-derives the lazy plan via s.table(tbl) (a catalog lookup — the
    * expensive part being skipped is the fingerprint corpus scan). A
    * same-JVM rebuild bumps the epoch and the next call re-serves. */
  private val serveCache = new java.util.WeakHashMap[SparkSession,
    scala.collection.mutable.Map[String, Long]]()

  /** Invalidate every session's serve cache (ADVICE r9): a long-lived
    * session (e.g. the Python entry path) otherwise never re-checks the
    * corpus fingerprint, silently serving a stale index after an on-disk
    * corpus regen. Call after any external data regen; the next serve of
    * each table redoes the freshness check. */
  def resetCaches(): Unit = serveCache.synchronized { serveCache.clear() }

  def cached(s: SparkSession, tbl: String, dirName: String, fp: => String,
      schemaDdl: String, bucketCol: String, buckets: Int)(
      build: => DataFrame): DataFrame = {
    // Capture the epoch BEFORE the serve (ADVICE r9 TOCTOU): a rebuild
    // landing between apply() and the cache put would otherwise tag the
    // pre-rebuild plan with the post-rebuild epoch and serve a plan over
    // deleted part files. Under the pre-read epoch a concurrent rebuild
    // merely invalidates this entry → one extra re-serve, never staleness.
    val preEpoch = epoch(tbl)
    val hit = serveCache.synchronized {
      serveCache.computeIfAbsent(s,
        _ => scala.collection.mutable.Map.empty[String, Long])
        .get(tbl).contains(preEpoch)
    }
    if (hit) s.table(tbl)
    else {
      // fingerprint + build-or-serve OUTSIDE the cache lock (they run
      // Spark jobs); concurrent misses race benignly — apply() is
      // per-table-locked and the loser takes the serve path
      val df = apply(s, tbl, dirName, fp, schemaDdl, bucketCol, buckets)(build)
      serveCache.synchronized {
        serveCache.computeIfAbsent(s,
          _ => scala.collection.mutable.Map.empty[String, Long])
          .put(tbl, preEpoch)
      }
      df
    }
  }

  private def serve(s: SparkSession, tbl: String, dirName: String, fp0: String,
      schemaDdl: String, bucketCol: String, buckets: Int)(
      build: => DataFrame): DataFrame = {
    // The stored fingerprint covers the physical LAYOUT as well as the
    // corpus: a bucket-count or schema change (e.g. retuning buckets to
    // the executor count) must rebuild, or a stale layout silently caps
    // join parallelism at the old bucket count.
    val fp = s"$fp0|$schemaDdl|$bucketCol|$buckets"
    val loc = new org.apache.hadoop.fs.Path(
      new java.io.File(s"target/graft-index/$dirName").getAbsoluteFile.toURI)
    val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
    val fpFile = new org.apache.hadoop.fs.Path(loc, "_graft_fingerprint")
    val stored =
      if (!fs.exists(fpFile)) None
      else {
        val in = fs.open(fpFile)
        try Some(new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
        finally in.close()
      }
    if (!stored.contains(fp)) {
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      if (fs.exists(loc)) fs.delete(loc, true)
      val w = build.write.mode("overwrite").option("path", loc.toString)
      (if (buckets > 0) w.bucketBy(buckets, bucketCol).sortBy(bucketCol) else w)
        .saveAsTable(tbl)
      val out = fs.create(fpFile, true)
      try out.write(fp.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      epochs.merge(tbl, 1L, (a, b) => a + b)
    } else if (!s.catalog.tableExists(tbl)) {
      val cluster =
        if (buckets > 0)
          s"CLUSTERED BY ($bucketCol) SORTED BY ($bucketCol) INTO $buckets BUCKETS "
        else ""
      s.sql(s"CREATE TABLE $tbl ($schemaDdl) USING PARQUET " +
        cluster + s"LOCATION '${loc.toString}'")
    }
    s.table(tbl)
  }
}
