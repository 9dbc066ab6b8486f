package graft.sources

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Raw-data ingest layer (SURVEY §2.3/§2.4): line-oriented text reads
  * (kmr_map_getline, src/kmrfiles.c:1552-1640), pipe-delimited `.tbl`
  * scans with explicit schema (ex/tpch.c:1057-1182), and external-process
  * pipe mapping (kmr_map_ms_commands, src/kmrmapms.c:2421-2486 — the
  * reference's "UDF in an external process" surface, realized as
  * RDD.pipe).
  *
  * The ingest gate queries round-trip driver testdata through the raw
  * format and back, so the oracle is the parquet original: a correct
  * ingest produces byte-identical analytics.
  */
object Ingest {

  /** kmr_map_getline parity: one record per line with its global line
    * number, numbered in lexical file order then byte order within each
    * file. Spark orders splits by size (descending) for bin-packing, so a
    * bare zipWithIndex would number lines in an input-layout-dependent
    * order on multi-file input. Instead of sorting the data (a full
    * shuffle of every byte just to renumber), this is the two-phase
    * count-then-offset design over the splits themselves: pass 1 counts
    * lines per split, the driver orders the O(#splits) counts by each
    * split's (file, start offset) and prefix-sums the carries, pass 2
    * re-reads and emits numbered lines map-only. Zero shuffle at any
    * scale; a split never spans files, so split order IS line order. */
  def readTextLines(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    import org.apache.hadoop.io.{LongWritable, Text}
    import org.apache.hadoop.mapred.{FileSplit, TextInputFormat}
    def hadoopLines() = spark.sparkContext
      .hadoopFile(path, classOf[TextInputFormat], classOf[LongWritable], classOf[Text])
      .asInstanceOf[org.apache.spark.rdd.HadoopRDD[LongWritable, Text]]
    val counts = hadoopLines().mapPartitionsWithInputSplit { (split, it) =>
      val fs = split.asInstanceOf[FileSplit]
      Iterator((fs.getPath.toString, fs.getStart, it.size.toLong))
    }.collect()
    var acc = 0L
    // Offsets are keyed by the split's own (file, start) — NOT by
    // partition index — so pass 2 is immune to the two getSplits calls
    // enumerating splits in different orders. If the input changed
    // between the passes the keys no longer match and the lookup below
    // fails loudly instead of silently misnumbering.
    val offsets = counts.sortBy(c => (c._1, c._2)).map { case (f, st, n) =>
      val o = acc; acc += n; ((f, st), o)
    }.toMap
    val offB = spark.sparkContext.broadcast(offsets)
    hadoopLines().mapPartitionsWithInputSplit { (split, it) =>
      val fs = split.asInstanceOf[FileSplit]
      val key = (fs.getPath.toString, fs.getStart)
      var i = offB.value.getOrElse(key,
        throw new IllegalStateException(
          s"input split $key not present in the count pass — " +
            "did the input directory change while readTextLines ran?"))
      // Text objects are reused by the record reader — copy the string
      // before the iterator advances.
      it.map { case (_, line) => val r = (i, line.toString); i += 1; r }
    }.toDF("line_no", "line")
  }

  /** TPC-H `.tbl` scan: pipe-delimited CSV with an explicit schema —
    * Catalyst pushes filters/pruning into this scan exactly as with
    * parquet (minus column statistics). */
  def readTbl(spark: SparkSession, path: String, schema: StructType,
      mode: String = "PERMISSIVE"): DataFrame =
    spark.read.option("sep", "|").option("mode", mode).schema(schema).csv(path)

  /** kmr_map_ms_commands parity: stream a partition's records through an
    * external command's stdin/stdout. Spark schedules one process per
    * partition with dynamic load balancing — the master/worker RPC the
    * reference implements by hand. */
  def pipeLines(ds: Dataset[String], command: Seq[String]): Dataset[String] = {
    import ds.sparkSession.implicits._
    ds.sparkSession.createDataset(ds.rdd.pipe(command))
  }

  /** kmr_file_enumerate (src/kmrfiles.c:1152-1356): expand a path into
    * its regular files, recursing into directories, as a distributable
    * Dataset of file paths. */
  def enumerateFiles(spark: SparkSession, path: String): Dataset[String] = {
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(p: org.apache.hadoop.fs.Path): Seq[String] = {
      val st = fs.getFileStatus(p)
      if (st.isDirectory)
        fs.listStatus(p).toSeq.sortBy(_.getPath.getName).flatMap(s => walk(s.getPath))
      else Seq(p.toString)
    }
    spark.createDataset(walk(root))
  }

  /** kmr_map_file_names (src/kmrfiles.c:1357-1404): enumerate file names,
    * distribute them across partitions, and map each name to its content
    * (name, bytes). Content loading goes through Spark's binaryFile
    * source, which carries the session's Hadoop configuration to the
    * executors (credentials, fs settings) — a hand-rolled
    * `new Configuration()` in a task would not. */
  def mapFileNames(spark: SparkSession, path: String, numPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    // distribute the (tiny) NAME strings, read contents per task — the
    // many-small-files case then parallelizes by numPartitions, and only
    // names ever shuffle. The session's Hadoop configuration is shipped
    // as a broadcast key-value list (credentials, fs settings).
    val confB = spark.sparkContext.broadcast(
      spark.sparkContext.hadoopConfiguration.iterator().asScala
        .map(e => (e.getKey, e.getValue)).toList)
    val names = enumerateFiles(spark, path)
    val dist = if (numPartitions > 0) names.repartition(numPartitions) else names
    dist.mapPartitions { it =>
      val conf = new org.apache.hadoop.conf.Configuration(false)
      confB.value.foreach { case (k, v) => conf.set(k, v) }
      it.map { name =>
        val p = new org.apache.hadoop.fs.Path(name)
        val fs = p.getFileSystem(conf)
        val len = fs.getFileStatus(p).getLen
        require(len <= Int.MaxValue - 8,
          s"$name is ${len}B — too large for a whole-file read; use a splittable source")
        val in = fs.open(p)
        try {
          val buf = new Array[Byte](len.toInt)
          in.readFully(0, buf)
          (name, buf)
        } finally in.close()
      }
    }.toDF("path", "content")
  }

  private def tmpDir(s: SparkSession, tag: String, sfDir: String): String = {
    // repo-relative scratch (never outside the workspace); one dir per
    // (tag, sf) so concurrent gates don't collide.
    val sf = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    s"target/graft-tmp/${tag}_$sf"
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- .tbl round-trip: project lineitem → write pipe-delimited text
    // → re-scan with explicit schema → aggregate. Oracle reads the
    // parquet original, so any parse/typing drift fails the hash.
    QueryDef("ingest_tbl", (s, d) => {
      val dir = tmpDir(s, "tbl", d)
      val proj = Tables.load(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_returnflag"),
          graft.Tables.qtyCents.as("qty_cents"))
      proj.write.mode("overwrite").option("sep", "|").csv(dir)
      val schema = StructType.fromDDL(
        "l_orderkey BIGINT, l_returnflag STRING, qty_cents BIGINT")
      readTbl(s, dir, schema)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum("qty_cents").as("sum_qty_cents"))
        .orderBy("l_returnflag")
    }, Some(
      "SELECT l_returnflag, count(*) AS n, " +
      "CAST(sum(" + graft.Tables.qtyCentsSql + ") AS BIGINT) AS sum_qty_cents " +
      "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")),

    // ---- Corrupt-input tolerance: the raw-scan reality at 100 TB is
    // that some records are garbage. Deliberately contaminate a .tbl
    // dump with unparseable lines, re-scan under DROPMALFORMED, and
    // verify the aggregate over fully-parsed records equals the clean
    // subset exactly — bad records are dropped or nulled, never coerced
    // into wrong values. The explicit non-null filter matters: Spark's
    // CSV fast-count path skips field parsing when no columns are
    // needed, so malformed detection varies with column pruning;
    // anchoring the aggregate on parsed fields makes the result
    // independent of that internal (probed empirically — a bare count()
    // under DROPMALFORMED counts cast-failing lines).
    QueryDef("ingest_malformed", (s, d) => {
      import s.implicits._
      val dir = tmpDir(s, "badtbl", d)
      Tables.load(s, d, "lineitem")
        .filter(col("l_orderkey") % 2 === 0)
        .select(col("l_orderkey"),
          graft.Tables.qtyCents.as("qty_cents"))
        .write.mode("overwrite").option("sep", "|").csv(dir)
      s.createDataset(Seq(
          "garbage|not_a_number", "x|y", "1|2|3|4|extra-columns", "|", "lone-field"))
        .write.mode("append").text(dir)
      readTbl(s, dir, StructType.fromDDL("l_orderkey BIGINT, qty_cents BIGINT"),
          mode = "DROPMALFORMED")
        .filter(col("l_orderkey").isNotNull && col("qty_cents").isNotNull)
        .groupBy()
        .agg(count(lit(1)).as("n"), sum("qty_cents").as("sum_qty_cents"))
    }, Some(
      "SELECT count(*) AS n, " +
      "CAST(sum(" + graft.Tables.qtyCentsSql + ") AS BIGINT) AS sum_qty_cents " +
      "FROM lineitem WHERE l_orderkey % 2 = 0")),

    // ---- Text-file wordcount (ex/wordcount.c:15-48 reads FILES, not
    // tables): write documents.text as plain .txt, read back line-wise,
    // tokenize, count. Same oracle as the parquet wordcount.
    QueryDef("ingest_text", (s, d) => {
      val dir = tmpDir(s, "txt", d)
      Tables.load(s, d, "documents").select(col("text"))
        .write.mode("overwrite").text(dir)
      s.read.text(dir)
        .select(explode(split(lower(col("value")), "[^a-z]+")).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy("word")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), col("word"))
    }, Some(
      "SELECT word, count(*) AS cnt FROM (" +
      "SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS word FROM documents) t " +
      "WHERE word <> '' GROUP BY word ORDER BY cnt DESC, word")),

    // ---- JSON-lines round-trip: events subset → .jsonl → re-scan with
    // explicit schema → aggregate; oracle reads the parquet original.
    QueryDef("ingest_json", (s, d) => {
      val dir = tmpDir(s, "json", d)
      Tables.load(s, d, "events")
        .select(col("event_id"), col("event_type"),
          Tables.cents.as("cents"))
        .write.mode("overwrite").json(dir)
      s.read.schema(StructType.fromDDL(
          "event_id BIGINT, event_type STRING, cents BIGINT"))
        .json(dir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
        .orderBy("event_type")
    }, Some(
      "SELECT event_type, count(*) AS n, " +
      "CAST(sum(" + graft.Tables.centsSql + ") AS BIGINT) AS sum_cents " +
      "FROM events GROUP BY event_type ORDER BY event_type")),

    // ---- Quoted-CSV round-trip with header: free text through the
    // format corner cases plain .tbl never hits — embedded delimiters,
    // quotes, escaped quotes. The re-read keeps the default
    // line-per-record framing (splittable scans; multiLine=true would
    // serialize each file through one task at 100 TB, so text with
    // embedded newlines belongs in parquet/JSONL, not CSV). The min-md5
    // per language makes the gate bitwise: one mangled character
    // anywhere in the round-trip and the hash diverges from the
    // parquet-original oracle.
    QueryDef("ingest_csv", (s, d) => {
      val dir = tmpDir(s, "csv", d)
      Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"), col("lang"))
        .write.mode("overwrite")
        .option("header", "true").option("quoteAll", "true")
        .option("escape", "\"")
        .csv(dir)
      s.read
        .option("header", "true").option("escape", "\"")
        .schema(StructType.fromDDL("doc_id BIGINT, text STRING, lang STRING"))
        .csv(dir)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          sum(length(col("text")).cast("long")).as("sum_chars"),
          min(md5(col("text"))).as("min_md5"))
        .orderBy("lang")
    }, Some(
      "SELECT lang, count(*) AS n, " +
      "CAST(sum(length(text)) AS BIGINT) AS sum_chars, " +
      "min(md5(text)) AS min_md5 " +
      "FROM documents GROUP BY lang ORDER BY lang")),

    // ---- XML round-trip on Spark 4's built-in XML source (the donated
    // spark-xml): write documents as <doc> rows, read back with an
    // explicit schema, and prove byte-identity per language via the same
    // min-md5 the CSV round-trip uses. rowTag files split by row
    // boundaries, and entity escaping (&lt;/&amp;) makes arbitrary
    // markup in text reversible; ignoreSurroundingSpaces stays OFF so
    // the reader cannot silently trim payloads. Same oracle as
    // ingest_csv: the aggregate straight off the parquet originals.
    QueryDef("ingest_xml", (s, d) => {
      val dir = tmpDir(s, "xml", d)
      Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"), col("lang"))
        .write.mode("overwrite")
        .option("rowTag", "doc").option("rootTag", "docs")
        .xml(dir)
      s.read
        .option("rowTag", "doc")
        .option("ignoreSurroundingSpaces", "false")
        .schema(StructType.fromDDL("doc_id BIGINT, text STRING, lang STRING"))
        .xml(dir)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          sum(length(col("text")).cast("long")).as("sum_chars"),
          min(md5(col("text"))).as("min_md5"))
        .orderBy("lang")
    }, Some(
      "SELECT lang, count(*) AS n, " +
      "CAST(sum(length(text)) AS BIGINT) AS sum_chars, " +
      "min(md5(text)) AS min_md5 " +
      "FROM documents GROUP BY lang ORDER BY lang")),

    // ---- Small-file compaction: the table-maintenance pass every
    // long-lived 100 TB table needs — streaming/micro-batch ingest
    // leaves thousands of KB-sized files per partition, and scan cost
    // becomes dominated by file-open overhead (plus driver memory for
    // the file index). Rewrite many small files into few large ones
    // with coalesce() — a NARROW dependency that concatenates partitions
    // without a shuffle (repartition would shuffle every byte; only
    // needed when the layout must also change). The gate proves row
    // fidelity (count + two independent sums per language) against the
    // original table; IngestSpec pins the actual file counts.
    QueryDef("sink_compact", (s, d) => {
      val dir = tmpDir(s, "compact", d)
      Tables.load(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .repartition(64) // simulate a fragmented micro-batch landing
        .write.mode("overwrite").parquet(s"$dir/small")
      s.read.parquet(s"$dir/small")
        .coalesce(2) // the compaction pass: no shuffle, 64 -> 2 files
        .write.mode("overwrite").parquet(s"$dir/compacted")
      s.read.parquet(s"$dir/compacted")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id")).as("sum_ids"),
          sum(col("n_chars").cast("long")).as("sum_chars"))
        .orderBy("lang")
    }, Some(
      "SELECT lang, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS sum_ids, " +
      "CAST(sum(n_chars) AS BIGINT) AS sum_chars " +
      "FROM documents GROUP BY lang ORDER BY lang")),

    // ---- Partitioned sink + pruned scan: write hive-layout parquet
    // partitioned by lang, read back with a partition filter. At 100 TB
    // the filter prunes directories at PLAN time (PartitionPruneSpec
    // pins the single-partition scan); the gate checks the round-trip
    // result against the unpartitioned original.
    QueryDef("sink_partitioned", (s, d) => {
      val dir = tmpDir(s, "partsink", d)
      Tables.load(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .write.mode("overwrite").partitionBy("lang").parquet(dir)
      s.read.parquet(dir)
        .filter(col("lang").isin("en", "de"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars").cast("long")).as("sum_chars"))
        .orderBy("lang")
    }, Some(
      "SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars " +
      "FROM documents WHERE lang IN ('en','de') GROUP BY lang ORDER BY lang")),

    // ---- Schema evolution: two parquet generations of the same table
    // (v2 adds a column), read back as ONE dataset with mergeSchema —
    // the steady-state lakehouse reality where a 100 TB corpus is never
    // rewritten when the schema grows. The aggregate separates rows by
    // generation via the evolved column's nullness, and the oracle
    // recomputes from the ORIGINAL table, so both the split and the
    // merged read must be lossless for the hash to match. pmod keeps
    // the generation assignment total for any id sign.
    QueryDef("ingest_evolve", (s, d) => {
      val dir = tmpDir(s, "evolve", d)
      val docs = Tables.load(s, d, "documents")
      docs.filter(pmod(col("doc_id"), lit(2L)) === 0)
        .select("doc_id", "lang")
        .write.mode("overwrite").parquet(s"$dir/v1")
      docs.filter(pmod(col("doc_id"), lit(2L)) === 1)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .write.mode("overwrite").parquet(s"$dir/v2")
      s.read.option("mergeSchema", "true").parquet(s"$dir/v1", s"$dir/v2")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          count(col("n_chars")).as("n_evolved"),
          sum(col("n_chars").cast("long")).as("sum_chars"))
        .orderBy("lang")
    }, Some(
      "SELECT lang, count(*) AS n_docs, " +
      "CAST(sum(CASE WHEN (doc_id % 2 + 2) % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_evolved, " +
      "CAST(sum(CASE WHEN (doc_id % 2 + 2) % 2 = 1 THEN n_chars END) AS BIGINT) AS sum_chars " +
      "FROM documents GROUP BY lang ORDER BY lang")),

    // ---- ORC round-trip: the other columnar format the reference's
    // users would bring; oracle still reads the parquet original, so any
    // encode/decode drift fails the hash.
    QueryDef("ingest_orc", (s, d) => {
      val dir = tmpDir(s, "orc", d)
      Tables.load(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          round(col("o_totalprice") * 100, 0).cast("long").as("price_cents"))
        .write.mode("overwrite").orc(dir)
      s.read.orc(dir)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), sum("price_cents").as("sum_cents"))
        .orderBy("o_orderstatus")
    }, Some(
      "SELECT o_orderstatus, count(*) AS n, " +
      "CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS sum_cents " +
      "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus")),

    // ---- External-process map: "doc_id <tokens…>" lines piped through
    // awk, which emits "doc_id token_count"; parsed back and verified
    // against DuckDB's own tokenization. Text is whitespace-normalized
    // on BOTH sides first (awk's default FS collapses runs and pipe
    // framing is line-based, so raw text with doubled spaces or embedded
    // newlines would diverge or break record framing).
    QueryDef("pipe_tokens", (s, d) => {
      import s.implicits._
      val norm = trim(regexp_replace(col("text"), "\\s+", " "))
      val lines = Tables.load(s, d, "documents")
        .select(concat_ws(" ", col("doc_id"), norm).as("line"))
        .as[String]
      pipeLines(lines, Seq("awk", "{print $1, NF-1}"))
        .map { out =>
          val Array(id, n) = out.split(" ", 2)
          (id.toLong, n.trim.toLong)
        }
        .toDF("doc_id", "n_tokens")
        .orderBy("doc_id")
    }, Some(
      // empty/whitespace-only/NULL text: awk yields 0 fields; DuckDB's
      // string_split('') is [''] (len 1) and NULL propagates — pin 0
      "SELECT doc_id, CASE WHEN text IS NULL OR trim(regexp_replace(text, '\\s+', ' ', 'g')) = '' THEN 0 " +
      "ELSE CAST(len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS BIGINT) END AS n_tokens " +
      "FROM documents ORDER BY doc_id"))
  )
}
